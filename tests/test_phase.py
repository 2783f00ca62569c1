import numpy as np
import jax.numpy as jnp

from nautilus_tpu import Prior, Sampler


def make_sampler(**kwargs):
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')

    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)

    return Sampler(prior, likelihood, n_live=200, seed=0,
                   vectorized='jax', n_batch=64, **kwargs)


def test_sampling_phase_device_progresses():
    # The device-side phase driver must add whole batches to valid shells
    # and raise the effective sample size toward the requested target
    # (reference loop: nautilus/sampler.py:482-494).
    sampler = make_sampler()
    assert sampler.run(n_eff=500)
    n_eff_before = sampler.n_eff
    n_like_before = sampler.n_like
    shell_n_before = sampler.shell_n.copy()

    sampler._sampling_phase_device(1, n_eff_before * 1.5)

    assert sampler.n_like > n_like_before
    assert sampler.n_eff > n_eff_before
    # Batches land in existing shells only, in n_batch multiples.
    grown = sampler.shell_n - shell_n_before
    assert np.all(grown >= 0)
    assert grown.sum() % sampler.n_batch == 0
    # Shell bookkeeping stays consistent: counts match stored arrays.
    for i in range(len(sampler.bounds)):
        assert len(sampler.points[i]) == len(sampler.log_l[i])


def test_exploration_phase_device_batches_and_stops():
    # The device-side exploration driver must add whole batches to the
    # newest shell and respect the bound trigger: after one dispatch the
    # host-side counters justify building a bound (reference loop:
    # nautilus/sampler.py:436-480).
    sampler = make_sampler()
    sampler.add_bound()
    sampler.n_update_iter = -sampler.n_live
    n_like_0 = sampler.n_like

    sampler._exploration_phase_device(0.01)

    added = sampler.n_like - n_like_0
    assert added > 0 and added % sampler.n_batch == 0
    assert sampler.n_like_iter == added
    assert len(sampler.idx[0]) == len(sampler.log_l[0]) == added
    # Device pacing may only stop at (or just past) a host stopping rule,
    # never mid-way with all rules cold: either the bound trigger fired or
    # the dispatch cap was hit.
    full_dispatch = added == sampler.PHASE_MAX_BATCHES * sampler.n_batch
    trigger = (sampler.n_update_iter >= sampler.n_update and
               np.sum(sampler.shell_n) > sampler.n_live)
    assert full_dispatch or trigger or sampler.f_live <= 0.01


def test_timing_and_rate_metrics():
    sampler = make_sampler()
    assert sampler.evals_per_second == 0.0
    assert sampler.run(n_eff=500)
    assert sampler.timing['total'] > 0
    assert sampler.timing['sample'] > 0
    assert sampler.timing['bound'] > 0
    assert sampler.timing['sample_cand'] >= sampler.n_like
    assert sampler.evals_per_second > 0
