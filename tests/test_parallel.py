"""Device-mesh parallelism tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.parallel import make_mesh, make_distributed_sampler, \
    shard_ensemble_train
from nautilus_tpu.ops.mlp import init_mlp


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 (virtual) devices')
    return make_mesh(8)


def test_distributed_sampling_step(mesh8):
    import __graft_entry__ as ge
    outer_stacked, outer_mask, nstack = ge._synthetic_bound(n_dim=3)

    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)

    step = make_distributed_sampler(
        mesh8, likelihood, lambda u: u, n_per_device=64)
    points, accept, log_l, stats = step(
        jax.random.key(0), outer_stacked, outer_mask, nstack)
    assert points.shape == (64 * 8, 3)
    # psum'd counter equals the visible accept mask count.
    assert int(stats['n_accept']) == int(np.sum(np.asarray(accept)))
    # accepted log_l finite, rejected -inf.
    log_l = np.asarray(log_l)
    accept = np.asarray(accept)
    assert np.all(np.isfinite(log_l[accept]))
    assert np.all(np.isinf(log_l[~accept]))


def test_distributed_step_deterministic(mesh8):
    import __graft_entry__ as ge
    outer_stacked, outer_mask, nstack = ge._synthetic_bound(n_dim=3)

    def likelihood(x):
        return -jnp.sum(x ** 2, axis=-1)

    step = make_distributed_sampler(
        mesh8, likelihood, lambda u: u, n_per_device=32)
    out1 = step(jax.random.key(7), outer_stacked, outer_mask, nstack)
    out2 = step(jax.random.key(7), outer_stacked, outer_mask, nstack)
    assert np.all(np.asarray(out1[0]) == np.asarray(out2[0]))
    # Different devices (folded keys) produce different candidates.
    pts = np.asarray(out1[0]).reshape(8, 32, 3)
    assert not np.allclose(pts[0], pts[1])


def test_ensemble_sharded_training(mesh8):
    e_nets = 8
    sizes = (3, 16, 1)
    keys = jax.random.split(jax.random.key(1), e_nets)
    params = jax.vmap(lambda k: init_mlp(k, sizes))(keys)
    m0 = jax.tree.map(jnp.zeros_like, params)
    v0 = jax.tree.map(jnp.zeros_like, params)
    t0 = jnp.zeros(e_nets, jnp.int32)
    xb = jnp.asarray(
        np.random.default_rng(0).random((128, 3)), jnp.float32)
    yb = jnp.sum(xb, axis=1)
    mb = jnp.ones(128, jnp.float32)

    train = shard_ensemble_train(mesh8, sizes)
    params2, _, _, t2, losses = train(params, m0, v0, t0, xb, yb, mb)
    assert losses.shape == (e_nets,)
    assert np.all(np.asarray(t2) == 1)
    # Parameters changed for every network.
    assert not np.allclose(np.asarray(params2.weights[0]),
                           np.asarray(params.weights[0]))


def test_sampler_with_mesh(mesh8):
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')

    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)

    sampler = Sampler(prior, likelihood, n_live=200, n_networks=0, seed=0,
                      vectorized='jax', mesh=mesh8)
    success = sampler.run(n_eff=300)
    assert success
    # Unnormalized Gaussian: logZ = log(2 pi sigma^2) for sigma = 0.1.
    assert sampler.log_z == pytest.approx(np.log(2 * np.pi * 0.01), abs=0.2)


def test_sampler_mesh_matches_single_device(mesh8):
    # The mesh shards computation, not keys: the drawn candidate sequence
    # is device-count-invariant (sampler.py:_shard_points_fn), so a mesh
    # run must reproduce the single-device run BITWISE — same points,
    # same log-likelihoods, same integer counters. Only the device-side
    # f32 pacing statistics may reassociate, and the host re-applies
    # every decision in f64, so even those cannot change the outcome.
    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.05) ** 2, axis=-1)

    results = {}
    for mesh in [None, mesh8]:
        prior = Prior()
        prior.add_parameter('a')
        prior.add_parameter('b')
        sampler = Sampler(prior, likelihood, n_live=200, n_networks=2,
                          seed=11, vectorized='jax', mesh=mesh)
        assert sampler.run(n_eff=500)
        results[mesh is None] = (
            sampler.log_z, sampler.n_like, sampler.n_eff,
            sampler.posterior(), np.copy(sampler.shell_n),
            np.copy(sampler.shell_n_sample),
            sampler.timing.get('sample_cand', 0))

    (z_mesh, n_like_mesh, n_eff_mesh, post_mesh, sn_mesh, sns_mesh,
     cand_mesh) = results[False]
    (z_one, n_like_one, n_eff_one, post_one, sn_one, sns_one,
     cand_one) = results[True]
    # Integer counters: bitwise.
    assert n_like_mesh == n_like_one
    assert np.array_equal(sn_mesh, sn_one)
    assert np.array_equal(sns_mesh, sns_one)
    assert cand_mesh == cand_one
    # The drawn sample stream: bitwise.
    for a, b in zip(post_mesh, post_one):
        assert np.array_equal(a, b)
    # Derived statistics: bitwise (pure f64 functions of the above).
    assert z_mesh == z_one
    assert n_eff_mesh == n_eff_one
