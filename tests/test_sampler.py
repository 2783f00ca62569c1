"""Integration tests for the Sampler.

Modeled on the reference suite (reference: tests/test_sampler.py): accuracy
gates against analytic truths, run-mode matrix, determinism, and stopping
criteria. Kept small enough for CPU CI: low n_live / n_eff.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import logsumexp

from nautilus_tpu import Prior, Sampler


def make_prior(n_dim=2):
    prior = Prior()
    for i in range(n_dim):
        prior.add_parameter('x_{}'.format(i))
    return prior


def gauss_like(sigma=0.05, n_dim=2):
    log_norm = -0.5 * n_dim * np.log(2 * np.pi * sigma ** 2)

    def likelihood(x):
        return log_norm - 0.5 * jnp.sum(((x - 0.5) / sigma) ** 2, axis=-1)
    return likelihood


@pytest.mark.parametrize('n_networks', [0, 2])
def test_gaussian_accuracy(n_networks):
    # Reference gates: |logZ| < 0.05, mean atol 0.01, cov atol 0.001
    # (reference: tests/test_sampler.py:167-215).
    sampler = Sampler(make_prior(), gauss_like(), n_live=500,
                      n_networks=n_networks, seed=0, vectorized='jax')
    success = sampler.run(n_eff=2000)
    assert success
    assert np.abs(sampler.log_z) < 0.05

    points, log_w, log_l = sampler.posterior()
    w = np.exp(log_w)
    mean = np.average(points, weights=w, axis=0)
    cov = np.cov(points.T, aweights=w)
    assert np.allclose(mean, 0.5, atol=0.01)
    assert np.allclose(cov, 0.05 ** 2 * np.eye(2), atol=0.001)


def test_bounds_nested():
    # Bounds must be nested: occupation matrix lower-triangular
    # (reference: tests/test_sampler.py:211-215).
    sampler = Sampler(make_prior(), gauss_like(), n_live=300,
                      n_networks=0, seed=1, vectorized='jax')
    sampler.run(n_eff=500)
    m = sampler.shell_bound_occupation()
    assert np.all(m == np.tril(m))


def test_enlarge_analytic():
    # With a huge enlarge factor, only the unit-cube bound exists and logZ
    # becomes a plain MC estimate whose expectation is exact
    # (reference: tests/test_sampler.py:218-241).
    sampler = Sampler(make_prior(), gauss_like(sigma=0.2), n_live=200,
                      n_networks=0, enlarge_per_dim=100, seed=2,
                      vectorized='jax')
    sampler.run(f_live=0.2, n_eff=1000)
    points, log_w, log_l = sampler.posterior()
    # All points in one shell with volume 1.
    assert len(sampler.bounds) == 1
    assert sampler.log_z == pytest.approx(
        logsumexp(log_l) - np.log(len(log_l)), abs=1e-9)


def test_resume_continue_deterministic():
    # Stopping at n_like_max and continuing must give identical results to
    # an uninterrupted run (in-memory; reference:
    # tests/test_sampler.py:261-281 does this via checkpoint files).
    results = []
    for interrupt in [False, True]:
        sampler = Sampler(make_prior(), gauss_like(), n_live=200,
                          n_networks=0, seed=3, vectorized='jax')
        if interrupt:
            while not sampler.run(n_eff=500, n_like_max=sampler.n_like + 200):
                pass
        else:
            sampler.run(n_eff=500)
        results.append((sampler.log_z, sampler.n_eff, sampler.n_like))
    assert results[0] == results[1]


def test_timeout():
    sampler = Sampler(make_prior(), gauss_like(), n_live=200,
                      n_networks=0, seed=4, vectorized='jax')
    success = sampler.run(timeout=0)
    assert not success


def test_n_like_max():
    sampler = Sampler(make_prior(), gauss_like(), n_live=200, n_networks=0,
                      seed=5, vectorized='jax', n_batch=100)
    success = sampler.run(n_like_max=300)
    assert not success
    assert sampler.n_like == 300


def test_constant_likelihood():
    # A constant likelihood must terminate and give logZ = const
    # (reference: tests/test_sampler.py:334-348).
    def likelihood(x):
        return jnp.full(x.shape[:-1], -2.0)

    sampler = Sampler(make_prior(), likelihood, n_live=200, n_networks=0,
                      seed=6, vectorized='jax')
    sampler.run(f_live=0.1, n_eff=200)
    assert sampler.log_z == pytest.approx(-2.0, abs=1e-6)


def test_plateau():
    # Likelihood with a plateau: exp(-r2/s2) clipped below a floor.
    # Analytic: Z = integral of max(floor, gaussian). Every seed must hit
    # the reference's accuracy gate (reference runs 10 seeds,
    # tests/test_sampler.py:351-392; the compiled programs are shared
    # across seeds so repeats are cheap).
    def likelihood(x):
        r2 = jnp.sum((x - 0.5) ** 2, axis=-1)
        return jnp.maximum(-r2 / 0.05 ** 2, -10.0)

    # MC truth.
    rng = np.random.default_rng(0)
    x = rng.random((1000000, 2))
    log_l = np.maximum(-np.sum((x - 0.5) ** 2, axis=1) / 0.05 ** 2, -10.0)
    log_z_true = logsumexp(log_l) - np.log(len(log_l))

    for seed in range(10):
        sampler = Sampler(make_prior(), likelihood, n_live=300,
                          n_networks=0, seed=seed, vectorized='jax')
        assert sampler.run(n_eff=1000)
        assert sampler.log_z == pytest.approx(log_z_true, abs=0.1), seed


def test_f32_likelihood_envelope():
    # |log L| ~ 1e5 through the fused f32 device path must agree with the
    # f64 host path and the analytic truth within the documented
    # quantization envelope (ops/arena.py precision notes: f32 resolution
    # at 1e5 is ~0.012 nat, far inside the statistical error here).
    offset = -1.0e5
    sigma = 0.1
    log_norm = -np.log(2 * np.pi * sigma ** 2)

    def like_jax(x):
        return offset - 0.5 * jnp.sum(((x - 0.5) / sigma) ** 2, axis=-1)

    def like_host(x):
        return offset - 0.5 * np.sum(((x - 0.5) / sigma) ** 2, axis=-1)

    truth = offset - log_norm
    results = {}
    for mode in ['jax', True]:
        like = like_jax if mode == 'jax' else like_host
        sampler = Sampler(make_prior(), like, n_live=200, n_networks=2,
                          seed=4, vectorized=mode, pass_dict=False,
                          n_batch=500)
        assert sampler.run(n_eff=1000)
        results[mode] = sampler.log_z
    assert results['jax'] == pytest.approx(truth, abs=0.1)
    assert results[True] == pytest.approx(truth, abs=0.1)
    assert results['jax'] == pytest.approx(results[True], abs=0.15)


def test_funnel():
    # 2D funnel vs brute-force MC truth (reference:
    # tests/test_sampler.py:302-331).
    def likelihood(x):
        v = (x[..., 0] - 0.5) * 10
        u = (x[..., 1] - 0.5) * 10
        return (-0.5 * v ** 2 / 1.0 ** 2 -
                0.5 * u ** 2 / jnp.exp(v) - 0.5 * v)

    sampler = Sampler(make_prior(), likelihood, n_live=500, n_networks=2,
                      seed=8, vectorized='jax')
    success = sampler.run(n_eff=3000)
    assert success
    rng = np.random.default_rng(1)
    x = rng.random((4000000, 2))
    v = (x[:, 0] - 0.5) * 10
    u = (x[:, 1] - 0.5) * 10
    log_l = -0.5 * v ** 2 - 0.5 * u ** 2 / np.exp(v) - 0.5 * v
    log_z_true = logsumexp(log_l) - np.log(len(log_l))
    assert sampler.log_z == pytest.approx(log_z_true, abs=0.1)


def test_multimodal_periodic():
    # Two modes on the periodic boundary: with periodic=[0, 1] the bound
    # should need fewer modes (reference: tests/test_sampler.py:395-416).
    def likelihood(x):
        d = jnp.minimum(jnp.abs(x - 0.0), jnp.abs(x - 1.0))
        r2 = jnp.sum(d ** 2, axis=-1)
        return -0.5 * r2 / 0.05 ** 2

    sampler = Sampler(make_prior(), likelihood, n_live=300, n_networks=0,
                      periodic=np.array([0, 1]), seed=9, vectorized='jax')
    sampler.run(f_live=0.1, n_eff=500)
    assert len(sampler.bounds[-1].neural_bounds) == 1


def test_discard_exploration():
    sampler = Sampler(make_prior(), gauss_like(), n_live=300,
                      n_networks=0, seed=10, vectorized='jax')
    success = sampler.run(n_eff=1000, discard_exploration=True)
    assert success
    assert np.abs(sampler.log_z) < 0.1
    n_eff_discard = sampler.n_eff
    sampler.discard_exploration = False
    assert sampler.n_eff > n_eff_discard


def test_host_likelihood_paths():
    # Non-JAX scalar likelihood + Prior object, pass_dict True and False.
    def likelihood_dict(d):
        return float(-0.5 * ((d['x_0'] - 0.5) ** 2 +
                             (d['x_1'] - 0.5) ** 2) / 0.05 ** 2 -
                     np.log(2 * np.pi * 0.05 ** 2))

    sampler = Sampler(make_prior(), likelihood_dict, n_live=200,
                      n_networks=0, seed=11)
    success = sampler.run(n_eff=300)
    assert success
    assert np.abs(sampler.log_z) < 0.2

    points, log_w, log_l = sampler.posterior(return_as_dict=True)
    assert 'x_0' in points


def test_vectorized_host_likelihood():
    def likelihood(x):
        return (-0.5 * np.sum(((x - 0.5) / 0.05) ** 2, axis=-1) -
                np.log(2 * np.pi * 0.05 ** 2))

    sampler = Sampler(make_prior(), likelihood, n_live=200, n_networks=0,
                      seed=12, vectorized=True, pass_dict=False)
    success = sampler.run(n_eff=300)
    assert success
    assert np.abs(sampler.log_z) < 0.2


def test_blobs():
    # Blobs: single extra return (reference: tests/test_blobs.py).
    def likelihood(x):
        log_l = -0.5 * jnp.sum(((x - 0.5) / 0.05) ** 2, axis=-1)
        return log_l, x[..., 0]

    sampler = Sampler(make_prior(), likelihood, n_live=200, n_networks=0,
                      seed=13, vectorized='jax')
    sampler.run(n_eff=300)
    points, log_w, log_l, blobs = sampler.posterior(return_blobs=True)
    assert len(blobs) == len(points)
    assert blobs.dtype == np.float32
