"""Device inverse-CDF prior transforms vs scipy, and the end-to-end
non-uniform-prior device path."""

import numpy as np
import pytest
from scipy.stats import (beta, cauchy, expon, gamma, laplace, loguniform,
                         norm, truncnorm, uniform)

import jax.numpy as jnp

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.ops.dists import make_prior_transform


@pytest.mark.parametrize('dist', [
    uniform(loc=-2.0, scale=5.0),
    loguniform(1e-3, 1e2),
    norm(loc=1.5, scale=0.3),
    truncnorm(-2.0, 1.0, loc=0.5, scale=2.0),
    expon(loc=0.1, scale=3.0),
    cauchy(loc=-1.0, scale=0.5),
    laplace(loc=2.0, scale=1.5),
    gamma(3.5, loc=0.0, scale=2.0),
    beta(2.0, 5.0, loc=-1.0, scale=2.0),
])
def test_device_ppf_matches_scipy(dist):
    # The device map must agree with the reference's host-side
    # dist.isf(1 - u) (reference: nautilus/prior.py:117).
    u = np.linspace(0.001, 0.999, 41)
    transform = make_prior_transform([dist])
    got = np.asarray(transform(jnp.asarray(u[:, None], jnp.float32)))[:, 0]
    want = dist.isf(1.0 - u)
    scale = np.maximum(np.abs(want), 1.0)
    assert np.allclose(got, want, atol=5e-4 * np.max(scale), rtol=5e-4)


@pytest.mark.parametrize('dist', [
    __import__('scipy.stats', fromlist=['triang']).triang(
        0.3, loc=-1.0, scale=2.0),
    __import__('scipy.stats', fromlist=['weibull_min']).weibull_min(
        1.7, loc=0.5, scale=2.0),
    __import__('scipy.stats', fromlist=['t']).t(
        4.0, loc=-0.5, scale=1.5),
])
def test_tabulated_exotic_ppf(dist):
    # Unrecognized families run on device via tabulated monotone
    # interpolation of their isf — NO host callback in the program, so
    # the fused path works on backends without callback support
    # (reference semantics: nautilus/prior.py:117).
    import jax
    u = np.linspace(0.001, 0.999, 997)
    transform = make_prior_transform([dist])
    got = np.asarray(
        jax.jit(transform)(jnp.asarray(u[:, None], jnp.float32)))[:, 0]
    want = dist.isf(1.0 - u)
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / scale) < 1e-5


def test_host_callback_fallback(monkeypatch):
    # With NAUTILUS_TPU_ISF_CALLBACK=1 an unrecognized family routes
    # through the io_callback path and matches scipy exactly (it IS
    # scipy, called from inside jit).
    from scipy.stats import triang
    monkeypatch.setenv('NAUTILUS_TPU_ISF_CALLBACK', '1')
    dist = triang(0.3, loc=-1.0, scale=2.0)
    u = np.linspace(0.01, 0.99, 21)
    transform = make_prior_transform([dist])
    got = np.asarray(transform(jnp.asarray(u[:, None], jnp.float32)))[:, 0]
    want = dist.isf(1.0 - u)
    assert np.allclose(got, want, atol=1e-5)


def test_exotic_prior_device_run():
    # A triang-prior model runs end-to-end on the fully fused device path
    # (the flagship vectorized='jax' mode) with no callback anywhere.
    from scipy.stats import triang

    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.2) / 0.3) ** 2, axis=-1)

    prior = Prior()
    prior.add_parameter('a', dist=triang(0.5, loc=-1.0, scale=2.0))
    prior.add_parameter('b', dist=triang(0.5, loc=-1.0, scale=2.0))
    sampler = Sampler(prior, likelihood, n_live=200, seed=11,
                      vectorized='jax', pass_dict=False)
    assert sampler.run(f_live=0.2, n_eff=400)
    assert np.isfinite(sampler.log_z)


def test_mixed_prior_transform():
    dists = [norm(0.0, 1.0), uniform(loc=2.0, scale=3.0), gamma(2.0)]
    u = np.random.default_rng(0).uniform(0.01, 0.99, size=(17, 3))
    transform = make_prior_transform(dists)
    got = np.asarray(transform(jnp.asarray(u, jnp.float32)))
    for i, dist in enumerate(dists):
        want = dist.isf(1.0 - u[:, i])
        assert np.allclose(got[:, i], want, atol=2e-3, rtol=2e-3)


def test_gaussian_prior_device_run():
    # A Gaussian-prior model runs end-to-end on the device path and agrees
    # with the host path within Monte-Carlo error.
    def likelihood(x):
        return -0.5 * jnp.sum((x / 0.5) ** 2, axis=-1)

    def likelihood_host(x):
        return -0.5 * np.sum((x / 0.5) ** 2, axis=-1)

    results = {}
    for mode in ['jax', True]:
        prior = Prior()
        prior.add_parameter('a', dist=norm(loc=0.0, scale=1.0))
        prior.add_parameter('b', dist=norm(loc=0.0, scale=1.0))
        like = likelihood if mode == 'jax' else likelihood_host
        sampler = Sampler(prior, like, n_live=300, seed=7, vectorized=mode,
                          pass_dict=False)
        sampler.run(f_live=0.2, n_eff=500)
        results[mode] = sampler.log_z

    # Analytic: product of two N(0,1) priors with N(0,0.5) likelihood
    # factors -> logZ = 2 * log( sqrt(2*pi*0.2^2... ) ) computed via
    # precision addition: Z_dim = sqrt(s2/(s2+p2)) with s=0.5, p=1.
    truth = 2 * 0.5 * np.log(0.5 ** 2 / (0.5 ** 2 + 1.0 ** 2))
    assert np.abs(results['jax'] - truth) < 0.2
    assert np.abs(results['jax'] - results[True]) < 0.2
