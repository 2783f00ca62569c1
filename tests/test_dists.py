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


def test_host_callback_fallback():
    # An unrecognized family must route through the io_callback path and
    # still match scipy exactly (it IS scipy, called from inside jit).
    from scipy.stats import triang
    dist = triang(0.3, loc=-1.0, scale=2.0)
    u = np.linspace(0.01, 0.99, 21)
    transform = make_prior_transform([dist])
    got = np.asarray(transform(jnp.asarray(u[:, None], jnp.float32)))[:, 0]
    want = dist.isf(1.0 - u)
    assert np.allclose(got, want, atol=1e-5)


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
