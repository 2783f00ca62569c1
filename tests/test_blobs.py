"""Blob handling tests (reference: tests/test_blobs.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nautilus_tpu import Prior, Sampler


def make_prior():
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    return prior


def run_small(likelihood, **kwargs):
    sampler = Sampler(make_prior(), likelihood, n_live=150, n_networks=0,
                      seed=0, **kwargs)
    sampler.run(f_live=0.2, n_eff=300)
    return sampler


def test_blobs_single_jax():
    # One extra return: dtype inferred, plain array
    # (reference: tests/test_blobs.py:14-37).
    def likelihood(x):
        log_l = -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)
        return log_l, x[..., 0]

    sampler = run_small(likelihood, vectorized='jax')
    points, log_w, log_l, blobs = sampler.posterior(return_blobs=True)
    assert blobs.shape == (len(points),)
    assert blobs.dtype == np.float32


def test_blobs_multi_jax():
    # Two extra returns: structured array with inferred field names.
    def likelihood(x):
        log_l = -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)
        return log_l, x[..., 0], jnp.sum(x, axis=-1)

    sampler = run_small(likelihood, vectorized='jax')
    points, log_w, log_l, blobs = sampler.posterior(return_blobs=True)
    assert blobs.dtype.names == ('blob_0', 'blob_1')
    assert np.allclose(blobs['blob_0'] + 0.0, blobs['blob_0'])


def test_blobs_explicit_dtype():
    # Explicit structured dtype with named fields
    # (reference: tests/test_blobs.py:40-70).
    dtype = [('pid', np.float64), ('s', np.float64)]

    def likelihood(x):
        log_l = -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)
        return log_l, x[..., 0], jnp.sum(x, axis=-1)

    sampler = run_small(likelihood, vectorized='jax', blobs_dtype=dtype)
    points, log_w, log_l, blobs = sampler.posterior(return_blobs=True)
    assert blobs.dtype.names == ('pid', 's')


def test_blobs_scalar_host():
    # Non-vectorized host likelihood returning a scalar blob (the CosmoSIS
    # pattern; reference: tests/test_blobs.py:73-99).
    def likelihood(x):
        return (-0.5 * float(np.sum(((x - 0.5) / 0.1) ** 2)),
                float(np.sum(x)))

    sampler = run_small(likelihood, pass_dict=False)
    points, log_w, log_l, blobs = sampler.posterior(return_blobs=True)
    assert blobs.shape == (len(points),)


def test_blobs_equal_weight():
    # Blobs follow equal-weight resampling
    # (reference: tests/test_blobs.py:102-133).
    def likelihood(x):
        log_l = -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)
        return log_l, x[..., 0]

    sampler = run_small(likelihood, vectorized='jax')
    points, log_w, log_l, blobs = sampler.posterior(
        return_blobs=True, equal_weight=True)
    assert len(blobs) == len(points)
    # Equal-weight: all normalized weights identical.
    assert np.all(log_w == log_w[0])


def test_no_blobs_raises():
    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)

    sampler = run_small(likelihood, vectorized='jax')
    with pytest.raises(ValueError):
        sampler.posterior(return_blobs=True)
