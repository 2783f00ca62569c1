"""Padded device-to-host fetch helpers: round-trip fidelity with padding
forced on (CPU backends normally bypass it)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nautilus_tpu.utils import fetch as F


@pytest.fixture
def padded(monkeypatch):
    monkeypatch.setattr(F, '_PAD_PLATFORMS', ('cpu', 'tpu'))
    monkeypatch.setattr(F, 'FETCH_FLOOR_BYTES', 512 * 1024)
    assert F.padding_active()


def test_fetch_small_roundtrip(padded):
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = F.fetch(jnp.asarray(x))
    assert out.dtype == np.float32
    assert np.array_equal(out, x)


def test_fetch_scalar_and_dtype(padded):
    out = F.fetch(jnp.asarray(7, jnp.int32))
    assert int(out) == 7
    out = F.fetch(jnp.asarray([1.5, 2.5], jnp.float32), np.float64)
    assert out.dtype == np.float64


def test_fetch_large_passthrough(padded):
    n = F.FETCH_FLOOR_BYTES // 4 + 5
    x = np.random.default_rng(0).normal(size=n).astype(np.float32)
    assert np.array_equal(F.fetch(jnp.asarray(x)), x)


def test_fetch_many_mixed_dtypes(padded):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 3)).astype(np.float32)
    b = rng.integers(0, 100, size=7).astype(np.int32)
    c = rng.random(9) > 0.5
    d = np.packbits(c)  # uint8
    outs = F.fetch_many(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                        jnp.asarray(d))
    assert np.array_equal(outs[0], a)
    assert np.array_equal(outs[1], b)
    assert outs[2].dtype == bool and np.array_equal(outs[2], c)
    assert np.array_equal(outs[3], d)


def test_fetch_many_empty_blob_tuple(padded):
    (only,) = F.fetch_many(jnp.asarray([1.0, 2.0], jnp.float32))
    assert np.allclose(only, [1.0, 2.0])
