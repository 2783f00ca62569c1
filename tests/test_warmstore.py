"""Exported-program store: bitwise equivalence and key hygiene."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nautilus_tpu.utils import warmstore


@pytest.fixture()
def store_on(tmp_path, monkeypatch):
    monkeypatch.setenv('JAX_COMPILATION_CACHE_DIR', str(tmp_path))
    monkeypatch.setattr(warmstore, 'DISABLED', False)
    yield tmp_path


def _make(mult):
    @warmstore.warm_jit(static_argnames=('n',))
    def f(x, n):
        def body(c, _):
            return jnp.sin(c * mult) + c, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return f


def test_roundtrip_bitwise(store_on):
    """A deserialized exported program returns bitwise-identical results."""
    f = _make(1.5)
    x = jnp.asarray(np.linspace(0., 1., 64, dtype=np.float32))
    ref = np.asarray(f(x, n=5))
    assert warmstore.stats['call_errors'] == 0

    key = f._key((x,), {'n': 5})
    # Export synchronously (the background worker path writes the same
    # file; here we want determinism inside the test).
    import jax.export as jexp
    warmstore._register_pytrees()
    exported = jexp.export(f._jit)(x, n=5)
    with open(f._path(key), 'wb') as fh:
        fh.write(exported.serialize())

    g = _make(1.5)  # fresh WarmJit, same code -> same key
    assert g._key((x,), {'n': 5}) == key
    out = np.asarray(g(x, n=5))
    assert warmstore.stats['loaded'] >= 1
    np.testing.assert_array_equal(out, ref)


def test_closure_changes_key(store_on):
    """Different captured constants must produce different store keys."""
    x = jnp.zeros(8, jnp.float32)
    k1 = _make(1.5)._key((x,), {'n': 3})
    k2 = _make(2.5)._key((x,), {'n': 3})
    assert k1 != k2


def test_shape_changes_key(store_on):
    f = _make(1.5)
    k1 = f._key((jnp.zeros(8, jnp.float32),), {'n': 3})
    k2 = f._key((jnp.zeros(16, jnp.float32),), {'n': 3})
    k3 = f._key((jnp.zeros(8, jnp.float32),), {'n': 4})
    assert len({k1, k2, k3}) == 3


def test_opaque_closure_falls_back(store_on):
    """Unfingerprintable captures disable the store, not the function."""
    class Weird:
        pass

    w = Weird()

    @warmstore.warm_jit
    def f(x):
        _ = w  # captured opaque object
        return x + 1

    out = np.asarray(f(jnp.ones(4, jnp.float32)))
    np.testing.assert_array_equal(out, np.full(4, 2, np.float32))
    assert f._broken


def test_disabled_by_default(monkeypatch):
    """Without the opt-in env var the wrapper is plain jit behavior."""
    assert os.environ.get('NAUTILUS_TPU_WARMSTORE') != '1'
    f = _make(3.0)
    x = jnp.ones(4, jnp.float32)
    np.asarray(f(x, n=2))  # must not touch the store
    assert f._broken or warmstore.DISABLED
