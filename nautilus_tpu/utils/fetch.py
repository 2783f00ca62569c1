"""Device-to-host fetch helpers tuned for remote-tunnel TPU links.

Measured on this environment's tunneled TPU (see ROADMAP.md): dispatches
and syncs round-trip in ~0.1 ms and bulk transfers run at 20-140 MB/s, but
*small* device-to-host copies (a few kB — counters, packed geometry
vectors, per-batch log-likelihood rows) intermittently fall into a
pathological slow path costing tens of seconds per copy. Every host-bound
payload below a floor is therefore padded on device into a single
floor-sized buffer before the copy: one extra O(0.1 ms) device op buys a
transfer that always rides the bulk path.

``fetch``/``fetch_many`` are no-ops (plain ``np.asarray``) on local
backends (CPU tests), where padding would only waste bandwidth.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# Floor in bytes for a single device->host copy. 512 kB transfers measured
# ~20-30 ms on the tunnel; overridable for other link profiles.
FETCH_FLOOR_BYTES = int(os.environ.get(
    'NAUTILUS_TPU_FETCH_FLOOR', 512 * 1024))

_PAD_PLATFORMS = ('tpu',)


def _platform():
    return jax.default_backend()


def padding_active():
    """Whether fetch padding applies on the current backend."""
    return _platform() in _PAD_PLATFORMS and FETCH_FLOOR_BYTES > 0


@partial(jax.jit, static_argnums=(1,))
def _pad_flat_jit(x, n_pad):
    flat = jnp.ravel(x)
    return jnp.zeros((n_pad,), flat.dtype).at[:flat.shape[0]].set(flat)


@partial(jax.jit, static_argnums=(1,))
def _pack_many_jit(arrays, n_pad):
    """Concatenate arbitrary-dtype arrays bitcast to int8 into one padded
    byte buffer (single transfer for a group of small results)."""
    parts = []
    for a in arrays:
        flat = jnp.ravel(a)
        if flat.dtype == jnp.bool_:
            flat = flat.astype(jnp.int8)
        parts.append(jax.lax.bitcast_convert_type(
            flat, jnp.int8).reshape(-1))
    packed = jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.int8)
    return jnp.zeros((n_pad,), jnp.int8).at[:packed.shape[0]].set(packed)


def fetch(x, dtype=None):
    """Fetch one device array to host, padding small payloads to the bulk
    floor. Drop-in for ``np.asarray(x)``."""
    x = jnp.asarray(x)
    nbytes = x.size * x.dtype.itemsize
    if not padding_active() or nbytes >= FETCH_FLOOR_BYTES:
        out = np.asarray(x)
    else:
        n_pad = max(FETCH_FLOOR_BYTES // max(x.dtype.itemsize, 1), 1)
        out = np.asarray(_pad_flat_jit(x, n_pad))[:x.size].reshape(x.shape)
    return out if dtype is None else out.astype(dtype)


def fetch_many(*arrays):
    """Fetch several device arrays in ONE padded transfer.

    Returns numpy arrays in input order. Shapes/dtypes must be concrete
    (they are read from the device arrays without synchronizing).
    """
    arrays = [jnp.asarray(a) for a in arrays]
    if not padding_active():
        return tuple(np.asarray(a) for a in arrays)

    total = sum(a.size * (1 if a.dtype == jnp.bool_ else a.dtype.itemsize)
                for a in arrays)
    n_pad = max(total, FETCH_FLOOR_BYTES)
    buf = np.asarray(_pack_many_jit(tuple(arrays), n_pad))

    out = []
    offset = 0
    for a in arrays:
        if a.dtype == jnp.bool_:
            size = a.size
            vals = buf[offset:offset + size].astype(bool).reshape(a.shape)
        else:
            size = a.size * a.dtype.itemsize
            vals = np.frombuffer(
                buf[offset:offset + size].tobytes(),
                dtype=np.dtype(a.dtype.name)).reshape(a.shape)
        out.append(vals)
        offset += size
    return tuple(out)
