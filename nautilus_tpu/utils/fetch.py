"""Device-to-host fetch helpers tuned for remote-tunnel TPU links.

Measured on this environment's tunneled TPU (see ROADMAP.md): the FIRST
device-to-host copy of a process stalls for ~190 s (a fixed
connection-establishment timeout in the transfer layer); after that every
copy costs ~27 ms regardless of size (4 kB to 4 MB) — pure round-trip
latency. Two consequences shape this module:

- :func:`warmup` pays the one-time stall as early as possible, on a
  daemon thread, so it overlaps XLA compilation and device compute
  instead of landing in the middle of the run.
- :func:`fetch_many` merges several result arrays into ONE device-side
  byte buffer per host read — n fetches at 27 ms each become one.

An optional size floor (``NAUTILUS_TPU_FETCH_FLOOR`` bytes) pads every
copy up to a bulk size; measurements show no size effect after warmup, so
it defaults to off.
"""

import os
import threading
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

# Optional floor in bytes for a single device->host copy (0 = disabled).
FETCH_FLOOR_BYTES = int(os.environ.get('NAUTILUS_TPU_FETCH_FLOOR', 0))

_warmup_thread = None
_warmup_lock = threading.Lock()
_warmup_times = {}


def warmup_seconds():
    """Wall time the link-establishment fetch took (None before it
    finishes). The first device->host copy of a process stalls in the
    tunnel's connection path for tens of seconds to minutes — an
    environmental cost no framework code can avoid; exposing it lets
    benchmarks decompose cold-start time honestly."""
    if 'start' in _warmup_times and 'end' in _warmup_times:
        return _warmup_times['end'] - _warmup_times['start']
    return None


@jax.jit
def _identity_jit(*leaves):
    return leaves


def put_tree(tree):
    """Upload a pytree to device in ONE dispatch.

    ``jax.device_put`` on a pytree transfers leaf-by-leaf with a ~30 ms
    per-leaf round trip on the tunneled backend (measured: 647 ms for 20
    leaves); passing the leaves as arguments of a single jitted identity
    batches the whole upload into one ~30 ms call.
    """
    leaves, treedef = jax.tree.flatten(tree)
    return jax.tree.unflatten(treedef, _identity_jit(*leaves))


def warmup(wait=False):
    """Establish the device->host transfer channel.

    On the tunneled TPU backend the first copy of a process blocks for
    ~190 s while the transfer layer connects; every later copy is ~27 ms.
    Calling this at framework initialization moves that one-time cost off
    the sampling path, overlapped with compilation. Idempotent;
    ``wait=True`` blocks until the channel is live.
    """
    global _warmup_thread
    if _platform() not in _PAD_PLATFORMS:
        return
    with _warmup_lock:
        if _warmup_thread is None:
            def _warm():
                import time
                _warmup_times['start'] = time.time()
                np.asarray(jnp.zeros(8, jnp.float32) + 0.0)
                _warmup_times['end'] = time.time()

            _warmup_thread = threading.Thread(
                target=_warm, name='nautilus-tpu-link-warmup', daemon=True)
            _warmup_thread.start()
    if wait:
        _warmup_thread.join()

_PAD_PLATFORMS = ('tpu',)


def _platform():
    return jax.default_backend()


def merge_active():
    """Whether fetch merging/padding applies (remote-tunnel backends)."""
    return _platform() in _PAD_PLATFORMS


def padding_active():
    """Whether the optional size-floor padding applies."""
    return merge_active() and FETCH_FLOOR_BYTES > 0


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


@lru_cache(maxsize=None)
def _replicate_jit(sharding):
    """Jitted identity with a fully-replicated out_sharding: XLA inserts
    the all-gather that makes every shard addressable on every process."""
    return jax.jit(lambda v: v, out_shardings=sharding)


def to_host(x):
    """``np.asarray`` that also works for multi-process global arrays.

    Under ``jax.distributed`` (multi-host pods; see parallel/mesh.py
    ``init_distributed``), kernel outputs whose sharding spans devices of
    other processes cannot be read directly — reshard to replicated first
    via a cached jitted identity. Every process runs the sampler's control
    loop with identical decisions (same seed, same fetched replicas), so
    the collective is dispatched symmetrically, mirroring how the reference
    keeps its MPI workers in lockstep (reference:
    docs/guides/parallelization.rst "MPI Parallelization").
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.sharding import NamedSharding, PartitionSpec
        mesh = getattr(x.sharding, 'mesh', None)
        if mesh is not None:
            x = _replicate_jit(NamedSharding(mesh, PartitionSpec()))(x)
        else:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def fetch(x, dtype=None):
    """Fetch one device array to host, padding small payloads to the bulk
    floor. Drop-in for ``np.asarray(x)``."""
    x = jnp.asarray(x)
    nbytes = x.size * x.dtype.itemsize
    if not padding_active() or nbytes >= FETCH_FLOOR_BYTES:
        out = to_host(x)
    else:
        n_pad = max(FETCH_FLOOR_BYTES // max(x.dtype.itemsize, 1), 1)
        out = to_host(_pad_flat_jit(x, n_pad))[:x.size].reshape(x.shape)
    return out if dtype is None else out.astype(dtype)


def fetch_many(*arrays):
    """Fetch several device arrays in ONE padded transfer.

    Returns numpy arrays in input order. Shapes/dtypes must be concrete
    (they are read from the device arrays without synchronizing).
    """
    arrays = [jnp.asarray(a) for a in arrays]
    if not merge_active() or len(arrays) == 1 and not padding_active():
        return tuple(to_host(a) for a in arrays)

    total = sum(a.size * (1 if a.dtype == jnp.bool_ else a.dtype.itemsize)
                for a in arrays)
    n_pad = max(total, FETCH_FLOOR_BYTES, 1)
    buf = to_host(_pack_many_jit(tuple(arrays), n_pad))

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
