"""Device-resident point arena.

Every point the sampler evaluates is stored once, on device, in one growing
``(capacity, n_dim)`` buffer with a parallel log-likelihood column and an
``alive`` flag. The sampler's host bookkeeping (shell membership, transfer
sets, discard offsets) then operates on *integer row indices* instead of
coordinate arrays, so batch collection fetches only log-likelihoods and
counters — never point payloads. Bound construction consumes the arena
directly through :meth:`PointArena.block_sorted` (a compact, sorted device
block), and coordinates cross the device link only for lazily-materialized
host needs: ``posterior()``, checkpoint writes, host-side (non-jittable)
likelihoods, and diagnostics.

This replaces the reference's host-resident ``self.points`` lists
(reference: nautilus/sampler.py:316-327); on hardware behind a
low-bandwidth dispatch tunnel the per-batch coordinate fetches those lists
require dominate wall time.

Precision envelope: the device columns are float32 (TPU-native), while all
host-side shell statistics recompute in float64 from the fetched values.
Log-likelihoods are therefore quantized to f32 resolution (~7 decimal
digits) on their way into the bookkeeping: |log L| magnitudes up to ~1e6
keep absolute resolution better than 0.1 nat, far inside the sampler's
statistical error at default settings. Likelihoods needing more range or
relative precision than f32 (|log L| >~ 1e30, or evidence differences
below ~|log L| * 1e-7 nat) should use the host evaluation path
(``vectorized=True/False``), which is float64 end-to-end like the
reference.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.bucket import bucket_size
from ..utils.fetch import fetch
from ..utils import prewarm

# Initial capacity. High floor: a capacity change re-shapes the arena
# buffers and forces a recompile of the whole-phase executables, so start
# big enough that typical runs (n_like ~ 2e4) never grow. 32k rows cost
# ~0.8 MB of HBM at d=3 — noise next to one compile on a tunneled backend.
ARENA_FLOOR = 32768


@jax.jit
def _append_jit(pts, log_l, alive, shell, buf, n0, k, shell_val):
    """Scatter the first ``k`` rows of ``buf`` (cols [pts | log_l | ...])
    into the arena at offset ``n0``; one executable serves every (n0, k)."""
    d = pts.shape[1]
    rows = jnp.arange(buf.shape[0])
    idx = jnp.where(rows < k, n0 + rows, pts.shape[0])
    pts = pts.at[idx].set(buf[:, :d].astype(pts.dtype), mode='drop')
    log_l = log_l.at[idx].set(buf[:, d].astype(log_l.dtype), mode='drop')
    alive = alive.at[idx].set(True, mode='drop')
    shell = shell.at[idx].set(shell_val, mode='drop')
    return pts, log_l, alive, shell


@jax.jit
def _set_alive_jit(alive, ids, value):
    return alive.at[ids].set(value, mode='drop')


@jax.jit
def _set_shell_jit(shell, ids, value):
    return shell.at[ids].set(value, mode='drop')


@partial(jax.jit, static_argnums=(3,))
def _compact_top_jit(pts, log_l, alive, size):
    """The ``size`` highest-log_l alive rows, ascending (the live set —
    input to the bound-construction fit kernels, which only ever fit the
    above-threshold subset; fitting over the full history block wastes
    ~8x the FLOPs late in a long run)."""
    key = jnp.where(alive, log_l, -jnp.inf)
    order = jnp.argsort(key)[-size:]
    return pts[order], log_l[order], alive[order]


@partial(jax.jit, static_argnums=(3,))
def _compact_sorted_jit(pts, log_l, alive, size):
    """Alive rows, ascending in log_l (ties by arena order), first ``size``
    rows. Dead/unused rows sort to the end (key = +inf) and are marked
    invalid in the returned mask."""
    key = jnp.where(alive, log_l, jnp.inf)
    order = jnp.argsort(key)[:size]
    return pts[order], log_l[order], alive[order]


@partial(jax.jit, static_argnums=(2,))
def _fetch_rows_jit(pts, start, size):
    return jax.lax.dynamic_slice(pts, (start, 0), (size, pts.shape[1]))


@partial(jax.jit, static_argnums=(4,))
def _grow_jit(pts, log_l, alive, shell, new_cap):
    extra = new_cap - pts.shape[0]
    return (jnp.concatenate([pts, jnp.zeros((extra, pts.shape[1]),
                                            pts.dtype)]),
            jnp.concatenate([log_l, jnp.full((extra,), -jnp.inf,
                                             log_l.dtype)]),
            jnp.concatenate([alive, jnp.zeros((extra,), bool)]),
            jnp.concatenate([shell, jnp.zeros((extra,), shell.dtype)]))


def _pad_ids(ids, cap):
    """Pad an id vector to a bucket; padded entries scatter out of range."""
    ids = np.asarray(ids, np.int32)
    out = np.full(bucket_size(len(ids), floor=64), cap, np.int32)
    out[:len(ids)] = ids
    return jnp.asarray(out)


class PointArena:
    """Append-only store of evaluated points; device- or host-backed.

    Device mode (``vectorized='jax'`` sampling): rows live in device
    buffers, written by jitted appends straight from the collection
    kernels' output buffers; the host sees coordinates only through the
    lazily-filled prefix cache of :meth:`rows`. Host mode (host-side
    likelihoods): rows live in one numpy array and the same index-based
    bookkeeping applies with zero-cost materialization.
    """

    def __init__(self, n_dim, device=False, capacity=ARENA_FLOOR):
        self.n_dim = n_dim
        self.device = bool(device)
        self.n = 0
        self._cache = np.zeros((0, n_dim))
        self._sorted_sizes = set()
        if self.device:
            self.capacity = bucket_size(capacity, floor=ARENA_FLOOR)
            self.d_pts = jnp.zeros((self.capacity, n_dim), jnp.float32)
            self.d_log_l = jnp.full((self.capacity,), -jnp.inf, jnp.float32)
            self.d_alive = jnp.zeros((self.capacity,), bool)
            self.d_shell = jnp.zeros((self.capacity,), jnp.int32)
        else:
            self.capacity = 0

    # -------------------------------------------------------------- #
    # appends

    def _ensure_capacity(self, need):
        if need <= self.capacity:
            return
        new_cap = bucket_size(need, floor=ARENA_FLOOR)
        self.d_pts, self.d_log_l, self.d_alive, self.d_shell = _grow_jit(
            self.d_pts, self.d_log_l, self.d_alive, self.d_shell, new_cap)
        self.capacity = new_cap
        self._prewarm_growth()

    def _prewarm_growth(self):
        """Background-compile the capacity-keyed executables of the NEXT
        arena growth so the transition never stalls the run (measured at
        10+ s per deserialized ``_grow_jit`` at 50-D; see ROADMAP.md)."""
        cap, nxt = self.capacity, self.capacity * 2
        prewarm.submit_like(_grow_jit, {}, self.d_pts, self.d_log_l,
                            self.d_alive, self.d_shell, nxt, force=True)
        for size in self._sorted_sizes:
            prewarm.submit_like(_compact_sorted_jit, {cap: nxt},
                                self.d_pts, self.d_log_l, self.d_alive,
                                size)

    def append_buf(self, buf, k, shell=0):
        """Append the first ``k`` rows of a device buffer whose columns are
        ``[point | log_l | ...]``. Device-to-device; nothing is fetched.
        Returns the new rows' arena ids."""
        assert self.device
        self._ensure_capacity(self.n + int(buf.shape[0]))
        if self.n > self.capacity // 2:
            self._prewarm_growth()
            prewarm.submit_like(
                _append_jit, {self.capacity: self.capacity * 2},
                self.d_pts, self.d_log_l, self.d_alive, self.d_shell, buf,
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32))
        self.d_pts, self.d_log_l, self.d_alive, self.d_shell = _append_jit(
            self.d_pts, self.d_log_l, self.d_alive, self.d_shell, buf,
            jnp.asarray(self.n, jnp.int32), jnp.asarray(k, jnp.int32),
            jnp.asarray(shell, jnp.int32))
        ids = np.arange(self.n, self.n + int(k))
        self.n += int(k)
        return ids

    def adopt(self, pts, log_l, alive, shell, n_new):
        """Take ownership of updated device buffers returned by a fused
        phase kernel that appended ``n_new`` rows in place."""
        assert self.device
        self.d_pts, self.d_log_l, self.d_alive, self.d_shell = \
            pts, log_l, alive, shell
        ids = np.arange(self.n, self.n + int(n_new))
        self.n += int(n_new)
        if self.n > self.capacity // 2:
            self._prewarm_growth()
        return ids

    def append_host(self, points):
        """Append host coordinate rows (host mode only)."""
        assert not self.device
        points = np.atleast_2d(np.asarray(points, np.float64))
        ids = np.arange(self.n, self.n + len(points))
        self._cache = np.concatenate([self._cache, points])
        self.n += len(points)
        return ids

    # -------------------------------------------------------------- #
    # alive flags (device mode; host mode tracks membership via the
    # sampler's index lists alone)

    def kill(self, ids):
        if self.device and len(ids) > 0:
            self.d_alive = _set_alive_jit(
                self.d_alive, _pad_ids(ids, self.capacity), False)

    def revive(self, ids, shell=None):
        if self.device and len(ids) > 0:
            padded = _pad_ids(ids, self.capacity)
            self.d_alive = _set_alive_jit(self.d_alive, padded, True)
            if shell is not None:
                self.d_shell = _set_shell_jit(
                    self.d_shell, padded, jnp.asarray(shell, jnp.int32))

    def set_alive(self, alive):
        assert self.device
        self.d_alive = alive

    def set_shell(self, ids, shell):
        """Assign rows to a shell slot (device-to-device, nothing fetched)."""
        if self.device and len(ids) > 0:
            self.d_shell = _set_shell_jit(
                self.d_shell, _pad_ids(ids, self.capacity),
                jnp.asarray(shell, jnp.int32))

    # -------------------------------------------------------------- #
    # reads

    def rows(self, ids):
        """Host coordinates for arena ids (lazy prefix materialization)."""
        self._materialize(self.n)
        return self._cache[np.asarray(ids, int)]

    def _materialize(self, upto):
        if not self.device or upto <= len(self._cache):
            return
        cached = len(self._cache)
        size = bucket_size(upto - cached, floor=64)
        size = min(size, self.capacity)
        start = min(cached, self.capacity - size)
        block = fetch(_fetch_rows_jit(
            self.d_pts, jnp.asarray(start, jnp.int32), size), np.float64)
        self._cache = np.concatenate(
            [self._cache, block[cached - start:upto - start]])

    def block_sorted(self, size):
        """Compact (pts, log_l, valid) device block of the alive rows,
        sorted ascending in log_l — the input to bound construction."""
        assert self.device
        size = min(size, self.capacity)
        self._sorted_sizes.add(size)
        if size * 2 <= self.capacity and size in prewarm.current_hints():
            prewarm.submit_like(_compact_sorted_jit, {size: size * 2},
                                self.d_pts, self.d_log_l, self.d_alive,
                                size)
        return _compact_sorted_jit(
            self.d_pts, self.d_log_l, self.d_alive, size)

    def block_top(self, size):
        """Compact block of the ``size`` highest-log_l alive rows,
        ascending — the live set for the bound fit kernels."""
        assert self.device
        size = min(size, self.capacity)
        if size in prewarm.current_hints():
            prewarm.submit_like(_compact_top_jit, {size: size * 2},
                                self.d_pts, self.d_log_l, self.d_alive,
                                size)
        return _compact_top_jit(
            self.d_pts, self.d_log_l, self.d_alive, size)

    # -------------------------------------------------------------- #
    # checkpoint rebuild

    def load(self, pts, log_l, alive, shell=None):
        """Rebuild the arena from host arrays (checkpoint resume)."""
        pts = np.atleast_2d(np.asarray(pts, np.float64))
        n = len(pts)
        self.n = n
        self._cache = pts
        if self.device:
            self.capacity = bucket_size(max(n, 1), floor=ARENA_FLOOR)
            buf_pts = np.zeros((self.capacity, self.n_dim), np.float32)
            buf_pts[:n] = pts
            buf_log_l = np.full(self.capacity, -np.inf, np.float32)
            buf_log_l[:n] = log_l
            buf_alive = np.zeros(self.capacity, bool)
            buf_alive[:n] = alive
            buf_shell = np.zeros(self.capacity, np.int32)
            if shell is not None:
                buf_shell[:n] = shell
            self.d_pts = jnp.asarray(buf_pts)
            self.d_log_l = jnp.asarray(buf_log_l)
            self.d_alive = jnp.asarray(buf_alive)
            self.d_shell = jnp.asarray(buf_shell)
