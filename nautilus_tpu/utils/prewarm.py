"""Background executable prewarming.

The sampler's kernels take bucket-padded shapes that grow with the run
(point block, neural-build compact, arena capacity, bound-stack pad). XLA
compiles one executable per shape, so every bucket transition stalls the
run while a family of executables is compiled or — with a warm persistent
cache — deserialized from disk (~0.3-10 s each, ~50 s total on a 50-D
run; measured in ROADMAP.md). All of that work is host CPU + disk and
releases the GIL, so it can run on a daemon thread *one bucket ahead* of
the foreground: call sites invoke :func:`submit_like` with the current
call's real arguments plus a dim-substitution map, and the worker lowers
and compiles the successor shape into the same jit executable cache the
foreground will hit.

Best-effort by design: any failure (signature drift, OOM-sized dummies)
only means the foreground pays the load lazily, exactly as before.
"""

import atexit
import queue
import threading

import jax
import numpy as np

_queue = queue.Queue()
_seen = set()
_lock = threading.Lock()
_worker = None
_stop = threading.Event()

# Test/diagnostic counters.
stats = {'submitted': 0, 'compiled': 0, 'failed': 0}


def _run():
    while not _stop.is_set():
        try:
            job = _queue.get(timeout=0.2)
        except queue.Empty:
            continue
        if _stop.is_set():
            break
        try:
            job()
            stats['compiled'] += 1
        except Exception:
            stats['failed'] += 1


@atexit.register
def _shutdown():
    # Joining here (instead of letting the daemon thread be killed
    # mid-compile at interpreter teardown) avoids an XLA abort on exit;
    # pending queue entries are dropped, the in-flight compile finishes.
    _stop.set()
    w = _worker
    if w is not None and w.is_alive():
        w.join(timeout=60)


def _ensure_worker():
    global _worker
    with _lock:
        if _worker is None or not _worker.is_alive():
            _worker = threading.Thread(
                target=_run, name='nautilus-prewarm', daemon=True)
            _worker.start()


def _sub_shape(shape, subs):
    return tuple(subs.get(dim, dim) for dim in shape)


def _to_sds(x, subs):
    """Array-likes become ShapeDtypeStructs with substituted dims. Python
    ints that name a bucket size themselves (static size arguments) are
    substituted too; everything else passes through unchanged."""
    if hasattr(x, 'shape') and hasattr(x, 'dtype'):
        return jax.ShapeDtypeStruct(_sub_shape(np.shape(x), subs), x.dtype)
    if type(x) is int and x in subs:
        return subs[x]
    return x


# Block-size hints published by the sampler's control loop (single
# threaded) right before bound construction: {current_bucket: next_bucket}
# when the live-point count is close enough to the bucket edge that the
# next size is imminent, else {}. Block-shaped kernel call sites combine
# these with their local substitutions so successor executables compile
# only when they are about to be needed.
_hints = {}


def set_hints(hints):
    """Publish imminent block-bucket transitions (sampler control loop)."""
    global _hints
    _hints = dict(hints)


def current_hints():
    """The published transition map (empty when nothing is imminent)."""
    return dict(_hints)


def submit_like(fn, subs, *args, force=False, **kwargs):
    """Prewarm ``fn`` at the shape obtained from ``args``/``kwargs`` by
    replacing every occurrence of dimension ``old`` with ``subs[old]``.

    ``fn`` must be a ``jax.jit``-wrapped callable (anything with
    ``.lower``). Dedupes on the substituted aval signature, so call sites
    can invoke this unconditionally on every call. ``force`` submits even
    with no substitutions — for calls whose *static* arguments (not
    shapes) name the successor, e.g. the arena grow kernel.
    """
    if (not subs and not force) or not hasattr(fn, 'lower'):
        # An empty substitution map means "no imminent transition": the
        # as-is shape is already compiled, and re-lowering it in the
        # background would only burn host CPU against the foreground.
        return
    try:
        sds_args = jax.tree.map(lambda x: _to_sds(x, subs), tuple(args))
        sds_kwargs = jax.tree.map(lambda x: _to_sds(x, subs), kwargs)
        key = (id(fn), str(jax.tree.map(
            lambda x: (x.shape, str(x.dtype))
            if isinstance(x, jax.ShapeDtypeStruct) else x,
            (sds_args, sds_kwargs))))
    except Exception:
        return
    with _lock:
        if key in _seen:
            return
        _seen.add(key)
    stats['submitted'] += 1
    _ensure_worker()
    _queue.put(lambda: fn.lower(*sds_args, **sds_kwargs).compile())


def submit_job(job):
    """Queue an arbitrary background task on the prewarm worker (e.g. the
    warmstore's export+serialize writes)."""
    stats['submitted'] += 1
    _ensure_worker()
    _queue.put(job)


def _to_sds_identity(x):
    """Array-likes to ShapeDtypeStructs with unchanged dims (export
    tracing needs only avals); everything else passes through."""
    if hasattr(x, 'shape') and hasattr(x, 'dtype'):
        return jax.ShapeDtypeStruct(tuple(np.shape(x)), x.dtype)
    return x


def next_bucket(size):
    """The successor bucket of a power-of-two padding schedule."""
    return int(size) * 2


def pending():
    """Number of jobs not yet processed (diagnostics)."""
    return _queue.qsize()
