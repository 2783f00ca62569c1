"""Disk-backed exported-executable store for expensive jitted programs.

Cold starts on a warm persistent compilation cache still pay Python
tracing plus jaxpr->MLIR lowering for every large program before the
cache key even exists (~16 s of the quickstart's cold time; ROADMAP.md).
:class:`WarmJit` removes that: the first process to run a (code,
closure, shape) configuration exports the traced program with
``jax.export`` on a background thread and writes the serialized
StableHLO next to the compilation cache; later processes deserialize it
in milliseconds and call it directly, skipping trace and lowering
entirely (the executable itself still comes from the persistent
compilation cache).

Safety model — a stale artifact must never be silently wrong:

- the store key includes a fingerprint of every ``.py`` file in the
  package and the jax version, so ANY code change invalidates the whole
  store;
- closures (e.g. the user's likelihood captured by the sampler's phase
  drivers) are hashed structurally — bytecode, constants, captured
  arrays, and nested function cells. Anything opaque (objects whose
  behavior cannot be fingerprinted) disables the store for that
  function and falls back to plain jit;
- deserialized outputs were verified bitwise against the traced path
  (tests/test_warmstore.py).

Status: OPT-IN (``NAUTILUS_TPU_WARMSTORE=1``). On the tunneled
single-chip dev setup the exported path removed the bound-chain
trace+lower stall (~2 s) but A/B runs of the full quickstart were
dominated by 5-10 s of link-weather noise, so the default stays the
plain jit path until the win can be demonstrated on quiet hardware
(measurements: ROADMAP.md "Cold start").
"""

import hashlib
import os
import threading

import numpy as np
import jax

try:
    import jax.export as jexp
except Exception:  # pragma: no cover - ancient jax
    jexp = None

DISABLED = os.environ.get('NAUTILUS_TPU_WARMSTORE') != '1'

# Diagnostics: exported-path hits, jit fallbacks, background exports.
stats = {'loaded': 0, 'fallback': 0, 'exported': 0, 'call_errors': 0}

_registered = False
_fingerprint = None
_dir_lock = threading.Lock()


def _register_pytrees():
    """Register the package's namedtuple pytrees for export serialization
    (idempotent)."""
    global _registered
    if _registered or jexp is None:
        return
    from ..ops.geometry import EllParams
    from ..ops.mlp import MLPParams
    from ..ops.neural_stack import NeuralStack
    from ..ops.shell_stack import BoundStack
    for cls in (EllParams, MLPParams, NeuralStack, BoundStack):
        try:
            jexp.register_namedtuple_serialization(
                cls, serialized_name='nautilus_tpu.' + cls.__name__)
        except ValueError:
            pass  # already registered
    _registered = True


def store_dir():
    """Directory holding serialized exports (created on demand)."""
    base = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if base:
        path = os.path.join(base, 'exported')
    else:
        path = os.path.join(os.path.expanduser('~'), '.cache',
                            'nautilus_tpu', 'exported')
    with _dir_lock:
        os.makedirs(path, exist_ok=True)
    return path


def code_fingerprint():
    """Hash of every package source file + the jax version."""
    global _fingerprint
    if _fingerprint is None:
        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for root, dirs, files in os.walk(pkg):
            dirs.sort()
            for name in sorted(files):
                if name.endswith('.py'):
                    h.update(name.encode())
                    with open(os.path.join(root, name), 'rb') as f:
                        h.update(f.read())
        h.update(jax.__version__.encode())
        _fingerprint = h.hexdigest()[:16]
    return _fingerprint


class _Opaque(Exception):
    """A closure value whose behavior cannot be fingerprinted."""


def _hash_value(v, h, depth, seen):
    """Structural hash of a closure-captured value into ``h``.

    Functions recurse into bytecode + constants + their own closures;
    arrays hash by bytes; containers element-wise. Raises :class:`_Opaque`
    for anything whose behavior the hash could not pin down.
    """
    if depth > 10:
        raise _Opaque('closure nesting too deep')
    if v is None or isinstance(v, (bool, int, float, complex, str, bytes)):
        h.update(repr(v).encode())
        return
    if isinstance(v, (np.ndarray, np.generic)):
        h.update(np.asarray(v).tobytes())
        return
    if isinstance(v, jax.Array):
        h.update(np.asarray(jax.device_get(v)).tobytes())
        return
    if isinstance(v, (tuple, list)):
        h.update(type(v).__name__.encode())
        for item in v:
            _hash_value(item, h, depth + 1, seen)
        return
    if isinstance(v, dict):
        for k in sorted(v, key=repr):
            h.update(repr(k).encode())
            _hash_value(v[k], h, depth + 1, seen)
        return
    if callable(v) and hasattr(v, '__code__'):
        if id(v) in seen:
            return
        seen.add(id(v))
        module = getattr(v, '__module__', '') or ''
        if module.split('.')[0] == 'nautilus_tpu':
            # Package code is covered by code_fingerprint(); the qualified
            # name pins which function is referenced.
            h.update((module + '.' + v.__qualname__).encode())
            return
        code = v.__code__
        h.update(code.co_code)
        _hash_value(code.co_consts, h, depth + 1, seen)
        h.update(' '.join(code.co_names).encode())
        if v.__closure__:
            for cell in v.__closure__:
                try:
                    contents = cell.cell_contents
                except ValueError:
                    raise _Opaque('empty closure cell')
                _hash_value(contents, h, depth + 1, seen)
        if v.__defaults__:
            _hash_value(v.__defaults__, h, depth + 1, seen)
        # Behavior also flows through referenced globals (helper
        # functions, module-level arrays): resolve and hash the ones the
        # bytecode names; modules and classes are identified by name.
        for name in code.co_names:
            g = v.__globals__.get(name)
            if g is None or isinstance(g, type(os)):
                h.update(name.encode())
            elif isinstance(g, type):
                h.update((name + getattr(g, '__qualname__', '')).encode())
            else:
                _hash_value(g, h, depth + 1, seen)
        return
    if callable(v) and hasattr(v, 'func'):  # functools.partial
        _hash_value(v.func, h, depth + 1, seen)
        _hash_value(tuple(v.args), h, depth + 1, seen)
        _hash_value(v.keywords, h, depth + 1, seen)
        return
    raise _Opaque('cannot fingerprint {!r}'.format(type(v)))


def _aval_token(x):
    if hasattr(x, 'shape') and hasattr(x, 'dtype'):
        return ('aval', tuple(np.shape(x)), str(x.dtype))
    return ('static', repr(x))


class WarmJit:
    """``jax.jit`` drop-in whose per-shape programs round-trip through the
    exported-program store. Forwards ``lower`` so the existing preload /
    prewarm machinery keeps working on the underlying jit."""

    def __init__(self, fun, static_argnums=(), static_argnames=()):
        self._fun = fun
        self._static_argnums = tuple(static_argnums)
        self._static_argnames = tuple(static_argnames)
        self._jit = jax.jit(fun, static_argnums=static_argnums,
                            static_argnames=static_argnames)
        self.__name__ = getattr(fun, '__name__', 'warm_jit')
        self._mem = {}
        self._lock = threading.Lock()
        self._closure_hash = None
        self._broken = DISABLED or jexp is None

    # ---------------------------------------------------------------- #

    def lower(self, *args, **kwargs):
        return self._jit.lower(*args, **kwargs)

    def _closure_token(self):
        if self._closure_hash is None:
            h = hashlib.sha256()
            fn = self._fun
            try:
                # The root is hashed explicitly (not via _hash_value's
                # package-internal shortcut): its closure cells carry the
                # user's likelihood/transform when the sampler builds
                # per-run drivers, and those must key the store.
                seen = {id(fn)}
                h.update((getattr(fn, '__module__', '') + '.' +
                          getattr(fn, '__qualname__', '')).encode())
                if getattr(fn, '__closure__', None):
                    for cell in fn.__closure__:
                        _hash_value(cell.cell_contents, h, 1, seen)
                if getattr(fn, '__defaults__', None):
                    _hash_value(fn.__defaults__, h, 1, seen)
                self._closure_hash = h.hexdigest()[:16]
            except (_Opaque, ValueError):
                self._closure_hash = ''
                self._broken = True
        return self._closure_hash

    def _key(self, args, kwargs):
        token = (self.__name__, self._closure_token(), code_fingerprint(),
                 jax.default_backend(),
                 jax.tree.map(_aval_token, tuple(args)),
                 jax.tree.map(_aval_token, dict(kwargs)))
        return hashlib.sha256(repr(token).encode()).hexdigest()[:32]

    def _dynamic(self, args, kwargs):
        """The call with static arguments stripped — the exported
        program's calling convention."""
        dyn_args = tuple(a for i, a in enumerate(args)
                         if i not in self._static_argnums)
        dyn_kwargs = {k: v for k, v in kwargs.items()
                      if k not in self._static_argnames}
        return dyn_args, dyn_kwargs

    def _path(self, key):
        return os.path.join(store_dir(), '{}-{}.jexp'.format(
            self.__name__, key))

    def _load(self, key):
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            _register_pytrees()
            with open(path, 'rb') as f:
                exported = jexp.deserialize(bytearray(f.read()))
            return jax.jit(exported.call)
        except Exception:
            return None

    def _export_async(self, key, args, kwargs):
        """Trace+export on the background prewarm worker and write the
        serialized program for the next process."""
        from . import prewarm

        sds_args = jax.tree.map(prewarm._to_sds_identity, tuple(args))
        sds_kwargs = jax.tree.map(prewarm._to_sds_identity, dict(kwargs))

        def job():
            _register_pytrees()
            exported = jexp.export(self._jit)(*sds_args, **sds_kwargs)
            data = exported.serialize()
            path = self._path(key)
            tmp = path + '.tmp.{}'.format(os.getpid())
            with open(tmp, 'wb') as f:
                f.write(data)
            os.replace(tmp, path)
            stats['exported'] += 1
            # Compile the exported wrapper now so the NEXT process finds
            # its executable in the persistent compilation cache instead
            # of paying a fresh StableHLO compile on first call.
            dyn_args, dyn_kwargs = self._dynamic(sds_args, sds_kwargs)
            jax.jit(exported.call).lower(*dyn_args, **dyn_kwargs).compile()

        prewarm.submit_job(job)

    # ---------------------------------------------------------------- #

    def __call__(self, *args, **kwargs):
        if self._broken:
            return self._jit(*args, **kwargs)
        try:
            key = self._key(args, kwargs)
        except Exception:
            self._broken = True
            return self._jit(*args, **kwargs)
        if self._broken:  # _key computes the closure token lazily
            return self._jit(*args, **kwargs)
        with self._lock:
            entry = self._mem.get(key)
        if entry is None:
            loaded = self._load(key)
            if loaded is not None:
                entry = ('exported', loaded)
                stats['loaded'] += 1
            else:
                entry = ('jit', self._jit)
                stats['fallback'] += 1
                self._export_async(key, args, kwargs)
            with self._lock:
                self._mem[key] = entry
        kind, fn = entry
        if kind == 'exported':
            dyn_args, dyn_kwargs = self._dynamic(args, kwargs)
            try:
                return fn(*dyn_args, **dyn_kwargs)
            except Exception:
                # Calling-convention or backend drift: fall back for good.
                stats['call_errors'] += 1
                with self._lock:
                    self._mem[key] = ('jit', self._jit)
                return self._jit(*args, **kwargs)
        return fn(*args, **kwargs)


def warm_jit(fun=None, static_argnums=(), static_argnames=()):
    """Decorator form of :class:`WarmJit` mirroring ``jax.jit``."""
    if fun is None:
        def wrap(f):
            return WarmJit(f, static_argnums=static_argnums,
                           static_argnames=static_argnames)
        return wrap
    return WarmJit(fun, static_argnums=static_argnums,
                   static_argnames=static_argnames)
