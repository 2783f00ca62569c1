"""Basic multi-dimensional bounds (TPU-native).

API-parity analogues of the reference's basic bounds (reference:
nautilus/bounds/basic.py). The classes here are thin host-side wrappers
around the pure, jittable kernels in :mod:`nautilus_tpu.ops.geometry`; all
geometry state lives in fixed-shape :class:`EllParams` pytrees so unions of
bounds can be stacked and evaluated in single fused XLA computations.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import geometry as G
from ..ops.linalg import inv_psd, slogdet_masked, _fix_dropped_dims
from ..utils.bucket import bucket_size, pad_batch, pad_points
from ..utils.fetch import fetch
from ..utils.keys import KeyStream
from ..utils import prewarm


@partial(jax.jit, static_argnums=(3,))
def _fit_ellipsoid_jit(points, point_mask, dim_mask, enlarge_per_dim):
    return G.fit_ellipsoid(points, point_mask, dim_mask,
                           enlarge_per_dim=enlarge_per_dim)


@partial(jax.jit, static_argnums=(3,))
def _fit_ellipsoid_packed(points, point_mask, dim_mask, enlarge_per_dim):
    """Fit and pack (c | B | B_inv | log_v) into one vector: the host reads
    the whole result in a single device->host round trip."""
    p = G.fit_ellipsoid(points, point_mask, dim_mask,
                        enlarge_per_dim=enlarge_per_dim)
    return jnp.concatenate([
        p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None]])


def unpack_ell(vec, d, dim_mask=None, dim_cube=None):
    """Unpack a (c | B | B_inv | log_v) vector into a numpy EllParams."""
    vec = np.asarray(vec, np.float32)
    if dim_mask is None:
        dim_mask = np.ones(d, bool)
    if dim_cube is None:
        dim_cube = np.zeros(d, bool)
    return G.EllParams(
        c=vec[:d],
        B=vec[d:d + d * d].reshape(d, d),
        B_inv=vec[d + d * d:d + 2 * d * d].reshape(d, d),
        dim_mask=np.asarray(dim_mask, bool),
        dim_cube=np.asarray(dim_cube, bool),
        log_v=vec[d + 2 * d * d])


def fit_ellipsoid_host(points, point_mask, dim_mask, enlarge_per_dim,
                       dim_cube=None):
    """Device MVEE fit returning an EllParams with *numpy* leaves.

    Bound geometry is tiny (d x d); keeping it on the host makes every
    subsequent volume read, overlap test, and stack build free of
    device round trips. One fetch per fit.
    """
    dim_mask = np.asarray(dim_mask, bool)
    vec = fetch(_fit_ellipsoid_packed(
        points, point_mask, jnp.asarray(dim_mask), float(enlarge_per_dim)),
        np.float32)
    return unpack_ell(vec, points.shape[1], dim_mask, dim_cube)


@partial(jax.jit, static_argnums=(2,))
def _ell_sample_jit(params, key, n_points):
    return G.ell_sample(params, key, n_points)


_ell_contains_jit = jax.jit(G.ell_contains)
_ell_transform_jit = jax.jit(G.ell_transform)
_ell_transform_inv_jit = jax.jit(G.ell_transform_inverse)


@jax.jit
def _drop_candidate_log_v(points, point_mask, c, a_inv, dim_mask):
    """For each active dim, the log-volume proxy of the ellipsoid projected
    with that dim dropped (reference: nautilus/bounds/basic.py:501-517).

    All candidates are evaluated from ONE inversion via the Schur
    complement: with M the active covariance block and P = M^-1, the
    dropped-dim-i quadratic form is x^T P x - (P x)_i^2 / P_ii (exact for
    any x_i) and log det M_sub = log det M + log P_ii. This turns the
    naive per-candidate inversion sweep — O(d * (d^3 + n d^2)), the
    dominant bound-construction cost at d ~ 50 — into O(d^3 + n d^2)
    total. Inactive dims return +inf so ``argmin`` never selects them.
    """
    m = _fix_dropped_dims(a_inv, dim_mask)
    p_full = _fix_dropped_dims(inv_psd(m), dim_mask)
    xc = (points - c) * dim_mask.astype(points.dtype)
    w = xc @ p_full.T
    maha_full = jnp.sum(w * xc, axis=1)
    pjj = jnp.maximum(jnp.diag(p_full), 1e-30)
    maha_drop = maha_full[:, None] - w ** 2 / pjj[None, :]
    scale = jnp.maximum(jnp.max(jnp.where(
        point_mask[:, None], maha_drop, 0.0), axis=0), 1e-30)
    d_sub = jnp.sum(dim_mask).astype(points.dtype) - 1.0
    log_det_sub = slogdet_masked(m, dim_mask) + jnp.log(pjj)
    log_v = log_det_sub + d_sub * jnp.log(scale)
    return jnp.where(dim_mask, log_v, jnp.inf)


def ucem_greedy_params(points, point_mask, enlarge_per_dim):
    """The cube-ellipsoid mixture's greedy dimension-drop descent as one
    on-device loop: candidate volumes, argmin, trial refit, accept-if-
    smaller, repeat — one host round trip for the whole search instead of
    one per iteration (reference control flow:
    nautilus/bounds/basic.py:496-528). Pure and jittable; returns the
    fitted EllParams (``dim_cube`` set) plus the cube-dim flags."""
    d = points.shape[1]

    def fit(dim_mask):
        return G.fit_ellipsoid(points, point_mask, dim_mask,
                               enlarge_per_dim=enlarge_per_dim)

    p0 = fit(jnp.ones(d, bool))
    state0 = (p0, jnp.zeros(d, bool), jnp.asarray(False),
              jnp.asarray(0, jnp.int32))

    def cond(state):
        p, dim_cube, done, it = state
        return (~done) & (it < d - 1) & (jnp.sum(~dim_cube) > 1)

    def body(state):
        p, dim_cube, done, it = state
        a_inv = p.B @ p.B.T
        cand = _drop_candidate_log_v(points, point_mask, p.c, a_inv,
                                     ~dim_cube)
        dim = jnp.argmin(cand)
        dim_cube_test = dim_cube.at[dim].set(True)
        p_test = fit(~dim_cube_test)
        better = p_test.log_v < p.log_v
        p = jax.tree.map(lambda a, b: jnp.where(better, b, a), p, p_test)
        dim_cube = jnp.where(better, dim_cube_test, dim_cube)
        return (p, dim_cube, ~better, it + 1)

    p, dim_cube, _, _ = jax.lax.while_loop(cond, body, state0)
    return p._replace(dim_cube=dim_cube), dim_cube


def ucem_greedy(points, point_mask, enlarge_per_dim):
    """:func:`ucem_greedy_params` packed into one vector
    (c | B | B_inv | log_v | dim_cube) for single-fetch host reads."""
    p, dim_cube = ucem_greedy_params(points, point_mask, enlarge_per_dim)
    return jnp.concatenate([
        p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None],
        dim_cube.astype(points.dtype)])


_ucem_greedy_jit = partial(jax.jit, static_argnums=(2,))(ucem_greedy)


@partial(jax.jit, static_argnums=(3,))
def _grow_candidates_jit(points, point_mask, dim_cube, enlarge_per_dim):
    """Batched candidate fits for the grow-from-empty mixture search: for
    every dim, the MVEE fit with that dim ADDED to the current ellipsoid
    set. One dispatch replaces a host loop of per-candidate fit+fetch
    rounds (reference control flow: nautilus/bounds/basic.py:535-551) —
    at d=50 over a 32k block that loop cost ~2 s per fallback in
    sequential link round trips."""

    def one(i):
        dm = (~dim_cube).at[i].set(True)
        p = G.fit_ellipsoid(points, point_mask, dm,
                            enlarge_per_dim=enlarge_per_dim)
        return jnp.concatenate([
            p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None]])

    return jax.vmap(one)(jnp.arange(points.shape[1]))


class UnitCube:
    r"""Unit hypercube bound, [0, 1)^n_dim.

    Reference: nautilus/bounds/basic.py:9-151.
    """

    def __init__(self):
        self.n_dim = None
        self.keys = None

    @classmethod
    def compute(cls, n_dim, keys=None):
        """Create a unit-cube bound (reference:
        nautilus/bounds/basic.py:69-97)."""
        bound = cls()
        bound.n_dim = n_dim
        bound.keys = keys if keys is not None else KeyStream()
        return bound

    def contains(self, points):
        """Whether each point lies inside the bound."""
        points = np.asarray(points)
        return np.asarray(np.all((points >= 0) & (points < 1), axis=-1))

    def sample(self, n_points=100, pool=None):
        """Draw uniform points; ``pool`` is accepted for API parity (sampling
        runs on device)."""
        n_pad = bucket_size(n_points)
        points = jax.random.uniform(
            self.keys.next(), (n_pad, self.n_dim))
        return fetch(points)[:n_points].astype(np.float64)

    @property
    def log_v(self):
        """Natural log of the bound volume."""
        return 0.0

    def write(self, group):
        """Serialize the bound into an HDF5 group."""
        group.attrs['type'] = 'UnitCube'
        group.attrs['n_dim'] = self.n_dim

    @classmethod
    def read(cls, group, keys=None):
        """Reconstruct the bound from an HDF5 group."""
        bound = cls()
        bound.keys = keys if keys is not None else KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        return bound

    def reset(self, keys=None):
        if keys is not None:
            self.keys = keys


class Ellipsoid:
    r"""Ellipsoid bound (x - c)^T A (x - c) < 1.

    Reference: nautilus/bounds/basic.py:244-449. Geometry is held in an
    :class:`EllParams` pytree; fitting runs the fixed-budget masked Khachiyan
    kernel on device.
    """

    def __init__(self):
        self.n_dim = None
        self.params = None
        self.keys = None

    @classmethod
    def compute(cls, points, enlarge_per_dim=1.1, keys=None):
        """Fit an enlarged minimum-volume enclosing ellipsoid to ``points``."""
        points = np.asarray(points)
        bound = cls()
        bound.n_dim = points.shape[1]

        if enlarge_per_dim < 1.0:
            raise ValueError(
                "The 'enlarge_per_dim' factor cannot be smaller than unity.")
        if not points.shape[0] > bound.n_dim:
            raise ValueError('Number of points must be larger than number ' +
                             'of dimensions.')

        pts, mask = pad_points(points)
        bound.params = fit_ellipsoid_host(
            pts, mask, np.ones(bound.n_dim, bool), float(enlarge_per_dim))
        bound.keys = keys if keys is not None else KeyStream()
        return bound

    def transform(self, points, inverse=False):
        """Map points into (``inverse=False``) or out of the bound's
        unit-ball frame."""
        pts, n = pad_batch(points)
        if not inverse:
            return fetch(_ell_transform_jit(self.params, pts))[:n]
        return fetch(_ell_transform_inv_jit(self.params, pts))[:n]

    def contains(self, points):
        """Whether each point lies inside the ellipsoid."""
        single = np.asarray(points).ndim == 1
        pts, n = pad_batch(points)
        result = fetch(_ell_contains_jit(self.params, pts))[:n]
        return result[0] if single else result

    def sample(self, n_points=100):
        """Draw points distributed uniformly over the bound."""
        n_pad = bucket_size(n_points)
        points = _ell_sample_jit(self.params, self.keys.next(), n_pad)
        return fetch(points)[:n_points].astype(np.float64)

    @property
    def log_v(self):
        """Natural log of the ellipsoid volume."""
        return float(self.params.log_v)

    def write(self, group):
        """Serialize the ellipsoid into an HDF5 group."""
        group.attrs['type'] = 'Ellipsoid'
        group.attrs['n_dim'] = self.n_dim
        for key in ['c', 'B', 'B_inv', 'dim_mask', 'dim_cube', 'log_v']:
            group.attrs[key] = np.asarray(getattr(self.params, key))

    @classmethod
    def read(cls, group, keys=None):
        """Reconstruct the ellipsoid from an HDF5 group."""
        bound = cls()
        bound.keys = keys if keys is not None else KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        bound.params = G.EllParams(
            c=np.asarray(group.attrs['c'], np.float32),
            B=np.asarray(group.attrs['B'], np.float32),
            B_inv=np.asarray(group.attrs['B_inv'], np.float32),
            dim_mask=np.asarray(group.attrs['dim_mask'], bool),
            dim_cube=np.asarray(group.attrs['dim_cube'], bool),
            log_v=np.asarray(group.attrs['log_v'], np.float32))
        return bound

    def reset(self, keys=None):
        if keys is not None:
            self.keys = keys


class UnitCubeEllipsoidMixture:
    r"""Mixture bound: each dim bounded either by the unit interval or by a
    lower-dimensional ellipsoid.

    Redesign of reference: nautilus/bounds/basic.py:452-727. Instead of
    holding a separate lower-dimensional ellipsoid (dynamic shapes), the
    mixture is a single full-dimensional :class:`EllParams` with
    ``dim_cube`` flags; all kernels mask accordingly, so unions of mixtures
    stack into fixed-shape pytrees. The greedy dimension-selection control
    loop runs on host, calling the fixed-shape fitting kernels.
    """

    def __init__(self):
        self.n_dim = None
        self.params = None
        self.keys = None

    @classmethod
    def compute(cls, points, enlarge_per_dim=1.1, keys=None):
        """Fit the mixture: greedy dim-drop picks which dimensions stay
        cube-bounded, the rest get an enlarged MVEE."""
        points = np.asarray(points)
        pts, mask = pad_points(points, floor=2048)
        bound = cls()
        bound.n_dim = points.shape[1]
        bound.keys = keys if keys is not None else KeyStream()
        bound.params = cls._greedy_fit(pts, mask, bound.n_dim,
                                       float(enlarge_per_dim))
        return bound

    @classmethod
    def compute_masked(cls, pts_dev, mask_dev, enlarge_per_dim=1.1,
                       keys=None):
        """Device-block twin of :meth:`compute`: fit over a masked device
        point block already resident on device (no host coordinates)."""
        bound = cls()
        bound.n_dim = int(pts_dev.shape[1])
        bound.keys = keys if keys is not None else KeyStream()
        bound.params = cls._greedy_fit(pts_dev, mask_dev, bound.n_dim,
                                       float(enlarge_per_dim))
        return bound

    @classmethod
    def _greedy_fit(cls, pts, mask, n_dim, enlarge_per_dim):
        """Shared greedy dimension selection over a (device or padded-host)
        point block: the shrink descent runs on device in one call
        (reference control flow: nautilus/bounds/basic.py:496-528); if even
        the best ellipsoid exceeds the cube, grow the ellipsoid dimension
        set from empty instead (reference: basic.py:535-551)."""
        prewarm.submit_like(_ucem_greedy_jit, prewarm.current_hints(),
                            pts, mask, enlarge_per_dim)
        vec = fetch(_ucem_greedy_jit(pts, mask, enlarge_per_dim),
                    np.float32)
        dim_cube = vec[-n_dim:] > 0.5
        params = unpack_ell(vec[:-n_dim], n_dim, ~dim_cube, dim_cube)
        log_v = float(params.log_v)

        if log_v > 0:
            # Grow from empty: repeatedly fit every add-one-dim candidate
            # in ONE batched dispatch and accept the best improvement
            # (reference scans candidates serially,
            # nautilus/bounds/basic.py:535-551 — equivalent descent, one
            # link round trip per ACCEPTED dim instead of one per fit).
            dim_cube = np.ones(n_dim, dtype=bool)
            params = None
            log_v = 0.0
            n_packed = n_dim + 2 * n_dim * n_dim + 1
            prewarm.submit_like(_grow_candidates_jit,
                                prewarm.current_hints(), pts, mask,
                                jnp.asarray(np.ones(n_dim, bool)),
                                enlarge_per_dim)
            while np.any(dim_cube):
                packed = fetch(_grow_candidates_jit(
                    pts, mask, jnp.asarray(dim_cube), enlarge_per_dim),
                    np.float32)
                raw = packed[:, n_packed - 1]
                # Non-finite candidate fits (degenerate f32 geometry) are
                # skipped, not allowed to win the argmin or end the search.
                cand_log_v = np.where(
                    dim_cube & np.isfinite(raw), raw, np.inf)
                best = int(np.argmin(cand_log_v))
                if not cand_log_v[best] < log_v:
                    break
                dim_cube[best] = False
                log_v = float(cand_log_v[best])
                params = unpack_ell(packed[best], n_dim,
                                    ~dim_cube, dim_cube)
            if params is None:
                params = cls._pure_cube_params(n_dim)

        return params._replace(dim_cube=np.asarray(dim_cube, bool))

    @staticmethod
    def _pure_cube_params(n_dim):
        eye = np.eye(n_dim, dtype=np.float32)
        return G.EllParams(
            c=np.zeros(n_dim, np.float32), B=eye, B_inv=eye,
            dim_mask=np.zeros(n_dim, bool),
            dim_cube=np.ones(n_dim, bool),
            log_v=np.asarray(0.0, np.float32))

    @property
    def dim_cube(self):
        return np.asarray(self.params.dim_cube)

    def transform(self, points, inverse=False):
        """Map points into (or back out of) the mixture frame: cube dims
        to [-1, 1), ellipsoid dims to the ellipsoid coordinate system
        (reference: nautilus/bounds/basic.py:565-592)."""
        pts, n = pad_batch(points)
        if inverse:
            return fetch(_ell_transform_inv_jit(self.params, pts))[:n]
        return fetch(_ell_transform_jit(self.params, pts))[:n]

    def contains(self, points):
        """Whether each point satisfies both the cube dims and the ellipsoid
        dims."""
        single = np.asarray(points).ndim == 1
        pts, n = pad_batch(points)
        result = fetch(_ell_contains_jit(self.params, pts))[:n]
        return result[0] if single else result

    def sample(self, n_points=100):
        """Draw points distributed uniformly over the mixture."""
        n_pad = bucket_size(n_points)
        points = _ell_sample_jit(self.params, self.keys.next(), n_pad)
        return fetch(points)[:n_points].astype(np.float64)

    @property
    def log_v(self):
        """Natural log of the mixture volume."""
        if not bool(np.any(~self.dim_cube)):
            return 0.0
        return float(self.params.log_v)

    def write(self, group):
        """Serialize the mixture into an HDF5 group."""
        group.attrs['type'] = 'UnitCubeEllipsoidMixture'
        group.attrs['n_dim'] = self.n_dim
        for key in ['c', 'B', 'B_inv', 'dim_mask', 'dim_cube', 'log_v']:
            group.attrs[key] = np.asarray(getattr(self.params, key))

    @classmethod
    def read(cls, group, keys=None):
        """Reconstruct the mixture from an HDF5 group."""
        bound = cls()
        bound.keys = keys if keys is not None else KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        bound.params = G.EllParams(
            c=np.asarray(group.attrs['c'], np.float32),
            B=np.asarray(group.attrs['B'], np.float32),
            B_inv=np.asarray(group.attrs['B_inv'], np.float32),
            dim_mask=np.asarray(group.attrs['dim_mask'], bool),
            dim_cube=np.asarray(group.attrs['dim_cube'], bool),
            log_v=np.asarray(group.attrs['log_v'], np.float32))
        return bound

    def reset(self, keys=None):
        if keys is not None:
            self.keys = keys
