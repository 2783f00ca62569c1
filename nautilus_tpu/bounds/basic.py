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
from ..utils.bucket import bucket_size, pad_points
from ..utils.keys import KeyStream


@partial(jax.jit, static_argnums=(3,))
def _fit_ellipsoid_jit(points, point_mask, dim_mask, enlarge_per_dim):
    return G.fit_ellipsoid(points, point_mask, dim_mask,
                           enlarge_per_dim=enlarge_per_dim)


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

    Vmapped over candidate dims; inactive dims return +inf so ``argmin``
    never selects them.
    """
    d = points.shape[1]

    def one(i):
        dm2 = dim_mask & (jnp.arange(d) != i)
        a_inv_p = _fix_dropped_dims(a_inv, dm2)
        a_p = _fix_dropped_dims(inv_psd(a_inv_p), dm2)
        xc = (points - c) * dm2.astype(points.dtype)
        maha = jnp.einsum('ni,ij,nj->n', xc, a_p, xc)
        scale = jnp.maximum(
            jnp.max(jnp.where(point_mask, maha, 0.0)), 1e-30)
        d_sub = jnp.sum(dm2).astype(points.dtype)
        return slogdet_masked(a_inv_p, dm2) + d_sub * jnp.log(scale)

    log_v = jax.vmap(one)(jnp.arange(d))
    return jnp.where(dim_mask, log_v, jnp.inf)


class UnitCube:
    r"""Unit hypercube bound, [0, 1)^n_dim.

    Reference: nautilus/bounds/basic.py:9-151.
    """

    def __init__(self):
        self.n_dim = None
        self.keys = None

    @classmethod
    def compute(cls, n_dim, keys=None):
        bound = cls()
        bound.n_dim = n_dim
        bound.keys = keys if keys is not None else KeyStream()
        return bound

    def contains(self, points):
        points = np.asarray(points)
        return np.asarray(np.all((points >= 0) & (points < 1), axis=-1))

    def sample(self, n_points=100, pool=None):
        n_pad = bucket_size(n_points)
        points = jax.random.uniform(
            self.keys.next(), (n_pad, self.n_dim))
        return np.asarray(points)[:n_points].astype(np.float64)

    @property
    def log_v(self):
        return 0.0

    def write(self, group):
        group.attrs['type'] = 'UnitCube'
        group.attrs['n_dim'] = self.n_dim

    @classmethod
    def read(cls, group, keys=None):
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
        dim_mask = jnp.ones(bound.n_dim, bool)
        bound.params = _fit_ellipsoid_jit(
            pts, mask, dim_mask, float(enlarge_per_dim))
        bound.keys = keys if keys is not None else KeyStream()
        return bound

    def transform(self, points, inverse=False):
        points = jnp.asarray(np.atleast_2d(np.asarray(points)))
        if not inverse:
            return np.asarray(_ell_transform_jit(self.params, points))
        return np.asarray(_ell_transform_inv_jit(self.params, points))

    def contains(self, points):
        single = np.asarray(points).ndim == 1
        points = jnp.asarray(np.atleast_2d(np.asarray(points)))
        result = np.asarray(_ell_contains_jit(self.params, points))
        return result[0] if single else result

    def sample(self, n_points=100):
        n_pad = bucket_size(n_points)
        points = _ell_sample_jit(self.params, self.keys.next(), n_pad)
        return np.asarray(points)[:n_points].astype(np.float64)

    @property
    def log_v(self):
        return float(self.params.log_v)

    def write(self, group):
        group.attrs['type'] = 'Ellipsoid'
        group.attrs['n_dim'] = self.n_dim
        for key in ['c', 'B', 'B_inv', 'dim_mask', 'dim_cube', 'log_v']:
            group.attrs[key] = np.asarray(getattr(self.params, key))

    @classmethod
    def read(cls, group, keys=None):
        bound = cls()
        bound.keys = keys if keys is not None else KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        bound.params = G.EllParams(
            c=jnp.asarray(group.attrs['c'], jnp.float32),
            B=jnp.asarray(group.attrs['B'], jnp.float32),
            B_inv=jnp.asarray(group.attrs['B_inv'], jnp.float32),
            dim_mask=jnp.asarray(group.attrs['dim_mask'], bool),
            dim_cube=jnp.asarray(group.attrs['dim_cube'], bool),
            log_v=jnp.asarray(group.attrs['log_v'], jnp.float32))
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
        points = np.asarray(points)
        bound = cls()
        n_dim = bound.n_dim = points.shape[1]
        bound.keys = keys if keys is not None else KeyStream()
        enlarge_per_dim = float(enlarge_per_dim)

        pts, mask = pad_points(points)

        def fit(dim_cube):
            dim_mask = jnp.asarray(~dim_cube)
            return _fit_ellipsoid_jit(pts, mask, dim_mask, enlarge_per_dim)

        # Greedy: start with all dims in the ellipsoid; move dims to the cube
        # while the volume decreases (reference: basic.py:496-528).
        dim_cube = np.zeros(n_dim, dtype=bool)
        params = fit(dim_cube)
        log_v = float(params.log_v)

        while np.sum(~dim_cube) > 1:
            a_inv = params.B @ params.B.T
            cand = np.asarray(_drop_candidate_log_v(
                pts, mask, params.c, a_inv, jnp.asarray(~dim_cube)))
            dim = int(np.argmin(cand))
            dim_cube[dim] = True
            params_test = fit(dim_cube)
            log_v_test = float(params_test.log_v)
            if log_v_test < log_v:
                params, log_v = params_test, log_v_test
            else:
                dim_cube[dim] = False
                break

        # Fallback: if the ellipsoid is larger than the cube, grow the
        # ellipsoid dimension set from empty (reference: basic.py:535-551).
        if log_v > 0:
            dim_cube = np.ones(n_dim, dtype=bool)
            params = None
            log_v = 0.0
            tested = np.zeros(n_dim, dtype=bool)
            while not np.all(tested):
                for dim in np.flatnonzero(~tested):
                    dim_cube[dim] = False
                    tested[dim] = True
                    params_test = fit(dim_cube)
                    log_v_test = float(params_test.log_v)
                    if log_v_test < log_v:
                        params, log_v = params_test, log_v_test
                        tested[dim_cube] = False
                    else:
                        dim_cube[dim] = True
            if params is None:
                params = cls._pure_cube_params(n_dim)

        bound.params = params._replace(dim_cube=jnp.asarray(dim_cube))
        return bound

    @staticmethod
    def _pure_cube_params(n_dim):
        eye = jnp.eye(n_dim, dtype=jnp.float32)
        return G.EllParams(
            c=jnp.zeros(n_dim, jnp.float32), B=eye, B_inv=eye,
            dim_mask=jnp.zeros(n_dim, bool),
            dim_cube=jnp.ones(n_dim, bool),
            log_v=jnp.asarray(0.0, jnp.float32))

    @property
    def dim_cube(self):
        return np.asarray(self.params.dim_cube)

    def transform(self, points):
        points = jnp.asarray(np.atleast_2d(np.asarray(points)))
        return np.asarray(_ell_transform_jit(self.params, points))

    def contains(self, points):
        single = np.asarray(points).ndim == 1
        points = jnp.asarray(np.atleast_2d(np.asarray(points)))
        result = np.asarray(_ell_contains_jit(self.params, points))
        return result[0] if single else result

    def sample(self, n_points=100):
        n_pad = bucket_size(n_points)
        points = _ell_sample_jit(self.params, self.keys.next(), n_pad)
        return np.asarray(points)[:n_points].astype(np.float64)

    @property
    def log_v(self):
        if not bool(np.any(~self.dim_cube)):
            return 0.0
        return float(self.params.log_v)

    def write(self, group):
        group.attrs['type'] = 'UnitCubeEllipsoidMixture'
        group.attrs['n_dim'] = self.n_dim
        for key in ['c', 'B', 'B_inv', 'dim_mask', 'dim_cube', 'log_v']:
            group.attrs[key] = np.asarray(getattr(self.params, key))

    @classmethod
    def read(cls, group, keys=None):
        bound = cls()
        bound.keys = keys if keys is not None else KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        bound.params = G.EllParams(
            c=jnp.asarray(group.attrs['c'], jnp.float32),
            B=jnp.asarray(group.attrs['B'], jnp.float32),
            B_inv=jnp.asarray(group.attrs['B_inv'], jnp.float32),
            dim_mask=jnp.asarray(group.attrs['dim_mask'], bool),
            dim_cube=jnp.asarray(group.attrs['dim_cube'], bool),
            log_v=jnp.asarray(group.attrs['log_v'], jnp.float32))
        return bound

    def reset(self, keys=None):
        if keys is not None:
            self.keys = keys
