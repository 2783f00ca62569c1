"""Batched ellipsoid geometry kernels.

An ellipsoid is represented by a fixed-shape pytree (:class:`EllParams`) so
that unions of ellipsoids stack into leading-axis arrays and `contains` /
`sample` / `transform` run as single fused XLA computations over
``(batch, n_dim)`` point blocks. Dimension masks support the reference's
cube-ellipsoid mixtures (reference: nautilus/bounds/basic.py:452-727) without
dynamic shapes: dropped dims carry identity rows in the frames.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .linalg import mvee, ellipsoid_frame, ellipsoid_log_v


class EllParams(NamedTuple):
    """Ellipsoid (x - c)^T A (x - c) <= 1 with Cholesky frame B B^T = A^-1.

    ``dim_mask`` marks active dimensions; on dropped dims c = 0 and B has
    identity rows/columns. ``dim_cube`` marks dims bounded by the unit
    interval instead of the ellipsoid (used by cube-ellipsoid mixtures;
    disjoint from active ellipsoid dims).
    """

    c: jax.Array        # (d,)
    B: jax.Array        # (d, d)
    B_inv: jax.Array    # (d, d)
    dim_mask: jax.Array  # (d,) bool: dims bounded by the ellipsoid
    dim_cube: jax.Array  # (d,) bool: dims bounded by the unit cube
    log_v: jax.Array    # () log volume of the ellipsoid part


def fit_ellipsoid(points, point_mask, dim_mask, enlarge_per_dim=1.1,
                  dim_cube=None):
    """Fit an enlarged MVEE to masked points. Pure, jittable.

    Mirrors reference: nautilus/bounds/basic.py:265-316 but with masks
    instead of dynamic shapes.
    """
    d = points.shape[1]
    if dim_cube is None:
        dim_cube = jnp.zeros(d, bool)
    points = points * dim_mask.astype(points.dtype)
    c, _, a_inv = mvee(points, point_mask, dim_mask)
    b, b_inv = ellipsoid_frame(a_inv, dim_mask, enlarge_per_dim)
    log_v = ellipsoid_log_v(b, dim_mask)
    return EllParams(c=c, B=b, B_inv=b_inv, dim_mask=dim_mask,
                     dim_cube=dim_cube, log_v=log_v)


def ell_transform(params, points):
    """Map points into the ellipsoid frame: y = B^-1 (x - c).

    Dropped dims are zeroed; cube dims map to [-1, 1) via y = 2x - 1
    (mirrors reference: nautilus/bounds/basic.py:318-342, 565-592).
    """
    dm = params.dim_mask.astype(points.dtype)
    cm = params.dim_cube.astype(points.dtype)
    xc = (points - params.c) * dm
    y = xc @ params.B_inv.T
    y = y * dm + (2.0 * points - 1.0) * cm
    return y


def ell_transform_inverse(params, y):
    """Inverse of :func:`ell_transform` on ellipsoid dims; cube dims mapped
    back from [-1, 1) to [0, 1)."""
    dm = params.dim_mask.astype(y.dtype)
    cm = params.dim_cube.astype(y.dtype)
    x = (y * dm) @ params.B.T + params.c
    return x * dm + 0.5 * (y + 1.0) * cm


def ell_contains(params, points):
    """Whether each point lies inside the (mixture) ellipsoid.

    r^2 < 1 over ellipsoid dims and 0 <= x < 1 over cube dims
    (reference: nautilus/bounds/basic.py:344-360, 594-617).

    On TPU the frame matmul runs in bf16 with f32 accumulation: a bound
    is a region *definition*, so any deterministic membership function
    applied consistently across sampling, shell rejection, and MC volume
    yields an unbiased evidence estimate — reduced precision only jitters
    the region boundary (sampling efficiency, not correctness), and every
    consumer of this function sees the identical bf16 region. The slack
    absorbs the frame round-trip rounding so sampled boundary points pass
    their own containment test at either precision.
    """
    dm = params.dim_mask.astype(points.dtype)
    xc = (points - params.c) * dm
    if jax.default_backend() == 'tpu':
        y = jnp.dot(xc.astype(jnp.bfloat16),
                    params.B_inv.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        slack = 3e-2
    else:
        y = xc @ params.B_inv.T
        slack = 1e-4
    r2 = jnp.sum((y * dm) ** 2, axis=-1)
    in_ell = r2 < 1.0 + slack
    in_cube = jnp.all(
        jnp.where(params.dim_cube, (points >= 0) & (points < 1), True),
        axis=-1)
    return in_ell & in_cube


def ell_sample(params, key, n_points):
    """Sample uniformly from the (mixture) ellipsoid.

    Gaussian direction x uniform^(1/d_eff) radius on ellipsoid dims,
    independent uniforms on cube dims (reference:
    nautilus/bounds/basic.py:362-381, 619-640).
    """
    d = params.c.shape[0]
    key_n, key_r, key_c = jax.random.split(key, 3)
    dm = params.dim_mask.astype(params.c.dtype)
    cm = params.dim_cube.astype(params.c.dtype)
    d_eff = jnp.maximum(jnp.sum(dm), 1.0)
    z = jax.random.normal(key_n, (n_points, d), params.c.dtype) * dm
    norm = jnp.sqrt(jnp.maximum(jnp.sum(z ** 2, axis=-1, keepdims=True),
                                1e-30))
    r = jax.random.uniform(
        key_r, (n_points, 1), params.c.dtype) ** (1.0 / d_eff)
    y = z / norm * r
    x = (y @ params.B.T + params.c) * dm
    u = jax.random.uniform(key_c, (n_points, d), params.c.dtype)
    return x + u * cm


def cube_contains(points):
    """Unit-cube membership (reference: nautilus/bounds/basic.py:51-67)."""
    return jnp.all((points >= 0) & (points < 1), axis=-1)


def stack_ell_params(params_list, k_pad=None):
    """Stack a list of EllParams into one leading-axis pytree plus mask.

    Padded slots are unit balls with zero log-volume weight (mask False).
    Built entirely on the host (numpy leaves): on hardware behind a
    dispatch-latency tunnel, per-leaf eager device ops here would dominate
    the sampler's bound bookkeeping. Callers upload the finished stack once
    (``jax.device_put``) or let ``jit`` convert at call time.
    """
    import numpy as np

    k = len(params_list)
    if k_pad is None:
        k_pad = k
    assert k_pad >= k
    d = np.shape(params_list[0].c)[0]
    dtype = np.float32

    def pad_stack(getter, pad_value, out_dtype):
        arrs = [np.asarray(getter(p), out_dtype) for p in params_list]
        arrs += [pad_value] * (k_pad - k)
        return np.stack(arrs)

    eye = np.eye(d, dtype=dtype)
    stacked = EllParams(
        c=pad_stack(lambda p: p.c, np.zeros(d, dtype), dtype),
        B=pad_stack(lambda p: p.B, eye, dtype),
        B_inv=pad_stack(lambda p: p.B_inv, eye, dtype),
        dim_mask=pad_stack(lambda p: p.dim_mask, np.ones(d, bool), bool),
        dim_cube=pad_stack(lambda p: p.dim_cube, np.zeros(d, bool), bool),
        log_v=pad_stack(lambda p: p.log_v,
                        np.asarray(-np.inf, dtype), dtype),
    )
    member_mask = np.arange(k_pad) < k
    return stacked, member_mask


def union_contains(stacked, member_mask, points, unit=True):
    """Membership in a union of (mixture) ellipsoids, optionally cut to the
    unit cube (reference: nautilus/bounds/union.py:269-289)."""
    per_member = jax.vmap(ell_contains, in_axes=(0, None))(stacked, points)
    per_member = per_member & member_mask[:, None]
    in_bound = jnp.any(per_member, axis=0)
    if unit:
        in_bound = in_bound & cube_contains(points)
    return in_bound


def union_multiplicity(stacked, member_mask, points):
    """Number of union members containing each point."""
    per_member = jax.vmap(ell_contains, in_axes=(0, None))(stacked, points)
    per_member = per_member & member_mask[:, None]
    return jnp.sum(per_member.astype(jnp.int32), axis=0)


def union_sample_batch(stacked, member_mask, key, n_points, unit=True):
    """Draw a fixed-size batch of candidate union samples with accept mask.

    Redesign of the reference's buffered rejection loop (reference:
    nautilus/bounds/union.py:291-327) as one fused device computation:
    members are chosen per-point from a categorical over member volumes (so
    no shuffle is needed), points are generated for every member via a scan
    of batched matmuls, and overlap is corrected by accepting each point with
    probability 1 / multiplicity. Counters are computed from the mask by the
    caller.

    Returns ``(points, accept)`` with shapes ((n_points, d), (n_points,)).
    """
    key_m, key_s, key_a = jax.random.split(key, 3)
    logits = jnp.where(member_mask, stacked.log_v, -jnp.inf)
    member = jax.random.categorical(key_m, logits, shape=(n_points,))

    # Per-point frames: gather the chosen member's affine geometry and
    # apply ONE batched sample transform, instead of generating a full
    # batch per member and selecting (k_pad x the RNG and matmul work —
    # measured dominant in the 50-D own-bound gate).
    d = stacked.c.shape[1]
    dtype = stacked.c.dtype
    c_m = stacked.c[member]                 # (n, d)
    b_m = stacked.B[member]                 # (n, d, d)
    dm = stacked.dim_mask[member].astype(dtype)
    cm = stacked.dim_cube[member].astype(dtype)
    d_eff = jnp.maximum(jnp.sum(dm, axis=1), 1.0)

    key_n, key_r, key_c = jax.random.split(key_s, 3)
    z = jax.random.normal(key_n, (n_points, d), dtype) * dm
    norm = jnp.sqrt(jnp.maximum(jnp.sum(z ** 2, axis=-1, keepdims=True),
                                1e-30))
    r = jax.random.uniform(
        key_r, (n_points, 1), dtype) ** (1.0 / d_eff[:, None])
    y = z / norm * r
    x = (jnp.einsum('nij,nj->ni', b_m, y) + c_m) * dm
    u = jax.random.uniform(key_c, (n_points, d), dtype)
    points = x + u * cm

    mult = union_multiplicity(stacked, member_mask, points)
    # A boundary sample can fail its own member's containment under f32;
    # such points must be rejected so sampling and `contains` agree.
    accept = (mult >= 1) & (
        jax.random.uniform(key_a, (n_points,)) <
        1.0 / jnp.maximum(mult, 1))
    if unit:
        accept = accept & cube_contains(points)
    return points, accept


def union_log_v(stacked, member_mask, n_sample, n_reject):
    """MC volume of the union: sum of member volumes times acceptance rate
    (reference: nautilus/bounds/union.py:329-343)."""
    logits = jnp.where(member_mask, stacked.log_v, -jnp.inf)
    log_v_sum = jax.scipy.special.logsumexp(logits)
    return log_v_sum + jnp.log(1.0 - n_reject / n_sample)
