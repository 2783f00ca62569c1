"""Masked linear-algebra kernels for bound geometry.

All functions in this module are pure, jittable, and operate on fixed-shape
arrays with explicit point/dimension masks so that the surrounding sampler can
bucket ragged point sets into a small number of compiled shapes.

The minimum-volume enclosing ellipsoid (MVEE) solver re-designs the
reference's batched Khachiyan iteration (reference:
nautilus/bounds/basic.py:175-241) as a fixed-budget scan whose per-iteration
work is a single (n, d+1) x (d+1, d+1) matmul (MXU friendly) followed by a
short scan of Sherman-Morrison rank-1 updates.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def safe_cholesky(m, eps=1e-10):
    """Cholesky with a relative jitter so nearly singular inputs succeed.

    The base jitter keeps full accuracy on well-conditioned inputs; if the
    factorization still fails (f32 cannot survive condition numbers past
    ~1e7 — e.g. the rank-deficient covariance of two collinear point
    clusters), it escalates through two larger jitters instead of
    returning NaN. The escalated result slightly thickens a degenerate
    ellipsoid — the enclosing guarantee is restored by the caller's
    max-Mahalanobis rescale, and a finite overbound is always preferable
    to NaN geometry poisoning the split recursion.
    """
    d = m.shape[-1]
    eye = jnp.eye(d, dtype=m.dtype)
    scale = jnp.maximum(jnp.trace(m) / d, 1e-30)

    def chol_with(e):
        return jnp.linalg.cholesky(m + e * scale * eye)

    c1 = chol_with(eps)
    c2 = chol_with(3e-6)
    c3 = chol_with(3e-3)
    ok1 = jnp.all(jnp.isfinite(c1))
    ok2 = jnp.all(jnp.isfinite(c2))
    return jnp.where(ok1, c1, jnp.where(ok2, c2, c3))


def inv_psd(m, eps=1e-10):
    """Invert a symmetric positive semi-definite matrix via Cholesky.

    TPU-native analogue of the reference's LAPACK dpotrf/dpotri path
    (reference: nautilus/bounds/basic.py:154-172).
    """
    d = m.shape[-1]
    chol = safe_cholesky(m, eps)
    chol_inv = jax.scipy.linalg.solve_triangular(
        chol, jnp.eye(d, dtype=m.dtype), lower=True)
    return chol_inv.T @ chol_inv


def _fix_dropped_dims(m, dim_mask):
    """Project a matrix onto the active dims and put identity on dropped."""
    dm = dim_mask.astype(m.dtype)
    proj = jnp.outer(dm, dm)
    return m * proj + jnp.diag(1.0 - dm)


def mvee(points, point_mask, dim_mask, n_outer=50, n_inner=20):
    """Approximate the minimum-volume enclosing ellipsoid of masked points.

    Fixed-iteration-budget Khachiyan algorithm. Each outer step evaluates all
    support scores g_i = q_i^T V^-1 q_i with one batched matmul, then applies
    up to `n_inner` rank-1 weight updates on the highest-score points using
    Sherman-Morrison updates of V^-1. A final rescale guarantees that every
    (unmasked) point is enclosed even if the budget was not enough for full
    convergence, mirroring the reference's extraction step (reference:
    nautilus/bounds/basic.py:233-240).

    Parameters
    ----------
    points : (n, d) array. Coordinates of dropped dims must be zeroed.
    point_mask : (n,) bool. Valid points.
    dim_mask : (d,) bool. Active dimensions.

    Returns
    -------
    c : (d,) center (zero on dropped dims).
    A : (d, d) matrix with (x-c)^T A (x-c) <= 1 for all valid points,
        identity on dropped dims.
    A_inv : (d, d) inverse of A (identity on dropped dims).
    """
    n, d = points.shape
    dtype = points.dtype
    d_eff = jnp.sum(dim_mask).astype(dtype)
    m = d_eff + 1.0

    pm = point_mask.astype(dtype)
    u = pm / jnp.sum(pm)

    # Standardize before lifting: the Khachiyan scatter matrix of raw
    # points is conditioned like (offset / spread)^2 — a cluster of
    # spread 1e-5 sitting at 0.1 is condition ~1e8, past f32. Centering
    # and per-dim scaling make the solve O(1)-conditioned; the MVEE is
    # affine-equivariant, so the result maps back exactly below.
    mu = jnp.sum(points * u[:, None], axis=0) * dim_mask.astype(dtype)
    xc0 = (points - mu) * dim_mask.astype(dtype)
    s = jnp.sqrt(jnp.sum(xc0 ** 2 * u[:, None], axis=0))
    s = jnp.where(dim_mask & (s > 0), s, 1.0)
    points = xc0 / s

    q = jnp.concatenate([points, jnp.ones((n, 1), dtype)], axis=1)
    dim_mask_q = jnp.concatenate(
        [dim_mask, jnp.ones((1,), bool)])
    eye_fix = jnp.diag(1.0 - dim_mask_q.astype(dtype))
    idx_arange = jnp.arange(n)

    def outer_step(u, _):
        v = (q * u[:, None]).T @ q + eye_fix
        v_inv = inv_psd(v)
        g_all = jnp.einsum('ni,ij,nj->n', q, v_inv, q)
        g_all = jnp.where(point_mask, g_all, -jnp.inf)
        _, top_idx = jax.lax.top_k(g_all, min(n_inner, n))

        def inner_step(carry, j):
            u, v_inv = carry
            qj = q[j]
            vq = v_inv @ qj
            g = qj @ vq
            a = (g - m) / (m * (g - 1.0))
            a = jnp.where((g > m) & point_mask[j], a, 0.0)
            denom = (1.0 - a) + a * g
            v_inv_new = (v_inv - (a / denom) * jnp.outer(vq, vq)) / (1.0 - a)
            u_new = u * (1.0 - a) + a * (idx_arange == j).astype(dtype)
            return (u_new, v_inv_new), None

        (u, _), _ = jax.lax.scan(inner_step, (u, v_inv), top_idx)
        return u, None

    u, _ = jax.lax.scan(outer_step, u, None, length=n_outer)

    c = jnp.sum(points * u[:, None], axis=0)
    xc = (points - c) * dim_mask.astype(dtype)
    cov = jnp.einsum('n,ni,nj->ij', u, xc, xc)
    cov = _fix_dropped_dims(cov, dim_mask)
    a_mat = inv_psd(cov)
    maha = jnp.einsum('ni,ij,nj->n', xc, a_mat, xc)
    scale = jnp.max(jnp.where(point_mask, maha, 0.0))
    scale = jnp.maximum(scale, 1e-30)
    a_mat = _fix_dropped_dims(a_mat / scale, dim_mask)
    a_inv = _fix_dropped_dims(cov * scale, dim_mask)

    # Map back out of the standardized frame (x = mu + s * y).
    c = mu + s * c * dim_mask.astype(dtype)
    a_mat = _fix_dropped_dims(a_mat / jnp.outer(s, s), dim_mask)
    a_inv = _fix_dropped_dims(a_inv * jnp.outer(s, s), dim_mask)
    return c, a_mat, a_inv


def ellipsoid_frame(a_inv, dim_mask, enlarge_per_dim):
    """Compute the Cholesky frame of an (enlarged) ellipsoid.

    Returns B with B B^T = A^-1 * enlarge^2 (identity on dropped dims) and its
    inverse. Mirrors reference: nautilus/bounds/basic.py:306-309.
    """
    e2 = jnp.asarray(enlarge_per_dim, a_inv.dtype) ** 2
    a_inv = _fix_dropped_dims(a_inv * e2, dim_mask)
    b = safe_cholesky(a_inv)
    d = a_inv.shape[-1]
    b_inv = jax.scipy.linalg.solve_triangular(
        b, jnp.eye(d, dtype=a_inv.dtype), lower=True)
    b = _fix_dropped_dims(b, dim_mask)
    b_inv = _fix_dropped_dims(b_inv, dim_mask)
    return b, b_inv


def ellipsoid_log_v(b, dim_mask):
    """Natural log volume of the ellipsoid with Cholesky frame ``b``.

    log |det B| + log V_ball(d_eff); dropped dims contribute log(1) = 0.
    Mirrors reference: nautilus/bounds/basic.py:383-394.
    """
    d_eff = jnp.sum(dim_mask).astype(b.dtype)
    diag = jnp.abs(jnp.diag(b))
    log_det = jnp.sum(jnp.where(dim_mask, jnp.log(diag), 0.0))
    log_ball = 0.5 * d_eff * jnp.log(jnp.pi) - gammaln(0.5 * d_eff + 1.0)
    return log_det + log_ball


def slogdet_masked(m, dim_mask):
    """Log |det| of the active block of a masked PSD matrix."""
    chol = safe_cholesky(_fix_dropped_dims(m, dim_mask))
    diag = jnp.abs(jnp.diag(chol))
    return 2.0 * jnp.sum(jnp.where(dim_mask, jnp.log(diag), 0.0))
