"""JAX-native inverse-CDF (percent-point) transforms for common priors.

The reference maps unit-cube coordinates to physical space through each
prior distribution's inverse survival function, ``dist.isf(1 - u)``
(reference: nautilus/prior.py:117) — a host-side scipy call. Here the same
map is built as a pure, jittable function so it fuses into the device
likelihood program: the common scipy families get closed-form or
fixed-iteration inverse CDFs on device, and anything unrecognized falls
back to a host callback (``jax.experimental.io_callback``) that evaluates
the frozen distribution's ``isf`` without leaving the jitted program.

All ppf kernels are branch-free with static iteration counts, so one
executable serves every batch size bucket.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import io_callback
from jax.scipy.special import betainc, gammainc, ndtr, ndtri


def uniform_ppf(u, loc, scale):
    return loc + scale * u


def loguniform_ppf(u, a, b):
    return a * jnp.exp(u * jnp.log(b / a))


def norm_ppf(u, loc, scale):
    return loc + scale * ndtri(u)


def truncnorm_ppf(u, a, b, loc, scale):
    """Standard-interval parameters ``a, b`` as scipy defines them."""
    fa = ndtr(a)
    fb = ndtr(b)
    return loc + scale * ndtri(fa + u * (fb - fa))


def expon_ppf(u, loc, scale):
    return loc - scale * jnp.log1p(-u)


def cauchy_ppf(u, loc, scale):
    return loc + scale * jnp.tan(jnp.pi * (u - 0.5))


def laplace_ppf(u, loc, scale):
    return loc - scale * jnp.sign(u - 0.5) * jnp.log1p(-2.0 * jnp.abs(
        u - 0.5))


def _bisect_ppf(cdf, u, lo, hi, n_iter=70):
    """Invert a monotone CDF by fixed-count bisection — branch-free,
    fully vectorized, ~2^-70 interval accuracy."""

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        below = cdf(mid) < u
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo = jnp.broadcast_to(lo, u.shape).astype(u.dtype)
    hi = jnp.broadcast_to(hi, u.shape).astype(u.dtype)
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return 0.5 * (lo + hi)


def gamma_ppf(u, a, loc, scale):
    """Gamma ppf by bisection on the regularized incomplete gamma CDF.

    The search bracket [0, a + 40*sqrt(a) + 40] covers the mass of every
    shape parameter the unit cube can reach at f32/f64 resolution.
    """
    hi = a + 40.0 * jnp.sqrt(a) + 40.0
    x = _bisect_ppf(lambda x: gammainc(a, x), u, 0.0, hi)
    return loc + scale * x


def beta_ppf(u, a, b, loc, scale):
    x = _bisect_ppf(lambda x: betainc(a, b, x), u, 0.0, 1.0)
    return loc + scale * x


def _dist_family(dist):
    """(family name, shape args, loc, scale) of a scipy frozen dist."""
    name = getattr(getattr(dist, 'dist', None), 'name', None)
    if name is None:
        return None
    shapes = tuple(float(s) for s in dist.args)
    loc = float(dist.kwds.get('loc', 0.0))
    scale = float(dist.kwds.get('scale', 1.0))
    # Positional loc/scale trail the shape parameters.
    n_shapes = dist.dist.numargs
    extra = shapes[n_shapes:]
    shapes = shapes[:n_shapes]
    if len(extra) > 0 and 'loc' not in dist.kwds:
        loc = extra[0]
    if len(extra) > 1 and 'scale' not in dist.kwds:
        scale = extra[1]
    return name, shapes, loc, scale


def make_dim_transform(dist):
    """A jittable ``u -> physical`` map for one frozen scipy distribution,
    or None when the family has no device kernel."""
    info = _dist_family(dist)
    if info is None:
        return None
    name, shapes, loc, scale = info

    if name == 'uniform':
        return lambda u: uniform_ppf(u, loc, scale)
    if name == 'loguniform' and len(shapes) == 2:
        a, b = shapes
        return lambda u: loguniform_ppf(u, a, b)
    if name == 'norm':
        return lambda u: norm_ppf(u, loc, scale)
    if name == 'truncnorm' and len(shapes) == 2:
        a, b = shapes
        return lambda u: truncnorm_ppf(u, a, b, loc, scale)
    if name == 'expon':
        return lambda u: expon_ppf(u, loc, scale)
    if name == 'cauchy':
        return lambda u: cauchy_ppf(u, loc, scale)
    if name == 'laplace':
        return lambda u: laplace_ppf(u, loc, scale)
    if name == 'gamma' and len(shapes) == 1:
        a, = shapes
        return lambda u: gamma_ppf(u, a, loc, scale)
    if name == 'beta' and len(shapes) == 2:
        a, b = shapes
        return lambda u: beta_ppf(u, a, b, loc, scale)
    return None


def make_tabulated_ppf(dist, n_grid=4096):
    """Device ppf for an arbitrary frozen distribution via a tabulated
    monotone (PCHIP) interpolant.

    The reference supports any object with an ``isf`` by calling it on
    host (reference: nautilus/prior.py:117); the fused device path cannot.
    Instead of a host callback — unsupported on some PJRT transports
    (e.g. tunneled TPU proxies) — the ``isf`` is evaluated ONCE at
    transform-build time on a normal-quantile-spaced grid, and a monotone
    cubic interpolant of the table runs on device, fusing into the
    likelihood program like any native kernel.

    Accuracy: the grid is uniform in z = Phi^-1(p) over [-5.5, 5.5]
    (denser toward the tails exactly where the ppf steepens; the range
    covers every u an f32 unit-cube draw can produce — the largest f32
    below 1 maps to z ~ 5.3); with the default 4096 knots the
    interpolation error of smooth scipy families is below 1e-6 relative.
    Breakpoints are rounded to f32 and deduplicated so the device-side
    ``searchsorted`` bins exactly match the table.
    """
    from scipy.interpolate import PchipInterpolator
    from scipy.stats import norm as _norm

    z = np.linspace(-5.5, 5.5, n_grid)
    p = _norm.cdf(z)
    # Exact-f32 strictly-increasing breakpoints (u arrives as f32).
    p = np.unique(p.astype(np.float32).astype(np.float64))
    p = p[(p > 0.0) & (p < 1.0)]
    x = dist.isf(1.0 - p)
    finite = np.isfinite(x)
    p, x = p[finite], x[finite]
    interp = PchipInterpolator(p, x)

    knots = jnp.asarray(interp.x, jnp.float32)
    # Coefficients stay float64->float32 per piece: (n-1, 4), highest
    # degree first, local in t = u - knot[i].
    coefs = jnp.asarray(interp.c.T, jnp.float32)

    def fn(u):
        uc = jnp.clip(u.astype(jnp.float32), knots[0], knots[-1])
        idx = jnp.clip(
            jnp.searchsorted(knots, uc, side='right') - 1,
            0, knots.shape[0] - 2)
        t = uc - knots[idx]
        c = coefs[idx]
        return ((c[..., 0] * t + c[..., 1]) * t + c[..., 2]) * t \
            + c[..., 3]

    return fn


def make_host_callback_transform(dists):
    """``io_callback`` escape hatch: evaluate exotic ``isf`` priors on host
    inside the jitted program. Column ``i`` of the result is
    ``dists[i].isf(1 - u[..., i])``; recognized families should be handled
    on device instead (see :func:`make_dim_transform`).

    Backend note: host callbacks require PJRT host send/recv support; on
    backends without it (e.g. tunneled TPU proxies) exotic families must
    use the host evaluation path (``vectorized=True/False``) instead —
    the sampler surfaces the backend's UNIMPLEMENTED error at trace time.
    """

    def host_isf(u):
        u = np.asarray(u, np.float64)
        out = np.empty_like(u)
        for i, dist in enumerate(dists):
            out[..., i] = dist.isf(1.0 - u[..., i])
        return out.astype(np.float32)

    def transform(u):
        return io_callback(
            host_isf, jax.ShapeDtypeStruct(u.shape, jnp.float32), u,
            ordered=False)

    return transform


def make_prior_transform(dists):
    """Jittable unit-cube -> physical transform for a list of free frozen
    distributions (one per dimension).

    Device kernels serve every recognized family; unrecognized families
    (anything with an ``isf``, reference: nautilus/prior.py:117) run on
    device through tabulated monotone interpolants of their ``isf`` (see
    :func:`make_tabulated_ppf`) — no host callback in the compiled
    program, so the fused path works on every backend. Setting
    ``NAUTILUS_TPU_ISF_CALLBACK=1`` restores the exact ``io_callback``
    escape hatch on backends that support host callbacks. Returns a
    function mapping ``(..., d)`` unit coordinates to physical
    coordinates.
    """
    import os
    use_callback = os.environ.get('NAUTILUS_TPU_ISF_CALLBACK', '') == '1'

    dim_fns = [make_dim_transform(dist) for dist in dists]
    host_dims = [i for i, fn in enumerate(dim_fns) if fn is None]

    if use_callback:
        if len(host_dims) == len(dists) and len(dists) > 0:
            return make_host_callback_transform(dists)
        host_fn = None
        if host_dims:
            host_fn = make_host_callback_transform(
                [dists[i] for i in host_dims])
            host_cols = jnp.asarray(host_dims)

        def transform(u):
            cols = []
            for i, fn in enumerate(dim_fns):
                if fn is not None:
                    cols.append(fn(u[..., i]))
                else:
                    cols.append(jnp.zeros_like(u[..., i]))
            out = jnp.stack(cols, axis=-1)
            if host_fn is not None:
                host_vals = host_fn(u[..., host_cols])
                out = out.at[..., host_cols].set(host_vals)
            return out

        return transform

    for i in host_dims:
        dim_fns[i] = make_tabulated_ppf(dists[i])

    def transform(u):
        return jnp.stack(
            [fn(u[..., i]) for i, fn in enumerate(dim_fns)], axis=-1)

    return transform
