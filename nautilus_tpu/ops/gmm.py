"""Two-component Gaussian mixture fit for bound splitting.

TPU-native replacement for the reference's use of
``sklearn.mixture.GaussianMixture(n_components=2, n_init=10)`` (reference:
nautilus/bounds/union.py:185-190): a fixed-iteration k-means++ seeded EM,
vmapped over restarts, on masked fixed-shape point arrays. Only what the
splitter needs is returned: per-point posterior log-probabilities (including
mixture weights) of the best restart.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _mvn_logpdf(points, mean, cov_chol):
    """Multivariate normal logpdf given a Cholesky factor of the covariance."""
    d = points.shape[-1]
    xc = points - mean
    y = jax.scipy.linalg.solve_triangular(cov_chol, xc.T, lower=True).T
    maha = jnp.sum(y ** 2, axis=-1)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diag(cov_chol)))
    return -0.5 * (maha + d * jnp.log(2.0 * jnp.pi) + log_det)


def _estimate(points, mask, resp, reg):
    """M-step: weights, means, covariance Cholesky factors from resp."""
    d = points.shape[-1]
    w = resp * mask[:, None].astype(points.dtype)          # (n, 2)
    nk = jnp.sum(w, axis=0) + 1e-10                        # (2,)
    means = (w.T @ points) / nk[:, None]                   # (2, d)

    def cov_k(wk, mk):
        xc = (points - mk) * jnp.sqrt(wk)[:, None]
        cov = (xc.T @ xc) / (jnp.sum(wk) + 1e-10)
        return cov + reg * jnp.eye(d, dtype=points.dtype)

    covs = jax.vmap(cov_k)(w.T, means)
    chols = jnp.linalg.cholesky(covs)
    weights = nk / jnp.sum(nk)
    return weights, means, chols


def _e_step(points, mask, weights, means, chols):
    log_p = jnp.stack([
        _mvn_logpdf(points, means[k], chols[k]) + jnp.log(weights[k])
        for k in range(2)], axis=1)                        # (n, 2)
    log_norm = jax.scipy.special.logsumexp(log_p, axis=1, keepdims=True)
    log_resp = log_p - log_norm
    ll = jnp.sum(jnp.where(mask, log_norm[:, 0], 0.0)) / jnp.sum(mask)
    return log_p, log_resp, ll


@partial(jax.jit, static_argnames=('n_init', 'n_kmeans', 'n_em'))
def fit_gmm2(points, mask, key, n_init=10, n_kmeans=10, n_em=50, reg=1e-6):
    """Fit a 2-component full-covariance GMM to masked points.

    Returns ``log_p`` of shape (n, 2): per-point joint log-probability
    (logpdf + log weight) under each component of the best restart, matching
    what the reference splitter thresholds on (reference:
    nautilus/bounds/union.py:188-197).
    """
    n, d = points.shape
    dtype = points.dtype
    mask_f = mask.astype(dtype)

    def single_init(init_key):
        k1, k2 = jax.random.split(init_key)
        # k-means++ seeding: first center uniform over valid points, second
        # with probability proportional to squared distance.
        logits0 = jnp.where(mask, 0.0, -jnp.inf)
        i0 = jax.random.categorical(k1, logits0)
        c0 = points[i0]
        d2 = jnp.sum((points - c0) ** 2, axis=1)
        logits1 = jnp.where(mask, jnp.log(d2 + 1e-20), -jnp.inf)
        i1 = jax.random.categorical(k2, logits1)
        centers = jnp.stack([c0, points[i1]])

        def kmeans_step(centers, _):
            d2 = jnp.sum(
                (points[:, None, :] - centers[None]) ** 2, axis=-1)
            assign = jnp.argmin(d2, axis=1)
            resp = jax.nn.one_hot(assign, 2, dtype=dtype) * mask_f[:, None]
            nk = jnp.sum(resp, axis=0) + 1e-10
            centers = (resp.T @ points) / nk[:, None]
            return centers, None

        centers, _ = jax.lax.scan(
            kmeans_step, centers, None, length=n_kmeans)

        d2 = jnp.sum((points[:, None, :] - centers[None]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)
        resp = jax.nn.one_hot(assign, 2, dtype=dtype)

        def em_step(resp, _):
            weights, means, chols = _estimate(points, mask, resp, reg)
            _, log_resp, ll = _e_step(points, mask, weights, means, chols)
            return jnp.exp(log_resp), ll

        resp, lls = jax.lax.scan(em_step, resp, None, length=n_em)
        weights, means, chols = _estimate(points, mask, resp, reg)
        log_p, _, ll = _e_step(points, mask, weights, means, chols)
        return log_p, ll

    log_ps, lls = jax.vmap(single_init)(jax.random.split(key, n_init))
    best = jnp.argmax(lls)
    return log_ps[best]
