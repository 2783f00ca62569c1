"""Analytic benchmark likelihoods with known evidences.

The model families exercised by the reference's docs and tests (correlated
Gaussians, Neal's funnel, Rosenbrock, eggbox, Gaussian shells and mixtures;
reference: docs/guides/quickstart.rst, tests/test_sampler.py,
tests/test_bounds.py), written as vectorized jittable JAX functions over
``(batch, n_dim)`` parameter blocks so they run fused with the sampler's
device pipeline.
"""

import numpy as np
import jax.numpy as jnp
from scipy.special import logsumexp


class LogLikelihood:
    """A vectorized jittable log-likelihood with optional analytic logZ.

    ``fn`` maps physical parameters of shape (..., n_dim) to log-likelihood
    of shape (...). ``log_z`` is the analytic evidence over the given
    uniform prior box, if known.
    """

    def __init__(self, fn, n_dim, box=(0.0, 1.0), log_z=None, name=''):
        self.fn = fn
        self.n_dim = n_dim
        self.box = box
        self.log_z = log_z
        self.name = name

    def __call__(self, x):
        return self.fn(x)


def correlated_gaussian(n_dim=3, rho=0.9, sigma=0.1, center=0.5):
    """Correlated multivariate Gaussian inside the unit box.

    Matches the reference quickstart model (reference:
    docs/guides/quickstart.rst): covariance sigma^2 * ((1-rho) I + rho J).
    """
    cov = sigma ** 2 * ((1 - rho) * np.eye(n_dim) +
                        rho * np.ones((n_dim, n_dim)))
    cov_inv = np.linalg.inv(cov)
    log_norm = -0.5 * (n_dim * np.log(2 * np.pi) +
                       np.linalg.slogdet(cov)[1])
    cov_inv_j = jnp.asarray(cov_inv, jnp.float32)

    def fn(x):
        xc = x - center
        maha = jnp.einsum('...i,ij,...j->...', xc, cov_inv_j, xc)
        return log_norm - 0.5 * maha

    # Evidence over the unit box: the Gaussian mass is essentially fully
    # contained, so logZ = log(1) + 0 = 0... but nautilus convention is
    # logZ = log integral of L over the unit-box prior = ~0 for a
    # normalized Gaussian fully inside the box.
    return LogLikelihood(fn, n_dim, log_z=0.0,
                         name='gaussian_{}d'.format(n_dim))


def gaussian_mixture(n_dim=2, separation=0.3, sigma=0.02, weights=(0.5, 0.5)):
    """Two well-separated Gaussian modes inside the unit box."""
    c1 = 0.5 - separation / 2
    c2 = 0.5 + separation / 2
    log_norm = -0.5 * n_dim * np.log(2 * np.pi * sigma ** 2)
    w = np.log(np.asarray(weights) / np.sum(weights))

    def fn(x):
        d1 = jnp.sum((x - c1) ** 2, axis=-1)
        d2 = jnp.sum((x - c2) ** 2, axis=-1)
        l1 = log_norm - 0.5 * d1 / sigma ** 2 + w[0]
        l2 = log_norm - 0.5 * d2 / sigma ** 2 + w[1]
        return jnp.logaddexp(l1, l2)

    return LogLikelihood(fn, n_dim, log_z=0.0,
                         name='gaussian_mixture_{}d'.format(n_dim))


def funnel(n_dim=10, scale=0.1):
    """Neal's funnel mapped into the unit box.

    x0 sets the log-width of the remaining dims:
    v = (x0 - 0.5) / scale ~ coordinate; others ~ N(0, exp(v)).
    Evidence computed by brute-force MC by the caller/tests.
    """

    def fn(x):
        v = (x[..., 0] - 0.5) * 20.0
        rest = (x[..., 1:] - 0.5) * 20.0
        log_p_v = -0.5 * v ** 2 / 9.0 - 0.5 * np.log(2 * np.pi * 9.0)
        sig2 = jnp.exp(v)
        log_p_rest = jnp.sum(
            -0.5 * rest ** 2 / sig2[..., None] -
            0.5 * (jnp.log(2 * jnp.pi) + v)[..., None], axis=-1)
        return log_p_v + log_p_rest

    # logZ over the unit box: the full funnel density integrates to 1 over
    # R^n; restricted to the box and including the Jacobian 20^n of the
    # affine map, logZ = n * log(1/20) relative... use MC truth in tests.
    return LogLikelihood(fn, n_dim, log_z=None,
                         name='funnel_{}d'.format(n_dim))


def rosenbrock(n_dim=10, a=1.0, b=100.0, half_width=5.0):
    """Rosenbrock density mapped into the unit box of half-width 5."""

    def fn(x):
        t = (x - 0.5) * 2 * half_width
        return -jnp.sum(
            b * (t[..., 1:] - t[..., :-1] ** 2) ** 2 +
            (a - t[..., :-1]) ** 2, axis=-1)

    return LogLikelihood(fn, n_dim, log_z=None,
                         name='rosenbrock_{}d'.format(n_dim))


def eggbox(n_dim=2, scale=5.0):
    """Eggbox likelihood: many equal modes (tests multimodal handling)."""

    def fn(x):
        t = x * 10.0 * jnp.pi
        return (2.0 + jnp.prod(jnp.cos(t / 2.0), axis=-1)) ** scale

    return LogLikelihood(fn, n_dim, log_z=None,
                         name='eggbox_{}d'.format(n_dim))


def gaussian_shell(n_dim=2, radius=0.2, width=0.02, center=0.5):
    """Thin Gaussian shell (reference: tests/test_bounds.py fixtures)."""

    def fn(x):
        r = jnp.sqrt(jnp.sum((x - center) ** 2, axis=-1))
        return -0.5 * (r - radius) ** 2 / width ** 2

    return LogLikelihood(fn, n_dim, log_z=None,
                         name='shell_{}d'.format(n_dim))


def mc_log_z(model, n=2 ** 22, seed=0):
    """Brute-force MC estimate of logZ over the unit box (host, float64)."""
    rng = np.random.default_rng(seed)
    total = None
    chunks = []
    for _ in range(max(n // 2 ** 18, 1)):
        x = rng.random((2 ** 18, model.n_dim))
        chunks.append(np.asarray(model.fn(jnp.asarray(x)), np.float64))
    log_l = np.concatenate(chunks)
    return logsumexp(log_l) - np.log(len(log_l))
