"""Validation harness: the five BASELINE configs with accuracy gates.

Runs the sampler end-to-end on each family from BASELINE.md ("Targets for
the new TPU-native framework") and checks logZ against analytic or
quadrature/MC truth. Prints one line per config plus a JSON summary.

Usage: python validate.py [--cpu] [--quick]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')

import numpy as np
from scipy.special import logsumexp
from scipy.stats import norm
from scipy.integrate import quad

parser = argparse.ArgumentParser()
parser.add_argument('--cpu', action='store_true')
parser.add_argument('--quick', action='store_true')
parser.add_argument('--eggbox', action='store_true')
args = parser.parse_args()

if args.cpu:
    os.environ['JAX_PLATFORMS'] = 'cpu'

import jax
import jax.numpy as jnp

if args.cpu:
    jax.config.update('jax_platforms', 'cpu')
else:
    # Persistent cache only off-CPU: XLA:CPU AOT deserialization is
    # unreliable across CPU-feature variations (see tests/conftest.py).
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.models import analytic


def run_config(name, model, n_live, n_eff, log_z_true, atol, n_networks=4):
    prior = Prior()
    for i in range(model.n_dim):
        prior.add_parameter('x_{}'.format(i))
    sampler = Sampler(prior, model.fn, n_live=n_live, seed=0,
                      n_networks=n_networks, vectorized='jax', n_batch=500)
    t0 = time.time()
    success = sampler.run(n_eff=n_eff)
    elapsed = time.time() - t0
    err = sampler.log_z - log_z_true
    ok = bool(success and abs(err) < atol)
    print('{:28s} logZ={:+.4f} truth={:+.4f} err={:+.4f} (atol {:.3f}) '
          'n_like={:6d} n_eff={:6.0f} {:6.1f}s {}'.format(
              name, sampler.log_z, log_z_true, err, atol, sampler.n_like,
              sampler.n_eff, elapsed, 'PASS' if ok else 'FAIL'),
          flush=True)
    return dict(name=name, log_z=float(sampler.log_z),
                log_z_true=float(log_z_true), atol=atol,
                n_like=int(sampler.n_like), seconds=round(elapsed, 1),
                passed=ok)


def funnel_log_z_truth(n_dim):
    """Semi-analytic funnel evidence over the unit box.

    The model maps the box to y in (-10, 10)^n with p(y) = N(y0; 0, 9) *
    prod N(y_i; 0, exp(y0)); Z = E_box[L] = (1/20^n) * P(y in box), with
    P = int N(v;0,9) [Phi(10/s)-Phi(-10/s)]^(n-1) dv, s = exp(v/2),
    restricted to v in (-10, 10). The model's own fn includes the density
    normalization, and the 20^n Jacobian cancels: E_box[L] = P... computed
    directly below against the model's conventions.
    """
    def integrand(v):
        s = np.exp(v / 2.0)
        p_rest = (norm.cdf(10.0 / s) - norm.cdf(-10.0 / s)) ** (n_dim - 1)
        return norm.pdf(v, scale=3.0) * p_rest

    p, _ = quad(integrand, -10, 10, limit=200)
    # E_box[L] = (1/20^n) * integral of the density over (-10, 10)^n.
    return np.log(p) - n_dim * np.log(20.0)


def mc_truth(model, n=2 ** 23, seed=1):
    rng = np.random.default_rng(seed)
    chunks = []
    for _ in range(n // 2 ** 19):
        x = rng.random((2 ** 19, model.n_dim))
        chunks.append(np.asarray(model.fn(jnp.asarray(x, jnp.float32)),
                                 np.float64))
    log_l = np.concatenate(chunks)
    return logsumexp(log_l) - np.log(len(log_l))


def main():
    quick = args.quick
    results = []

    # 1. 3D correlated Gaussian (the quickstart problem).
    m = analytic.correlated_gaussian(n_dim=3)
    results.append(run_config(
        '3d_correlated_gaussian', m, 1000, 5000 if quick else 10000,
        0.0, 0.05))

    # 2. 10D correlated Gaussian.
    m = analytic.correlated_gaussian(n_dim=10, rho=0.5, sigma=0.05)
    results.append(run_config(
        '10d_correlated_gaussian', m, 1500, 5000, 0.0, 0.1))

    # 3. Rosenbrock (heavy tails). Uniform-box MC truth is useless here
    # (ESS ~ 20 at 8M draws), so the anchor is the reference nautilus
    # itself at MATCHED settings — the BASELINE target is agreement with
    # it, and on this geometry the logZ estimate is strongly
    # n_live-dependent in both implementations (reference at 10d gives
    # -39.99 with n_live=3000 but -43.21 with the n_live=1500 used here;
    # measured 2026-08-21, seed=0, vectorized=True, n_eff=5000).
    rosenbrock_truth = {4: -15.1035, 10: -43.2107}
    m = analytic.rosenbrock(n_dim=4 if quick else 10)
    results.append(run_config(
        'rosenbrock_{}d'.format(m.n_dim), m, 1500, 5000,
        rosenbrock_truth[m.n_dim], 0.3))

    # 4. 10D Neal's funnel (semi-analytic truth).
    n_f = 4 if quick else 10
    m = analytic.funnel(n_dim=n_f)
    results.append(run_config(
        'funnel_{}d'.format(n_f), m, 2000, 5000,
        funnel_log_z_truth(n_f), 0.2))

    # 5a. 2D Gaussian mixture (multimodal).
    m = analytic.gaussian_mixture(n_dim=2)
    results.append(run_config(
        'gaussian_mixture_2d', m, 1000, 5000, 0.0, 0.05))

    # 5b. 16D two-mode Gaussian mixture (multimodal, high-d).
    if not quick:
        m = analytic.gaussian_mixture(n_dim=16, separation=0.4, sigma=0.04)
        results.append(run_config(
            'gaussian_mixture_16d', m, 2000, 5000, 0.0, 0.15))

    # 5c. 2D eggbox: 25 sharp modes with a ~243-nat likelihood range.
    # Expensive (the reference needs ~18 min CPU; logZ 235.8276 at
    # n_live=2000, n_eff=1e4, seed=0). Opt in with --eggbox.
    if args.eggbox:
        m = analytic.eggbox(n_dim=2)
        results.append(run_config('eggbox_2d', m, 2000, 5000, 235.8276,
                                  0.5))

    # 6. 50D batched Gaussian: the "expensive vectorized likelihood"
    # regime — wide batches keep the MXU busy. sigma=0.15 keeps the
    # posterior-to-prior compression at ~47 nats (~35 bound iterations);
    # sharper posteriors scale the run linearly in compression (a 50-D
    # sigma=0.03 run needs ~130 nats, ~100 bounds, and ~6e5 evaluations
    # in the reference too).
    if not quick:
        # Truth: logZ = log P_N(box) = -0.04037(10), from 4e6 draws of the
        # exact Gaussian (the box clips ~4% of the mass at sigma=0.15).
        m = analytic.correlated_gaussian(n_dim=50, rho=0.2, sigma=0.15)
        results.append(run_config(
            '50d_gaussian', m, 3000, 3000, -0.04037, 0.3, n_networks=4))

    print(json.dumps({
        'passed': sum(r['passed'] for r in results),
        'total': len(results),
        'results': results}))
    return 0 if all(r['passed'] for r in results) else 1


if __name__ == '__main__':
    sys.exit(main())
