"""Headline benchmark: time-to-logZ on the 3D correlated Gaussian.

The reference's quickstart problem (reference: docs/guides/quickstart.rst):
3D correlated Gaussian, n_live=1000, run to the default n_eff=10000.
Prints ONE JSON line with the steady-state wall time (the headline
metric, comparable across rounds) plus the cold fresh-process time with
NOTHING excluded — link establishment, executable compile/load, and the
run itself.

Baseline: johannesulf/nautilus (pure Python/sklearn) on the same host CPU,
same problem, n_live=1000, seed 0, vectorized likelihood:
20.49 s wall, 18700 likelihood calls, logZ=-0.003, n_eff=10012
(measured 2026-08-17 via /root/reference). The reference figure is a cold
single-run time, so `cold_vs_baseline` is the apples-to-apples
comparison; `vs_baseline` (steady state) is what repeat runs in one
process see.
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')

t_process_start = time.time()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from nautilus_tpu import Prior, Sampler  # noqa: E402
from nautilus_tpu.utils.fetch import warmup_seconds  # noqa: E402

REFERENCE_SECONDS = 20.49


def make_problem():
    n_dim = 3
    cov = 0.01 * (0.1 * np.eye(n_dim) + 0.9 * np.ones((n_dim, n_dim)))
    cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    log_norm = float(-0.5 * (n_dim * np.log(2 * np.pi) +
                             np.linalg.slogdet(cov)[1]))

    def likelihood(x):
        xc = x - 0.5
        return log_norm - 0.5 * jnp.einsum(
            '...i,ij,...j->...', xc, cov_inv, xc)

    prior = Prior()
    for key in 'abc':
        prior.add_parameter(key)
    return prior, likelihood


def one_run(prior, likelihood, seed, mesh=None):
    # Default n_batch (= n_live on the device path): one fused batch per
    # exploration cycle, the latency-minimal host loop on remote TPU links.
    sampler = Sampler(prior, likelihood, n_live=1000, seed=seed,
                      vectorized='jax', mesh=mesh)
    t_start = time.time()
    success = sampler.run()
    return sampler, success, time.time() - t_start


def main():
    prior, likelihood = make_problem()

    # COLD: fresh process, nothing excluded. Sampler.__init__ starts the
    # device-link warmup on a daemon thread (utils/fetch.py) so the
    # one-time first-copy stall overlaps tracing and executable loading;
    # everything else — cache loads, compiles, the full run — is inside
    # the timed region, measured from process start.
    sampler, success_cold, _ = one_run(prior, likelihood, seed=0)
    cold = time.time() - t_process_start
    print('cold (fresh process, nothing excluded): {:.1f}s '
          'success={} logZ={:.4f} timing={}'.format(
              cold, success_cold, sampler.log_z,
              {k: round(v, 1) for k, v in sampler.timing.items()}),
          file=sys.stderr)

    # STEADY STATE: identical configuration in the same process reuses
    # every loaded executable through the compiled-callable cache.
    sampler, success, elapsed = one_run(prior, likelihood, seed=0)
    print('steady: success={} logZ={:.4f} n_eff={:.0f} n_like={} '
          'evals_per_sec={:.0f} platform={} timing={}'.format(
              success, sampler.log_z, sampler.n_eff, sampler.n_like,
              sampler.n_like / elapsed, jax.devices()[0].platform,
              {k: round(v, 1) for k, v in sampler.timing.items()}),
          file=sys.stderr)

    # MESH-OVERHEAD GUARD: the same configuration on an explicit 1-device
    # mesh. The GSPMD sharding annotations must be free on one chip
    # (overhead <= ~5%); a regression here would silently tax every
    # multi-chip run. First mesh run warms the mesh-variant executables,
    # the second is the measured one.
    mesh1_s = mesh1_overhead = None
    if '--no-mesh1' not in sys.argv:
        from nautilus_tpu.parallel import make_mesh
        mesh = make_mesh(1)
        one_run(prior, likelihood, seed=0, mesh=mesh)
        sampler_m, success_m, mesh1_s = one_run(
            prior, likelihood, seed=0, mesh=mesh)
        mesh1_overhead = mesh1_s / elapsed - 1.0
        print('mesh1: success={} logZ={:.4f} {:.2f}s '
              '(overhead {:+.1%} vs mesh=None)'.format(
                  success_m, sampler_m.log_z, mesh1_s, mesh1_overhead),
              file=sys.stderr)

    link = warmup_seconds()
    print(json.dumps({
        'metric': 'time_to_logz_3d_gaussian_nlive1000_neff10k',
        'value': round(elapsed, 2),
        'unit': 's',
        'vs_baseline': round(REFERENCE_SECONDS / elapsed, 3),
        'cold_s': round(cold, 2),
        'cold_vs_baseline': round(REFERENCE_SECONDS / cold, 3),
        # Environmental component of cold: the tunnel's one-time
        # device->host connection stall (30-200 s observed on this
        # link), overlapped with compilation but unavoidable.
        'link_stall_s': None if link is None else round(link, 2),
        # 1-device-mesh steady run: sharding-annotation overhead guard
        # (must stay ~0; see VERDICT r4 item 5).
        'mesh1_s': None if mesh1_s is None else round(mesh1_s, 2),
        'mesh1_overhead': (None if mesh1_overhead is None
                           else round(mesh1_overhead, 3)),
    }))


if __name__ == '__main__':
    main()
