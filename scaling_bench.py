"""Scaling-efficiency harness: likelihood evals/s at 1 vs N mesh devices.

Runs the same sampler configuration on a single device and on an N-device
mesh (the whole phase pipeline shards its candidate axis; see
Sampler(mesh=...)) and reports the evals/s ratio against the >=80%
BASELINE target. On one real chip, ``--virtual N`` exercises the code
path on a host-platform mesh (no true speedup — the virtual devices share
one CPU — but the identical program is what a pod slice would run); on a
real multi-chip slice, run without flags for a true measurement, after
``nautilus_tpu.parallel.init_distributed()`` on every host.

Usage: python scaling_bench.py [--virtual N] [--n-live N] [--n-eff N]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')

parser = argparse.ArgumentParser()
parser.add_argument('--virtual', type=int, default=0,
                    help='force an N-device virtual CPU mesh')
parser.add_argument('--n-live', type=int, default=1000)
parser.add_argument('--n-eff', type=int, default=10000)
args = parser.parse_args()

if args.virtual:
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count={}'.format(
                args.virtual)).strip()

import numpy as np
import jax
import jax.numpy as jnp

if args.virtual:
    jax.config.update('jax_platforms', 'cpu')
else:
    # Persistent cache only off-CPU: XLA:CPU AOT deserialization is
    # unreliable across CPU-feature variations (see tests/conftest.py).
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from nautilus_tpu import Prior, Sampler, warmup  # noqa: E402
from nautilus_tpu.parallel import make_mesh  # noqa: E402


def one_run(mesh, seed):
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
    sampler = Sampler(prior, likelihood, n_live=args.n_live, seed=seed,
                      vectorized='jax', mesh=mesh)
    t0 = time.time()
    sampler.run(n_eff=args.n_eff)
    dt = time.time() - t0
    return sampler.n_like / dt, sampler.log_z, dt


def main():
    n_dev = len(jax.devices())
    warmup(wait=True)
    # Untimed warmups load the executables for both configurations.
    one_run(None, seed=1)
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        one_run(mesh, seed=1)

    rate_1, log_z_1, dt_1 = one_run(None, seed=0)
    if mesh is not None:
        rate_n, log_z_n, dt_n = one_run(mesh, seed=0)
    else:
        rate_n, log_z_n, dt_n = rate_1, log_z_1, dt_1

    efficiency = rate_n / (rate_1 * max(n_dev, 1))
    out = {
        'metric': 'scaling_efficiency_evals_per_sec',
        'n_devices': n_dev,
        'evals_per_sec_1dev': round(rate_1, 1),
        'evals_per_sec_mesh': round(rate_n, 1),
        'efficiency_vs_linear': round(efficiency, 3),
        'speedup': round(rate_n / rate_1, 3),
        'log_z_match': bool(abs(log_z_1 - log_z_n) < 0.01),
        'platform': jax.devices()[0].platform,
    }
    if args.virtual:
        out['note'] = (
            'virtual CPU mesh ({} devices sharing {} host cores): records '
            'sharded-path health for regression tracking, not hardware '
            'scaling; bitwise mesh-invariance of the sample stream is '
            'asserted in tests/test_parallel.py'.format(
                n_dev, os.cpu_count()))
    print(json.dumps(out))


if __name__ == '__main__':
    sys.exit(main())
