"""50-D batched-Gaussian headline metric (tracked as BENCH50D_r{N}.json).

The regime BASELINE.md names as the "expensive batched astrophysical
likelihood" target: 50 dimensions, wide candidate batches keeping the MXU
busy, ~47 nats of posterior compression. Prints ONE JSON line with
time-to-logZ, evals/sec/chip, and the accuracy check against the
4e6-draw MC truth (see validate.py config 6).

Reference anchor: johannesulf/nautilus on this host CPU needs ~13.5x the
wall time at matched settings (VALIDATION.md, round 3).
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')

t_process_start = time.time()

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from nautilus_tpu import Prior, Sampler  # noqa: E402
from nautilus_tpu.models import analytic  # noqa: E402

LOG_Z_TRUE = -0.04037  # 4e6-draw MC truth (box clips ~4% at sigma=0.15)


def main():
    model = analytic.correlated_gaussian(n_dim=50, rho=0.2, sigma=0.15)
    prior = Prior()
    for i in range(model.n_dim):
        prior.add_parameter('x_{}'.format(i))
    # n_batch=500 matches the validation config (and round-3 numbers);
    # measured: larger batches (n_batch=n_live) collect ~8% more
    # likelihood calls without reducing wall time on this problem.
    sampler = Sampler(prior, model.fn, n_live=3000, seed=0, n_networks=4,
                      vectorized='jax', n_batch=500)
    t0 = time.time()
    success = sampler.run(n_eff=3000)
    elapsed = time.time() - t0
    err = float(sampler.log_z - LOG_Z_TRUE)

    print('success={} logZ={:+.4f} err={:+.4f} n_like={} timing={}'.format(
        success, sampler.log_z, err, sampler.n_like,
        {k: round(v, 1) for k, v in sampler.timing.items()}),
        file=sys.stderr)
    print(json.dumps({
        'metric': 'time_to_logz_50d_gaussian_nlive3000_neff3k',
        'value': round(elapsed, 2),
        'unit': 's',
        'evals_per_sec': round(sampler.n_like / elapsed, 1),
        'n_like': int(sampler.n_like),
        'log_z_err': round(err, 4),
        'accuracy_ok': bool(success and abs(err) < 0.3),
        'cold_s': round(time.time() - t_process_start, 2),
        'platform': jax.devices()[0].platform,
    }))


if __name__ == '__main__':
    main()
