"""Phase-level wall-time profile of a sampler run (dev tool)."""

import cProfile
import io
import os
import pstats
import sys
import time

if '--tpu' not in sys.argv:
    os.environ['JAX_PLATFORMS'] = 'cpu'

import numpy as np
import jax
import jax.numpy as jnp

if '--tpu' not in sys.argv:
    jax.config.update('jax_platforms', 'cpu')

from nautilus_tpu import Prior, Sampler

n_dim = 3
cov = 0.01 * (0.1 * np.eye(n_dim) + 0.9 * np.ones((n_dim, n_dim)))
cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
log_norm = float(-0.5 * (n_dim * np.log(2 * np.pi) +
                         np.linalg.slogdet(cov)[1]))


def likelihood(x):
    xc = x - 0.5
    return log_norm - 0.5 * jnp.einsum('...i,ij,...j->...', xc, cov_inv, xc)


prior = Prior()
for key in 'abc':
    prior.add_parameter(key)

n_live = int(sys.argv[sys.argv.index('--n-live') + 1]) \
    if '--n-live' in sys.argv else 1000
n_eff = int(sys.argv[sys.argv.index('--n-eff') + 1]) \
    if '--n-eff' in sys.argv else 10000

sampler = Sampler(prior, likelihood, n_live=n_live, seed=0,
                  vectorized='jax')

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
success = sampler.run(n_eff=n_eff)
pr.disable()
elapsed = time.time() - t0
print('success={} logZ={:.4f} n_like={} elapsed={:.1f}s platform={}'.format(
    success, sampler.log_z, sampler.n_like, elapsed,
    jax.devices()[0].platform))

s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats('cumulative')
ps.print_stats(35)
print(s.getvalue())
