"""cProfile of the 50-D headline run on the real chip (dev tool)."""
import cProfile
import io
import os
import pstats
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.models import analytic

model = analytic.correlated_gaussian(n_dim=50, rho=0.2, sigma=0.15)
prior = Prior()
for i in range(model.n_dim):
    prior.add_parameter('x_{}'.format(i))
sampler = Sampler(prior, model.fn, n_live=3000, seed=0, n_networks=4,
                  vectorized='jax', n_batch=500)
pr = cProfile.Profile()
t0 = time.time()
pr.enable()
success = sampler.run(n_eff=3000)
pr.disable()
elapsed = time.time() - t0
print('success={} logZ={:+.4f} n_like={} elapsed={:.1f}s timing={}'.format(
    success, sampler.log_z, sampler.n_like, elapsed,
    {k: round(v, 1) for k, v in sampler.timing.items()}))

s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats('cumulative')
ps.print_stats(45)
print(s.getvalue())

from nautilus_tpu.utils import prof
if prof.ENABLED:
    print(prof.report())
