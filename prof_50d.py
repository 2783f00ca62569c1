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

# Track persistent-cache loads and fresh compiles (dev-only private-API
# monkeypatch; best-effort).
LOADS, COMPILES, READS = [], [], []
try:
    from jax._src import compilation_cache as _cc
    _orig_get = _cc.get_executable_and_time

    def _logged_get(*a, **k):
        t0 = time.time()
        out = _orig_get(*a, **k)
        LOADS.append((t0 - t_run0, time.time() - t0))
        return out
    _cc.get_executable_and_time = _logged_get
    from jax._src import compiler as _compiler
    _orig_read = _compiler._cache_read

    def _logged_read(module_name, *a, **k):
        t0 = time.time()
        out = _orig_read(module_name, *a, **k)
        READS.append((t0 - t_run0, time.time() - t0, module_name))
        return out
    _compiler._cache_read = _logged_read
    _orig_compile = _compiler.backend_compile_and_load

    def _logged_compile(*a, **k):
        t0 = time.time()
        out = _orig_compile(*a, **k)
        COMPILES.append((t0 - t_run0, time.time() - t0))
        return out
    _compiler.backend_compile_and_load = _logged_compile
except Exception as e:
    print('cache instrumentation failed:', e)

t_run0 = time.time()

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.models import analytic

model = analytic.correlated_gaussian(n_dim=50, rho=0.2, sigma=0.15)
prior = Prior()
for i in range(model.n_dim):
    prior.add_parameter('x_{}'.format(i))
sampler = Sampler(prior, model.fn, n_live=3000, seed=0, n_networks=4,
                  vectorized='jax', n_batch=500)
CPROF = os.environ.get('PROF_CPROFILE') == '1'
pr = cProfile.Profile()
t0 = time.time()
if CPROF:
    pr.enable()
success = sampler.run(n_eff=3000)
if CPROF:
    pr.disable()
elapsed = time.time() - t0
print('success={} logZ={:+.4f} n_like={} elapsed={:.1f}s timing={}'.format(
    success, sampler.log_z, sampler.n_like, elapsed,
    {k: round(v, 1) for k, v in sampler.timing.items()}))

if CPROF:
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats('cumulative')
    ps.print_stats(45)
    print(s.getvalue())

from nautilus_tpu.utils import prof
if prof.ENABLED:
    print(prof.report())
from nautilus_tpu.utils import prewarm
print('prewarm:', prewarm.stats, 'pending:', prewarm.pending())
print('cache loads: n={} total={:.1f}s'.format(
    len(LOADS), sum(d for _, d in LOADS)))
print('fresh compiles: n={} total={:.1f}s'.format(
    len(COMPILES), sum(d for _, d in COMPILES)))
for t0, dt, name in READS:
    if dt > 0.05:
        print('  load {:6.1f}s +{:.2f}s {}'.format(t0, dt, name))
import collections
hist = collections.Counter(int(t // 30) * 30 for t, _ in LOADS)
print('load starts by 30s window:', dict(sorted(hist.items())))
