import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
T0 = time.time()
import numpy as np
import jax
import time as _t
from jax._src import compiler as _compiler
LOADS=[]; COMPILES=[]
_orig_read = _compiler._cache_read
def _lr(name,*a,**k):
    t0=_t.time(); out=_orig_read(name,*a,**k); LOADS.append((round(_t.time()-T0,1), round(_t.time()-t0,2), name)); return out
_compiler._cache_read = _lr
_orig_c = _compiler.backend_compile_and_load
def _lc(*a,**k):
    t0=_t.time(); out=_orig_c(*a,**k); COMPILES.append((round(_t.time()-T0,1), round(_t.time()-t0,2))); return out
_compiler.backend_compile_and_load = _lc
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
print('pre-import {:.1f}s'.format(time.time()-T0), flush=True)
from nautilus_tpu import Prior, Sampler
print('import {:.1f}s'.format(time.time()-T0), flush=True)
import sys
if '--nopreload' in sys.argv:
    Sampler._preload_async = lambda self: None
n_dim=3
cov = 0.01*(0.1*np.eye(n_dim)+0.9*np.ones((n_dim,n_dim)))
cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
log_norm = float(-0.5*(n_dim*np.log(2*np.pi)+np.linalg.slogdet(cov)[1]))
def likelihood(x):
    xc = x-0.5
    return log_norm - 0.5*jnp.einsum('...i,ij,...j->...', xc, cov_inv, xc)
prior=Prior()
for k in 'abc': prior.add_parameter(k)
print('pre-ctor {:.1f}s'.format(time.time()-T0), flush=True)
sampler=Sampler(prior, likelihood, n_live=1000, seed=0, vectorized='jax')
print('ctor {:.1f}s'.format(time.time()-T0), flush=True)
ok=sampler.run()
print('cold total {:.1f}s timing {}'.format(time.time()-T0,
      {k: round(v,2) for k,v in sampler.timing.items()}))
from nautilus_tpu.utils import warmstore, prewarm
print('warmstore', warmstore.stats, 'prewarm', prewarm.stats)

print('loads n={} {:.1f}s'.format(len(LOADS), sum(d for _,d,_ in LOADS)))
print('compiles n={} {:.1f}s'.format(len(COMPILES), sum(d for _,d in COMPILES)))
for t,d,n in LOADS:
    if d>0.2: print('  load', t, d, n)
for t,d in COMPILES:
    if d>0.5: print('  compile', t, d)
