import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
T0 = time.time()
def mark(s): print('{:6.2f}s {}'.format(time.time()-T0, s), flush=True)
import numpy as np; mark('numpy')
import jax; mark('jax import')
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from nautilus_tpu import Prior, Sampler; mark('nautilus import')
from jax._src import compiler as _c
LOADS=[]
_orig=_c._cache_read
def _lr(name,*a,**k):
    t0=time.time(); out=_orig(name,*a,**k); LOADS.append((time.time()-T0, time.time()-t0, name)); return out
_c._cache_read=_lr
n_dim=3
cov = 0.01*(0.1*np.eye(n_dim)+0.9*np.ones((n_dim,n_dim)))
cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
log_norm = float(-0.5*(n_dim*np.log(2*np.pi)+np.linalg.slogdet(cov)[1]))
def likelihood(x):
    xc = x-0.5
    return log_norm - 0.5*jnp.einsum('...i,ij,...j->...', xc, cov_inv, xc)
prior=Prior()
for k in 'abc': prior.add_parameter(k)
sampler=Sampler(prior, likelihood, n_live=1000, seed=0, vectorized='jax'); mark('Sampler ctor')
ok=sampler.run(); mark('run done')
print('timing', {k: round(v,2) for k,v in sampler.timing.items()})
from nautilus_tpu.utils.fetch import warmup_seconds
print('link stall', warmup_seconds())
tot=sum(d for _,d,_ in LOADS)
print('foreground+bg loads: n={} total={:.1f}s'.format(len(LOADS), tot))
for t,d,n in LOADS:
    if d>0.2: print('  {:6.2f}s +{:.2f}s {}'.format(t,d,n))
