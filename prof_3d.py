"""Steady-state 3-D bound-phase sub-profile (dev tool)."""
import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
os.environ['NAUTILUS_TPU_PROF'] = '1'
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
from nautilus_tpu import Prior, Sampler
from nautilus_tpu.utils import prof
n_dim=3
cov = 0.01*(0.1*np.eye(n_dim)+0.9*np.ones((n_dim,n_dim)))
cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
log_norm = float(-0.5*(n_dim*np.log(2*np.pi)+np.linalg.slogdet(cov)[1]))
def likelihood(x):
    xc = x-0.5
    return log_norm - 0.5*jnp.einsum('...i,ij,...j->...', xc, cov_inv, xc)
prior=Prior()
for k in 'abc': prior.add_parameter(k)
for trial in range(2):
    prof.PROF.clear()
    s=Sampler(prior, likelihood, n_live=1000, seed=0, vectorized='jax')
    t0=time.time(); ok=s.run(); el=time.time()-t0
    print('run {}: {:.2f}s timing {}'.format(trial, el,
          {k: round(v,2) for k,v in s.timing.items()}))
print(prof.report())
