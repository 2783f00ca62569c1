import os, time, cProfile, pstats, io
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
T0 = time.time()
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from nautilus_tpu import Prior, Sampler
n_dim=3
cov = 0.01*(0.1*np.eye(n_dim)+0.9*np.ones((n_dim,n_dim)))
cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
log_norm = float(-0.5*(n_dim*np.log(2*np.pi)+np.linalg.slogdet(cov)[1]))
def likelihood(x):
    xc = x-0.5
    return log_norm - 0.5*jnp.einsum('...i,ij,...j->...', xc, cov_inv, xc)
prior=Prior()
for k in 'abc': prior.add_parameter(k)
pr = cProfile.Profile()
pr.enable()
sampler=Sampler(prior, likelihood, n_live=1000, seed=0, vectorized='jax')
ok=sampler.run()
pr.disable()
print('cold total {:.1f}s timing {}'.format(time.time()-T0,
      {k: round(v,2) for k,v in sampler.timing.items()}))
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats('tottime').print_stats(25)
print(s.getvalue())
