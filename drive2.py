import os; os.environ['JAX_PLATFORMS']='cpu'
import numpy as np, jax.numpy as jnp
from nautilus_tpu import Prior, Sampler
from nautilus_tpu.utils import prewarm
def likelihood(x):
    return -0.5*jnp.sum(((x-0.5)/0.01)**2, axis=-1) - np.log(2*np.pi*0.01**2)
prior = Prior(); prior.add_parameter('a'); prior.add_parameter('b')
s = Sampler(prior, likelihood, n_live=500, n_networks=2, seed=3, vectorized='jax')
ok = s.run(n_eff=2000)
print('success', ok, 'logZ', s.log_z, 'n_like', s.n_like)
print('prewarm stats:', prewarm.stats, 'pending:', prewarm.pending())
assert ok and abs(s.log_z) < 0.05
