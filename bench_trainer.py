import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
from nautilus_tpu.ops.mlp import train_mlp_ensemble

def bench(d, n_pad, n_valid, max_epochs):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_pad, d)).astype(np.float32)
    y = (-np.sum(x**2, axis=1)/d + 0.1*rng.normal(size=n_pad)).astype(np.float32)
    mask = np.arange(n_pad) < n_valid
    sizes = (d, 100, 50, 20, 1)
    f = jax.jit(lambda x,y,m,k: train_mlp_ensemble(x,y,m,k,sizes,n_networks=4,batch_size=200,max_epochs=max_epochs,n_iter_no_change=10000))
    xj,yj,mj = jnp.asarray(x),jnp.asarray(y),jnp.asarray(mask)
    p,ep = f(xj,yj,mj,jax.random.PRNGKey(0)); np.asarray(ep)
    ts=[]
    for i in range(3):
        t0=time.perf_counter(); p,ep=f(xj,yj,mj,jax.random.PRNGKey(i)); ep=np.asarray(ep)
        ts.append(time.perf_counter()-t0)
    w0 = float(np.asarray(jax.tree.leaves(p)[0]).ravel()[0])
    mode = os.environ.get('NAUTILUS_TPU_PALLAS_TRAINER', 'default')
    print(f"d={d} n_pad={n_pad} trainer={mode}: {min(ts)/max_epochs*1e3:.2f} ms/epoch (w0={w0:+.5f})")

bench(3, 4096, 4000, 100)
bench(50, 16384, 14000, 100)
