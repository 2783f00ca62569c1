"""Per-epoch trainer cost at quickstart and 50-D shapes (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from nautilus_tpu.ops.mlp import train_mlp_ensemble


def timeit_train(d, n_pad, n_valid, max_epochs, seed=0, n=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_pad, d)).astype(np.float32)
    y = (-np.sum(x ** 2, axis=1) / d + 0.1 * rng.normal(size=n_pad)
         ).astype(np.float32)
    mask = np.arange(n_pad) < n_valid
    sizes = (d, 100, 50, 20, 1)
    f = jax.jit(lambda x, y, m, k: train_mlp_ensemble(
        x, y, m, k, sizes, n_networks=4, batch_size=200,
        max_epochs=max_epochs, n_iter_no_change=10000))
    xj, yj, mj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)
    p, ep = f(xj, yj, mj, jax.random.PRNGKey(0))
    np.asarray(ep)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        p, ep = f(xj, yj, mj, jax.random.PRNGKey(i))
        ep = np.asarray(ep)
        ts.append(time.perf_counter() - t0)
    n_batches = max(n_pad // 200, 1)
    t = min(ts)
    print(f"d={d} n_pad={n_pad}: {max_epochs} epochs in {t*1e3:.0f} ms "
          f"-> {t/max_epochs*1e3:.2f} ms/epoch, "
          f"{t/max_epochs/n_batches*1e6:.1f} us/step  (ran {ep})")


if __name__ == '__main__':
    timeit_train(3, 4096, 4000, 100)
    timeit_train(50, 4096, 4000, 100)
    timeit_train(50, 16384, 14000, 100)
