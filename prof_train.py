"""Microbenchmark the d=50 ensemble trainer on the real chip (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from nautilus_tpu.ops.mlp import train_mlp_ensemble

D = 50
N_PAD = 4096
SIZES = (D, 100, 50, 20, 1)


def make_data(seed=0, n_valid=3500):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N_PAD, D)).astype(np.float32)
    # target: smooth radial function, like a log-likelihood rank score
    y = (-np.sum(x ** 2, axis=1) / D).astype(np.float32)
    mask = np.arange(N_PAD) < n_valid
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)


def main():
    x, y, mask = make_data()
    key = jax.random.PRNGKey(0)

    f = jax.jit(lambda x, y, m, k: train_mlp_ensemble(
        x, y, m, k, SIZES, n_networks=4, batch_size=200))
    p, n_ep = f(x, y, mask, key)
    n_ep = np.asarray(n_ep)
    t0 = time.perf_counter()
    p, n_ep2 = f(x, y, mask, jax.random.PRNGKey(1))
    n_ep2 = np.asarray(n_ep2)  # forces completion via fetch
    t = time.perf_counter() - t0
    print(f"train d={D} n_pad={N_PAD}: {t:.2f} s, epochs={n_ep2}")
    t0 = time.perf_counter()
    p, n_ep3 = f(x, y, mask, jax.random.PRNGKey(2))
    n_ep3 = np.asarray(n_ep3)
    t = time.perf_counter() - t0
    print(f"train repeat: {t:.2f} s, epochs={n_ep3}")


if __name__ == '__main__':
    main()
