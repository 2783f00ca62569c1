"""Membership-sweep compaction microbenchmark (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from nautilus_tpu.ops import geometry as G
from nautilus_tpu.ops.neural_stack import NeuralStack
from nautilus_tpu.ops.shell_stack import BoundStack, sample_shell_batch

D, B, K, M, E, CHUNK = 50, 64, 16, 1, 4, 2048
SIZES = (D, 100, 50, 20, 1)


def make_stack(rng):
    eye = np.broadcast_to(np.eye(D, dtype=np.float32) * 0.2, (B, K, D, D))
    ell = G.EllParams(
        c=np.full((B, K, D), 0.5, np.float32),
        B=jnp.asarray(eye), B_inv=jnp.asarray(eye / 0.04),
        dim_mask=jnp.ones((B, K, D), bool),
        dim_cube=jnp.zeros((B, K, D), bool),
        log_v=jnp.full((B, K), -1.0, jnp.float32))
    nell = G.EllParams(
        c=jnp.full((B, M, D), 0.5, jnp.float32),
        B=jnp.asarray(eye[:, :M]), B_inv=jnp.asarray(eye[:, :M] / 0.04),
        dim_mask=jnp.ones((B, M, D), bool),
        dim_cube=jnp.zeros((B, M, D), bool),
        log_v=jnp.full((B, M), -1.0, jnp.float32))
    weights = tuple(jnp.asarray(rng.normal(
        size=(B, M, E, SIZES[k], SIZES[k + 1])) * 0.1, jnp.float32)
        for k in range(len(SIZES) - 1))
    biases = tuple(jnp.zeros((B, M, E, SIZES[k + 1]), jnp.float32)
                   for k in range(len(SIZES) - 1))
    neural = NeuralStack(
        ell=nell, mean=jnp.full((B, M, D), 0.5, jnp.float32),
        scale=jnp.full((B, M, D), 0.1, jnp.float32), weights=weights,
        biases=biases, cut=jnp.full((B, M), -1e30, jnp.float32),
        has_net=jnp.ones((B, M), bool), mode_mask=jnp.ones((B, M), bool))
    return BoundStack(outer=ell, outer_mask=jnp.ones((B, K), bool),
                      neural=neural, shift=jnp.zeros((B, D), jnp.float32),
                      bound_mask=jnp.ones(B, bool))


def main():
    rng = np.random.default_rng(0)
    stack = make_stack(rng)
    idx = jnp.asarray(3, jnp.int32)

    for compact in (None, 256):
        @partial(jax.jit, static_argnames=('k',))
        def run(stack, idx, key, k=10):
            def body(i, c):
                out = sample_shell_batch(
                    stack, idx, jax.random.fold_in(key, i), CHUNK,
                    compact=compact)
                return c + jnp.sum(out[3].astype(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.asarray(0, jnp.int32))

        int(run(stack, idx, jax.random.PRNGKey(0), k=1))
        int(run(stack, idx, jax.random.PRNGKey(0), k=21))
        t0 = time.perf_counter()
        out = int(run(stack, idx, jax.random.PRNGKey(1), k=21))
        t21 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(run(stack, idx, jax.random.PRNGKey(1), k=1))
        t1 = time.perf_counter() - t0
        per = (t21 - t1) / 20
        print(f"compact={compact}: {per*1e3:.2f} ms per {CHUNK}-chunk "
              f"({per/CHUNK*1e6:.2f} us/cand)  accepts={out}")


if __name__ == '__main__':
    main()
