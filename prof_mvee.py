"""Microbenchmark the d=50 MVEE on the real chip (profiling harness).

block_until_ready on this tunneled backend returns before the computation
finishes, so timings chain K iterations inside one jitted fori_loop and end
with a scalar fetch; per-iteration cost = (t_K - t_1) / (K - 1).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from nautilus_tpu.ops.linalg import mvee

D = 50


def chained(k):
    @jax.jit
    def run(pts, pm, dm):
        def body(i, p):
            c, a, ai = mvee(p, pm, dm)
            # feed a tiny function of the output back in so XLA can't
            # dead-code or hoist the iterations
            return p + 1e-12 * c[None, :]
        p = jax.lax.fori_loop(0, k, body, pts)
        return jnp.sum(p[0])
    return run


def timeit(fn, *args, n=3):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for n in (16384, 32768):
        pts = rng.normal(size=(n, D)) * rng.uniform(0.5, 2.0, size=D)
        pts = jnp.asarray(pts, jnp.float32)
        pm = jnp.ones(n, bool)
        dm = jnp.ones(D, bool)
        t1 = timeit(chained(1), pts, pm, dm)
        t9 = timeit(chained(9), pts, pm, dm)
        per = (t9 - t1) / 8.0
        print(f"mvee n={n} d={D}: {per*1e3:.1f} ms/call "
              f"(t1={t1*1e3:.0f} ms, t9={t9*1e3:.0f} ms)")


if __name__ == '__main__':
    main()
