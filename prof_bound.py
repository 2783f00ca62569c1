"""Microbenchmark bound-construction kernels at 50-D shapes (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import nautilus_tpu.bounds.nautilus as NB
from nautilus_tpu.ops import geometry as G
from nautilus_tpu.bounds.basic import ucem_greedy_params
from nautilus_tpu.bounds.union import _gmm_labels
from nautilus_tpu.bounds.neural import _batched_build_jit, _mode_sel_jit, \
    _compact_sel_jit
from nautilus_tpu.utils.keys import KeyStream

D = 50


def timed(label, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    # force full completion via a host fetch of one leaf
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.0f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    for n in (8192, 16384):
        pts = 0.5 + 0.1 * rng.normal(size=(n, D))
        pts = jnp.asarray(np.clip(pts, 0, 1), jnp.float32)
        log_l = jnp.asarray(-np.sum((np.asarray(pts) - 0.5) ** 2, axis=1),
                            jnp.float32)
        valid = jnp.ones(n, bool)
        above = valid & (log_l >= jnp.median(log_l))
        dm = jnp.ones(D, bool)
        key = jax.random.PRNGKey(0)

        print(f"--- n={n} d={D}")
        fit = jax.jit(lambda p, m: G.fit_ellipsoid(p, m, dm))
        p_mode = timed('fit_ellipsoid(root)', fit, pts, above)
        gmm = jax.jit(lambda pm, p, a, k: _gmm_labels(pm, p, a, k, D + 1))
        timed('gmm_labels', gmm, p_mode, pts, above, key)
        ucem = jax.jit(lambda p, a: ucem_greedy_params(p, a, 1.1))
        timed('ucem_greedy', ucem, pts, above)
        prologue = jax.jit(lambda p, l, v: NB._bound_prologue_jit(
            p, l, v, jnp.median(l), key, key, 1.1, D + 1))
        timed('full_prologue', prologue, pts, log_l, valid)

        # fused neural builder at bucket size n (1 mode, 4 nets)
        keys = KeyStream()
        ell1 = jax.tree.map(lambda a: a[None], p_mode)
        mode_mask = np.ones(1, bool)
        sel, n_sel = _mode_sel_jit(pts, valid, ell1, jnp.asarray(mode_mask))
        print('n_sel =', int(np.asarray(n_sel)))
        pts_c, log_l_c, above_c, valid_c = _compact_sel_jit(
            pts, log_l, above, sel, n)
        sizes = (D, 100, 50, 20, 1)

        def build(p, l, a, v, k):
            return _batched_build_jit(
                p, l, a, v, ell1, jnp.asarray(mode_mask), k[None],
                sizes=sizes, n_networks=4, batch_size=200, max_epochs=3000,
                n_iter_no_change=10, lr=1e-2, alpha=0.0,
                enlarge_per_dim=1.1)
        timed('batched_build', build, pts_c, log_l_c, above_c, valid_c, key)


if __name__ == '__main__':
    main()
