"""Fused Pallas training-epoch kernel vs the autodiff reference.

The kernel ships opt-in (see ops/mlp.py _pallas_trainer_enabled for the
measured XLA-parity result); this test keeps its hand-written backward
pass and Adam update pinned to the scan path's semantics via interpret
mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nautilus_tpu.ops.mlp import (MLPParams, _adam_update, init_mlp,
                                  mlp_forward)
from nautilus_tpu.ops import pallas_kernels as pk


@pytest.mark.skipif(not pk.HAS_PALLAS, reason='pallas unavailable')
def test_train_epoch_matches_autodiff():
    E, B, S, d = 2, 3, 8, 4
    sizes = (d, 5, 1)
    lr, alpha = 1e-2, 0.01
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(E, B, S, d)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(E, B, S, 1)), jnp.float32)
    ms = jnp.asarray(rng.uniform(size=(E, B, S, 1)) > 0.3, jnp.float32)
    params = jax.vmap(lambda k: init_mlp(k, sizes))(
        jax.random.split(jax.random.PRNGKey(0), E))
    m0 = jax.tree.map(jnp.zeros_like, params)
    v0 = jax.tree.map(jnp.zeros_like, params)
    t0 = jnp.zeros((E, 1), jnp.int32)

    L = len(params.weights)
    pf, mf, vf = [], [], []
    for k in range(L):
        pf += [params.weights[k], params.biases[k]]
        mf += [m0.weights[k], m0.biases[k]]
        vf += [v0.weights[k], v0.biases[k]]
    npf, _, _, nt, loss_sum = pk.train_epoch_pallas(
        xs, ys, ms, pf, mf, vf, t0, lr, alpha, interpret=True)

    def ref_one(e):
        p = jax.tree.map(lambda a: a[e], params)
        m = jax.tree.map(lambda a: a[e], m0)
        v = jax.tree.map(lambda a: a[e], v0)
        t, ls = 0, 0.0
        for b in range(B):
            xb, yb, mb = xs[e, b], ys[e, b, :, 0], ms[e, b, :, 0]

            def batch_loss(p):
                pred = mlp_forward(p, xb)
                sq = (pred - yb) ** 2 * mb
                l2 = sum(jnp.sum(w ** 2) for w in p.weights)
                return (0.5 * jnp.sum(sq) + 0.5 * alpha * l2) / \
                    jnp.maximum(jnp.sum(mb), 1.0)

            loss, g = jax.value_and_grad(batch_loss)(p)
            t += 1
            p, m, v = _adam_update(p, g, m, v, t, lr)
            ls += loss * jnp.sum(mb)
        return p, ls

    for e in range(E):
        p_ref, ls_ref = ref_one(e)
        p_ker = MLPParams(tuple(a[e] for a in npf[0::2]),
                          tuple(a[e] for a in npf[1::2]))
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_ker)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=0)
        assert int(nt[e, 0]) == B
        np.testing.assert_allclose(float(loss_sum[e, 0]), float(ls_ref),
                                   rtol=1e-5)
