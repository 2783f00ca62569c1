"""On-device MLP ensemble training for the likelihood-rank emulator.

TPU-native replacement of the reference's sklearn ``MLPRegressor`` ensemble
(reference: nautilus/neural.py). The whole ensemble trains simultaneously in
one compiled program: network parameters carry a leading ensemble axis and
every optimizer step is vmapped over it, turning ``n_networks`` sequential
sklearn fits into batched matmuls on the MXU.

Training semantics mirror sklearn's defaults so the emulator's statistical
behavior matches the reference gates (RMSE / bound purity): ReLU hidden
layers, linear output, squared-error/2 loss, Adam (lr 1e-2), minibatches of
min(200, n), per-epoch shuffling, and early stopping after 10 epochs without
strict improvement of the epoch loss (reference: nautilus/neural.py:79-81).
"""

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _pallas_trainer_enabled():
    """Opt-in (``NAUTILUS_TPU_PALLAS_TRAINER=1``): run epochs through the
    fused Pallas kernel (ops/pallas_kernels.py train_epoch_pallas).

    Measured on the benchmark TPU (ROADMAP.md "trainer"): the kernel
    exactly matches the XLA scan path (0.72 vs 0.70 ms/epoch at the
    quickstart shapes, 2.05 vs 2.02 at the 50-D shapes) — the epoch is
    bound by ~240 serially-dependent small-matmul issue latencies, not
    by HBM traffic or per-op overhead, so keeping weights resident in
    VMEM buys nothing. The XLA path stays default; the kernel remains as
    the measured probe and an alternative backend."""
    if os.environ.get('NAUTILUS_TPU_PALLAS_TRAINER', '') != '1':
        return False
    if jax.default_backend() != 'tpu':
        return False
    from . import pallas_kernels
    return pallas_kernels.HAS_PALLAS


class MLPParams(NamedTuple):
    weights: tuple
    biases: tuple


def init_mlp(key, sizes, dtype=jnp.float32):
    """Glorot-uniform initialization (matches sklearn's for ReLU nets)."""
    weights = []
    biases = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        fan_in, fan_out = sizes[i], sizes[i + 1]
        bound = jnp.sqrt(6.0 / (fan_in + fan_out))
        kw, kb = jax.random.split(k)
        weights.append(jax.random.uniform(
            kw, (fan_in, fan_out), dtype, -bound, bound))
        biases.append(jax.random.uniform(
            kb, (fan_out,), dtype, -bound, bound))
    return MLPParams(tuple(weights), tuple(biases))


def mlp_forward(params, x):
    """Forward pass: ReLU hidden layers, linear scalar output."""
    h = x
    n_layers = len(params.weights)
    for i in range(n_layers - 1):
        h = jax.nn.relu(h @ params.weights[i] + params.biases[i])
    out = h @ params.weights[-1] + params.biases[-1]
    return out[..., 0]


def mlp_forward_scoring(params, x):
    """Forward pass for membership *scoring*: bf16 matmuls on TPU.

    The neural bound is a region definition: any deterministic membership
    function used consistently for sampling, shell rejection, and volume
    estimation yields an unbiased evidence estimate — precision only moves
    the region boundary slightly (sampling efficiency, not correctness).
    On the MXU, bf16 inputs with float32 accumulation cut the dominant
    per-candidate cost of the bound-stack membership matrix by ~2-4x.
    Training and calibration keep full float32 (:func:`mlp_forward`).
    """
    if jax.default_backend() != 'tpu':
        return mlp_forward(params, x)
    h = x.astype(jnp.bfloat16)
    n_layers = len(params.weights)
    for i in range(n_layers - 1):
        h = jnp.dot(h, params.weights[i].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + params.biases[i]
        h = jax.nn.relu(h).astype(jnp.bfloat16)
    out = jnp.dot(h, params.weights[-1].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + params.biases[-1]
    return out[..., 0]


def ensemble_predict(params, x):
    """Mean prediction over the ensemble axis.

    ``params`` leaves have a leading ensemble axis. Mirrors reference:
    nautilus/neural.py:100-116 (standardization is applied by the caller).
    """
    preds = jax.vmap(mlp_forward, in_axes=(0, None))(params, x)
    return jnp.mean(preds, axis=0)


def _adam_update(params, grads, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    lr_t = lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
    m = jax.tree.map(lambda a, g: b1 * a + (1 - b1) * g, m, grads)
    v = jax.tree.map(lambda a, g: b2 * a + (1 - b2) * g ** 2, v, grads)
    params = jax.tree.map(
        lambda p, mi, vi: p - lr_t * mi / (jnp.sqrt(vi) + eps),
        params, m, v)
    return params, m, v


@partial(jax.jit,
         static_argnames=('sizes', 'n_networks', 'batch_size', 'max_epochs',
                          'n_iter_no_change'))
def train_mlp_ensemble(x, y, mask, key, sizes, n_networks=4, batch_size=200,
                       lr=1e-2, max_epochs=3000, n_iter_no_change=10,
                       alpha=0.0):
    """Train an ensemble of MLP regressors on masked data.

    Parameters
    ----------
    x : (n_pad, d) standardized inputs (padded rows arbitrary).
    y : (n_pad,) targets.
    mask : (n_pad,) validity mask.
    key : PRNG key; split per network for init and shuffling.
    sizes : tuple, full layer sizes (d, *hidden, 1).

    Returns
    -------
    params : MLPParams with leading ensemble axis.
    n_epochs : (n_networks,) epochs actually run per network.
    """
    n_pad, d = x.shape
    dtype = x.dtype
    n_batches = max(n_pad // batch_size, 1)
    n_valid = jnp.sum(mask.astype(dtype))

    net_keys = jax.random.split(key, n_networks)
    params = jax.vmap(lambda k: init_mlp(k, sizes, dtype))(net_keys)
    m0 = jax.tree.map(jnp.zeros_like, params)
    v0 = jax.tree.map(jnp.zeros_like, params)

    def batch_loss(p, xb, yb, mb):
        pred = mlp_forward(p, xb)
        sq = (pred - yb) ** 2 * mb
        # sklearn-style L2 penalty on the weight matrices (not biases):
        # alpha/2 * ||W||^2 / n_samples (reference: nautilus/neural.py:80,
        # default alpha=0).
        l2 = sum(jnp.sum(w ** 2) for w in p.weights)
        return (0.5 * jnp.sum(sq) + 0.5 * alpha * l2) / \
            jnp.maximum(jnp.sum(mb), 1.0)

    grad_fn = jax.value_and_grad(batch_loss)

    def epoch_one_net(p, m, v, t, ekey):
        perm = jax.random.permutation(ekey, n_pad)
        xs = x[perm][:n_batches * batch_size].reshape(
            n_batches, batch_size, d)
        ys = y[perm][:n_batches * batch_size].reshape(n_batches, batch_size)
        ms = mask[perm][:n_batches * batch_size].reshape(
            n_batches, batch_size).astype(dtype)

        def step(carry, batch):
            p, m, v, t, loss_sum = carry
            xb, yb, mb = batch
            loss, grads = grad_fn(p, xb, yb, mb)
            t = t + 1
            p, m, v = _adam_update(p, grads, m, v, t, lr)
            loss_sum = loss_sum + loss * jnp.sum(mb)
            return (p, m, v, t, loss_sum), None

        (p, m, v, t, loss_sum), _ = jax.lax.scan(
            step, (p, m, v, t, jnp.asarray(0.0, dtype)), (xs, ys, ms))
        # Average sample loss over the epoch (matches sklearn's loss_curve_).
        epoch_loss = loss_sum / jnp.maximum(n_valid, 1.0)
        return p, m, v, t, epoch_loss

    use_pallas = _pallas_trainer_enabled()
    if use_pallas:
        from .pallas_kernels import train_epoch_pallas

    def pallas_epoch(params, m, v, t, epoch_keys):
        """Whole-ensemble epoch through the fused kernel; identical
        batch/update semantics to ``epoch_one_net``."""
        def prep(k):
            perm = jax.random.permutation(k, n_pad)
            cut = n_batches * batch_size
            return (x[perm][:cut].reshape(n_batches, batch_size, d),
                    y[perm][:cut].reshape(n_batches, batch_size, 1),
                    mask[perm][:cut].reshape(
                        n_batches, batch_size, 1).astype(dtype))
        xs, ys, ms_b = jax.vmap(prep)(epoch_keys)
        n_layers = len(params.weights)
        pf, mf, vf = [], [], []
        for k in range(n_layers):
            pf += [params.weights[k], params.biases[k]]
            mf += [m.weights[k], m.biases[k]]
            vf += [v.weights[k], v.biases[k]]
        npf, nmf, nvf, nt, loss_sum = train_epoch_pallas(
            xs, ys, ms_b, pf, mf, vf, t.reshape(n_networks, 1),
            lr, alpha)
        unflat = lambda f: MLPParams(tuple(f[0::2]), tuple(f[1::2]))
        losses = loss_sum.reshape(n_networks) / jnp.maximum(n_valid, 1.0)
        return (unflat(npf), unflat(nmf), unflat(nvf),
                nt.reshape(n_networks), losses)

    def cond(state):
        _, _, _, _, _, _, done, epoch, _ = state
        return jnp.logical_and(epoch < max_epochs, ~jnp.all(done))

    def body(state):
        params, m, v, t, best, no_improve, done, epoch, ekey = state
        ekey, sub = jax.random.split(ekey)
        epoch_keys = jax.random.split(sub, n_networks)
        if use_pallas:
            new_params, new_m, new_v, new_t, losses = pallas_epoch(
                params, m, v, t, epoch_keys)
        else:
            new_params, new_m, new_v, new_t, losses = jax.vmap(
                epoch_one_net)(params, m, v, t, epoch_keys)

        # Only advance networks that are not done.
        keep = lambda old, new: jax.tree.map(
            lambda o, nw: jnp.where(
                done.reshape((-1,) + (1,) * (nw.ndim - 1)), o, nw), old, new)
        params = keep(params, new_params)
        m = keep(m, new_m)
        v = keep(v, new_v)
        t = jnp.where(done, t, new_t)

        improved = losses < best
        no_improve = jnp.where(
            done, no_improve, jnp.where(improved, 0, no_improve + 1))
        best = jnp.where(done, best, jnp.minimum(best, losses))
        done = done | (no_improve > n_iter_no_change)
        return (params, m, v, t, best, no_improve, done, epoch + 1, ekey)

    t0 = jnp.zeros(n_networks, jnp.int32)
    best0 = jnp.full(n_networks, jnp.inf, dtype)
    no_improve0 = jnp.zeros(n_networks, jnp.int32)
    done0 = jnp.zeros(n_networks, bool)
    state = (params, m0, v0, t0, best0, no_improve0, done0,
             jnp.asarray(0, jnp.int32), key)
    state = jax.lax.while_loop(cond, body, state)
    params, t = state[0], state[3]
    return params, t // n_batches


@partial(jax.jit,
         static_argnames=('sizes', 'n_networks', 'batch_size', 'max_epochs',
                          'n_iter_no_change'))
def train_mlp_ensemble_packed(x, y, mask, key, sizes, n_networks=4,
                              batch_size=200, lr=1e-2, max_epochs=3000,
                              n_iter_no_change=10, alpha=0.0):
    """:func:`train_mlp_ensemble`, with all parameters flattened into one
    (n_networks, n_params) array so the host reads the trained ensemble in a
    single device->host round trip. Unpack with :func:`unflatten_params`."""
    params, n_epochs = train_mlp_ensemble(
        x, y, mask, key, sizes, n_networks=n_networks,
        batch_size=batch_size, lr=lr, max_epochs=max_epochs,
        n_iter_no_change=n_iter_no_change, alpha=alpha)
    flat = jnp.concatenate(
        [w.reshape(n_networks, -1) for w in params.weights] +
        [b.reshape(n_networks, -1) for b in params.biases], axis=1)
    return flat, n_epochs


def train_ensembles_multi(x, y, mask, keys, sizes, n_networks=4,
                          batch_size=200, lr=1e-2, max_epochs=3000,
                          n_iter_no_change=10, alpha=0.0):
    """Train one MLP ensemble per *group* — all groups, all networks, in a
    single computation (vmap over the group axis of the per-group trainer).

    The sampler uses this to train every mode's emulator of a multimodal
    bound simultaneously: where the reference loops over modes (one sklearn
    ensemble each; reference: nautilus/bounds/nautilus.py:108-114), the TPU
    build runs (n_groups x n_networks) networks as one batched program.

    Parameters
    ----------
    x : (G, n_pad, d) standardized inputs per group.
    y : (G, n_pad) targets. mask : (G, n_pad) validity.
    keys : (G,) PRNG keys.

    Returns (params with leading axes (G, E, ...), n_epochs (G, E)).
    """

    def one_group(xg, yg, mg, kg):
        return train_mlp_ensemble(
            xg, yg, mg, kg, sizes, n_networks=n_networks,
            batch_size=batch_size, lr=lr, max_epochs=max_epochs,
            n_iter_no_change=n_iter_no_change, alpha=alpha)

    return jax.vmap(one_group)(x, y, mask, keys)


@partial(jax.jit,
         static_argnames=('sizes', 'n_networks', 'batch_size', 'max_epochs',
                          'n_iter_no_change'))
def train_predict_packed(x, y, mask, key, sizes, n_networks=4,
                         batch_size=200, lr=1e-2, max_epochs=3000,
                         n_iter_no_change=10, alpha=0.0):
    """Train the ensemble AND return its mean predictions on the training
    inputs in the same dispatch (the threshold calibration needs exactly
    these; reference: nautilus/bounds/neural.py:93-95). One host fetch for
    (flat_params, predictions)."""
    params, _ = train_mlp_ensemble(
        x, y, mask, key, sizes, n_networks=n_networks,
        batch_size=batch_size, lr=lr, max_epochs=max_epochs,
        n_iter_no_change=n_iter_no_change, alpha=alpha)
    flat = jnp.concatenate(
        [w.reshape(n_networks, -1) for w in params.weights] +
        [b.reshape(n_networks, -1) for b in params.biases], axis=1)
    pred = ensemble_predict(params, x)
    return jnp.concatenate([flat.reshape(-1), pred])


def rank_scores_masked(log_l, inside, above):
    """Likelihood-rank training scores, computed on device.

    Masked re-design of the reference's rank-score construction (reference:
    nautilus/bounds/neural.py:84-88): points inside the bound and at/above
    the threshold get scores in [0.5, 1], the rest of the inside points in
    [0, 0.5], each by tie-averaged rank within its subset (scipy
    ``rankdata`` 'average' semantics via a double ``searchsorted`` on the
    masked sort). Points outside carry score 0 and must be masked out by
    the caller.
    """
    dtype = jnp.float32

    def masked_ranks(sel):
        vals = jnp.where(sel, log_l, jnp.inf)
        s = jnp.sort(vals)
        lo = jnp.searchsorted(s, log_l, side='left')
        hi = jnp.searchsorted(s, log_l, side='right')
        return (lo + hi + 1).astype(dtype) / 2.0

    sel_a = inside & above
    sel_b = inside & ~above
    n_a = jnp.maximum(jnp.sum(sel_a.astype(dtype)), 1.0)
    n_b = jnp.maximum(jnp.sum(sel_b.astype(dtype)), 1.0)
    r_a = masked_ranks(sel_a)
    r_b = masked_ranks(sel_b)
    return jnp.where(
        sel_a, 0.5 * (1.0 + (r_a - 0.5) / n_a),
        jnp.where(sel_b, 0.5 * (r_b - 0.5) / n_b, 0.0))


def calibrate_cut(score, pred, mask, above):
    """Acceptance-threshold calibration on device.

    Cubic least-squares fit of predicted vs true score over masked points,
    evaluated at the smallest above-threshold true score (reference:
    nautilus/bounds/neural.py:93-95). Solved via ridge-stabilized normal
    equations — scores live in [0, 1] so the 4x4 system is well
    conditioned in float32.
    """
    w = mask.astype(jnp.float32)
    x = jnp.where(mask, score, 0.0)
    y = jnp.where(mask, pred, 0.0)
    v = jnp.stack([jnp.ones_like(x), x, x * x, x * x * x], axis=1)
    vw = v * w[:, None]
    a = vw.T @ v + 1e-6 * jnp.eye(4, dtype=jnp.float32)
    b = vw.T @ y
    coef = jnp.linalg.solve(a, b)
    x0 = jnp.min(jnp.where(mask & above, score, jnp.inf))
    return ((coef[3] * x0 + coef[2]) * x0 + coef[1]) * x0 + coef[0]


def flatten_ensembles(params):
    """Pack multi-group ensemble params into one (G, E, P) array.

    Layout matches :func:`train_mlp_ensemble_packed` /
    :func:`unflatten_params`: all weight blocks layer by layer, then all
    bias blocks.
    """
    g, e = params.weights[0].shape[:2]
    return jnp.concatenate(
        [w.reshape(g, e, -1) for w in params.weights] +
        [b.reshape(g, e, -1) for b in params.biases], axis=2)


def unflatten_params(flat, sizes):
    """Invert the packing of :func:`train_mlp_ensemble_packed` (host side).

    Returns an MLPParams of numpy arrays with a leading ensemble axis.
    """
    import numpy as np
    flat = np.asarray(flat)
    e = flat.shape[0]
    weights = []
    biases = []
    offset = 0
    for k in range(len(sizes) - 1):
        n = sizes[k] * sizes[k + 1]
        weights.append(flat[:, offset:offset + n].reshape(
            e, sizes[k], sizes[k + 1]))
        offset += n
    for k in range(len(sizes) - 1):
        n = sizes[k + 1]
        biases.append(flat[:, offset:offset + n].reshape(e, sizes[k + 1]))
        offset += n
    return MLPParams(tuple(weights), tuple(biases))
