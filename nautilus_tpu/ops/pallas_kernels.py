"""Hand-written Pallas TPU kernels for the hottest fused ops.

The sampler's single hottest computation is the neural-bound rejection
score: every candidate point runs through an ensemble of small MLPs
(reference semantics: nautilus/neural.py:100-116 ensemble-mean predict
gating bounds/neural.py:117-124). Under plain XLA this lowers to a chain
of small batched matmuls with intermediates round-tripping through HBM;
the Pallas kernel here keeps a candidate tile and every layer activation
in VMEM and accumulates the ensemble mean in one pass — one HBM read of
the candidates, one HBM write of the scores.

:func:`ensemble_score` is the product entry point (used by the membership
sweep in ops/neural_stack.py): it runs the XLA scoring path by default and
switches to this kernel under ``NAUTILUS_TPU_PALLAS=1`` — see its
docstring for the measured standalone-win / fused-pipeline-loss tradeoff
that sets that default.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

from .mlp import MLPParams, mlp_forward_scoring

try:  # pragma: no cover - import guard for minimal environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False


def _score_kernel(z_ref, *refs):
    """One candidate tile through the whole ensemble, entirely in VMEM.

    ``refs`` is (w_0, b_0, ..., w_{L-1}, b_{L-1}, out_ref) where weight
    refs have shape (E, in, out) and bias refs (E, out). ReLU hidden
    layers, linear scalar output, ensemble-mean accumulation.
    """
    out_ref = refs[-1]
    layer_refs = refs[:-1]
    n_layers = len(layer_refs) // 2
    e_nets = layer_refs[0].shape[0]

    z = z_ref[:]
    acc = jnp.zeros((z.shape[0], 1), jnp.float32)
    for e in range(e_nets):
        h = z
        for k in range(n_layers):
            w = layer_refs[2 * k][e]
            b = layer_refs[2 * k + 1][e]
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if k < n_layers - 1:
                h = jnp.maximum(h, 0.0)
        acc = acc + h
    out_ref[:] = acc / e_nets


def ensemble_score_pallas(z, weights, biases, tile=256, interpret=False):
    """Ensemble-mean MLP score for a batch of standardized points.

    Parameters
    ----------
    z : (n, d) float32, standardized inputs; n must be a multiple of
        ``tile`` (callers pad — the sampler's batches are bucketed).
    weights : tuple of (E, in_k, out_k) arrays.
    biases : tuple of (E, out_k) arrays.

    Returns
    -------
    (n,) float32 ensemble-mean scores.
    """
    n, d = z.shape
    tile = min(tile, n)
    assert n % tile == 0

    grid = (n // tile,)
    in_specs = [pl.BlockSpec((tile, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    operands = [z.astype(jnp.float32)]
    for w, b in zip(weights, biases):
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            b.shape, lambda i: (0,) * b.ndim, memory_space=pltpu.VMEM))
        operands.append(w.astype(jnp.float32))
        operands.append(b.astype(jnp.float32))

    out = pl.pallas_call(
        _score_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out[:, 0]


def ensemble_score_xla(z, weights, biases):
    """XLA path: vmapped scoring forward (bf16 matmuls with f32
    accumulation on TPU; plain f32 elsewhere), mean over the ensemble."""
    preds = jax.vmap(
        lambda w, b: mlp_forward_scoring(MLPParams(w, b), z))(
            weights, biases)
    return jnp.mean(preds, axis=0)


def _use_pallas():
    return os.environ.get('NAUTILUS_TPU_PALLAS', '') not in ('', '0')


def ensemble_score(z, weights, biases):
    """Ensemble-mean score with backend selection.

    Default is the XLA scoring path; ``NAUTILUS_TPU_PALLAS=1`` switches to
    the hand-written Pallas kernel. Measured on the benchmark TPU: the
    Pallas kernel wins STANDALONE at the membership sweep's shapes
    ((2048, d) candidates, 4-net (100, 50, 20) ensembles, vmapped over
    modes: 0.68 ms vs 0.86 ms at d=3), but inside the fused phase
    programs it blocks XLA from fusing the surrounding ellipsoid
    gate/transform ops and the end-to-end benchmark regresses (sample
    phase 3.4 s -> 23.6 s) — so XLA stays the default and the kernel
    remains available for standalone scoring workloads.
    """
    if HAS_PALLAS and _use_pallas() and z.shape[0] % 128 == 0:
        return ensemble_score_pallas(z, weights, biases, tile=128)
    return ensemble_score_xla(z, weights, biases)


# --------------------------------------------------------------------- #
# Fused ensemble-training epoch
#
# Profiling (ROADMAP.md "trainer"): one Adam step of the 4-net emulator
# ensemble costs ~25-40 us under XLA regardless of dimension — pure
# per-op overhead on ~40 tiny ops whose operands round-trip through HBM
# between scan iterations. Training dominates BOTH headline benches
# (the quickstart's speculative bound build and ~half of the 50-D bound
# phase). This kernel runs a whole epoch per net in ONE pallas_call:
# grid = (nets, batches); the net's weights and Adam moments stay
# resident in VMEM across all of its batches (~0.5 MB total), and each
# (200, d) minibatch is DMA'd in while the previous one computes.
# The math replicates ops/mlp.py exactly: ReLU MLP, squared-error/2
# loss with sklearn's alpha L2 on weight matrices, masked padded rows,
# and the sqrt-bias-corrected Adam variant of _adam_update.


def _train_epoch_kernel(n_layers, xs_ref, ys_ref, ms_ref, lr_ref,
                        alpha_ref, *refs):
    """One (net e, batch b) grid step: forward, backward, Adam update.

    ``refs`` holds the 6*L+1 state input refs (params, moments, t)
    followed by the output refs aliased to them plus the un-aliased
    ``loss_sum`` (1,1) f32. State is read AND written through the output
    refs — aliasing makes them the same buffers as the inputs, so the
    first grid step sees the incoming values and later steps see the
    running update.
    """
    L = n_layers
    outs = refs[6 * L + 1:]
    params = outs[:2 * L]
    ms = outs[2 * L:4 * L]
    vs = outs[4 * L:6 * L]
    t_ref = outs[6 * L]
    loss_ref = outs[6 * L + 1]

    def read(i):
        # weights: (1, d_in, d_out) blocks; biases: (1, 1, H) blocks.
        return params[i][0] if i % 2 == 0 else params[i][0, 0]

    xb = xs_ref[0, 0]                      # (S, d)
    yb = ys_ref[0, 0]                      # (S, 1)
    mb = ms_ref[0, 0].astype(jnp.float32)  # (S, 1)
    lr = lr_ref[0, 0]
    alpha = alpha_ref[0, 0]
    denom = jnp.maximum(jnp.sum(mb), 1.0)

    # Forward, keeping pre-activations for the backward pass.
    hs = [xb]
    zs = []
    h = xb
    for k in range(L):
        w = read(2 * k)
        b = read(2 * k + 1)
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]
        zs.append(z)
        h = jnp.maximum(z, 0.0) if k < L - 1 else z
        hs.append(h)

    pred = hs[-1]                          # (S, 1)
    err = (pred - yb) * mb
    # Epoch-loss accumulation: loss * sum(mb), exactly like the scan path
    # (ops/mlp.py batch step); the caller divides by n_valid.
    l2 = sum(jnp.sum(read(2 * k) ** 2) for k in range(L))
    loss = (0.5 * jnp.sum(err * (pred - yb)) + 0.5 * alpha * l2) / denom

    @pl.when(pl.program_id(1) == 0)
    def _():
        loss_ref[0, 0, 0] = 0.0

    loss_ref[0, 0, 0] += loss * jnp.sum(mb)

    # Backward.
    grads = [None] * (2 * L)
    g = err / denom                        # dLoss/dpred, (S, 1)
    for k in range(L - 1, -1, -1):
        h_in = hs[k]
        w = read(2 * k)
        dw = jax.lax.dot_general(
            h_in, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        grads[2 * k] = dw + alpha * w / denom
        grads[2 * k + 1] = jnp.sum(g, axis=0)
        if k > 0:
            dh = jax.lax.dot_general(
                g, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = dh * (zs[k - 1] > 0).astype(jnp.float32)

    # Adam (sqrt-bias-corrected lr variant; ops/mlp.py _adam_update).
    b1, b2, eps = 0.9, 0.999, 1e-8
    t_new = t_ref[0, 0, 0] + 1
    t_f = t_new.astype(jnp.float32)
    # b**t as exp(t*log(b)) — Mosaic has no scalar powf lowering.
    import math
    b1_t = jnp.exp(t_f * math.log(b1))
    b2_t = jnp.exp(t_f * math.log(b2))
    lr_t = lr * jnp.sqrt(1.0 - b2_t) / (1.0 - b1_t)
    for i in range(2 * L):
        g_i = grads[i]
        idx = (0,) if i % 2 == 0 else (0, 0)
        m_new = b1 * ms[i][idx] + (1.0 - b1) * g_i
        v_new = b2 * vs[i][idx] + (1.0 - b2) * g_i ** 2
        ms[i][idx] = m_new
        vs[i][idx] = v_new
        params[i][idx] = params[i][idx] - lr_t * m_new / \
            (jnp.sqrt(v_new) + eps)
    t_ref[0, 0, 0] = t_new


def train_epoch_pallas(xs, ys, masks, params_flat, m_flat, v_flat, t, lr,
                       alpha, interpret=False):
    """Run one training epoch for every net in a single fused kernel.

    Parameters
    ----------
    xs : (E, B, S, d) per-net permuted minibatches.
    ys, masks : (E, B, S, 1) targets / validity.
    params_flat, m_flat, v_flat : flat lists [w_0, b_0, w_1, b_1, ...]
        with a leading ensemble axis on every array.
    t : (E, 1) int32 Adam step counters.
    lr, alpha : scalars.

    Returns
    -------
    (params_flat', m_flat', v_flat', t', loss_sum) with ``loss_sum`` of
    shape (E, 1) — sum over batches of loss*sum(mask), the exact
    quantity the scan path accumulates.
    """
    E, B, S, d = xs.shape
    L = len(params_flat) // 2

    def widen(flat):
        # Biases (E, H) get a unit middle dim so their (1, 1, H) blocks
        # satisfy the TPU (sublane, lane) tiling constraint.
        return [a if i % 2 == 0 else a[:, None, :]
                for i, a in enumerate(flat)]

    params_flat = widen(params_flat)
    m_flat = widen(m_flat)
    v_flat = widen(v_flat)

    def data_spec(shape):
        return pl.BlockSpec((1, 1) + shape[2:],
                            lambda e, b: (e, b) + (0,) * (len(shape) - 2),
                            memory_space=pltpu.VMEM)

    def state_spec(shape):
        return pl.BlockSpec((1,) + shape[1:],
                            lambda e, b: (e,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [data_spec(xs.shape), data_spec(ys.shape),
                data_spec(masks.shape),
                pl.BlockSpec((1, 1), lambda e, b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda e, b: (0, 0),
                             memory_space=pltpu.SMEM)]
    operands = [xs, ys, masks,
                jnp.asarray(lr, jnp.float32).reshape(1, 1),
                jnp.asarray(alpha, jnp.float32).reshape(1, 1)]
    state = list(params_flat) + list(m_flat) + list(v_flat)
    for arr in state:
        in_specs.append(state_spec(arr.shape))
        operands.append(arr)
    t3 = t.reshape(E, 1, 1)
    t_spec = pl.BlockSpec((1, 1, 1), lambda e, b: (e, 0, 0),
                          memory_space=pltpu.SMEM)
    in_specs.append(t_spec)
    operands.append(t3)

    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in state]
    out_specs = [state_spec(a.shape) for a in state]
    out_shapes.append(jax.ShapeDtypeStruct(t3.shape, t3.dtype))
    out_specs.append(t_spec)
    out_shapes.append(jax.ShapeDtypeStruct((E, 1, 1), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 1, 1), lambda e, b: (e, 0, 0),
                                  memory_space=pltpu.SMEM))

    # Aliases: state operand i (after the 5 data operands) -> output i;
    # the t counter follows the state block.
    aliases = {5 + i: i for i in range(len(state) + 1)}

    out = pl.pallas_call(
        partial(_train_epoch_kernel, L),
        grid=(E, B),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    n_state = len(state)

    def narrow(flat):
        return [a if i % 2 == 0 else a[:, 0, :]
                for i, a in enumerate(flat)]

    new_state = out[:n_state]
    return (narrow(new_state[:2 * L]), narrow(new_state[2 * L:4 * L]),
            narrow(new_state[4 * L:6 * L]), out[n_state][:, :, 0],
            out[n_state + 1][:, :, 0])
