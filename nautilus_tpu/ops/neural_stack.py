"""Fused kernels over stacked neural bounds.

The NautilusBound's hot sampling loop rejects candidate points through every
mode's neural bound (outer ellipsoid gate + MLP-ensemble score). Here all
modes are stacked on a leading axis so one fused XLA computation evaluates
every (mode, network) pair for a whole candidate batch at once — the
device-parallel redesign of the reference's per-bound Python loop
(reference: nautilus/bounds/nautilus.py:213-222, bounds/neural.py:99-126).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as G
from .pallas_kernels import ensemble_score


class NeuralStack(NamedTuple):
    """Stacked per-mode neural bounds (leading axis: mode)."""

    ell: G.EllParams     # stacked outer ellipsoids, leaves (M, ...)
    mean: jax.Array      # (M, d) input standardization
    scale: jax.Array     # (M, d)
    weights: tuple       # ((M, E, in, out), ...) ensemble MLP weights
    biases: tuple        # ((M, E, out), ...)
    cut: jax.Array       # (M,) calibrated score thresholds
    has_net: jax.Array   # (M,) bool: emulator present
    mode_mask: jax.Array  # (M,) bool: valid modes


def neural_contains_any(stack, points, empty_means_all=False):
    """Whether each point lies in at least one mode's neural bound.

    ``empty_means_all=True`` makes a stack with zero valid modes impose no
    neural cut at all — the convention of the run-level bound stack, whose
    unit-cube slot has no modes (see ops/shell_stack.py).
    """

    def one_mode(ell, mean, scale, wb, cut, has_net):
        in_ell = G.ell_contains(ell, points)
        t = G.ell_transform(ell, points)
        z = (t - mean) / scale
        weights, biases = wb
        # Pallas one-pass VMEM kernel on TPU, XLA elsewhere (see
        # ops/pallas_kernels.ensemble_score for the measurements).
        score = ensemble_score(z, weights, biases)
        score_ok = score > cut - 1e-9
        return in_ell & (score_ok | ~has_net)

    per_mode = jax.vmap(one_mode)(
        stack.ell, stack.mean, stack.scale,
        (stack.weights, stack.biases), stack.cut, stack.has_net)
    per_mode = per_mode & stack.mode_mask[:, None]
    any_mode = jnp.any(per_mode, axis=0)
    if empty_means_all:
        return any_mode | ~jnp.any(stack.mode_mask)
    return any_mode


def insert_neural_slot(weights, biases, flat, b_idx):
    """Write one bound's trained ensembles into the whole-run weight stack.

    ``weights``/``biases`` are the run-level stacked tuples with leaves
    ``(B, M, E, in, out)`` / ``(B, M, E, out)``; ``flat`` is one bound's
    packed parameters ``(m_t, E, P)`` as produced by
    :func:`nautilus_tpu.ops.mlp.flatten_ensembles` (weight blocks layer by
    layer, then bias blocks), with ``m_t <= M``. The trained parameters
    never leave the device: training emits ``flat`` and this op scatters it
    into slot ``b_idx`` — no host round trip for megabytes of MLP weights.
    """
    m_t, e, _ = flat.shape
    off = 0
    new_weights = []
    for w in weights:
        _, m_pad, _, n_in, n_out = w.shape
        blk = flat[:, :, off:off + n_in * n_out].reshape(m_t, e, n_in, n_out)
        off += n_in * n_out
        blk = jnp.pad(blk, ((0, m_pad - m_t), (0, 0), (0, 0), (0, 0)))
        new_weights.append(
            jax.lax.dynamic_update_index_in_dim(w, blk, b_idx, 0))
    new_biases = []
    for b in biases:
        _, m_pad, _, n_out = b.shape
        blk = flat[:, :, off:off + n_out].reshape(m_t, e, n_out)
        off += n_out
        blk = jnp.pad(blk, ((0, m_pad - m_t), (0, 0), (0, 0)))
        new_biases.append(
            jax.lax.dynamic_update_index_in_dim(b, blk, b_idx, 0))
    return tuple(new_weights), tuple(new_biases)


insert_neural_slot_jit = jax.jit(insert_neural_slot)


def nautilus_sample_batch(outer_stacked, outer_mask, stack, key, n_points):
    """One fused candidate batch for NautilusBound sampling.

    Draws `n_points` candidates from the outer union (with overlap and
    unit-cube correction) and evaluates the neural rejection in the same
    compiled program.

    Returns
    -------
    points : (n_points, d)
    outer_accept : (n_points,) bool — delivered by the outer union sampler.
    neural_accept : (n_points,) bool — also inside a neural bound.
    """
    points, outer_accept = G.union_sample_batch(
        outer_stacked, outer_mask, key, n_points, unit=True)
    in_neural = neural_contains_any(stack, points)
    return points, outer_accept, outer_accept & in_neural
