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
from .mlp import MLPParams, mlp_forward


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


def neural_contains_any(stack, points):
    """Whether each point lies in at least one mode's neural bound."""

    def one_mode(ell, mean, scale, wb, cut, has_net):
        in_ell = G.ell_contains(ell, points)
        t = G.ell_transform(ell, points)
        z = (t - mean) / scale
        weights, biases = wb
        preds = jax.vmap(
            lambda w, b: mlp_forward(MLPParams(w, b), z))(weights, biases)
        score = jnp.mean(preds, axis=0)
        score_ok = score > cut - 1e-9
        return in_ell & (score_ok | ~has_net)

    per_mode = jax.vmap(one_mode)(
        stack.ell, stack.mean, stack.scale,
        (stack.weights, stack.biases), stack.cut, stack.has_net)
    per_mode = per_mode & stack.mode_mask[:, None]
    return jnp.any(per_mode, axis=0)


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
