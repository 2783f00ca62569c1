"""Neural network-based bound (TPU-native).

API-parity analogue of the reference NeuralBound (reference:
nautilus/bounds/neural.py): an outer ellipsoid intersected with the region
where an ensemble MLP emulator predicts a likelihood-rank score above a
calibrated threshold.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import rankdata

from ..neural import NeuralNetworkEmulator
from ..ops import geometry as G
from ..utils.bucket import pad_points
from ..utils.keys import KeyStream
from .basic import Ellipsoid, unpack_ell


@partial(jax.jit, static_argnums=(4,))
def _batched_mode_fit_jit(points, above, valid, mode_ells, enlarge_per_dim):
    """Per-mode outer-ellipsoid fits for a whole multimodal bound in one
    dispatch. For every mode: membership in the mode-finding ellipsoid,
    MVEE fit over the above-threshold members, and containment of all mode
    members in the new ellipsoid. Packed as (M, L + n_pad)."""
    d = points.shape[1]

    def one_mode(ell):
        member = G.ell_contains(ell, points) & valid
        mask_fit = member & above
        p = G.fit_ellipsoid(points, mask_fit, jnp.ones(d, bool),
                            enlarge_per_dim=enlarge_per_dim)
        inside = G.ell_contains(p, points) & member
        return jnp.concatenate([
            p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None],
            inside.astype(points.dtype)])

    return jax.vmap(one_mode)(mode_ells)


@partial(jax.jit, static_argnames=(
    'sizes', 'n_networks', 'batch_size', 'max_epochs', 'n_iter_no_change'))
def _batched_train_predict_jit(points, scores, inside, ell_stacked, keys,
                               sizes, n_networks, batch_size, max_epochs,
                               n_iter_no_change, lr):
    """Train every mode's emulator ensemble simultaneously and return, per
    mode, the flattened parameters, standardization, and training-input
    predictions — one dispatch, one packed fetch."""
    from ..ops.mlp import train_ensembles_multi, ensemble_predict

    d = points.shape[1]

    def standardize(ell, ins):
        t = G.ell_transform(ell, points)
        w = ins.astype(points.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(t * w[:, None], axis=0) / n
        var = jnp.sum((t - mean) ** 2 * w[:, None], axis=0) / n
        scale = jnp.sqrt(var)
        scale = jnp.where(scale == 0, 1.0, scale)
        return (t - mean) / scale, mean, scale

    z, mean, scale = jax.vmap(standardize)(ell_stacked, inside)
    params, _ = train_ensembles_multi(
        z, scores, inside, keys, sizes, n_networks=n_networks,
        batch_size=batch_size, lr=lr, max_epochs=max_epochs,
        n_iter_no_change=n_iter_no_change)
    pred = jax.vmap(ensemble_predict)(params, z)
    m = z.shape[0]
    flat = jnp.concatenate(
        [w.reshape(m, -1) for w in params.weights] +
        [b.reshape(m, -1) for b in params.biases], axis=1)
    return jnp.concatenate(
        [flat, mean, scale, pred], axis=1)


@partial(jax.jit, static_argnums=(3,))
def _fit_contains_transform_jit(points, mask_fit, mask_all, enlarge_per_dim):
    """Fit the outer ellipsoid on the above-threshold subset and evaluate
    containment + frame transform for every point — one dispatch, one packed
    fetch (reference steps: nautilus/bounds/neural.py:68-82)."""
    d = points.shape[1]
    p = G.fit_ellipsoid(points, mask_fit, jnp.ones(d, bool),
                        enlarge_per_dim=enlarge_per_dim)
    inside = G.ell_contains(p, points) & mask_all
    t = G.ell_transform(p, points)
    return jnp.concatenate([
        p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None],
        inside.astype(points.dtype), t.reshape(-1)])


def rank_scores(log_l, log_l_min):
    """Map likelihoods to rank scores in [0, 1].

    Points at or above the threshold get scores in [0.5, 1], the rest in
    [0, 0.5], each by (tie-averaged) rank (reference:
    nautilus/bounds/neural.py:84-88).
    """
    score = np.zeros(len(log_l))
    select = log_l >= log_l_min
    n_above = np.sum(select)
    n_below = np.sum(~select)
    if n_above > 0:
        score[select] = 0.5 * (
            1 + (rankdata(log_l[select]) - 0.5) / n_above)
    if n_below > 0:
        score[~select] = 0.5 * (
            (rankdata(log_l[~select]) - 0.5) / n_below)
    return score


class NeuralBound:
    """Ellipsoid gated by an ensemble-MLP likelihood-rank emulator."""

    def __init__(self):
        self.n_dim = None
        self.outer_bound = None
        self.emulator = None
        self.score_predict_min = 0.0

    @classmethod
    def compute(cls, points, log_l, log_l_min, enlarge_per_dim=1.1,
                n_networks=4, neural_network_kwargs=None, keys=None):
        """Fit the outer ellipsoid and train the rank emulator.

        Reference: nautilus/bounds/neural.py:28-97.
        """
        points = np.asarray(points)
        log_l = np.asarray(log_l)
        bound = cls()
        d = bound.n_dim = points.shape[1]
        if keys is None:
            keys = KeyStream()

        if n_networks == 0:
            bound.outer_bound = Ellipsoid.compute(
                points[log_l >= log_l_min], enlarge_per_dim=enlarge_per_dim,
                keys=keys)
            bound.emulator = None
            bound.score_predict_min = 0.0
            return bound

        # One dispatch: fit the outer ellipsoid on the above-threshold
        # subset, and containment + frame coordinates for all points.
        pts_pad, mask_all = pad_points(points)
        n_pad = pts_pad.shape[0]
        mask_fit = np.zeros(n_pad, bool)
        mask_fit[:len(points)] = log_l >= log_l_min
        vec = np.asarray(_fit_contains_transform_jit(
            pts_pad, jnp.asarray(mask_fit), mask_all,
            float(enlarge_per_dim)), np.float64)

        n_packed = d + 2 * d * d + 1
        bound.outer_bound = Ellipsoid()
        bound.outer_bound.n_dim = d
        bound.outer_bound.keys = keys
        bound.outer_bound.params = unpack_ell(vec[:n_packed], d)
        inside = vec[n_packed:n_packed + n_pad][:len(points)] > 0.5
        points_t = vec[n_packed + n_pad:].reshape(
            n_pad, d)[:len(points)][inside]
        log_l = log_l[inside]

        score = rank_scores(log_l, log_l_min)
        emulator, pred = NeuralNetworkEmulator.train(
            points_t, score, n_networks=n_networks,
            neural_network_kwargs=neural_network_kwargs, key=keys.next(),
            return_predictions=True)
        bound.emulator = emulator

        # Calibrate the acceptance threshold: cubic fit of predicted vs true
        # score, evaluated at the lowest above-threshold score (reference:
        # nautilus/bounds/neural.py:93-95).
        above = log_l >= log_l_min
        bound.score_predict_min = float(np.polyval(
            np.polyfit(score, pred, 3), np.amin(score[above])))

        return bound

    @classmethod
    def compute_batched(cls, points, log_l, log_l_min, mode_params,
                        enlarge_per_dim=1.1, n_networks=4,
                        neural_network_kwargs=None, keys=None):
        """Build one NeuralBound per mode, all modes at once.

        Replaces the reference's per-mode loop (reference:
        nautilus/bounds/nautilus.py:108-114) with two fused dispatches for
        the whole multimodal bound: (A) every mode's outer-ellipsoid fit +
        membership, (B) every mode's emulator ensemble trained
        simultaneously plus its calibration predictions. Total device round
        trips are O(1) in the number of modes.
        """
        points = np.asarray(points)
        log_l = np.asarray(log_l)
        m = len(mode_params)
        d = points.shape[1]
        if keys is None:
            keys = KeyStream()

        if n_networks == 0:
            # No emulators: per-mode ellipsoid fits only (rarely hot).
            out = []
            for p in mode_params:
                mode_ell = Ellipsoid()
                mode_ell.n_dim = d
                mode_ell.params = p
                mode_ell.keys = keys
                sel = mode_ell.contains(points)
                out.append(cls.compute(
                    points[sel], log_l[sel], log_l_min,
                    enlarge_per_dim=enlarge_per_dim, n_networks=0,
                    keys=keys))
            return out

        if m == 1:
            # Unimodal: the single-mode path avoids the vmapped trainer's
            # extra compilation cost.
            mode_ell = Ellipsoid()
            mode_ell.n_dim = d
            mode_ell.params = mode_params[0]
            mode_ell.keys = keys
            sel = mode_ell.contains(points)
            return [cls.compute(
                points[sel], log_l[sel], log_l_min,
                enlarge_per_dim=enlarge_per_dim, n_networks=n_networks,
                neural_network_kwargs=neural_network_kwargs, keys=keys)]

        # Pad the mode axis to a small power-of-two bucket so XLA compiles
        # a handful of batched-trainer variants per run. Padded slots carry
        # empty masks: their (masked) loss is zero and they early-stop.
        from ..utils.bucket import bucket_size
        m_pad = bucket_size(m, floor=2)

        pts_pad, valid = pad_points(points)
        n_pad = pts_pad.shape[0]
        above = np.zeros(n_pad, bool)
        above[:len(points)] = log_l >= log_l_min

        ell_stacked, _ = G.stack_ell_params(mode_params, m_pad)

        # (A) fits + membership for every mode.
        packed = np.asarray(_batched_mode_fit_jit(
            pts_pad, jnp.asarray(above), valid, ell_stacked,
            float(enlarge_per_dim)), np.float64)
        n_packed = d + 2 * d * d + 1
        outer_params = [unpack_ell(packed[i, :n_packed], d)
                        for i in range(m)]
        inside = packed[:, n_packed:] > 0.5    # (m_pad, n_pad)
        inside[m:] = False

        # Rank scores per mode (host; needs only log_l).
        scores = np.zeros((m_pad, n_pad))
        for i in range(m):
            sel = inside[i, :len(points)]
            scores[i, :len(points)][sel] = rank_scores(
                log_l[sel], log_l_min)

        kwargs = dict(neural_network_kwargs or {})
        kwargs.pop('random_state', None)
        from ..neural import DEFAULT_HIDDEN
        hidden = tuple(kwargs.pop('hidden_layer_sizes', DEFAULT_HIDDEN))
        lr = float(kwargs.pop('learning_rate_init', 1e-2))
        max_epochs = int(kwargs.pop('max_iter', 3000))
        n_iter_no_change = int(kwargs.pop('n_iter_no_change', 10))
        batch_size = int(kwargs.pop('batch_size', 200))
        sizes = (d,) + hidden + (1,)

        outer_stacked, _ = G.stack_ell_params(outer_params, m_pad)
        mode_keys = keys.next_n(m_pad)

        # (B) all ensembles trained at once + calibration predictions.
        out = np.asarray(_batched_train_predict_jit(
            pts_pad, jnp.asarray(scores, jnp.float32),
            jnp.asarray(inside), outer_stacked, mode_keys,
            sizes=sizes, n_networks=n_networks, batch_size=batch_size,
            max_epochs=max_epochs, n_iter_no_change=n_iter_no_change,
            lr=lr), np.float64)

        # Unpack: weight blocks, bias blocks, mean, scale, predictions.
        bounds = []
        offset_blocks = []
        off = 0
        for k in range(len(sizes) - 1):
            size = n_networks * sizes[k] * sizes[k + 1]
            offset_blocks.append(('w', k, off, size))
            off += size
        for k in range(len(sizes) - 1):
            size = n_networks * sizes[k + 1]
            offset_blocks.append(('b', k, off, size))
            off += size
        mean_off, scale_off, pred_off = off, off + d, off + 2 * d

        from ..neural import NeuralNetworkEmulator
        from ..ops.mlp import MLPParams
        for i in range(m):
            row = out[i]
            weights = []
            biases = []
            for kind, k, o, size in offset_blocks:
                block = row[o:o + size].astype(np.float32)
                if kind == 'w':
                    weights.append(block.reshape(
                        n_networks, sizes[k], sizes[k + 1]))
                else:
                    biases.append(block.reshape(n_networks, sizes[k + 1]))
            emulator = NeuralNetworkEmulator()
            emulator.n_networks = n_networks
            emulator.hidden_layer_sizes = hidden
            emulator.mean = row[mean_off:mean_off + d]
            emulator.scale = row[scale_off:scale_off + d]
            emulator.params = MLPParams(tuple(weights), tuple(biases))

            bound = cls()
            bound.n_dim = d
            bound.outer_bound = Ellipsoid()
            bound.outer_bound.n_dim = d
            bound.outer_bound.keys = keys
            bound.outer_bound.params = outer_params[i]
            bound.emulator = emulator

            sel = inside[i, :len(points)]
            score_i = scores[i, :len(points)][sel]
            pred_i = row[pred_off:pred_off + n_pad][:len(points)][sel]
            above_i = log_l[sel] >= log_l_min
            bound.score_predict_min = float(np.polyval(
                np.polyfit(score_i, pred_i, 3), np.amin(score_i[above_i])))
            bounds.append(bound)
        return bounds

    def contains(self, points):
        points = np.atleast_2d(np.asarray(points))
        in_bound = np.array(self.outer_bound.contains(points))
        if np.any(in_bound) and self.emulator is not None:
            points_t = self.outer_bound.transform(points)
            in_bound[in_bound] = (
                self.emulator.predict(points_t[in_bound]) >
                self.score_predict_min - 1e-9)
        return in_bound

    def write(self, group):
        group.attrs['n_dim'] = self.n_dim
        group.attrs['score_predict_min'] = self.score_predict_min
        self.outer_bound.write(group.create_group('outer_bound'))
        if self.emulator is not None:
            self.emulator.write(group.create_group('emulator'))

    @classmethod
    def read(cls, group, keys=None):
        bound = cls()
        if keys is None:
            keys = KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        bound.score_predict_min = float(group.attrs['score_predict_min'])
        bound.outer_bound = Ellipsoid.read(group['outer_bound'], keys=keys)
        if 'emulator' in group:
            bound.emulator = NeuralNetworkEmulator.read(group['emulator'])
        else:
            bound.emulator = None
        return bound
