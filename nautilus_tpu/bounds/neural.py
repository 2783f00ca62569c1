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
