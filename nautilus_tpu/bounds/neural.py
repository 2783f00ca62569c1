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
from ..utils.fetch import fetch
from ..utils.bucket import pad_points
from ..utils.keys import KeyStream
from ..utils import prewarm
from ..utils.warmstore import warm_jit
from .basic import Ellipsoid, unpack_ell


@partial(warm_jit, static_argnames=(
    'sizes', 'n_networks', 'batch_size', 'max_epochs', 'n_iter_no_change',
    'enlarge_per_dim'))
def _batched_build_jit(points, log_l, above, valid, mode_ells, mode_mask,
                       keys, sizes, n_networks, batch_size, max_epochs,
                       n_iter_no_change, lr, alpha, enlarge_per_dim):
    """Build every mode's neural bound in ONE device program.

    Fuses the full reference pipeline (reference:
    nautilus/bounds/neural.py:28-97 per mode, looped at
    nautilus/bounds/nautilus.py:108-114) — mode membership, outer-ellipsoid
    MVEE fit, rank-score construction, input standardization, MLP-ensemble
    training, and acceptance-cut calibration — into a single dispatch for
    all modes at once. Only a tiny per-mode summary (ellipsoid geometry,
    standardization, calibrated cut) is fetched by the host; the trained
    ensemble weights stay on device as a packed (M, E, P) array.
    """
    from ..ops.mlp import train_ensembles_multi, ensemble_predict, \
        rank_scores_masked, calibrate_cut, flatten_ensembles

    d = points.shape[1]

    def geom(ell, is_mode):
        member = G.ell_contains(ell, points) & valid & is_mode
        mask_fit = member & above
        # Padded mode slots fit over all valid points so every intermediate
        # stays finite; their outputs are discarded by the host.
        mask_fit = jnp.where(jnp.any(mask_fit), mask_fit, valid)
        p = G.fit_ellipsoid(points, mask_fit, jnp.ones(d, bool),
                            enlarge_per_dim=enlarge_per_dim)
        inside = G.ell_contains(p, points) & member
        t = G.ell_transform(p, points)
        w = inside.astype(points.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(t * w[:, None], axis=0) / n
        var = jnp.sum((t - mean) ** 2 * w[:, None], axis=0) / n
        scale = jnp.sqrt(var)
        scale = jnp.where(scale == 0, 1.0, scale)
        z = (t - mean) / scale
        score = rank_scores_masked(log_l, inside, above)
        packed_geom = jnp.concatenate([
            p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None]])
        return packed_geom, inside, z, score, mean, scale

    packed_geom, inside, z, score, mean, scale = jax.vmap(geom)(
        mode_ells, mode_mask)
    params, _ = train_ensembles_multi(
        z, score, inside, keys, sizes, n_networks=n_networks,
        batch_size=batch_size, lr=lr, max_epochs=max_epochs,
        n_iter_no_change=n_iter_no_change, alpha=alpha)
    pred = jax.vmap(ensemble_predict)(params, z)
    cut = jax.vmap(calibrate_cut, in_axes=(0, 0, 0, None))(
        score, pred, inside, above)
    small = jnp.concatenate(
        [packed_geom, mean, scale, cut[:, None]], axis=1)
    return small, flatten_ensembles(params)


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


@jax.jit
def _mode_sel_jit(pts, valid, mode_ells, mode_mask):
    """Points inside any mode-finding ellipsoid (device prefilter for the
    batched builder) and their count — only the count is fetched."""
    per = jax.vmap(G.ell_contains, in_axes=(0, None))(mode_ells, pts)
    sel = jnp.any(per & mode_mask[:, None], axis=0) & valid
    return sel, jnp.sum(sel.astype(jnp.int32))


@partial(jax.jit, static_argnums=(4,))
def _compact_sel_jit(pts, log_l, above, sel, size):
    """Gather the selected rows into a compact block (device-to-device)."""
    idx = jnp.nonzero(sel, size=size, fill_value=pts.shape[0])[0]
    valid = idx < pts.shape[0]
    safe = jnp.minimum(idx, pts.shape[0] - 1)
    return (pts[safe], jnp.where(valid, log_l[safe], -jnp.inf),
            above[safe] & valid, valid)


@jax.jit
def _mode_member_jit(mode_ell, pts, above):
    return G.ell_contains(mode_ell, pts) & above


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
        vec = fetch(_fit_contains_transform_jit(
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
        nautilus/bounds/nautilus.py:108-114) with ONE fused dispatch for
        the whole multimodal bound: every mode's outer-ellipsoid fit, rank
        scores, emulator-ensemble training, and threshold calibration run
        in a single device program. The host fetches only a tiny per-mode
        summary; the ensemble weights stay on device and are returned as
        the second element (a packed (m_pad, E, P) array) for insertion
        into the run-level bound stack.

        Returns ``(bounds, flat)`` where ``flat`` is None for
        ``n_networks=0``.
        """
        points = np.asarray(points)
        log_l = np.asarray(log_l)
        m = len(mode_params)
        d = points.shape[1]
        if keys is None:
            keys = KeyStream()

        # Host pre-filter: only points inside some mode-finding ellipsoid
        # participate in any mode's fit or training set (the reference
        # trains per mode on exactly these, reference:
        # nautilus/bounds/nautilus.py:108-114). Filtering before padding
        # keeps the trainer in one small compiled bucket for the whole run
        # instead of growing with the total sample count. The slack makes
        # this a superset of the device-side f32 membership test, which
        # still decides final membership inside the fused builder.
        if len(points) > 0 and m > 0:
            sel = np.zeros(len(points), bool)
            for p in mode_params:
                dm = np.asarray(p.dim_mask, np.float64)
                xc = (points - np.asarray(p.c, np.float64)) * dm
                y = xc @ np.asarray(p.B_inv, np.float64).T
                sel |= np.sum((y * dm) ** 2, axis=1) < 1.0 + 1e-3
            points = points[sel]
            log_l = log_l[sel]

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
            return out, None

        # Pad the mode axis to a small power-of-two bucket so XLA compiles
        # a handful of batched-trainer variants per run. Padded slots train
        # on empty masks: their loss is zero and they early-stop.
        from ..utils.bucket import bucket_size
        m_pad = bucket_size(m, floor=1)

        # The fused builder is the most expensive program to compile (MVEE
        # + GMM-free geometry + the full ensemble-training while-loop), so
        # its point axis uses a high floor: one executable usually serves
        # the whole run. Masked padding rows cost only cheap device time.
        pts_pad, valid = pad_points(points, floor=4096)
        n_pad = pts_pad.shape[0]
        above = np.zeros(n_pad, bool)
        above[:len(points)] = log_l >= log_l_min
        log_l_pad = np.full(n_pad, -np.inf, np.float32)
        log_l_pad[:len(points)] = log_l

        ell_stacked, mode_mask = G.stack_ell_params(mode_params, m_pad)

        cfg = cls._build_config(d, neural_network_kwargs)
        small, flat = cls.dispatch_build(
            pts_pad, jnp.asarray(log_l_pad), jnp.asarray(above), valid,
            ell_stacked, mode_mask, m_pad, keys, n_networks, cfg,
            enlarge_per_dim)
        small = fetch(small, np.float64)
        return cls.finish_build(
            small, flat, m, d, cfg, n_networks, keys), flat

    @classmethod
    def _build_config(cls, d, neural_network_kwargs):
        """Resolve the builder's training hyperparameters (sklearn-kwarg
        compatible; reference: nautilus/neural.py:79-88)."""
        from ..neural import resolve_network_kwargs
        cfg = resolve_network_kwargs(neural_network_kwargs)
        cfg['sizes'] = (d,) + cfg['hidden'] + (1,)
        if cfg['batch_size'] is None:
            cfg['batch_size'] = 200
        cfg['batch_size'] = int(cfg['batch_size'])
        return cfg

    @classmethod
    def dispatch_build(cls, pts, log_l, above, valid, ell_stacked, mode_mask,
                       m_pad, keys, n_networks, cfg, enlarge_per_dim,
                       prewarm_next=0):
        """Dispatch the fused builder WITHOUT fetching.

        Returns the (small, flat) device futures; callers merge the tiny
        ``small`` summary into a later combined fetch (see
        NautilusBound.compute_device's speculative build) and keep ``flat``
        on device for the run-level bound stack.
        """
        mode_keys = keys.next_n(m_pad)
        if prewarm_next:
            # The caller saw the selected-point count closing in on the
            # current compact bucket: compile the successor's builder (the
            # largest program in the run) in the background now.
            prewarm.submit_like(
                _batched_build_jit, {int(pts.shape[0]): int(prewarm_next)},
                pts, log_l, above, valid, ell_stacked,
                jnp.asarray(mode_mask), mode_keys, sizes=cfg['sizes'],
                n_networks=n_networks, batch_size=cfg['batch_size'],
                max_epochs=cfg['max_epochs'],
                n_iter_no_change=cfg['n_iter_no_change'], lr=cfg['lr'],
                alpha=cfg.get('alpha', 0.0),
                enlarge_per_dim=float(enlarge_per_dim))
        return _batched_build_jit(
            pts, log_l, above, valid, ell_stacked, jnp.asarray(mode_mask),
            mode_keys, sizes=cfg['sizes'], n_networks=n_networks,
            batch_size=cfg['batch_size'], max_epochs=cfg['max_epochs'],
            n_iter_no_change=cfg['n_iter_no_change'], lr=cfg['lr'],
            alpha=cfg.get('alpha', 0.0),
            enlarge_per_dim=float(enlarge_per_dim))

    @classmethod
    def finish_build(cls, small, flat, m, d, cfg, n_networks, keys):
        """Construct the NeuralBound objects from a fetched ``small``
        summary (rows: packed ellipsoid | mean | scale | cut)."""
        from ..neural import NeuralNetworkEmulator
        n_packed = d + 2 * d * d + 1
        bounds = []
        for i in range(m):
            row = small[i]
            emulator = NeuralNetworkEmulator()
            emulator.n_networks = n_networks
            emulator.hidden_layer_sizes = cfg['hidden']
            emulator.mean = row[n_packed:n_packed + d]
            emulator.scale = row[n_packed + d:n_packed + 2 * d]
            # Trained weights stay on device; fetched lazily only for
            # checkpoint writes or standalone host prediction.
            emulator.set_flat_device(flat[i], cfg['sizes'])

            bound = cls()
            bound.n_dim = d
            bound.outer_bound = Ellipsoid()
            bound.outer_bound.n_dim = d
            bound.outer_bound.keys = keys
            bound.outer_bound.params = unpack_ell(row[:n_packed], d)
            bound.emulator = emulator
            bound.score_predict_min = float(row[n_packed + 2 * d])
            bounds.append(bound)
        return bounds

    @classmethod
    def compute_batched_device(cls, pts_dev, log_l_dev, valid_dev, above_dev,
                               mode_params, enlarge_per_dim=1.1, n_networks=4,
                               neural_network_kwargs=None, keys=None,
                               n_sel=None):
        """Device-block twin of :meth:`compute_batched`.

        The point set never visits the host: the mode prefilter (reference
        behavior: train only on points inside some mode-finding ellipsoid,
        reference: nautilus/bounds/nautilus.py:108-114) runs on device and
        compacts the block before the fused builder, so the trainer keeps
        its small compiled bucket. Only the selected-point count, the tiny
        per-mode summary, and (for ``n_networks=0``) the per-mode ellipsoid
        geometries are fetched. Callers that already know the selected
        count (the bound prologue computes the root-mode count in its own
        packed fetch) pass ``n_sel`` to skip the count fetch entirely.
        """
        from ..utils.bucket import bucket_size
        from .basic import fit_ellipsoid_host

        m = len(mode_params)
        d = int(pts_dev.shape[1])
        if keys is None:
            keys = KeyStream()
        m_pad = bucket_size(m, floor=1)

        ell_stacked, mode_mask = G.stack_ell_params(mode_params, m_pad)
        hints = prewarm.current_hints()
        prewarm.submit_like(_mode_sel_jit, hints, pts_dev,
                            valid_dev, ell_stacked, jnp.asarray(mode_mask))
        sel, n_sel_dev = _mode_sel_jit(pts_dev, valid_dev, ell_stacked,
                                       jnp.asarray(mode_mask))
        if n_sel is None:
            n_sel = int(fetch(n_sel_dev))
        n_sel = max(int(n_sel), 1)
        size = bucket_size(n_sel, floor=4096)
        next_compact = 2 * size if n_sel > 3 * size // 4 else 0
        if next_compact:
            hints[size] = next_compact
        prewarm.submit_like(_compact_sel_jit, hints, pts_dev,
                            log_l_dev, above_dev, sel, size)
        pts_c, log_l_c, above_c, valid_c = _compact_sel_jit(
            pts_dev, log_l_dev, above_dev, sel, size)

        if n_networks == 0:
            # No emulators: one masked ellipsoid fit per mode.
            out = []
            for p in mode_params:
                member = _mode_member_jit(
                    jax.tree.map(jnp.asarray, p), pts_c, above_c)
                bound = cls()
                bound.n_dim = d
                bound.outer_bound = Ellipsoid()
                bound.outer_bound.n_dim = d
                bound.outer_bound.keys = keys
                bound.outer_bound.params = fit_ellipsoid_host(
                    pts_c, member, np.ones(d, bool), float(enlarge_per_dim))
                bound.emulator = None
                bound.score_predict_min = 0.0
                out.append(bound)
            return out, None

        cfg = cls._build_config(d, neural_network_kwargs)
        small, flat = cls.dispatch_build(
            pts_c, log_l_c, above_c, valid_c, ell_stacked, mode_mask,
            m_pad, keys, n_networks, cfg, enlarge_per_dim,
            prewarm_next=next_compact)
        small = fetch(small, np.float64)
        return cls.finish_build(
            small, flat, m, d, cfg, n_networks, keys), flat

    def contains(self, points):
        """Whether each point passes the outer ellipsoid AND the emulated
        likelihood-score cut."""
        points = np.atleast_2d(np.asarray(points))
        in_bound = np.array(self.outer_bound.contains(points))
        if np.any(in_bound) and self.emulator is not None:
            points_t = self.outer_bound.transform(points)
            in_bound[in_bound] = (
                self.emulator.predict(points_t[in_bound]) >
                self.score_predict_min - 1e-9)
        return in_bound

    def reset(self, keys=None):
        """Reset the sampling state (API parity: every reference bound
        exposes ``reset``; the neural bound holds no sample cache, so only
        the key stream is replaced)."""
        self.outer_bound.reset(keys)

    def write(self, group):
        """Serialize the bound (outer ellipsoid, emulator weights, cut) into
        an HDF5 group."""
        group.attrs['n_dim'] = self.n_dim
        group.attrs['score_predict_min'] = self.score_predict_min
        self.outer_bound.write(group.create_group('outer_bound'))
        if self.emulator is not None:
            self.emulator.write(group.create_group('emulator'))

    @classmethod
    def read(cls, group, keys=None):
        """Reconstruct the bound from an HDF5 group."""
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
