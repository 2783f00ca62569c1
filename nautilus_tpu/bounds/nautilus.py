"""The NautilusBound: union of neural bounds inside a multi-ellipsoid
envelope.

API-parity analogue of the reference bound built every sampler iteration
(reference: nautilus/bounds/nautilus.py). Mode finding and the split/trim
recursion stay as host control flow; sampling runs through one fused device
kernel that draws outer-union candidates and applies the neural rejection
for the whole batch at once (see :mod:`nautilus_tpu.ops.neural_stack`).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import geometry as G
from ..ops.neural_stack import NeuralStack, nautilus_sample_batch, \
    neural_contains_any
from ..utils.bucket import bucket_size, pad_batch
from ..utils.fetch import fetch, fetch_many, put_tree
from ..utils.keys import KeyStream
from ..utils import prewarm
from ..utils.warmstore import warm_jit
from .basic import Ellipsoid, UnitCubeEllipsoidMixture
from .neural import NeuralBound
from .periodic import PhaseShift
from .union import Union, _union_contains_jit, ellipsoids_overlap


@partial(jax.jit, static_argnums=(4,))
def _nautilus_sample_jit(outer_stacked, outer_mask, stack, key, n_points):
    points, outer_accept, accept = nautilus_sample_batch(
        outer_stacked, outer_mask, stack, key, n_points)
    # Single packed output = single host fetch.
    return jnp.concatenate(
        [points, outer_accept[:, None].astype(points.dtype),
         accept[:, None].astype(points.dtype)], axis=1)


@jax.jit
def _neural_contains_jit(stack, points):
    return neural_contains_any(stack, points)


@jax.jit
def _shift_block_jit(pts, vec):
    return jnp.mod(pts + vec, 1.0)


@jax.jit
def _above_jit(log_l, valid, log_l_min):
    """Above-threshold mask over the full block (one compare; the fit
    kernels use the compact fit block's own mask instead)."""
    return valid & (log_l >= log_l_min)


@partial(warm_jit, static_argnums=(6, 7))
def _bound_prologue_jit(pts, log_l, valid, log_l_min, key_split, key_mc,
                        enlarge_per_dim, n_points_min):
    """The whole data-independent prologue of bound construction in ONE
    dispatch: above-threshold mask, mode-root MVEE fit, the *first*
    mode-split attempt (GMM + both child fits; the common unimodal case
    resolves mode finding right here), the outer cube-ellipsoid greedy
    descent, and the MC volume counters of the single-member outer union.

    On a ~27 ms-per-round-trip link the serial version of this chain costs
    four fetches per bound (prefit, split attempt, outer log_v seeding,
    plus counters); fusing it leaves a single fetch and lets the device
    pipeline all the geometry work while the host waits once. The child
    membership masks stay on device for the multimodal continuation; the
    mode-root EllParams is returned device-resident so the speculative
    fused neural build can start before the host sees anything.

    Packed layout: [n_above | mode fit (d+2d^2+1) | child0 | child1 |
    counts (2) | ucem fit (d+2d^2+1+d) | mc counters (2)].
    """
    from .basic import ucem_greedy_params
    from .union import _gmm_labels

    d = pts.shape[1]
    f32 = pts.dtype
    dim_mask = jnp.ones(d, bool)
    above = valid & (log_l >= log_l_min)
    n_above = jnp.sum(above).astype(f32)

    p_mode = G.fit_ellipsoid(pts, above, dim_mask,
                             enlarge_per_dim=enlarge_per_dim)
    mode_vec = jnp.concatenate(
        [p_mode.c, p_mode.B.reshape(-1), p_mode.B_inv.reshape(-1),
         p_mode.log_v[None]])

    # First mode-split attempt (same math as _split_ellipsoid_masked_jit;
    # reference control flow: nautilus/bounds/union.py:183-213).
    labels = _gmm_labels(p_mode, pts, above, key_split, n_points_min)
    masks = jnp.stack([above & (labels == 0), above & (labels == 1)])

    def fit(m):
        p = G.fit_ellipsoid(pts, m, dim_mask,
                            enlarge_per_dim=enlarge_per_dim)
        return jnp.concatenate([
            p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None]])

    child_vec = jax.vmap(fit)(masks).reshape(-1)
    counts = jnp.sum(masks, axis=1).astype(f32)

    # Outer envelope root + MC volume counters for its one-member union
    # (seeds Union.log_v without a separate dispatch).
    p_outer, dim_cube = ucem_greedy_params(pts, above, enlarge_per_dim)
    ucem_vec = jnp.concatenate(
        [p_outer.c, p_outer.B.reshape(-1), p_outer.B_inv.reshape(-1),
         p_outer.log_v[None], dim_cube.astype(f32)])

    from .union import MC_VOLUME_MAX_ITERS, MC_VOLUME_N_MIN, Union as _U
    stacked = jax.tree.map(lambda a: a[None], p_outer)
    one_mask = jnp.ones(1, bool)
    mc_chunk = _U.SAMPLE_BATCH

    def mc_cond(state):
        return ((state[1] < MC_VOLUME_N_MIN) &
                (state[2] < MC_VOLUME_MAX_ITERS))

    def mc_body(state):
        n_tot, n_acc, it = state
        sub = jax.random.fold_in(key_mc, it)
        _, accept = G.union_sample_batch(
            stacked, one_mask, sub, mc_chunk, unit=True)
        return (n_tot + mc_chunk,
                n_acc + jnp.sum(accept.astype(jnp.int32)), it + 1)

    zero = jnp.asarray(0, jnp.int32)
    mc = jax.lax.while_loop(mc_cond, mc_body, (zero, zero, zero))

    packed = jnp.concatenate([
        n_above[None], mode_vec, child_vec, counts, ucem_vec,
        jnp.stack(mc[:2]).astype(f32)])
    return packed, above, masks[0], masks[1], p_mode


class NautilusBound:
    """Union of non-overlapping neural bounds cut to a sampling envelope."""

    SAMPLE_BATCH = 1024

    def __init__(self):
        self.n_dim = None
        self.shift = None
        self.neural_bounds = []
        self.neural_flat = None
        self.outer_bound = None
        self.points = None
        self.n_sample = 0
        self.n_reject = 0
        self.keys = None
        self._stack_cache = None

    @classmethod
    def compute(cls, points, log_l, log_l_min, log_v_target,
                enlarge_per_dim=1.1, n_points_min=None, split_threshold=100,
                periodic=None, n_networks=4, neural_network_kwargs=None,
                keys=None):
        """Build the bound from the current point set.

        Reference: nautilus/bounds/nautilus.py:39-144.
        """
        points = np.asarray(points)
        log_l = np.asarray(log_l)
        bound = cls()
        bound.n_dim = points.shape[1]
        bound.keys = keys if keys is not None else KeyStream()

        if periodic is not None:
            bound.shift = PhaseShift.compute(
                points[log_l >= log_l_min], periodic)
            points = bound.shift.transform(points)
        else:
            bound.shift = None

        # Mode finding: split a union of plain ellipsoids while splits keep
        # the members non-overlapping.
        multi_ellipsoid = Union.compute(
            points[log_l >= log_l_min], enlarge_per_dim=enlarge_per_dim,
            n_points_min=n_points_min, bound_class=Ellipsoid,
            keys=bound.keys)
        while multi_ellipsoid.split(allow_overlap=False):
            pass

        # All modes' neural bounds are built in ONE device program (fits,
        # rank scores, ensemble training, calibration); the trained weights
        # stay on device in ``neural_flat`` for the run-level bound stack.
        bound.neural_bounds, bound.neural_flat = NeuralBound.compute_batched(
            points, log_l, log_l_min, multi_ellipsoid.params_list,
            enlarge_per_dim=enlarge_per_dim, n_networks=n_networks,
            neural_network_kwargs=neural_network_kwargs, keys=bound.keys)

        # Outer sampling envelope: a union of cube-ellipsoid mixtures, split
        # until close to the target volume, then trimmed.
        bound.outer_bound = Union.compute(
            points[log_l >= log_l_min], enlarge_per_dim=enlarge_per_dim,
            n_points_min=n_points_min, bound_class=UnitCubeEllipsoidMixture,
            keys=bound.keys)

        log_v_threshold = np.log(
            split_threshold * enlarge_per_dim ** points.shape[1])
        while bound.outer_bound.log_v - log_v_target > log_v_threshold:
            if not bound.outer_bound.split():
                break
        while bound.outer_bound.log_v - log_v_target > log_v_threshold:
            if not bound.outer_bound.trim():
                break

        bound.points = np.zeros((0, points.shape[1]))
        bound.n_sample = 0
        bound.n_reject = 0
        return bound

    # Compacted point capacity of the speculative neural build: the
    # mode-membership prefilter compacts the block to this static size on
    # device before training. The selected count is validated from the
    # same combined fetch; a (rare) overflow falls back to the serial
    # mode-select + compact path with the exact bucket.
    SPEC_COMPACT = 4096

    @classmethod
    def compute_device(cls, pts_dev, log_l_dev, valid_dev,
                       log_l_min, log_v_target, enlarge_per_dim=1.1,
                       n_points_min=None, split_threshold=100, periodic=None,
                       n_networks=4, neural_network_kwargs=None, keys=None,
                       points_above=None, expect_modes=1, speculate=True,
                       fit_block=None):
        """Device-block twin of :meth:`compute`.

        Consumes a compact device point block (typically the sampler's
        point arena, sorted by likelihood) instead of host coordinates:
        mode finding, the neural builds, and the outer split/trim loops all
        run over on-device masks, so bound construction fetches only tiny
        geometries and counters. ``points_above`` (host rows of the
        above-threshold subset) is required only when ``periodic`` is set —
        the phase-shift centering is a cheap host computation.

        Latency structure: one fused prologue dispatch computes the root
        fits, the first mode-split attempt, and the outer-root MC volume
        counters; when ``expect_modes <= 1`` (the previous bound was
        unimodal) the full neural build is dispatched speculatively on the
        root mode before the prologue is fetched, so the typical unimodal
        bound costs ONE combined fetch — against four-plus serial fetches
        in the naive ordering (reference per-step control flow:
        nautilus/bounds/nautilus.py:39-144).
        """
        bound = cls()
        bound.n_dim = d = int(pts_dev.shape[1])
        bound.keys = keys if keys is not None else KeyStream()

        # ``fit_block`` (pts, log_l, valid): a compact block holding (at
        # least) the above-threshold rows. All geometry fits, the GMM
        # split attempt, and the MC volume counters run on it — on a long
        # run the full history block is ~100x the live set, and masked
        # fits over it waste exactly that factor. The full block is still
        # used where the whole history matters: the training-point
        # selection and the speculative compact.
        if fit_block is None:
            pts_fit, log_l_fit, valid_fit = pts_dev, log_l_dev, valid_dev
        else:
            pts_fit, log_l_fit, valid_fit = fit_block

        if periodic is not None:
            bound.shift = PhaseShift.compute(points_above, periodic)
            shift_vec = jnp.asarray(bound.shift.shift_vector(d),
                                    jnp.float32)
            pts_dev = _shift_block_jit(pts_dev, shift_vec)
            pts_fit = (pts_dev if fit_block is None
                       else _shift_block_jit(pts_fit, shift_vec))
        else:
            bound.shift = None

        from .basic import unpack_ell
        from ..utils.prof import region
        npm = int(n_points_min) if n_points_min is not None else d + 1
        with region('bound.prologue_dispatch'):
            key_a, key_b = bound.keys.next(), bound.keys.next()
            prewarm.submit_like(
                _bound_prologue_jit, prewarm.current_hints(), pts_fit,
                log_l_fit, valid_fit, jnp.asarray(0.0, jnp.float32),
                key_a, key_b, float(enlarge_per_dim), npm)
            packed_dev, above_fit, m0, m1, p_mode_dev = \
                _bound_prologue_jit(
                    pts_fit, log_l_fit, valid_fit,
                    jnp.asarray(log_l_min, jnp.float32), key_a, key_b,
                    float(enlarge_per_dim), npm)
            above = _above_jit(log_l_dev, valid_dev,
                               jnp.asarray(log_l_min, jnp.float32))

        # Speculative fused neural build on the root mode, dispatched
        # before any fetch; the mode prefilter + compact + full training
        # chain overlaps the link round trip of the prologue fetch.
        # ``speculate=False`` (the sampler latches it off after a compact
        # overflow) avoids dispatching trainings that would be discarded —
        # wasted device compute queues ahead of the real build.
        spec = None
        if n_networks > 0 and expect_modes <= 1 and speculate:
            with region('bound.spec_dispatch'):
                from .neural import _mode_sel_jit, _compact_sel_jit
                cfg = NeuralBound._build_config(d, neural_network_kwargs)
                ell1 = jax.tree.map(lambda a: a[None], p_mode_dev)
                sel, n_sel_dev = _mode_sel_jit(
                    pts_dev, valid_dev, ell1, jnp.ones(1, bool))
                pts_c, log_l_c, above_c, valid_c = _compact_sel_jit(
                    pts_dev, log_l_dev, above, sel, cls.SPEC_COMPACT)
                small, flat = NeuralBound.dispatch_build(
                    pts_c, log_l_c, above_c, valid_c, ell1,
                    np.ones(1, bool), 1, bound.keys, n_networks, cfg,
                    enlarge_per_dim)
                spec = (small, flat, n_sel_dev)

        if spec is not None:
            # Merged fetch: spec[0] is a training output, so this waits
            # for the speculative build even when it turns out discarded
            # (a unimodal->multimodal transition pays one wasted training
            # wait, once per transition — after it, expect_modes > 1
            # skips speculation). Splitting the fetch to decide first
            # would instead cost one extra round trip on EVERY unimodal
            # bound, the overwhelmingly common case.
            with region('bound.prologue+spec_fetch'):
                packed, spec_small, n_sel_spec = fetch_many(
                    packed_dev, spec[0], spec[2])
            packed = packed.astype(np.float64)
            n_sel_root = int(n_sel_spec)
            spec_fits = n_sel_root <= cls.SPEC_COMPACT
            bound.spec_overflow = not spec_fits
        else:
            n_sel_dev0 = None
            if n_networks > 0 and expect_modes <= 1:
                # Unimodal-likely non-speculative path: count the root
                # mode's selected points over the full block now so the
                # batched builder can skip its own count fetch (joins the
                # prologue fetch, no extra round trip).
                from .neural import _mode_sel_jit
                ell1 = jax.tree.map(lambda a: a[None], p_mode_dev)
                _, n_sel_dev0 = _mode_sel_jit(
                    pts_dev, valid_dev, ell1, jnp.ones(1, bool))
            with region('bound.prologue_fetch'):
                if n_sel_dev0 is not None:
                    packed, n_sel_np = fetch_many(packed_dev, n_sel_dev0)
                    n_sel_root = int(n_sel_np)
                else:
                    packed = fetch(packed_dev, np.float64)
                    n_sel_root = None
            packed = np.asarray(packed, np.float64)
            spec_fits = False
            bound.spec_overflow = False

        n_packed = d + 2 * d * d + 1
        n_above = int(packed[0])
        off = 1
        mode_params0 = unpack_ell(packed[off:off + n_packed], d)
        off += n_packed
        child_params = [
            unpack_ell(packed[off + i * n_packed:
                              off + (i + 1) * n_packed], d)
            for i in range(2)]
        off += 2 * n_packed
        child_counts = packed[off:off + 2].astype(int)
        off += 2
        ucem_vec = packed[off:off + n_packed + d]
        off += n_packed + d
        mc_tot, mc_acc = packed[off:off + 2].astype(int)
        dim_cube = ucem_vec[-d:] > 0.5
        outer_params0 = unpack_ell(ucem_vec[:-d], d, ~dim_cube, dim_cube)
        if float(outer_params0.log_v) > 0:
            # Rare: the greedy descent did not beat the unit cube; redo
            # this member with the grow-from-empty search.
            outer_params0 = None

        # Mode finding: resolve the prologue's first split attempt with
        # the exact rules Union.split applies (blocked root, overlap veto,
        # volume-must-shrink; reference: nautilus/bounds/union.py:195-213),
        # then continue the serial masked split loop only if it succeeded.
        from .union import split_accept
        with region('bound.mode_union'):
            multi_ellipsoid = Union.compute_masked(
                pts_fit, above_fit, n_above,
                enlarge_per_dim=enlarge_per_dim,
                n_points_min=n_points_min, bound_class=Ellipsoid,
                keys=bound.keys, params0=mode_params0)
        split_ok = (
            not bool(multi_ellipsoid.block[0]) and
            not ellipsoids_overlap(child_params) and
            split_accept(float(mode_params0.log_v),
                         [float(p.log_v) for p in child_params]))
        if split_ok:
            with region('bound.mode_split_loop'):
                multi_ellipsoid._adopt_first_split(
                    child_params, [m0, m1], child_counts)
                while multi_ellipsoid.split(allow_overlap=False):
                    pass

        if spec is not None and spec_fits and not split_ok:
            # Mode finding stayed unimodal and the compacted block held
            # every selected point: the speculative build is the real
            # build.
            bound.neural_bounds = NeuralBound.finish_build(
                spec_small.astype(np.float64), spec[1], 1, d, cfg,
                n_networks, bound.keys)
            bound.neural_flat = spec[1]
        else:
            with region('bound.neural_build'):
                bound.neural_bounds, bound.neural_flat = \
                    NeuralBound.compute_batched_device(
                        pts_dev, log_l_dev, valid_dev, above,
                        multi_ellipsoid.params_list,
                        enlarge_per_dim=enlarge_per_dim,
                        n_networks=n_networks,
                        neural_network_kwargs=neural_network_kwargs,
                        keys=bound.keys,
                        n_sel=(n_sel_root
                               if not split_ok else None))

        with region('bound.outer_union'):
            bound.outer_bound = Union.compute_masked(
                pts_fit, above_fit, n_above,
                enlarge_per_dim=enlarge_per_dim,
                n_points_min=n_points_min,
                bound_class=UnitCubeEllipsoidMixture, keys=bound.keys,
                params0=outer_params0)
        if outer_params0 is not None:
            # Seed the MC volume estimate from the prologue's counters —
            # the split-until decision below reads log_v for free.
            bound.outer_bound.n_sample += int(mc_tot)
            bound.outer_bound.n_reject += int(mc_tot - mc_acc)

        log_v_threshold = np.log(split_threshold * enlarge_per_dim ** d)
        with region('bound.outer_split_trim'):
            while bound.outer_bound.log_v - log_v_target > log_v_threshold:
                if not bound.outer_bound.split():
                    break
            while bound.outer_bound.log_v - log_v_target > log_v_threshold:
                if not bound.outer_bound.trim():
                    break

        bound.points = np.zeros((0, d))
        bound.n_sample = 0
        bound.n_reject = 0
        return bound

    # ------------------------------------------------------------------ #

    def _stack(self):
        """Stacked neural-bound pytree for the fused kernels."""
        if self._stack_cache is None:
            modes = self.neural_bounds
            m = len(modes)
            m_pad = bucket_size(m, floor=2)
            d = self.n_dim

            ell_list = [nb.outer_bound.params for nb in modes]
            ell_stacked, mode_mask = G.stack_ell_params(ell_list, m_pad)

            has_any_net = any(nb.emulator is not None for nb in modes)
            if has_any_net:
                ref = next(nb.emulator for nb in modes
                           if nb.emulator is not None)
                n_layers = len(ref.params.weights)
                e = ref.n_networks
                means, scales, cuts, has_nets = [], [], [], []
                weights = [[] for _ in range(n_layers)]
                biases = [[] for _ in range(n_layers)]
                for nb in modes:
                    emu = nb.emulator
                    if emu is not None:
                        means.append(np.asarray(emu.mean))
                        scales.append(np.asarray(emu.scale))
                        cuts.append(nb.score_predict_min)
                        has_nets.append(True)
                        for k in range(n_layers):
                            weights[k].append(np.asarray(
                                emu.params.weights[k]))
                            biases[k].append(np.asarray(
                                emu.params.biases[k]))
                    else:
                        means.append(np.zeros(d))
                        scales.append(np.ones(d))
                        cuts.append(0.0)
                        has_nets.append(False)
                        for k in range(n_layers):
                            weights[k].append(np.zeros_like(
                                np.asarray(ref.params.weights[k])))
                            biases[k].append(np.zeros_like(
                                np.asarray(ref.params.biases[k])))
                # Pad to m_pad with dummies.
                for _ in range(m_pad - m):
                    means.append(np.zeros(d))
                    scales.append(np.ones(d))
                    cuts.append(0.0)
                    has_nets.append(False)
                    for k in range(n_layers):
                        weights[k].append(np.zeros_like(
                            np.asarray(ref.params.weights[k])))
                        biases[k].append(np.zeros_like(
                            np.asarray(ref.params.biases[k])))
                w_stacked = tuple(
                    np.stack(wk).astype(np.float32) for wk in weights)
                b_stacked = tuple(
                    np.stack(bk).astype(np.float32) for bk in biases)
                mean_arr = np.stack(means).astype(np.float32)
                scale_arr = np.stack(scales).astype(np.float32)
            else:
                # No emulators at all (n_networks=0): dummy single-layer net.
                w_stacked = (np.zeros((m_pad, 1, d, 1), np.float32),)
                b_stacked = (np.zeros((m_pad, 1, 1), np.float32),)
                mean_arr = np.zeros((m_pad, d), np.float32)
                scale_arr = np.ones((m_pad, d), np.float32)
                cuts = [0.0] * m_pad
                has_nets = [False] * m_pad

            if len(cuts) < m_pad:
                cuts += [0.0] * (m_pad - len(cuts))
                has_nets += [False] * (m_pad - len(has_nets))

            # Built on host, uploaded once.
            self._stack_cache = put_tree(NeuralStack(
                ell=ell_stacked,
                mean=mean_arr, scale=scale_arr,
                weights=w_stacked, biases=b_stacked,
                cut=np.asarray(cuts, np.float32),
                has_net=np.asarray(has_nets, bool),
                mode_mask=mode_mask))
        return self._stack_cache

    def stack_parts(self, k_pad, m_pad):
        """This bound's geometry slot for a whole-run :class:`BoundStack`.

        Pads the outer union to ``k_pad`` members and the neural modes to
        ``m_pad`` so every bound stacks into one pytree (see
        ops/shell_stack.py). Only the tiny host-resident fields are
        returned here — the MLP ensemble weights are inserted on device
        from :meth:`neural_flat_array` by the sampler's stack builder.
        """
        outer_stacked, outer_mask = G.stack_ell_params(
            self.outer_bound.params_list, k_pad)

        d = self.n_dim
        ell_list = [nb.outer_bound.params for nb in self.neural_bounds]
        if len(ell_list) == 0:
            ell_stacked, mode_mask = G.stack_ell_params(
                [UnitCubeEllipsoidMixture._pure_cube_params(d)], m_pad)
            mode_mask = np.zeros(m_pad, bool)
        else:
            ell_stacked, mode_mask = G.stack_ell_params(ell_list, m_pad)

        means, scales, cuts, has_nets = [], [], [], []
        for i in range(m_pad):
            nb = (self.neural_bounds[i]
                  if i < len(self.neural_bounds) else None)
            emu = nb.emulator if nb is not None else None
            means.append(np.asarray(emu.mean) if emu is not None
                         else np.zeros(d))
            scales.append(np.asarray(emu.scale) if emu is not None
                          else np.ones(d))
            cuts.append(nb.score_predict_min if emu is not None else 0.0)
            has_nets.append(emu is not None)

        shift = np.zeros(d, np.float32)
        if self.shift is not None:
            shift[self.shift.periodic] = 0.5 - self.shift.centers
        return dict(
            outer=outer_stacked, outer_mask=outer_mask, ell=ell_stacked,
            mean=np.stack(means).astype(np.float32),
            scale=np.stack(scales).astype(np.float32),
            cut=np.asarray(cuts, np.float32),
            has_net=np.asarray(has_nets, bool),
            mode_mask=mode_mask, shift=shift)

    def neural_flat_array(self):
        """Packed (modes, E, P) ensemble parameters for stack insertion.

        On-device when the bound was just trained; rebuilt on host from the
        per-emulator parameters after a checkpoint resume.
        """
        if self.neural_flat is None:
            rows = []
            for nb in self.neural_bounds:
                emu = nb.emulator
                if emu is None:
                    continue
                e = emu.n_networks
                parts = (
                    [np.asarray(w).reshape(e, -1)
                     for w in emu.params.weights] +
                    [np.asarray(b).reshape(e, -1)
                     for b in emu.params.biases])
                rows.append(np.concatenate(parts, axis=1))
            if rows:
                self.neural_flat = np.stack(rows).astype(np.float32)
        return self.neural_flat

    def contains(self, points):
        """Whether each point lies in the neural union (fused stack kernel)."""
        single = np.asarray(points).ndim == 1
        points = np.atleast_2d(np.asarray(points, np.float64))
        if self.shift is not None:
            points = self.shift.transform(points)
        pts, n = pad_batch(points)
        stacked, member_mask = self.outer_bound._stacked()
        in_bound = fetch(
            _union_contains_jit(stacked, member_mask, pts, True))[:n]
        if len(self.neural_bounds) > 0:
            in_bound = in_bound & fetch(
                _neural_contains_jit(self._stack(), pts))[:n]
        return in_bound[0] if single else in_bound

    def sample(self, n_points=100, return_points=True, pool=None):
        """Draw points from the bound via the fused rejection kernel.

        The ``pool`` argument is accepted for API compatibility but unused:
        batched device sampling replaces the reference's process-pool path
        (reference: nautilus/bounds/nautilus.py:223-237).
        """
        while len(self.points) < n_points:
            stacked, member_mask = self.outer_bound._stacked()
            packed = fetch(_nautilus_sample_jit(
                stacked, member_mask, self._stack(), self.keys.next(),
                self.SAMPLE_BATCH), np.float64)
            outer_accept = packed[:, -2] > 0.5
            neural_accept = packed[:, -1] > 0.5
            n_delivered = int(np.sum(outer_accept))
            n_kept = int(np.sum(neural_accept))
            self.outer_bound.n_sample += self.SAMPLE_BATCH
            self.outer_bound.n_reject += self.SAMPLE_BATCH - n_delivered
            self.n_sample += n_delivered
            self.n_reject += n_delivered - n_kept
            accepted = packed[:, :-2][neural_accept]
            self.points = np.vstack([self.points, accepted])

        if return_points:
            points = self.points[:n_points]
            self.points = self.points[n_points:]
            if self.shift is not None:
                points = self.shift.transform(points, inverse=True)
            return points

    @property
    def log_v(self):
        """Natural log of the estimated bound volume."""
        if self.n_sample == 0:
            self.sample(return_points=False)
        return float(self.outer_bound.log_v +
                     np.log(1.0 - self.n_reject / self.n_sample))

    @property
    def n_ell(self):
        return int(np.sum([
            np.any(~np.asarray(p.dim_cube))
            for p in self.outer_bound.params_list]))

    @property
    def n_net(self):
        if self.neural_bounds and self.neural_bounds[0].emulator is not None:
            return len(self.neural_bounds) * \
                self.neural_bounds[0].emulator.n_networks
        return 0

    # ------------------------------------------------------------------ #

    def write(self, group):
        """Serialize the full bound tree into an HDF5 group."""
        group.attrs['type'] = 'NautilusBound'
        group.attrs['n_dim'] = self.n_dim
        if self.shift is not None:
            self.shift.write(group.create_group('shift'))
        group.attrs['n_neural_bounds'] = len(self.neural_bounds)
        for i, nb in enumerate(self.neural_bounds):
            nb.write(group.create_group('neural_bound_{}'.format(i)))
        self.outer_bound.write(group.create_group('outer_bound'))
        group.create_dataset('points', data=self.points,
                             maxshape=(None, self.n_dim))
        group.attrs['n_sample'] = self.n_sample
        group.attrs['n_reject'] = self.n_reject

    def update(self, group):
        """Refresh the serialized sampling counters in an existing HDF5
        group."""
        group.attrs['n_sample'] = self.n_sample
        group.attrs['n_reject'] = self.n_reject
        self.outer_bound.update(group['outer_bound'])
        group['points'].resize(self.points.shape)
        group['points'][...] = self.points

    @classmethod
    def read(cls, group, keys=None):
        """Reconstruct the bound tree from an HDF5 group."""
        bound = cls()
        bound.keys = keys if keys is not None else KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        if 'shift' in group:
            bound.shift = PhaseShift.read(group['shift'])
        else:
            bound.shift = None
        bound.neural_bounds = []
        for i in range(int(group.attrs['n_neural_bounds'])):
            bound.neural_bounds.append(NeuralBound.read(
                group['neural_bound_{}'.format(i)], keys=bound.keys))
        bound.outer_bound = Union.read(group['outer_bound'], keys=bound.keys)
        bound.points = np.array(group['points'])
        bound.n_sample = int(group.attrs['n_sample'])
        bound.n_reject = int(group.attrs['n_reject'])
        return bound

    def reset(self, keys=None):
        self.points = np.zeros((0, self.n_dim))
        self.n_sample = 0
        self.n_reject = 0
        if keys is not None:
            self.keys = keys
        self.outer_bound.reset(keys)
