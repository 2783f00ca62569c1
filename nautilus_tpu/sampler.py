"""The TPU-native importance nested sampler.

Host-side adaptive control loop with all hot math on device: candidate
points are drawn through fused rejection-sampling kernels, neural bounds
train as vmapped MLP ensembles, and jittable likelihoods evaluate on device
fused with the prior transform (optionally sharded over a device mesh).

Control-flow parity with the reference sampler (reference:
nautilus/sampler.py): two phases (exploration builds nested shells, sampling
fills them to a target effective sample size), transfer points, plateau
handling, blobs, checkpoint/resume.
"""

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None
import logging
import numpy as np
import threading

from collections import OrderedDict
from functools import partial
from pathlib import Path
from scipy.special import logsumexp
from shutil import get_terminal_size
from time import time
from warnings import warn

import jax
import jax.numpy as jnp

from .bounds import UnitCube, NautilusBound
from .bounds.basic import UnitCubeEllipsoidMixture
from .neural import DEFAULT_HIDDEN
from .ops import geometry as G
from .ops.arena import PointArena
from .ops.neural_stack import NeuralStack, insert_neural_slot_jit
from .ops.shell_stack import BoundStack, arena_transfer_split, \
    bound_contains_matrix, collect_shell_points, exploration_phase, \
    mc_volume_counters, sampling_phase, stack_clear_slot, stack_set_slot, \
    stack_slot_contains
from .pool import SamplerPool, likelihood_worker
from .prior import Prior
from .utils.bucket import bucket_size, pad_batch
from .utils.fetch import fetch, fetch_many, put_tree, warmup
from .utils.keys import KeyStream
from .utils.prof import region as prof_region
from .utils import prewarm

# Compiled phase callables shared across Sampler instances with identical
# (likelihood, prior, batching) configuration — repeat runs in one process
# reuse loaded executables instead of re-tracing (see _step_cache_key).
# LRU-bounded: entries hold strong references to likelihood closures, mesh
# objects, and loaded executables, so an unbounded cache would leak
# compiled programs in long-lived processes that build many samplers.
_STEP_FN_CACHE = OrderedDict()
_STEP_FN_CACHE_MAX = 8
# Guards check-then-insert on the shared callable stores: the preload
# daemon thread builds the same entries concurrently with the run loop,
# and duplicate jit instances would each pay their own executable load.
_STEP_FN_LOCK = threading.Lock()

_mc_volume_jit = partial(jax.jit, static_argnums=(3, 4, 5))(
    mc_volume_counters)
_slot_contains_jit = jax.jit(stack_slot_contains)
_contains_matrix_jit = jax.jit(bound_contains_matrix)
_arena_transfer_split_jit = jax.jit(arena_transfer_split)


@jax.jit
def _pack_collect_meta(buf):
    """Counters + log_l + innermost-earlier-bound columns of a collection
    buffer — everything the host needs from a batch, coordinates excluded
    (they stay on device, appended to the point arena)."""
    n_t = buf.shape[0] - 1
    d = buf.shape[1] - 2
    return jnp.concatenate([buf[n_t, :4], buf[:n_t, d], buf[:n_t, d + 1]])


@jax.jit
def _phase_log_l_col(buf):
    return buf[:, buf.shape[1] - 1]


class Sampler:
    """Dynamic sampler built on importance nested sampling.

    Drop-in analogue of the reference Sampler (reference:
    nautilus/sampler.py:21-129) with one addition: ``vectorized='jax'``
    declares the likelihood jittable, enabling the fully fused device path
    (prior transform + likelihood in one XLA program).
    """

    def __init__(self, prior, likelihood, n_dim=None, n_live=2000,
                 n_update=None, enlarge_per_dim=1.1, n_points_min=None,
                 split_threshold=100, periodic=None, n_networks=4,
                 neural_network_kwargs=None, prior_args=None,
                 prior_kwargs=None, likelihood_args=None,
                 likelihood_kwargs=None, n_batch=None,
                 n_like_new_bound=None, vectorized=False, pass_dict=None,
                 pool=None, seed=None, blobs_dtype=None, filepath=None,
                 resume=True, mesh=None):
        if callable(prior):
            self.prior = partial(prior, *(prior_args or []),
                                 **(prior_kwargs or {}))
        else:
            self.prior = prior
        self._base_likelihood = likelihood
        self.likelihood = partial(likelihood, *(likelihood_args or []),
                                  **(likelihood_kwargs or {}))

        if callable(prior):
            if n_dim is None:
                raise ValueError("When passing a function as the 'prior' " +
                                 "argument, 'n_dim' cannot be None.")
            self.n_dim = n_dim
            if pass_dict is None:
                pass_dict = False
        else:
            self.n_dim = prior.dimensionality()
            if pass_dict is None:
                pass_dict = True

        if self.n_dim <= 1:
            raise ValueError(
                'Cannot run the sampler with less than 2 parameters.')

        self.n_live = n_live
        self.n_update = n_update if n_update is not None else n_live
        self.n_like_new_bound = (n_like_new_bound if n_like_new_bound
                                 is not None else 10 * n_live)
        self.enlarge_per_dim = enlarge_per_dim
        self.n_points_min = (n_points_min if n_points_min is not None
                             else self.n_dim + 50)
        self.split_threshold = split_threshold
        self.periodic = periodic
        self.n_networks = n_networks
        self.neural_network_kwargs = neural_network_kwargs or {}
        self.vectorized = vectorized
        self.pass_dict = pass_dict

        # Pools parallelize host (non-JAX) likelihoods only; device kernels
        # replace the reference's sampler pool.
        try:
            pool = list(pool)
        except TypeError:
            pool = [pool]
        if len(pool) > 1 and pool[1] not in (None, 1):
            # Reference semantics: pool=(pool_l, pool_s) splits likelihood
            # vs bound-sampling work (reference: nautilus/sampler.py
            # pool handling). Bound sampling runs in device kernels here,
            # so the second slot has nothing to do — nothing is lost.
            logging.getLogger(__name__).debug(
                'pool[1] (bound-sampling pool) is unused: bound sampling '
                'runs in on-device kernels; only pool[0] drives host '
                'likelihood evaluation.')
        pool_l = pool[0]
        if pool_l in [None, 1]:
            self.pool_l = None
        elif isinstance(pool_l, int):
            self.pool_l = SamplerPool(pool_l, likelihood=self.likelihood)
            self.likelihood = likelihood_worker
        else:
            self.pool_l = SamplerPool(pool_l)

        if n_batch is None:
            if vectorized == 'jax':
                # Device path: each batch costs a fixed number of host
                # round trips regardless of size, and the likelihood is
                # fused on device — bigger batches amortize dispatch
                # latency at no extra cost. One batch per exploration
                # cycle (n_batch = n_update = n_live by default) makes the
                # host loop latency-minimal.
                n_batch = max(500, n_live if n_update is None else n_update)
            else:
                s = 1 if self.pool_l is None else self.pool_l.size
                n_batch = (100 // s + (100 % s != 0)) * s
        self.n_batch = n_batch

        self.seed = seed
        self.keys = KeyStream(seed)
        self.rng = np.random.default_rng(seed)
        # Establish the device->host transfer channel in the background:
        # on tunneled TPU backends the first copy of a process stalls for
        # minutes while the link connects (see utils/fetch.py), so it
        # starts now and overlaps tracing/compilation.
        warmup()
        # Optional jax.sharding.Mesh: shards device-likelihood batches over
        # the 'dp' axis (the TPU-native analogue of the reference's
        # likelihood pool).
        self.mesh = mesh

        self._jax_eval_cache = {}
        self._bound_stack = None
        self._local_step_fns = None
        # In-flight speculative candidate batch (device future). Issuance
        # and reuse follow deterministic rules so checkpoint resume stays
        # bitwise identical; see _add_samples_device.
        self._prefetch = None

        # Wall-time accounting per phase (seconds): 'bound' (bound
        # construction incl. emulator training), 'sample' (candidate
        # drawing + fused likelihood), 'likelihood' (host-path likelihood
        # evaluation), 'total' (accumulated across run() calls). The
        # reference exposes only call counters (reference:
        # nautilus/sampler.py:906); wall-time metrics and the derived
        # evals-per-second rate are first-class here.
        self.timing = {'bound': 0.0, 'sample': 0.0, 'likelihood': 0.0,
                       'total': 0.0}

        # Run state. Point coordinates live in the arena (on device for
        # the fused likelihood path); the host tracks shells and the
        # transfer set as arena row-index arrays plus log_l/blob arrays.
        self.n_like = 0
        self.explored = False
        self.bounds = []
        self.arena = PointArena(self.n_dim, device=(vectorized == 'jax'))
        self.idx = []
        self.log_l = []
        self.blobs = None
        self.blobs_dtype = blobs_dtype
        self._discard_exploration = False
        self.shell_n = np.zeros(0, dtype=int)
        self.shell_n_sample = np.zeros(0, dtype=int)
        self.shell_n_eff = np.zeros(0, dtype=float)
        self.shell_log_l_min = np.zeros(0, dtype=float)
        self.shell_log_l = np.zeros(0, dtype=float)
        self.shell_log_v = np.zeros(0, dtype=float)
        self.shell_n_sample_exp = np.zeros(0, dtype=int)
        self.shell_end_exp = np.zeros(0, dtype=int)
        self.idx_t = np.zeros(0, dtype=int)
        self.shell_t = np.zeros(0, dtype=int)
        self.log_l_t = np.zeros(0)
        self.blobs_t = None
        self.n_update_iter = 0
        self.n_like_iter = 0
        # Shells that failed to deliver a full batch within the candidate
        # budget: they stop being fill/variance targets (with a warning)
        # instead of aborting the run.
        self._starved = set()
        # Latched off after a speculative-build compact overflow (affects
        # key consumption, so it is checkpointed).
        self._spec_overflowed = False

        self.filepath = filepath
        if resume and filepath is not None and Path(filepath).exists():
            self._read_state(filepath)

    # ------------------------------------------------------------------ #
    # main loop

    def run(self, f_live=0.01, n_shell=1, n_eff=10000, n_like_max=np.inf,
            discard_exploration=False, timeout=np.inf, verbose=False):
        """Run until convergence (reference: nautilus/sampler.py:373-505).

        Returns True if converged; False if stopped by ``n_like_max`` or
        ``timeout``.
        """
        t_start = time()
        self._preload_async()

        if verbose:
            if self.n_like == 0:
                print('Starting the nautilus-tpu sampler...')
            else:
                print('Resuming nautilus-tpu run...')
            self.print_status(header=True)

        if len(self.bounds) == 0:
            self.add_bound()
            self.n_update_iter = -self.n_live
            self.n_like_iter = 0

        success = (self.explored and
                   not np.any(self._unfilled_shells(n_shell)) and
                   self.n_eff >= n_eff)

        while ((self.n_like < n_like_max) and
               (time() - t_start < timeout) and not success):

            if not self.explored:
                if ((self.n_update_iter >= self.n_update or
                     self.n_like_iter >= self.n_like_new_bound) and
                        np.sum(self.shell_n) > self.n_live):
                    self.add_bound(verbose=verbose)
                    self.n_update_iter = 0
                    self.n_like_iter = 0
                    if self.filepath is not None:
                        self.write(self.filepath, overwrite=True)

                if (self.vectorized == 'jax' and
                        not bool(np.any(self.shell_t >= 0))):
                    # Multi-batch device path: both exploration stopping
                    # rules run on device, one round trip per up-to-
                    # PHASE_MAX_BATCHES batches.
                    self._exploration_phase_device(
                        f_live, n_like_max, verbose=verbose)
                else:
                    self.n_update_iter += self.add_samples(
                        -1, verbose=verbose)
                    self.n_like_iter += self.n_batch
                    if self.filepath is not None:
                        if self.n_like == self.n_batch:
                            self.write(self.filepath, overwrite=True)
                        self.write_shell_update(self.filepath, -1)

                if self.f_live <= f_live:
                    # Remove unoccupied shells: they hold ~zero volume and
                    # may never yield a point.
                    if np.any(self.shell_n == 0):
                        self._bound_stack = None
                        for shell in np.flatnonzero(self.shell_n == 0)[::-1]:
                            self.bounds.pop(shell)
                            self.idx.pop(shell)
                            self.log_l.pop(shell)
                            if self.blobs is not None:
                                self.blobs.pop(shell)
                            for key in ['shell_n', 'shell_n_sample',
                                        'shell_n_eff', 'shell_log_l_min',
                                        'shell_log_l', 'shell_log_v']:
                                setattr(self, key, np.delete(
                                    getattr(self, key), shell))

                    self.shell_n_sample_exp = np.copy(self.shell_n_sample)
                    self.shell_end_exp = np.array(
                        [len(i) for i in self.idx])
                    self.explored = True
                    self.discard_exploration = discard_exploration
                    if self.filepath is not None:
                        self.write(self.filepath, overwrite=True)

            elif self.vectorized == 'jax':
                # Device path: the whole fill-or-argmax decision loop runs
                # on device, one round trip per PHASE_MAX_BATCHES batches.
                if not self._sampling_phase_device(
                        n_shell, n_eff, n_like_max, verbose=verbose):
                    break

            elif np.any(self._unfilled_shells(n_shell)):
                shell = np.flatnonzero(self._unfilled_shells(n_shell))[0]
                self.add_samples(shell, verbose=verbose)
                if self.filepath is not None:
                    self.write_shell_update(self.filepath, shell)

            elif self.n_eff < n_eff:
                crit = self._shell_criterion()
                if not np.any(crit > -np.inf):
                    warn('All shells are starved; stopping the sampling '
                         'phase before reaching the effective sample size '
                         'target.', RuntimeWarning, stacklevel=2)
                    break
                shell = np.argmax(crit)
                self.add_samples(shell, verbose=verbose)
                if self.filepath is not None:
                    self.write_shell_update(self.filepath, shell)

            success = (self.explored and
                       not np.any(self._unfilled_shells(n_shell)) and
                       self.n_eff >= n_eff)

        self.timing['total'] += time() - t_start

        if verbose:
            self.print_status('Finished' if success else 'Stopped')

        return success

    def _preload_async(self):
        """Compile/load the later-phase executables on a background thread.

        A cold run pays seconds of trace + persistent-cache-load per
        compiled program, serialized along the run's critical path. The
        sampling-phase driver and the fused single-batch collectors are
        not needed until well into the run, so a daemon thread lowers and
        compiles them concurrently — the work interleaves into the main
        thread's XLA compile and link-wait gaps (both release the GIL).
        Shapes are derived from the run configuration alone; values are
        dummies (lower/compile never executes). Best-effort: any failure
        leaves the normal lazy path untouched.
        """
        if self.vectorized != 'jax' or getattr(self, '_preloaded', False):
            return
        self._preloaded = True


        def work():
            try:
                from .bounds.nautilus import NautilusBound as NB, \
                    _bound_prologue_jit
                from .bounds.neural import NeuralBound, _batched_build_jit, \
                    _compact_sel_jit, _mode_sel_jit

                d = self.n_dim
                f32 = np.float32
                e_nets = max(self.n_networks, 1)
                k_pad, m_pad, b_pad = 4, 1, 32
                sizes = self._mlp_sizes()
                n_layers = len(sizes) - 1
                key = self.keys.key_at(0)
                keys1 = jax.random.split(key, 1)
                epd = float(self.enlarge_per_dim)

                def blk(n):
                    return (np.zeros((n, d), f32), np.zeros(n, f32),
                            np.zeros(n, bool))

                # Bound-construction chain first: it is needed within the
                # run's first seconds. The builder (the largest program)
                # has ONE shape thanks to the fixed speculative compact.
                if self.n_networks > 0:
                    cfg = NeuralBound._build_config(
                        d, self.neural_network_kwargs)
                    eye1 = np.zeros((1, d, d), f32)
                    ell1 = G.EllParams(
                        c=np.zeros((1, d), f32), B=eye1, B_inv=eye1,
                        dim_mask=np.ones((1, d), bool),
                        dim_cube=np.zeros((1, d), bool),
                        log_v=np.zeros(1, f32))
                    pts_c, log_l_c, above_c = blk(NB.SPEC_COMPACT)
                    _batched_build_jit.lower(
                        pts_c, log_l_c, above_c, above_c, ell1,
                        jnp.ones(1, bool), keys1, sizes=tuple(sizes),
                        n_networks=self.n_networks,
                        batch_size=cfg['batch_size'],
                        max_epochs=cfg['max_epochs'],
                        n_iter_no_change=cfg['n_iter_no_change'],
                        lr=cfg['lr'], enlarge_per_dim=epd).compile()
                for n in (2048, 4096):
                    pts_b, log_l_b, valid_b = blk(n)
                    _bound_prologue_jit.lower(
                        pts_b, log_l_b, valid_b,
                        jnp.asarray(0.0, jnp.float32), key, key, epd,
                        int(self.n_points_min)).compile()
                    if self.n_networks > 0:
                        _mode_sel_jit.lower(
                            pts_b, valid_b, ell1,
                            jnp.ones(1, bool)).compile()
                        _compact_sel_jit.lower(
                            pts_b, log_l_b, valid_b, valid_b,
                            NB.SPEC_COMPACT).compile()

                parts = self._cube_stack_parts(k_pad, m_pad)

                def stacked(field):
                    return jax.tree.map(
                        lambda x: np.broadcast_to(
                            np.asarray(x), (b_pad,) + np.shape(x)),
                        parts[field])

                weights = tuple(np.zeros(
                    (b_pad, m_pad, e_nets, sizes[k], sizes[k + 1]), f32)
                    for k in range(n_layers))
                biases = tuple(np.zeros(
                    (b_pad, m_pad, e_nets, sizes[k + 1]), f32)
                    for k in range(n_layers))
                neural = NeuralStack(
                    ell=stacked('ell'), mean=stacked('mean'),
                    scale=stacked('scale'), weights=weights, biases=biases,
                    cut=stacked('cut'), has_net=stacked('has_net'),
                    mode_mask=stacked('mode_mask'))
                stack = BoundStack(
                    outer=stacked('outer'), outer_mask=stacked('outer_mask'),
                    neural=neural, shift=np.zeros((b_pad, d), f32),
                    bound_mask=np.zeros(b_pad, bool))
                vb = np.zeros(b_pad, f32)
                ib = np.zeros(b_pad, np.int32)
                bb = np.zeros(b_pad, bool)
                self._phase_step().lower(
                    stack, key, ib, ib, vb, vb, vb, vb, vb, bb,
                    np.int32(1), np.float32(1.0), np.int32(1)).compile()
                for need_member in (True, False):
                    # Plain Python int: the real calls pass a weak-typed
                    # index, and the executable cache keys on weak types.
                    self._fused_step(need_member).lower(
                        stack, 0, key).compile()
            except Exception:  # pragma: no cover - best-effort preload
                pass

        threading.Thread(target=work, name='nautilus-tpu-preload',
                         daemon=True).start()

    def _unfilled_shells(self, n_shell):
        """Shells still needing samples; starved shells are exempt."""
        need = self.shell_n < n_shell
        for shell in self._starved:
            need[shell] = False
        return need

    def _shell_criterion(self):
        """Variance-reduction targeting criterion per shell (reference:
        nautilus/sampler.py:488-494), with starved shells masked out."""
        with np.errstate(divide='ignore', invalid='ignore'):
            crit = (self.shell_log_l + self.shell_log_v -
                    0.5 * np.log(self.shell_n) -
                    0.5 * np.log(self.shell_n_eff))
        crit[~np.isfinite(crit)] = -np.inf
        for starved in self._starved:
            crit[starved] = -np.inf
        return crit

    @property
    def evals_per_second(self):
        """Likelihood evaluations per second of accumulated run() time."""
        if self.timing['total'] == 0:
            return 0.0
        return self.n_like / self.timing['total']

    def _points(self, shell):
        """Host coordinates of one shell (materializes the arena prefix)."""
        return self.arena.rows(self.idx[shell])

    @property
    def points(self):
        """Per-shell coordinate arrays (API parity with the reference's
        host-resident lists, reference: nautilus/sampler.py:316). Reading
        this materializes the device arena."""
        return [self._points(shell) for shell in range(len(self.idx))]

    @property
    def points_t(self):
        """Transfer-candidate coordinates (see ``points``)."""
        return self.arena.rows(self.idx_t)

    # ------------------------------------------------------------------ #
    # exploration / sampling internals

    @property
    def discard_exploration(self):
        """Whether exploration-phase points are excluded from the estimates."""
        return self._discard_exploration

    @discard_exploration.setter
    def discard_exploration(self, discard_exploration):
        if not isinstance(discard_exploration, bool):
            raise ValueError("'discard_exploration' must be a bool.")
        self._discard_exploration = discard_exploration
        for index in range(len(self.log_l)):
            self.update_shell_info(index)

    def add_bound(self, verbose=False):
        """Try to build a new bound over the current live set.

        Reference: nautilus/sampler.py:982-1091.
        """
        t_start = time()
        if len(self.bounds) == 0:
            log_l_min = -np.inf
            self.bounds.append(UnitCube.compute(self.n_dim, keys=self.keys))
            success = True
        else:
            if verbose:
                self.print_status('Bounding', end='\r')
            log_l = np.sort(np.concatenate(self.log_l))
            log_l_min = log_l[-self.n_live]

            # Skip likelihood plateaus when enough points lie above them.
            if (np.sum(log_l == log_l_min) > 1 and
                    np.sum(log_l > log_l_min) >= self.n_points_min):
                log_l_min = np.amin(log_l[log_l > log_l_min])

            if np.all(log_l >= log_l_min):
                success = False
            else:
                if self.arena.device:
                    # Device-block construction: the arena's alive rows
                    # (sorted by likelihood) feed every fit/split/train
                    # kernel without the coordinates ever visiting the
                    # host.
                    n_alive = len(log_l)
                    size = bucket_size(n_alive, floor=2048)
                    # Publish the imminent block-bucket transition for the
                    # bound chain's prewarm hooks (cleared below).
                    prewarm.set_hints(
                        {size: 2 * size}
                        if n_alive > 3 * size // 4 else {})
                    blk_pts, blk_log_l, blk_valid = \
                        self.arena.block_sorted(size)
                    # Compact live-set block for the fit kernels (the
                    # full history block is only needed for training
                    # selection; see compute_device's fit_block).
                    n_above_h = int(np.sum(log_l >= log_l_min))
                    size_fit = bucket_size(n_above_h, floor=2048)
                    fit_block = (self.arena.block_top(size_fit)
                                 if size_fit < size else None)
                    points_above = None
                    if self.periodic is not None:
                        all_pts = self.arena.rows(np.concatenate(self.idx))
                        all_log_l = np.concatenate(self.log_l)
                        points_above = all_pts[all_log_l >= log_l_min]
                    prev = self.bounds[-1]
                    expect_modes = (max(len(prev.neural_bounds), 1)
                                    if isinstance(prev, NautilusBound)
                                    else 1)
                    bound = NautilusBound.compute_device(
                        blk_pts, blk_log_l, blk_valid, log_l_min,
                        self.log_v_live,
                        enlarge_per_dim=self.enlarge_per_dim,
                        n_points_min=self.n_points_min,
                        split_threshold=self.split_threshold,
                        periodic=self.periodic,
                        n_networks=self.n_networks,
                        neural_network_kwargs=self.neural_network_kwargs,
                        keys=self.keys, points_above=points_above,
                        expect_modes=expect_modes,
                        speculate=not self._spec_overflowed,
                        fit_block=fit_block)
                    if getattr(bound, 'spec_overflow', False):
                        # This run's selected point sets outgrow the
                        # speculative compact; later builds skip the
                        # wasted dispatch (persisted for resume parity).
                        self._spec_overflowed = True
                else:
                    log_l_cat = np.concatenate(self.log_l)
                    points = self.arena.rows(np.concatenate(self.idx))[
                        np.argsort(log_l_cat)]
                    bound = NautilusBound.compute(
                        points, log_l, log_l_min, self.log_v_live,
                        enlarge_per_dim=self.enlarge_per_dim,
                        n_points_min=self.n_points_min,
                        split_threshold=self.split_threshold,
                        periodic=self.periodic,
                        n_networks=self.n_networks,
                        neural_network_kwargs=self.neural_network_kwargs,
                        keys=self.keys)

                # MC volume seeding through the run stack: the new bound is
                # inserted speculatively and only four counters are fetched
                # (reference behavior: nautilus/sampler.py:1032-1039). The
                # transfer-containment kernel is dispatched in the same
                # breath so its device time and link latency overlap the
                # counter fetch.
                self.bounds.append(bound)
                stack = self._stack_insert(len(self.bounds) - 1, bound)
                subs = self._prewarm_subs(stack)
                prewarm.submit_like(
                    _mc_volume_jit, subs, stack, len(self.bounds) - 1,
                    self.keys.key_at(self.keys.state['counter']),
                    1000, 1024, 8192)
                mc_future = _mc_volume_jit(
                    stack, len(self.bounds) - 1, self.keys.next(),
                    1000, 1024, 8192)
                n_shells = len(self.bounds) - 1
                if self.arena.device:
                    # Containment of every arena row in the new bound: a
                    # bit-packed n/8-byte fetch; the updated alive mask
                    # stays on device.
                    prewarm.submit_like(
                        _arena_transfer_split_jit, subs, stack,
                        len(self.bounds) - 1, self.arena.d_pts,
                        self.arena.d_alive)
                    bits_future, alive_new = _arena_transfer_split_jit(
                        stack, len(self.bounds) - 1, self.arena.d_pts,
                        self.arena.d_alive)
                else:
                    pts_pad, n_all = pad_batch(
                        np.concatenate([self._points(shell)
                                        for shell in range(n_shells)]),
                        floor=16384)
                    contains_future = _slot_contains_jit(
                        stack, len(self.bounds) - 1, pts_pad)
                if self.arena.device:
                    with prof_region('bound.mc_transfer_fetch'):
                        counters, bits_np = fetch_many(mc_future,
                                                       bits_future)
                else:
                    counters = fetch(mc_future)
                counters = counters.astype(int)
                n_tot, n_outer, n_self = (int(c) for c in counters[:3])
                bound.outer_bound.n_sample += n_tot
                bound.outer_bound.n_reject += n_tot - n_outer
                bound.n_sample += n_outer
                bound.n_reject += n_outer - n_self

                # Only accept a new bound if it is smaller.
                if bound.log_v < self.bounds[-2].log_v:
                    success = True
                else:
                    self.bounds.pop()
                    if self._bound_stack is not None:
                        # Clear the speculative slot in place; no rebuild.
                        self._bound_stack = stack_clear_slot(
                            self._bound_stack,
                            jnp.asarray(len(self.bounds), jnp.int32))
                    success = False

        prewarm.set_hints({})
        if success:
            self.shell_n = np.append(self.shell_n, 0)
            self.shell_n_sample = np.append(self.shell_n_sample, 0)
            self.shell_n_eff = np.append(self.shell_n_eff, 0)
            self.shell_log_l = np.append(self.shell_log_l, np.nan)
            self.shell_log_v = np.append(self.shell_log_v, np.nan)
            self.shell_log_l_min = np.append(self.shell_log_l_min, log_l_min)
            self.idx.append(np.zeros(0, dtype=int))
            self.log_l.append(np.zeros(0))
            if self.blobs is not None:
                self.blobs.append(np.zeros(
                    self.blobs[-1][:0].shape, dtype=self.blobs_dtype))
        else:
            self.shell_log_l_min[-1] = log_l_min
            self.timing['bound'] += time() - t_start
            return False

        # Move points of previous shells that fall inside the new bound to
        # the transfer set: their likelihoods can be reused. Pure index
        # bookkeeping — no coordinates move.
        if len(self.bounds) > 1:
            shell_t = []
            idx_t = []
            log_l_t = []
            blobs_t = [] if self.blobs is not None else None

            n_shells = len(self.bounds) - 1
            if self.arena.device:
                self.arena.set_alive(alive_new)
                bits = np.unpackbits(bits_np).astype(bool)

                def shell_in_bound(shell):
                    return bits[self.idx[shell]]
            else:
                in_bound_all = fetch(contains_future)[:n_all]
                offsets = np.cumsum([0] + [len(self.idx[shell])
                                           for shell in range(n_shells)])

                def shell_in_bound(shell):
                    return in_bound_all[offsets[shell]:offsets[shell + 1]]

            for shell in range(n_shells):
                in_bound = shell_in_bound(shell)
                shell_t.append(np.repeat(shell, np.sum(in_bound)))
                idx_t.append(self.idx[shell][in_bound])
                self.idx[shell] = self.idx[shell][~in_bound]
                log_l_t.append(self.log_l[shell][in_bound])
                self.log_l[shell] = self.log_l[shell][~in_bound]
                if self.blobs is not None:
                    blobs_t.append(self.blobs[shell][in_bound])
                    self.blobs[shell] = self.blobs[shell][~in_bound]
                self.shell_n[shell] -= np.sum(in_bound)
                self.update_shell_info(shell)

            self.shell_t = np.concatenate(shell_t)
            self.idx_t = np.concatenate(idx_t)
            self.log_l_t = np.concatenate(log_l_t)
            if self.blobs is not None:
                self.blobs_t = np.concatenate(blobs_t)

        self.timing['bound'] += time() - t_start
        return True

    # ------------------------------------------------------------------ #
    # likelihood evaluation

    def _jax_transform(self):
        """Jittable unit-cube -> physical transform for the device path."""
        if callable(self.prior):
            return self.prior
        elif isinstance(self.prior, Prior):
            if self.prior.is_uniform():
                # All-uniform: one fused affine map.
                lo, hi = self.prior.uniform_bounds()
                lo = jnp.asarray(lo)
                hi = jnp.asarray(hi)

                def transform(u):
                    return lo + (hi - lo) * u
                return transform
            # General priors: per-family device inverse-CDF kernels with a
            # host-callback escape hatch for exotic dists (reference host
            # map: nautilus/prior.py:117).
            return self.prior.jax_transform()
        raise ValueError(
            "vectorized='jax' requires a callable prior or a "
            "Prior instance.")

    def _jax_eval(self, n):
        """Compiled prior-transform + likelihood for a padded batch size."""
        if n not in self._jax_eval_cache:
            transform = self._jax_transform()
            likelihood = self.likelihood

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                sharding = NamedSharding(
                    self.mesh, PartitionSpec(self.mesh.axis_names[0]))

                @jax.jit
                def evaluate(points):
                    points = jax.lax.with_sharding_constraint(
                        points, sharding)
                    return likelihood(transform(points))
            else:
                @jax.jit
                def evaluate(points):
                    return likelihood(transform(points))

            self._jax_eval_cache[n] = evaluate
        return self._jax_eval_cache[n]

    # ------------------------------------------------------------------ #
    # fused device path

    SHELL_BATCH = 2048

    def _mlp_sizes(self):
        hidden = tuple(self.neural_network_kwargs.get(
            'hidden_layer_sizes', DEFAULT_HIDDEN))
        return (self.n_dim,) + hidden + (1,)

    def _cube_stack_parts(self, k_pad, m_pad):
        """Bound-stack slot for the unit cube (slot 0 of every run)."""
        d = self.n_dim
        cube = UnitCubeEllipsoidMixture._pure_cube_params(d)
        outer_stacked, _ = G.stack_ell_params([cube], k_pad)
        ell_stacked, _ = G.stack_ell_params([cube], m_pad)
        return dict(
            outer=outer_stacked, outer_mask=np.arange(k_pad) < 1,
            ell=ell_stacked,
            mean=np.zeros((m_pad, d), np.float32),
            scale=np.ones((m_pad, d), np.float32),
            cut=np.zeros(m_pad, np.float32),
            has_net=np.zeros(m_pad, bool),
            mode_mask=np.zeros(m_pad, bool),
            shift=np.zeros(d, np.float32))

    def _ensure_stack(self):
        """Whole-run BoundStack: every bound in one padded pytree.

        Rebuilt whenever the bound list changes; shapes are bucketed so XLA
        compiles only a handful of executables per run. The small geometry
        fields are assembled on host and uploaded (a few KB); the MLP
        ensemble weights never visit the host — each bound's trained
        ``neural_flat`` device array is scattered into the stacked weight
        buffers by an on-device insert.
        """
        if self._bound_stack is None:
            e_nets = max(self.n_networks, 1)
            sizes = self._mlp_sizes()
            k_max = max([1] + [len(b.outer_bound.params_list)
                               for b in self.bounds[1:]])
            m_max = max([1] + [len(b.neural_bounds)
                               for b in self.bounds[1:]])
            # Pad floors trade recompiles against per-chunk compute: the
            # membership matrix costs B_pad x M_pad x E MLP forwards per
            # candidate, so the MLP-bearing mode axis stays tight — a
            # unimodal run pays exactly one mode slot — while the
            # geometry-only union axis and the bound axis keep high floors
            # (a typical run crosses 8 bounds, and re-bucketing the bound
            # axis would recompile every phase executable mid-run).
            k_pad = bucket_size(k_max, floor=4)
            m_pad = bucket_size(m_max, floor=1)
            b_pad = bucket_size(len(self.bounds), floor=32)

            parts = [self._cube_stack_parts(k_pad, m_pad)]
            for bound in self.bounds[1:]:
                parts.append(bound.stack_parts(k_pad, m_pad))
            while len(parts) < b_pad:
                parts.append(parts[0])

            def stacked(field):
                return jax.tree.map(
                    lambda *xs: np.stack(xs), *[p[field] for p in parts])

            n_layers = len(sizes) - 1
            weights = tuple(jnp.zeros(
                (b_pad, m_pad, e_nets, sizes[k], sizes[k + 1]), jnp.float32)
                for k in range(n_layers))
            biases = tuple(jnp.zeros(
                (b_pad, m_pad, e_nets, sizes[k + 1]), jnp.float32)
                for k in range(n_layers))
            for i, bound in enumerate(self.bounds[1:], start=1):
                flat = bound.neural_flat_array()
                if flat is not None:
                    weights, biases = insert_neural_slot_jit(
                        weights, biases, jnp.asarray(flat, jnp.float32), i)

            neural = NeuralStack(
                ell=stacked('ell'), mean=stacked('mean'),
                scale=stacked('scale'), weights=weights, biases=biases,
                cut=stacked('cut'), has_net=stacked('has_net'),
                mode_mask=stacked('mode_mask'))
            bound_mask = np.arange(b_pad) < len(self.bounds)
            # Built on host, uploaded once; device buffers are then reused
            # by every fused batch until the bound list changes.
            self._bound_stack = put_tree(BoundStack(
                outer=stacked('outer'), outer_mask=stacked('outer_mask'),
                neural=neural, shift=stacked('shift'),
                bound_mask=bound_mask))
        return self._bound_stack

    def _prewarm_subs(self, stack=None):
        """Dim-substitution map for imminent bucket transitions (arena
        capacity, bound-stack pad) — see utils.prewarm. Empty when no
        transition is near, which makes the submits cheap no-ops."""
        subs = {}
        if self.arena.device and self.arena.n > self.arena.capacity // 2:
            subs[self.arena.capacity] = self.arena.capacity * 2
        if stack is not None:
            b_pad = int(stack.bound_mask.shape[0])
            if len(self.bounds) >= b_pad - 1:
                subs[b_pad] = 2 * b_pad
            k_pad = int(stack.outer_mask.shape[1])
            k_max = max([1] + [len(b.outer_bound.params_list)
                               for b in self.bounds[1:]])
            if k_max >= k_pad:
                subs[k_pad] = 2 * k_pad
        return subs

    def _stack_insert(self, index, bound):
        """Write a freshly built bound into the cached run stack.

        One device dispatch (geometry fields ride in as call arguments,
        MLP weights scatter on device) instead of the full host restack +
        re-upload; falls back to :meth:`_ensure_stack` when the cached
        stack's pad shapes can no longer hold the new bound.
        """
        stack = self._bound_stack
        if stack is not None:
            b_pad = stack.bound_mask.shape[0]
            k_pad = stack.outer_mask.shape[1]
            m_pad = stack.neural.mode_mask.shape[1]
            if (index >= b_pad or
                    len(bound.outer_bound.params_list) > k_pad or
                    max(len(bound.neural_bounds), 1) > m_pad):
                stack = None
        if stack is None:
            self._bound_stack = None
            return self._ensure_stack()

        parts = bound.stack_parts(k_pad, m_pad)
        stack = stack_set_slot(
            stack, jnp.asarray(index, jnp.int32), parts['outer'],
            parts['outer_mask'], parts['ell'], parts['mean'],
            parts['scale'], parts['cut'], parts['has_net'],
            parts['mode_mask'], parts['shift'], jnp.asarray(True))
        flat = bound.neural_flat_array()
        if flat is not None:
            weights, biases = insert_neural_slot_jit(
                stack.neural.weights, stack.neural.biases,
                jnp.asarray(flat, jnp.float32), index)
            stack = stack._replace(neural=stack.neural._replace(
                weights=weights, biases=biases))
        self._bound_stack = stack
        return stack

    # Safety cap on rejection-loop chunks per batch. The reference has NO
    # cap (reference: nautilus/sampler.py:790 loops until delivery) and
    # legitimately brute-forces ~1e-5-acceptance shells (e.g. the deep
    # eggbox, where the outer bound degenerates to the unit cube and only
    # the MLP gate selects); 2^16 chunks = ~134M candidates keeps that
    # regime reachable while still bounding a truly empty shell to device
    # minutes.
    MAX_COLLECT_ITERS = 65536
    PHASE_MAX_BATCHES = 32

    def _device_eval_fn(self):
        """Traceable prior transform + likelihood (None on host paths)."""
        if self.vectorized != 'jax':
            return None
        transform = self._jax_transform()
        likelihood = self.likelihood
        sharding = self._candidate_sharding()

        def eval_fn(points):
            if sharding is not None:
                points = jax.lax.with_sharding_constraint(points, sharding)
            return likelihood(transform(points))
        return eval_fn

    def _candidate_sharding(self):
        """NamedSharding of the candidate batch axis over the mesh's first
        axis, or None without a mesh."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec
        return NamedSharding(
            self.mesh, PartitionSpec(self.mesh.axis_names[0]))

    def _shard_points_fn(self):
        """Candidate-axis sharding hook for the phase kernels.

        With a mesh, candidate chunks are annotated so GSPMD partitions the
        per-candidate work — union sampling, the MLP membership sweep, and
        the fused likelihood — across devices, with XLA inserting the
        collectives for the cross-candidate reductions. This is the
        TPU-native analogue of the reference's likelihood pool and parallel
        bound sampling (reference: nautilus/pool.py:36-107,
        nautilus/bounds/nautilus.py:223-237); the drawn sample sequence is
        device-count-invariant because keys never depend on the mesh.
        """
        sharding = self._candidate_sharding()
        if sharding is None:
            return None

        def shard(points):
            return jax.lax.with_sharding_constraint(points, sharding)
        return shard

    def _step_cache_key(self):
        """Identity of this sampler's compiled phase programs.

        Two samplers with the same likelihood function, equivalent prior,
        and the same batching configuration trace bit-identical phase
        programs — sharing the jitted callables across instances lets a
        later sampler reuse the first one's loaded executables (repeat
        runs in one process skip all compile/load cost). Returns None when
        identity cannot be established (bound likelihood args, exotic
        priors); those samplers keep per-instance callables.
        """
        if self.vectorized != 'jax':
            return None
        if self.likelihood.args or self.likelihood.keywords:
            return None
        if callable(self.prior):
            if self.prior.args or self.prior.keywords:
                return None
            prior_key = ('fn', self.prior.func)
        elif isinstance(self.prior, Prior) and self.prior.is_uniform():
            lo, hi = self.prior.uniform_bounds()
            prior_key = ('uniform', tuple(lo), tuple(hi))
        else:
            prior_key = ('prior', self.prior, tuple(self.prior.keys))
        return (self._base_likelihood, prior_key, self.mesh, self.n_batch,
                self.n_live, self.n_dim, self.SHELL_BATCH,
                self.PHASE_MAX_BATCHES, self.MAX_COLLECT_ITERS)

    def _step_fns(self):
        """Compiled-callable store: module-shared when identity allows."""
        key = self._step_cache_key()
        with _STEP_FN_LOCK:
            if key is None:
                if self._local_step_fns is None:
                    self._local_step_fns = {}
                return self._local_step_fns
            fns = _STEP_FN_CACHE.setdefault(key, {})
            _STEP_FN_CACHE.move_to_end(key)
            while len(_STEP_FN_CACHE) > _STEP_FN_CACHE_MAX:
                _STEP_FN_CACHE.popitem(last=False)
            return fns

    def _fused_step(self, need_member=True):
        """One compiled program per ``add_samples`` call: the whole
        rejection loop (draw candidates, gate through the bound stack,
        evaluate a jittable likelihood) runs as a device-side while-loop
        and returns exactly ``n_batch`` accepted points — one dispatch and
        one small host fetch per batch regardless of acceptance rate.

        Two variants: ``need_member=False`` skips the full bound-stack
        membership sweep when the host knows no later bound or live
        transfer candidate exists.
        """
        fns = self._step_fns()
        compact = self._membership_compact() if need_member else None
        name = 'fused_{}_{}'.format(need_member, compact)
        with _STEP_FN_LOCK:
            if name not in fns:
                eval_fn = self._device_eval_fn()
                shard_fn = self._shard_points_fn()
                n_target = self.n_batch
                chunk = self.SHELL_BATCH
                max_iters = self.MAX_COLLECT_ITERS

                @jax.jit
                def step(stack, index, key):
                    return collect_shell_points(
                        stack, index, key, n_target, chunk=chunk,
                        eval_fn=eval_fn, max_iters=max_iters,
                        need_member=need_member, shard_fn=shard_fn,
                        compact=compact)

                fns[name] = step
            return fns[name]

    def _membership_compact(self):
        """Static tier bounding the membership-sweep sub-batch per chunk.

        The bound-stack membership matrix costs B_pad slot evaluations
        per candidate but only matters for candidates accepted by their
        own bound — 0.4% of draws on the 50-D benchmark. The tier is
        chosen from the CHECKPOINTED per-bound acceptance counters (so a
        resumed run picks the same executables) with an 8x headroom over
        the observed self-acceptance; ``None`` means the full chunk (no
        compaction, e.g. the quickstart's ~40% acceptance).
        """
        chunk = self.SHELL_BATCH
        n_sample = sum(b.n_sample for b in self.bounds[1:])
        n_reject = sum(b.n_reject for b in self.bounds[1:])
        n_outer_s = sum(b.outer_bound.n_sample for b in self.bounds[1:]
                        if b.outer_bound is not None)
        n_outer_r = sum(b.outer_bound.n_reject for b in self.bounds[1:]
                        if b.outer_bound is not None)
        if n_outer_s < 16 * chunk:
            return None  # too little evidence; stay exact-full
        outer_rate = max(1.0 - n_outer_r / max(n_outer_s, 1), 0.0)
        neural_rate = max(1.0 - n_reject / max(n_sample, 1), 0.0)
        need = 8.0 * outer_rate * neural_rate * chunk
        for tier in (chunk // 8, chunk // 2):
            if need <= tier:
                return tier
        return None

    def _need_member(self, index):
        """Whether a collect dispatch needs the full membership matrix."""
        return (index < len(self.bounds) - 1 or
                bool(np.any(self.shell_t >= 0)))

    def _phase_step(self):
        """Compiled whole-phase driver (see ops.shell_stack.sampling_phase)."""
        fns = self._step_fns()
        compact = self._membership_compact()
        name = 'phase_{}'.format(compact)
        with _STEP_FN_LOCK:
            if name not in fns:
                eval_fn = self._device_eval_fn()
                shard_fn = self._shard_points_fn()
                n_batch = self.n_batch
                chunk = self.SHELL_BATCH
                max_batches = self.PHASE_MAX_BATCHES
                max_iters = self.MAX_COLLECT_ITERS

                @jax.jit
                def phase(stack, key, shell_n, shell_ns, m1, s1, m2, s2,
                          bound_log_v, blocked, n_shell_min, n_eff_target,
                          n_budget):
                    return sampling_phase(
                        stack, key, shell_n, shell_ns, m1, s1, m2, s2,
                        bound_log_v, blocked, n_batch, chunk, n_shell_min,
                        n_eff_target, max_batches, eval_fn,
                        max_iters=max_iters, n_budget=n_budget,
                        shard_fn=shard_fn, compact=compact)

                fns[name] = phase
            return fns[name]

    def _batch_budget(self, n_like_max):
        """Batches allowed before ``n_like`` reaches ``n_like_max`` —
        keeps the reference's one-batch stopping granularity (reference:
        nautilus/sampler.py:433) through multi-batch dispatches."""
        remaining = n_like_max - self.n_like
        if not np.isfinite(remaining):
            return np.int32(2 ** 30)
        return np.int32(max(-(-int(remaining) // self.n_batch), 1))

    def _sampling_phase_device(self, n_shell, n_eff_target,
                               n_like_max=np.inf, verbose=False):
        """Run (a slice of) the sampling phase in one device dispatch.

        Uploads the per-shell streaming statistics, lets the device make up
        to PHASE_MAX_BATCHES fill-or-argmax decisions (reference host loop:
        nautilus/sampler.py:482-494), then replays the recorded per-batch
        metadata into host bookkeeping. One round trip replaces one per
        batch — the difference between a latency-bound and compute-bound
        sampling phase on remote TPU links.
        """
        if verbose:
            self.print_status('Sampling', end='\r')
        t_start = time()
        stack = self._ensure_stack()
        b_pad = stack.bound_mask.shape[0]
        n_bounds = len(self.bounds)

        if self._discard_exploration and self.explored:
            starts = self.shell_end_exp
            ns_adj = self.shell_n_sample - self.shell_n_sample_exp
        else:
            starts = np.zeros(n_bounds, dtype=int)
            ns_adj = self.shell_n_sample

        shell_n = np.zeros(b_pad, np.int32)
        shell_ns = np.zeros(b_pad, np.int32)
        m1 = np.full(b_pad, -1e30, np.float32)
        s1 = np.zeros(b_pad, np.float32)
        m2 = np.full(b_pad, -1e30, np.float32)
        s2 = np.zeros(b_pad, np.float32)
        bound_log_v = np.full(b_pad, -np.inf, np.float32)
        blocked = np.zeros(b_pad, bool)
        for shell in self._starved:
            # Starved shells are excluded from both device targeting rules
            # (fill and variance argmax) inside the compiled phase; their
            # true counts stay in host state.
            blocked[shell] = True
        for i in range(n_bounds):
            ll = self.log_l[i][starts[i]:]
            shell_n[i] = len(ll)
            if i in self._starved:
                shell_n[i] = max(shell_n[i], int(n_shell))
            shell_ns[i] = ns_adj[i]
            bound_log_v[i] = self.bounds[i].log_v
            if len(ll) > 0:
                m = max(float(np.max(ll)), -1e30)
                m1[i] = m
                s1[i] = float(np.sum(np.exp(ll - m)))
                m2[i] = 2.0 * m
                s2[i] = float(np.sum(np.exp(2.0 * (ll - m))))

        phase_fn = self._phase_step()
        phase_args = (
            stack, self.keys.next(), shell_n, shell_ns, m1, s1, m2, s2,
            bound_log_v, blocked, np.int32(n_shell),
            np.float32(n_eff_target), self._batch_budget(n_like_max))
        prewarm.submit_like(phase_fn, self._prewarm_subs(stack),
                            *phase_args)
        with prof_region('sample.phase_dispatch'):
            out = phase_fn(*phase_args)
        # Two-step fetch: metadata first (tiny), then only the
        # log-likelihoods of the rows the phase actually filled — the
        # coordinates go straight from the phase buffer into the device
        # arena, so point payloads never cross the link.
        buf_dev, blob_devs, meta, n_used = out
        # Single transfer: counters plus the full log-likelihood column
        # and blob buffers (fetching everything costs one round trip; a
        # second prefix fetch would double the latency bill).
        with prof_region('sample.phase_fetch'):
            fetched = fetch_many(meta, n_used, _phase_log_l_col(buf_dev),
                                 *blob_devs)
        meta, n_used = fetched[0], int(fetched[1])
        log_l_full = fetched[2].astype(np.float64)
        blob_full = fetched[3:]
        if n_used > 0:
            n_rows = n_used * self.n_batch
            log_l_rows = log_l_full[:n_rows]
            blob_bufs = tuple(b[:n_rows] for b in blob_full)
            ids0 = self.arena.append_buf(buf_dev, n_rows)
        if n_used == 0:
            # Device stats judged the phase done but host stats disagreed
            # (f32 vs f64 rounding near the threshold), or every targetable
            # shell is starved: fall back to one host-driven batch so the
            # run loop always progresses, or report no-progress so the run
            # stops instead of livelocking.
            if np.any(self._unfilled_shells(n_shell)):
                shell = int(np.flatnonzero(self._unfilled_shells(n_shell))[0])
            else:
                crit = self._shell_criterion()
                if not np.any(crit > -np.inf):
                    warn('All shells are starved; stopping the sampling '
                         'phase before reaching the effective sample size '
                         'target.', RuntimeWarning, stacklevel=2)
                    return False
                shell = int(np.argmax(crit))
            self.add_samples(shell, verbose=verbose)
            if self.filepath is not None:
                self.write_shell_update(self.filepath, shell)
            return True

        meta = np.asarray(meta, int)
        self.timing['sample'] += time() - t_start
        for bi in range(n_used):
            shell, n_cand, n_outer, n_self, n_kept = meta[bi]
            self.timing['sample_cand'] = self.timing.get(
                'sample_cand', 0) + int(n_cand)
            sl = slice(bi * self.n_batch, bi * self.n_batch + n_kept)
            if shell > 0:
                bound = self.bounds[shell]
                bound.outer_bound.n_sample += int(n_cand)
                bound.outer_bound.n_reject += int(n_cand - n_outer)
                bound.n_sample += int(n_outer)
                bound.n_reject += int(n_outer - n_self)
            self.shell_n_sample[shell] += int(n_self)
            self.arena.set_shell(ids0[sl], shell)
            self.idx[shell] = np.append(self.idx[shell], ids0[sl])
            self.log_l[shell] = np.append(
                self.log_l[shell], log_l_rows[sl], axis=0)
            if len(blob_bufs) > 0:
                cols = [np.asarray(c)[bi * self.n_batch:
                                     bi * self.n_batch + n_kept]
                        for c in blob_bufs]
                blobs = self._pack_blobs(cols)
                if self.blobs is None:
                    self.blobs = [blobs]
                else:
                    self.blobs[shell] = np.append(
                        self.blobs[shell], blobs, axis=0)
            self.n_like += int(n_kept)
            self.update_shell_info(shell)
            if self.filepath is not None:
                self.write_shell_update(self.filepath, int(shell))
        n_kept_last = int(meta[n_used - 1, 4])
        if n_kept_last < self.n_batch:
            # Starved batch: everything delivered was committed above;
            # kill the undelivered tail rows of the arena append (they
            # hold zero coordinates and belong to no shell) and stop
            # targeting this shell rather than aborting the run.
            self.arena.kill(ids0[(n_used - 1) * self.n_batch + n_kept_last:])
            shell = int(meta[n_used - 1, 0])
            self._starved.add(shell)
            warn('Shell {} delivered only {} of {} points within the '
                 'candidate budget; it will no longer be targeted for '
                 'additional samples.'.format(
                     shell, n_kept_last, self.n_batch),
                 RuntimeWarning, stacklevel=2)
        return True

    def _explore_phase_step(self):
        """Compiled exploration-phase driver (see
        ops.shell_stack.exploration_phase)."""
        fns = self._step_fns()
        with _STEP_FN_LOCK:
            if 'explore' not in fns:
                eval_fn = self._device_eval_fn()
                shard_fn = self._shard_points_fn()
                n_batch = self.n_batch
                chunk = self.SHELL_BATCH
                max_batches = self.PHASE_MAX_BATCHES
                max_iters = self.MAX_COLLECT_ITERS
                n_live = self.n_live

                # Donating the arena buffers lets XLA update them in
                # place — at deep-run scale (1e6 rows x d) the in/out
                # copies would otherwise double the program's memory
                # footprint.
                @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
                def phase(pts, log_l, alive, shell, arena_n, stack, key,
                          index, shell_ns, m1, s1, bound_log_v, slot_valid,
                          log_l_min_last, n_total0, n_update_rem,
                          n_like_rem, f_live_target, n_budget):
                    return exploration_phase(
                        pts, log_l, alive, shell, arena_n, stack, key,
                        index, shell_ns, m1, s1, bound_log_v, slot_valid,
                        log_l_min_last, n_total0, n_update_rem, n_like_rem,
                        f_live_target, n_live, n_batch, chunk, max_batches,
                        eval_fn, max_iters=max_iters, n_budget=n_budget,
                        shard_fn=shard_fn)

                fns['explore'] = phase
            return fns['explore']

    def _exploration_phase_device(self, f_live_target, n_like_max=np.inf,
                                  verbose=False):
        """Run up to PHASE_MAX_BATCHES exploration batches in one dispatch.

        The device paces itself with the same rules the host loop applies
        (bound trigger and ``f_live``, reference:
        nautilus/sampler.py:436-480); accepted points land directly in the
        arena and only counters plus the new log-likelihoods are fetched.
        The host replays the per-batch metadata and re-applies every rule
        in float64 at the dispatch boundary, so the run remains a pure
        function of (seed, state) and checkpoint resume stays exact.
        """
        if verbose:
            self.print_status('Sampling', end='\r')
        t_start = time()
        index = len(self.bounds) - 1
        # The phase path never consumes the single-batch speculative
        # dispatch; drop it (deterministic: issuance is skipped when the
        # next call takes this path).
        self._prefetch = None
        self.arena._ensure_capacity(
            self.arena.n + self.PHASE_MAX_BATCHES * self.n_batch)
        stack = self._ensure_stack()
        b_pad = stack.bound_mask.shape[0]

        shell_ns = np.zeros(b_pad, np.int32)
        m1 = np.full(b_pad, -1e30, np.float32)
        s1 = np.zeros(b_pad, np.float32)
        bound_log_v = np.full(b_pad, -np.inf, np.float32)
        slot_valid = np.zeros(b_pad, bool)
        for i in range(len(self.bounds)):
            slot_valid[i] = True
            shell_ns[i] = self.shell_n_sample[i]
            bound_log_v[i] = self.bounds[i].log_v
            ll = self.log_l[i]
            if len(ll) > 0:
                m = max(float(np.max(ll)), -1e30)
                m1[i] = m
                s1[i] = float(np.sum(np.exp(ll - m)))

        explore_fn = self._explore_phase_step()
        explore_args = (
            self.arena.d_pts, self.arena.d_log_l, self.arena.d_alive,
            self.arena.d_shell, jnp.asarray(self.arena.n, jnp.int32),
            stack, self.keys.next(), jnp.asarray(index, jnp.int32),
            shell_ns, m1, s1, bound_log_v, slot_valid,
            np.float32(self.shell_log_l_min[index]),
            np.int32(np.sum(self.shell_n)),
            np.int32(self.n_update - self.n_update_iter),
            np.int32(self.n_like_new_bound - self.n_like_iter),
            np.float32(f_live_target), self._batch_budget(n_like_max))
        prewarm.submit_like(explore_fn, self._prewarm_subs(stack),
                            *explore_args)
        with prof_region('sample.explore_dispatch'):
            out = explore_fn(*explore_args)
        pts_a, log_l_a, alive_a, shell_a, log_l_buf, blob_bufs, meta, \
            n_used = out
        # One transfer for everything the host needs from this dispatch:
        # fetching the full (max_batches x n_batch) log-likelihood buffer
        # costs the same ~one round trip as fetching a prefix, and saves a
        # second sync per call on high-latency links.
        with prof_region('sample.explore_fetch'):
            fetched = fetch_many(meta, n_used, log_l_buf, *blob_bufs)
        meta = fetched[0].astype(int)
        n_used = int(fetched[1])
        log_l_full = fetched[2].astype(np.float64)
        blob_full = fetched[3:]

        if n_used == 0:
            # Adopt the (unchanged) returned buffers: the dispatch donated
            # the previous arena storage.
            self.arena.adopt(pts_a, log_l_a, alive_a, shell_a, 0)
            # Device f32 stats disagreed with the host's f64 rules near a
            # threshold: fall back to one host-paced batch so the run loop
            # always progresses.
            self.n_update_iter += self.add_samples(-1, verbose=verbose)
            self.n_like_iter += self.n_batch
            if self.filepath is not None:
                if not Path(self.filepath).exists():
                    self.write(self.filepath, overwrite=True)
                self.write_shell_update(self.filepath, -1)
            return

        n_rows = n_used * self.n_batch
        log_l_rows = log_l_full[:n_rows]
        blob_cols_all = tuple(b[:n_rows] for b in blob_full)
        with prof_region('sample.arena_adopt'):
            ids0 = self.arena.adopt(pts_a, log_l_a, alive_a, shell_a,
                                    n_rows)
        self.timing['sample'] += time() - t_start

        if self.filepath is not None and not Path(self.filepath).exists():
            self.write(self.filepath, overwrite=True)

        for bi in range(n_used):
            n_cand, n_outer, n_self, n_kept, n_above = meta[bi]
            self.timing['sample_cand'] = self.timing.get(
                'sample_cand', 0) + int(n_cand)
            sl = slice(bi * self.n_batch, bi * self.n_batch + n_kept)
            if index > 0:
                bound = self.bounds[index]
                bound.outer_bound.n_sample += int(n_cand)
                bound.outer_bound.n_reject += int(n_cand - n_outer)
                bound.n_sample += int(n_outer)
                bound.n_reject += int(n_outer - n_self)
            self.shell_n_sample[index] += int(n_self)
            self.idx[index] = np.append(self.idx[index], ids0[sl])
            self.log_l[index] = np.append(
                self.log_l[index], log_l_rows[sl], axis=0)
            if len(blob_cols_all) > 0:
                blobs = self._pack_blobs([c[sl] for c in blob_cols_all])
                if self.blobs is None:
                    self.blobs = [blobs]
                else:
                    self.blobs[index] = np.append(
                        self.blobs[index], blobs, axis=0)
            self.n_like += int(n_kept)
            self.n_update_iter += int(n_above)
            self.n_like_iter += self.n_batch
            self.update_shell_info(index)
            if self.filepath is not None:
                self.write_shell_update(self.filepath, index)

        if meta[n_used - 1, 3] < self.n_batch:
            # All delivered batches were committed and checkpointed above;
            # the error leaves a consistent, resumable state.
            raise RuntimeError(
                'Exploration sampling did not deliver {} points within {} '
                'candidate chunks; the newest bound may be empty. The run '
                'state is consistent and can be resumed.'.format(
                    self.n_batch, self.MAX_COLLECT_ITERS))

    def _add_samples_device(self, shell):
        """Fill one batch of shell ``shell`` through the fused device path.

        One dispatch + one small host fetch per batch: the device-side
        collection loop (see
        :func:`nautilus_tpu.ops.shell_stack.collect_shell_points`) delivers
        exactly ``n_batch`` accepted points, candidate counters following
        the reference's stopping rule, and each point's innermost earlier
        bound — which feeds transfer-point substitution (reference:
        nautilus/sampler.py:804-819) without per-bound ``contains``
        dispatches. On the fused-likelihood path the coordinates are
        appended straight to the device arena; the host fetches only
        log-likelihoods, bound ids, and counters.

        Returns ``(ids, log_l, blobs, n_fresh_above)`` where ``ids`` are
        arena row indices.
        """
        t_start = time()
        index = shell if shell >= 0 else len(self.bounds) - 1
        stack = self._ensure_stack()
        need_member = self._need_member(index)
        step = self._fused_step(need_member)
        prewarm.submit_like(step, self._prewarm_subs(self._ensure_stack()),
                            self._ensure_stack(), jnp.asarray(0, jnp.int32),
                            self.keys.key_at(self.keys.state['counter']))
        bound = self.bounds[index]
        fused_like = self.vectorized == 'jax'
        use_transfer = shell == -1 and len(self.shell_t) > 0

        pos_t = np.zeros(0, dtype=int)
        # Use the speculative batch issued at the end of the previous
        # exploration call if it targeted this same bound configuration.
        pending = self._prefetch
        self._prefetch = None
        fetched = None
        if (pending is not None and pending['n_bounds'] == len(self.bounds)
                and pending['index'] == index
                and pending.get('need_member', True) == need_member):
            out = pending['future']
            thread = pending.get('thread')
            if thread is not None:
                # The link pipelines concurrent transfers (measured ~8 ms
                # effective vs ~30 ms serial), so the speculative batch's
                # results were fetched on a daemon thread while the host
                # did the previous batch's bookkeeping — by now they are
                # usually already on host.
                thread.join()
                fetched = pending['holder'].get('result')
        else:
            out = step(stack, index, self.keys.next())

        d = self.n_dim
        if self.arena.device:
            # Coordinates stay on device: append the batch to the arena
            # and fetch only (counters | log_l | innermost-earlier-bound).
            if fetched is None:
                fetched = fetch_many(_pack_collect_meta(out[0]), *out[1])
            meta = fetched[0].astype(np.float64)
            n_cand, n_outer, n_self, n_iter = meta[:4].astype(int)
            log_l = meta[4:4 + self.n_batch]
            shell_p = meta[4 + self.n_batch:].astype(int)
            ids = self.arena.append_buf(out[0], self.n_batch, shell=index)
            points = None
            blob_cols = list(fetched[1:]) if fused_like else None
        else:
            if fetched is None:
                fetched = fetch_many(out[0], *out[1])
            packed = np.asarray(fetched[0], np.float64)
            n_cand, n_outer, n_self, n_iter = packed[
                self.n_batch, :4].astype(int)
            rows = packed[:self.n_batch]
            points = rows[:, :d]
            log_l = rows[:, d]
            shell_p = rows[:, d + 1].astype(int)
            ids = None
            blob_cols = [np.asarray(b) for b in fetched[1]] if fused_like \
                else None
        self.timing['sample_chunks'] = self.timing.get(
            'sample_chunks', 0) + int(n_iter)
        self.timing['sample_cand'] = self.timing.get(
            'sample_cand', 0) + int(n_cand)
        if n_iter >= self.MAX_COLLECT_ITERS:
            if shell == -1:
                # Exploration cannot proceed without fresh live points;
                # all completed batches are committed and checkpointed, so
                # the error leaves a consistent, resumable state.
                raise RuntimeError(
                    'Exploration sampling did not deliver {} points '
                    'within {} candidate chunks; the newest bound may be '
                    'empty. The run state is consistent and can be '
                    'resumed.'.format(self.n_batch, self.MAX_COLLECT_ITERS))
            # Sampling phase: drop the partial batch, stop targeting the
            # shell, and let the run loop continue.
            if self.arena.device and ids is not None:
                self.arena.kill(ids)
            self._starved.add(index)
            warn('Shell {} delivered no full batch within the candidate '
                 'budget; it will no longer be targeted for additional '
                 'samples.'.format(index), RuntimeWarning, stacklevel=2)
            self.timing['sample'] += time() - t_start
            blobs0 = self.blobs_t[:0] if self.blobs_t is not None else None
            return np.zeros(0, dtype=int), np.zeros(0), blobs0, 0

        if index > 0:
            bound.outer_bound.n_sample += n_cand
            bound.outer_bound.n_reject += n_cand - n_outer
            bound.n_sample += n_outer
            bound.n_reject += n_outer - n_self
        n_bound = n_self

        # Substitute transfer points: fresh points whose innermost old
        # bound matches a transfer candidate's origin shell are replaced
        # so the old likelihood evaluations are reused.
        if use_transfer:
            replace = np.zeros(len(log_l), dtype=bool)
            for sh in range(len(self.bounds) - 1):
                idx_1 = np.flatnonzero(self.shell_t == sh)
                idx_2 = np.flatnonzero(shell_p == sh)
                n_sub = min(len(idx_1), len(idx_2))
                if n_sub > 0:
                    chosen = self.rng.choice(
                        idx_1, size=n_sub, replace=False)
                    pos_t = np.append(pos_t, chosen)
                    self.shell_t[chosen] = -1
                    replace[self.rng.choice(
                        idx_2, size=n_sub, replace=False)] = True
            if np.any(replace):
                if self.arena.device:
                    self.arena.kill(ids[replace])
                    ids = ids[~replace]
                else:
                    points = points[~replace]
                log_l = log_l[~replace]
                if blob_cols is not None:
                    blob_cols = [c[~replace] for c in blob_cols]
            if len(pos_t) > 0 and self.arena.device:
                self.arena.revive(self.idx_t[pos_t], shell=index)

        self.timing['sample'] += time() - t_start
        if fused_like:
            self.n_like += len(log_l)
            blobs = (self._pack_blobs(blob_cols)
                     if blob_cols else None)
        elif len(points) > 0:
            log_l, blobs = self.evaluate_likelihood(points)
        else:
            log_l = np.zeros(0)
            blobs = (self.blobs_t[:0] if self.blobs_t is not None
                     else None)
        if not self.arena.device:
            ids = self.arena.append_host(
                points if points is not None else np.zeros((0, d)))

        # Speculatively dispatch the next exploration batch: during
        # exploration the next call almost always samples the same (last)
        # shell, so its candidates can be in flight while the host does
        # bookkeeping. Deterministic rule (not timing-dependent): issue
        # after every exploration-phase call; reuse iff the bound list is
        # unchanged. The checkpoint records the consumed key counter so a
        # resumed run reconstructs the identical in-flight batch.
        if shell == -1 and not self.explored and (
                self.vectorized != 'jax' or
                bool(np.any(self.shell_t >= 0))):
            # Skip issuing when the next exploration call will take the
            # multi-batch phase path (it never consumes this).
            counter = self.keys.state['counter']
            need_next = self._need_member(index)
            future = self._fused_step(need_next)(
                stack, index, self.keys.next())
            # Fetch the speculative batch's results on a daemon thread:
            # the link pipelines concurrent transfers, so this round trip
            # overlaps the host bookkeeping below instead of serializing
            # at the start of the next call.
            holder = {}
            arena_dev = self.arena.device

            def _bg_fetch():
                try:
                    if arena_dev:
                        holder['result'] = fetch_many(
                            _pack_collect_meta(future[0]), *future[1])
                    else:
                        holder['result'] = fetch_many(future[0], *future[1])
                except Exception:  # pragma: no cover - consumer refetches
                    pass

            thread = threading.Thread(
                target=_bg_fetch, name='nautilus-tpu-prefetch', daemon=True)
            thread.start()
            self._prefetch = dict(
                n_bounds=len(self.bounds), index=index, key_counter=counter,
                need_member=need_next, future=future, thread=thread,
                holder=holder)

        # The exploration progress counter includes only freshly evaluated
        # points (reference: nautilus/sampler.py:447, 1144).
        n_fresh_above = int(np.sum(
            log_l >= self.shell_log_l_min[shell]))

        # Reused transfer points join the shell with their stored
        # likelihoods (reference: nautilus/sampler.py:1116-1128).
        if len(pos_t) > 0:
            ids = np.concatenate((self.idx_t[pos_t], ids))
            log_l = np.concatenate((self.log_l_t[pos_t], log_l))
            if blobs is not None:
                blobs = np.concatenate((self.blobs_t[pos_t], blobs))

        self.shell_n_sample[shell] += n_bound
        return ids, log_l, blobs, n_fresh_above

    def evaluate_likelihood(self, points):
        """Evaluate the likelihood for a batch of unit-cube points.

        Reference: nautilus/sampler.py:832-908 plus the fused device path.
        """
        t_start = time()
        if self.vectorized == 'jax':
            n = len(points)
            n_pad = bucket_size(n)
            pts = np.zeros((n_pad, self.n_dim))
            pts[:n] = points
            result = self._jax_eval(n_pad)(jnp.asarray(pts, jnp.float32))
            if isinstance(result, tuple):
                fetched = fetch_many(*result)
                log_l = fetched[0].astype(np.float64)[:n]
                blobs = [b[:n] for b in fetched[1:]]
            else:
                log_l = fetch(result, np.float64)[:n]
                blobs = None
            blobs_list = None if blobs is None else list(zip(*blobs))
        else:
            if callable(self.prior):
                transform = self.prior
            elif self.pass_dict:
                transform = self.prior.unit_to_dictionary
            else:
                transform = self.prior.unit_to_physical

            if not self.vectorized:
                args = list(map(transform, np.copy(points)))
            else:
                args = list(map(transform, np.array_split(
                    points,
                    1 if self.pool_l is None else self.pool_l.size)))

            if self.pool_l is not None:
                result = list(self.pool_l.map(self.likelihood, args))
            else:
                result = list(map(self.likelihood, args))

            if isinstance(result[0], tuple):
                log_l_parts = [r[0] for r in result]
                blobs_list = [r[1:] for r in result]
            else:
                log_l_parts = result
                blobs_list = None

            if self.vectorized:
                log_l = np.concatenate(log_l_parts)
            else:
                log_l = np.array(log_l_parts)

            if blobs_list is not None and self.vectorized:
                blobs_cols = [np.concatenate(
                    [blobs_list[row][col] for row in range(len(blobs_list))])
                    for col in range(len(blobs_list[0]))]
                blobs_list = list(zip(*blobs_cols))

        blobs = None
        if blobs_list is not None:
            cols = [np.array([row[col] for row in blobs_list])
                    for col in range(len(blobs_list[0]))]
            blobs = self._pack_blobs(cols)

        self.n_like += len(log_l)
        self.timing['likelihood'] += time() - t_start
        return log_l, blobs

    def _pack_blobs(self, cols):
        """Pack per-point blob columns into a (structured) array, inferring
        ``blobs_dtype`` on first use (reference: sampler.py:876-904)."""
        if self.blobs_dtype is None:
            if len(cols) > 1:
                self.blobs_dtype = [
                    ('blob_{}'.format(i), b.dtype)
                    for i, b in enumerate(cols)]
            else:
                self.blobs_dtype = cols[0].dtype
        return np.squeeze(np.array(
            list(zip(*cols)), dtype=self.blobs_dtype))

    def add_samples(self, shell, verbose=False):
        """Add one batch of samples to a shell.

        Reference: nautilus/sampler.py:1093-1144.
        """
        if verbose:
            self.print_status('Sampling', end='\r')

        ids, log_l, blobs, n_fresh_above = self._add_samples_device(shell)
        if verbose:
            self.print_status('Computing', end='\r')

        self.idx[shell] = np.append(self.idx[shell], ids)
        self.log_l[shell] = np.append(self.log_l[shell], log_l, axis=0)
        if blobs is not None:
            if self.blobs is None:
                self.blobs = [blobs]
            else:
                self.blobs[shell] = np.append(
                    self.blobs[shell], blobs, axis=0)
        self.update_shell_info(shell)

        return n_fresh_above

    def sample_shell(self, index, shell_t=None):
        """Sample one batch of points uniformly from a shell.

        Public API parity with the reference (reference:
        nautilus/sampler.py:751-830): returns ``(points, n_bound)`` — the
        shell points and the number of draws delivered by bound ``index``
        — plus, when ``shell_t`` (an array of transfer-candidate shell
        associations, modified in place) is given, the indices of transfer
        candidates to substitute. Internally the whole rejection loop runs
        as one fused device program; this wrapper fetches the coordinates
        for host callers. The sampler's own batch collection uses the
        arena-resident variant (:meth:`_add_samples_device`) instead.
        """
        if shell_t is not None and index not in [-1, len(self.bounds) - 1]:
            raise ValueError("'shell_t' must be empty list if not sampling "
                             "from the last bound/shell.")
        idx = index if index >= 0 else len(self.bounds) - 1
        stack = self._ensure_stack()
        out = self._fused_step(True)(stack, idx, self.keys.next())
        packed = fetch(out[0], np.float64)
        d = self.n_dim
        n_cand, n_outer, n_self, n_iter = \
            packed[self.n_batch, :4].astype(int)
        if n_iter >= self.MAX_COLLECT_ITERS:
            # Starved: the buffer's undelivered rows are zeros, not shell
            # samples — fail loudly rather than return them.
            raise RuntimeError(
                'Shell {} did not deliver {} points within the candidate '
                'budget ({} chunks).'.format(
                    index, self.n_batch, self.MAX_COLLECT_ITERS))
        points = packed[:self.n_batch, :d]
        shell_p = packed[:self.n_batch, d + 1].astype(int)

        if idx > 0:
            bound = self.bounds[idx]
            bound.outer_bound.n_sample += int(n_cand)
            bound.outer_bound.n_reject += int(n_cand - n_outer)
            bound.n_sample += int(n_outer)
            bound.n_reject += int(n_outer - n_self)

        idx_t = np.zeros(0, dtype=int)
        if shell_t is not None and len(shell_t) > 0:
            replace = np.zeros(len(points), dtype=bool)
            for shell in range(len(self.bounds) - 1):
                idx_1 = np.flatnonzero(shell_t == shell)
                idx_2 = np.flatnonzero(shell_p == shell)
                n_sub = min(len(idx_1), len(idx_2))
                if n_sub > 0:
                    chosen = self.rng.choice(
                        idx_1, size=n_sub, replace=False)
                    idx_t = np.append(idx_t, chosen)
                    shell_t[chosen] = -1
                    replace[self.rng.choice(
                        idx_2, size=n_sub, replace=False)] = True
            points = points[~replace]

        if shell_t is None:
            return points, int(n_self)
        return points, int(n_self), idx_t

    def update_shell_info(self, index):
        """Recompute per-shell statistics.

        Reference: nautilus/sampler.py:910-943.
        """
        shell_n_sample = self.shell_n_sample[index]

        if self._discard_exploration and self.explored:
            start = self.shell_end_exp[index]
            shell_n_sample -= self.shell_n_sample_exp[index]
        else:
            start = 0

        log_l = self.log_l[index][start:]
        shell_n = len(log_l)
        self.shell_n[index] = shell_n

        if shell_n > 0:
            self.shell_log_v[index] = (
                self.bounds[index].log_v +
                np.log(shell_n / shell_n_sample))
            self.shell_log_l[index] = logsumexp(log_l) - np.log(shell_n)
            if not np.all(log_l == -np.inf):
                self.shell_n_eff[index] = np.exp(
                    2 * logsumexp(log_l) - logsumexp(2 * log_l))
            else:
                self.shell_n_eff[index] = len(log_l)
        else:
            self.shell_log_v[index] = -np.inf
            self.shell_log_l[index] = np.nan
            self.shell_n_eff[index] = 0

    # ------------------------------------------------------------------ #
    # summary statistics

    def posterior(self, return_as_dict=None, equal_weight=False,
                  equal_weight_boost=1.0, return_blobs=False):
        """Return the weighted posterior sample estimate.

        Reference: nautilus/sampler.py:541-647.
        """
        if return_as_dict is None:
            return_as_dict = bool(
                callable(self.prior) and self.pass_dict and
                self.vectorized != 'jax')

        if self._discard_exploration and self.explored:
            start = self.shell_end_exp
        else:
            start = np.zeros(len(self.idx), dtype=int)

        points = self.arena.rows(np.concatenate(
            [i[s:] for i, s in zip(self.idx, start)]))
        log_v = np.repeat(self.shell_log_v -
                          np.log(np.maximum(self.shell_n, 1)), self.shell_n)
        log_l = np.concatenate(
            [ll[s:] for ll, s in zip(self.log_l, start)])
        log_w = log_v + log_l
        if return_blobs:
            if self.blobs is None:
                raise ValueError('No blobs have been calculated.')
            blobs = np.concatenate(
                [b[s:] for b, s in zip(self.blobs, start)])

        if equal_weight:
            repeats = np.exp(log_w - np.amax(log_w)) * equal_weight_boost
            repeats = np.floor(repeats).astype(int) + (
                self.rng.random(len(repeats)) <
                repeats - np.floor(repeats)).astype(int)
            points = np.repeat(points, repeats, axis=0)
            log_w = np.zeros(np.sum(repeats))
            log_l = np.repeat(log_l, repeats, axis=0)
            if return_blobs:
                blobs = np.repeat(blobs, repeats, axis=0)

        if callable(self.prior):
            transform = self.prior
        elif return_as_dict:
            transform = self.prior.unit_to_dictionary
        else:
            transform = self.prior.unit_to_physical

        if self.vectorized == 'jax' and callable(self.prior):
            points = np.asarray(transform(jnp.asarray(points, jnp.float32)),
                                np.float64)
        elif not self.vectorized and callable(self.prior):
            points = np.array(list(map(transform, points)))
        else:
            points = transform(points)

        if (not return_as_dict and callable(self.prior) and self.pass_dict
                and self.vectorized != 'jax'):
            raise ValueError(
                'Cannot return points as numpy array. The prior function ' +
                'only returns dictionaries.')

        log_w = log_w - logsumexp(log_w)

        if return_blobs:
            return points, log_w, log_l, blobs
        return points, log_w, log_l

    @property
    def n_eff(self):
        """Total effective sample size (reference: sampler.py:650-665)."""
        if np.all(self.shell_n_eff == 0):
            return 0
        select = self.shell_n_eff > 0
        sum_w = np.exp(self.shell_log_l + self.shell_log_v - np.nanmax(
            self.shell_log_l + self.shell_log_v))[select]
        sum_w_sq = sum_w ** 2 / self.shell_n_eff[select]
        return np.sum(sum_w) ** 2 / np.sum(sum_w_sq)

    def effective_sample_size(self):
        """Deprecated alias of :attr:`n_eff` (reference parity)."""
        warn("'effective_sample_size' is deprecated. Use the property "
             "'n_eff' instead.", DeprecationWarning, stacklevel=2)
        return self.n_eff

    @property
    def log_z(self):
        """Global log evidence (reference: sampler.py:682-694)."""
        if np.sum(self.shell_n) == 0:
            return None
        select = ~np.isnan(self.shell_log_l)
        return logsumexp(
            self.shell_log_l[select] + self.shell_log_v[select])

    def evidence(self):
        """Deprecated alias of :attr:`log_z` (reference parity)."""
        warn("'evidence' is deprecated. Use the property 'log_z' instead.",
             DeprecationWarning, stacklevel=2)
        return self.log_z

    @property
    def eta(self):
        """Asymptotic sampling efficiency (reference: sampler.py:710-730)."""
        select = ~np.isnan(self.shell_log_l) & (self.shell_n > 0)
        shell_log_z = (self.shell_log_l + self.shell_log_v)[select]
        shell_eta = self.shell_n_eff[select] / self.shell_n[select]
        return np.exp(2 * logsumexp(shell_log_z) - 2 * logsumexp(
            shell_log_z - 0.5 * np.log(shell_eta)))

    def asymptotic_sampling_efficiency(self):
        """Deprecated alias of :attr:`eta` (reference parity)."""
        warn("'asymptotic_sampling_efficiency' is deprecated. Use the "
             "property 'eta' instead.", DeprecationWarning, stacklevel=2)
        return self.eta

    @property
    def f_live(self):
        """Fraction of the evidence in the live set
        (reference: sampler.py:1147-1169)."""
        if self.explored:
            return None
        if np.sum(self.shell_n) == 0:
            return 1.0
        log_v = np.repeat(
            self.shell_log_v - np.log(np.maximum(self.shell_n, 1)),
            self.shell_n)
        log_l = np.concatenate(self.log_l)
        log_w = log_v + log_l
        log_w_live = log_w[np.argsort(log_l)][-self.n_live:]
        return np.exp(logsumexp(log_w_live) - logsumexp(log_w))

    @property
    def log_v_live(self):
        """Volume in the live set (reference: sampler.py:1172-1190)."""
        if len(self.bounds) == 0:
            return 1.0
        log_l = np.concatenate(self.log_l)
        log_v = np.repeat(
            self.shell_log_v - np.log(np.maximum(self.shell_n, 1)),
            self.shell_n)
        log_v_live = log_v[np.argsort(log_l)][-self.n_live:]
        return logsumexp(log_v_live)

    def _membership_matrix(self, points):
        """(n_bounds, n_points) membership via the fused stack kernel —
        one dispatch for every (bound, point) pair, numerically identical
        to the membership the sampling kernels used."""
        pts_pad, n = pad_batch(np.asarray(points, np.float64))
        member = fetch(_contains_matrix_jit(
            self._ensure_stack(), pts_pad))
        return member[:len(self.bounds), :n]

    def shell_association(self, points, n_max=None):
        """Innermost bound containing each point
        (reference: sampler.py:1192-1221)."""
        if n_max is None:
            n_max = len(self.bounds)
        member = self._membership_matrix(points)[:n_max]
        idx = np.arange(member.shape[0])[:, None]
        return np.max(np.where(member, idx, -1), axis=0)

    def shell_bound_occupation(self, fractional=True):
        """Cross-occupation matrix of shells and bounds
        (reference: sampler.py:1223-1251)."""
        n_bounds = len(self.bounds)
        sizes = [len(i) for i in self.idx]
        offsets = np.cumsum([0] + sizes)
        member = self._membership_matrix(
            self.arena.rows(np.concatenate(self.idx)))
        m = np.zeros((n_bounds, n_bounds), dtype=int)
        for i in range(n_bounds):
            m[i] = np.sum(member[:, offsets[i]:offsets[i + 1]], axis=1)
        if fractional:
            m = m / np.diag(m)[:, np.newaxis]
        return m

    # Status-line columns: (title, width, value formatter). The column set
    # and order match the reference's live display (reference:
    # sampler.py:945-980) so downstream tooling that parses it keeps
    # working.
    _STATUS_COLUMNS = (
        ('Status', 9, str),
        ('Bounds', 6, '{:d}'.format),
        ('Ellipses', 8, '{:d}'.format),
        ('Networks', 8, '{:d}'.format),
        ('Calls', 8, '{:d}'.format),
        ('f_live', 6, '{:.4f}'.format),
        ('N_eff', 5, '{:.0f}'.format),
        ('log Z', 7, '{:+.2f}'.format),
    )

    def print_status(self, status='', header=False, end='\n'):
        """Print the one-line live progress display."""
        if header:
            cells = [title for title, _, _ in self._STATUS_COLUMNS]
        else:
            latest = self.bounds[-1] if len(self.bounds) > 1 else None
            values = [status, len(self.bounds),
                      latest.n_ell if latest else 0,
                      latest.n_net if latest else 0,
                      self.n_like, self.f_live, self.n_eff, self.log_z]
            cells = ['N/A' if v is None else col[2](v)
                     for v, col in zip(values, self._STATUS_COLUMNS)]

        line = ' | '.join(
            '{:<{}}'.format(cell, col[1])
            for cell, col in zip(cells, self._STATUS_COLUMNS))
        width = get_terminal_size((80, 24)).columns
        print(line.ljust(width)[:width], end=end, flush=True)

    # ------------------------------------------------------------------ #
    # persistence

    def write(self, filepath, overwrite=False):
        """Write the full sampler state to an HDF5 file.

        Schema mirrors the reference (reference: sampler.py:1253-1332) with
        the PRNG key stream state added.
        """
        if h5py is None:
            raise RuntimeError('h5py is required for checkpointing.')
        filepath = Path(filepath)
        if filepath.suffix not in ['.h5', '.hdf5']:
            raise ValueError("File ending must be '.h5' or '.hdf5'.")
        if filepath.exists():
            if not overwrite:
                raise RuntimeError(
                    'File {} already exists.'.format(str(filepath)))
            filepath.unlink()
        filepath.parent.mkdir(parents=True, exist_ok=True)

        fstream = h5py.File(filepath, 'x')
        group = fstream.create_group('sampler')

        for key in ['n_dim', 'n_live', 'n_update', 'n_like_new_bound',
                    'enlarge_per_dim', 'n_points_min', 'split_threshold',
                    'n_networks', 'n_batch', 'n_like', 'explored',
                    '_discard_exploration', 'shell_n', 'shell_n_sample',
                    'shell_n_eff', 'shell_log_l_min', 'shell_log_l',
                    'shell_log_v', 'shell_n_sample_exp', 'shell_end_exp',
                    'n_update_iter', 'n_like_iter']:
            group.attrs[key] = getattr(self, key)
        group.attrs['vectorized'] = (
            'jax' if self.vectorized == 'jax' else bool(self.vectorized))
        group.attrs['pass_dict'] = self.pass_dict
        # Starved-shell set: a resumed run must keep skipping these shells
        # or it would re-pay the full candidate budget and diverge from the
        # uninterrupted run.
        group.attrs['starved'] = np.array(sorted(self._starved), dtype=int)
        group.attrs['spec_overflowed'] = self._spec_overflowed

        for shell in range(len(self.bounds)):
            group.create_dataset(
                'points_{}'.format(shell), data=self._points(shell),
                maxshape=(None, self.n_dim))
            group.create_dataset(
                'log_l_{}'.format(shell), data=self.log_l[shell],
                maxshape=(None,))
            # Arena row indices: preserve the arena ordering across resume
            # so tie-breaking in the device-block sort stays bitwise
            # deterministic.
            group.create_dataset(
                'idx_{}'.format(shell), data=self.idx[shell],
                maxshape=(None,))
            if self.blobs is not None:
                maxshape = list(self.blobs[shell].shape)
                maxshape[0] = None
                group.create_dataset(
                    'blobs_{}'.format(shell), data=self.blobs[shell],
                    maxshape=tuple(maxshape))

        group.create_dataset('points_t', data=self.points_t,
                             maxshape=(None, self.n_dim))
        group.create_dataset('idx_t', data=self.idx_t, maxshape=(None,))
        group.create_dataset('shell_t', data=self.shell_t, maxshape=(None,))
        group.create_dataset('log_l_t', data=self.log_l_t, maxshape=(None,))
        if self.blobs_t is not None:
            maxshape = list(self.blobs_t.shape)
            maxshape[0] = None
            group.create_dataset('blobs_t', data=self.blobs_t,
                                 maxshape=tuple(maxshape))

        for i, bound in enumerate(self.bounds):
            bound.write(fstream.create_group('bound_{}'.format(i)))

        self._write_rng(group)
        fstream.close()

    def _write_rng(self, group):
        group.attrs['keys_seed'] = self.keys.state['seed']
        group.attrs['keys_counter'] = self.keys.state['counter']
        if self._prefetch is not None:
            group.attrs['prefetch_counter'] = self._prefetch['key_counter']
            group.attrs['prefetch_n_bounds'] = self._prefetch['n_bounds']
            group.attrs['prefetch_index'] = self._prefetch['index']
        else:
            group.attrs['prefetch_counter'] = -1
        rng_state = self.rng.bit_generator.state
        group.attrs['rng_state'] = str(rng_state['state']['state'])
        group.attrs['rng_inc'] = str(rng_state['state']['inc'])
        group.attrs['rng_has_uint32'] = rng_state['has_uint32']
        group.attrs['rng_uinteger'] = rng_state['uinteger']

    def _read_rng(self, group):
        self.keys.state = {'seed': int(group.attrs['keys_seed']),
                           'counter': int(group.attrs['keys_counter'])}
        self.rng.bit_generator.state = dict(
            bit_generator='PCG64',
            state=dict(state=int(group.attrs['rng_state']),
                       inc=int(group.attrs['rng_inc'])),
            has_uint32=group.attrs['rng_has_uint32'],
            uinteger=group.attrs['rng_uinteger'])

    def write_shell_update(self, filepath, shell):
        """Incrementally update one shell in an existing checkpoint.

        Reference: sampler.py:1334-1377.
        """
        if shell < 0:
            shell = len(self.bounds) + shell
        fstream = h5py.File(Path(filepath), 'r+')
        group = fstream['sampler']

        for key in ['n_like', 'shell_n', 'shell_n_sample', 'shell_n_eff',
                    'shell_log_l_min', 'shell_log_l', 'shell_log_v',
                    'n_update_iter', 'n_like_iter']:
            group.attrs[key] = getattr(self, key)
        group.attrs['starved'] = np.array(sorted(self._starved), dtype=int)

        points = self._points(shell)
        group['points_{}'.format(shell)].resize(points.shape)
        group['points_{}'.format(shell)][...] = points
        group['log_l_{}'.format(shell)].resize(self.log_l[shell].shape)
        group['log_l_{}'.format(shell)][...] = self.log_l[shell]
        group['idx_{}'.format(shell)].resize(self.idx[shell].shape)
        group['idx_{}'.format(shell)][...] = self.idx[shell]
        if self.blobs is not None:
            group['blobs_{}'.format(shell)].resize(self.blobs[shell].shape)
            group['blobs_{}'.format(shell)][...] = self.blobs[shell]

        for key in ['points_t', 'idx_t', 'shell_t', 'log_l_t', 'blobs_t']:
            if getattr(self, key) is not None:
                group[key].resize(getattr(self, key).shape)
                group[key][...] = getattr(self, key)

        if isinstance(self.bounds[shell], NautilusBound):
            self.bounds[shell].update(fstream['bound_{}'.format(shell)])

        self._write_rng(group)
        fstream.close()

    def _read_state(self, filepath):
        """Resume from a checkpoint (reference: sampler.py:330-371)."""
        with h5py.File(filepath, 'r') as fstream:
            group = fstream['sampler']
            self._read_rng(group)

            for key in ['n_like', 'explored', '_discard_exploration',
                        'shell_n', 'shell_n_sample', 'shell_n_eff',
                        'shell_log_l_min', 'shell_log_l', 'shell_log_v',
                        'shell_n_sample_exp', 'shell_end_exp',
                        'n_update_iter', 'n_like_iter']:
                setattr(self, key, group.attrs[key])
            self._starved = set(
                int(s) for s in group.attrs.get('starved', []))
            self._spec_overflowed = bool(
                group.attrs.get('spec_overflowed', False))

            points_lists = []
            idx_lists = []
            has_idx = 'idx_0' in group
            next_id = 0
            for shell in range(len(self.shell_n)):
                points_lists.append(
                    np.array(group['points_{}'.format(shell)]))
                self.log_l.append(
                    np.array(group['log_l_{}'.format(shell)]))
                if has_idx:
                    idx_lists.append(
                        np.array(group['idx_{}'.format(shell)], dtype=int))
                else:
                    # Checkpoint predates arena indices: synthesize
                    # contiguous ids (shells first, then the transfer set).
                    n_pts = len(points_lists[-1])
                    idx_lists.append(np.arange(next_id, next_id + n_pts))
                    next_id += n_pts
                if 'blobs_{}'.format(shell) in group:
                    if shell == 0:
                        self.blobs = []
                    self.blobs.append(
                        np.array(group['blobs_{}'.format(shell)]))
                    if shell == 0:
                        self.blobs_dtype = self.blobs[-1].dtype

            points_t = np.zeros((0, self.n_dim))
            idx_t_stored = np.zeros(0, dtype=int)
            for key in ['shell_t', 'log_l_t', 'blobs_t']:
                if key in group:
                    setattr(self, key, np.array(group[key]))
            if 'points_t' in group:
                points_t = np.array(group['points_t'])
            if 'idx_t' in group and has_idx:
                idx_t_stored = np.array(group['idx_t'], dtype=int)
            else:
                idx_t_stored = np.arange(next_id, next_id + len(points_t))

            # Rebuild the arena, compacted but order-preserving: relative
            # arena order (the tie-breaker of the device-block sort) is a
            # function of the stored row indices, so a resumed run draws
            # the exact same bound fits as an uninterrupted one.
            all_ids = np.concatenate(idx_lists + [idx_t_stored])
            uorder = np.unique(all_ids)
            n_rows = len(uorder)
            pts = np.zeros((n_rows, self.n_dim))
            log_l_arr = np.full(n_rows, -np.inf)
            alive = np.zeros(n_rows, bool)
            shell_arr = np.zeros(n_rows, np.int32)
            for shell in range(len(self.shell_n)):
                pos = np.searchsorted(uorder, idx_lists[shell])
                pts[pos] = points_lists[shell]
                log_l_arr[pos] = self.log_l[shell]
                alive[pos] = True
                shell_arr[pos] = shell
                self.idx.append(pos)
            pos = np.searchsorted(uorder, idx_t_stored)
            pts[pos] = points_t
            if len(pos) > 0:
                log_l_arr[pos] = self.log_l_t
                # Consumed candidates carry shell_t == -1; their rows are
                # dead, so any valid slot id works.
                shell_arr[pos] = np.maximum(self.shell_t, 0)
            self.idx_t = pos
            self.arena.load(pts, log_l_arr, alive, shell=shell_arr)

            self.bounds = [
                UnitCube.read(fstream['bound_0'], keys=self.keys)]
            for i in range(1, len(self.shell_n)):
                self.bounds.append(NautilusBound.read(
                    fstream['bound_{}'.format(i)], keys=self.keys))
            self._bound_stack = None

            # Reconstruct the in-flight speculative batch so the resumed
            # key/draw sequence matches the uninterrupted run exactly.
            prefetch_counter = int(group.attrs.get('prefetch_counter', -1))
            if prefetch_counter >= 0:
                n_bounds = int(group.attrs['prefetch_n_bounds'])
                index = int(group.attrs['prefetch_index'])
                need_member = self._need_member(index)
                self._prefetch = dict(
                    n_bounds=n_bounds, index=index,
                    key_counter=prefetch_counter, need_member=need_member,
                    future=self._fused_step(need_member)(
                        self._ensure_stack(), index,
                        self.keys.key_at(prefetch_counter)))
