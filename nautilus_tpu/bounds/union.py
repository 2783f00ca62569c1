"""Union of ellipsoids / cube-ellipsoid mixtures (TPU-native).

API-parity analogue of the reference Union bound (reference:
nautilus/bounds/union.py). Member geometry is stored as a list of
:class:`EllParams` pytrees and stacked (padded to a bucket size) into one
leading-axis pytree, so ``contains`` and the rejection-sampling step run as
single fused XLA computations. The split/trim control recursion stays on
host, exactly like the reference's.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize_scalar
from scipy.special import logsumexp

from ..ops import geometry as G
from ..ops.gmm import fit_gmm2
from ..utils.bucket import bucket_size, pad_batch, pad_points
from ..utils.fetch import fetch, put_tree
from ..utils.keys import KeyStream
from .basic import Ellipsoid, UnitCubeEllipsoidMixture, fit_ellipsoid_host, \
    unpack_ell, _ell_transform_jit


@partial(jax.jit, static_argnums=(3, 4))
def _union_sample_jit(stacked, member_mask, key, n_points, unit):
    points, accept = G.union_sample_batch(stacked, member_mask, key,
                                          n_points, unit=unit)
    # Single packed output = single host fetch.
    return jnp.concatenate(
        [points, accept[:, None].astype(points.dtype)], axis=1)


@partial(jax.jit, static_argnums=(3,))
def _union_contains_jit(stacked, member_mask, points, unit):
    return G.union_contains(stacked, member_mask, points, unit=unit)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _union_mc_jit(stacked, member_mask, key, n_min, chunk, max_iters, unit):
    """MC volume counters for a union: draw chunks until ``n_min`` points
    were accepted; fetch only (candidates drawn, accepted). Device-side
    analogue of the buffered sampling the reference volume estimate rides
    on (reference: nautilus/bounds/union.py:291-343)."""

    def cond(state):
        return (state[1] < n_min) & (state[2] < max_iters)

    def body(state):
        n_tot, n_acc, it = state
        sub = jax.random.fold_in(key, it)
        _, accept = G.union_sample_batch(
            stacked, member_mask, sub, chunk, unit=unit)
        return (n_tot + chunk,
                n_acc + jnp.sum(accept.astype(jnp.int32)), it + 1)

    zero = jnp.asarray(0, jnp.int32)
    state = jax.lax.while_loop(cond, body, (zero, zero, zero))
    return jnp.stack(state[:2])


def _gmm_labels(params, points, mask, key, n_points_min):
    """Member-frame transform, 2-component GMM, and small-cluster
    reassignment (reference: nautilus/bounds/union.py:183-197)."""
    n = points.shape[0]
    points_t = G.ell_transform(params, points)
    log_p = fit_gmm2(points_t, mask, key)
    log_p = jnp.where(mask[:, None], log_p, -jnp.inf)
    labels = jnp.argmax(log_p, axis=1)

    counts = jnp.stack([jnp.sum(mask & (labels == 0)),
                        jnp.sum(mask & (labels == 1))])
    need = jnp.any(counts < n_points_min)
    small = jnp.argmin(counts)
    score = jnp.where(small == 0, log_p[:, 0], log_p[:, 1])
    _, top_idx = jax.lax.top_k(score, min(n_points_min, n))
    top = jnp.zeros(n, bool).at[top_idx].set(True)
    return jnp.where(need & top, small, labels)


@partial(jax.jit, static_argnums=(4, 5))
def _split_ellipsoid_jit(params, points, mask, key, n_points_min,
                         enlarge_per_dim):
    """A full ellipsoid split in one dispatch: member-frame transform, GMM,
    small-cluster reassignment, and both child MVEE fits. Packs children and
    labels into one vector so the host reads everything in a single round
    trip (reference control flow: nautilus/bounds/union.py:183-213)."""
    d = points.shape[1]
    labels = _gmm_labels(params, points, mask, key, n_points_min)
    dim_mask = jnp.ones(d, bool)

    def fit(label):
        p = G.fit_ellipsoid(points, mask & (labels == label), dim_mask,
                            enlarge_per_dim=enlarge_per_dim)
        return jnp.concatenate([
            p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None]])

    packed = jax.vmap(fit)(jnp.arange(2))
    return jnp.concatenate(
        [packed.reshape(-1), labels.astype(points.dtype)])


@partial(jax.jit, static_argnums=(4, 5))
def _split_mixture_jit(params, points, mask, key, n_points_min,
                       enlarge_per_dim):
    """Mixture-member split in one dispatch: GMM + reassignment + the full
    greedy cube/ellipsoid descent for both children (vmapped)."""
    from .basic import ucem_greedy
    labels = _gmm_labels(params, points, mask, key, n_points_min)

    def child(label):
        return ucem_greedy(points, mask & (labels == label),
                           enlarge_per_dim)

    packed = jax.vmap(child)(jnp.arange(2))
    return jnp.concatenate(
        [packed.reshape(-1), labels.astype(points.dtype)])


@partial(jax.jit, static_argnums=(4, 5))
def _split_ellipsoid_masked_jit(params, points, member_mask, key,
                                n_points_min, enlarge_per_dim):
    """Masked-mode ellipsoid split: same math as
    :func:`_split_ellipsoid_jit` but the child *membership masks stay on
    device* — the host fetches only the two packed child geometries and
    their member counts (a few hundred bytes), never the labels."""
    d = points.shape[1]
    labels = _gmm_labels(params, points, member_mask, key, n_points_min)
    masks = jnp.stack([member_mask & (labels == 0),
                       member_mask & (labels == 1)])
    dim_mask = jnp.ones(d, bool)

    def fit(m):
        p = G.fit_ellipsoid(points, m, dim_mask,
                            enlarge_per_dim=enlarge_per_dim)
        return jnp.concatenate([
            p.c, p.B.reshape(-1), p.B_inv.reshape(-1), p.log_v[None]])

    packed = jax.vmap(fit)(masks)
    counts = jnp.sum(masks, axis=1).astype(points.dtype)
    return jnp.concatenate([packed.reshape(-1), counts]), masks[0], masks[1]


@partial(jax.jit, static_argnums=(4, 5))
def _split_mixture_masked_jit(params, points, member_mask, key,
                              n_points_min, enlarge_per_dim):
    """Masked-mode mixture split: GMM + reassignment + the greedy
    cube/ellipsoid descent for both children; child masks stay on device."""
    from .basic import ucem_greedy
    labels = _gmm_labels(params, points, member_mask, key, n_points_min)
    masks = jnp.stack([member_mask & (labels == 0),
                       member_mask & (labels == 1)])
    packed = jax.vmap(
        lambda m: ucem_greedy(points, m, enlarge_per_dim))(masks)
    counts = jnp.sum(masks, axis=1).astype(points.dtype)
    return jnp.concatenate([packed.reshape(-1), counts]), masks[0], masks[1]


# MC volume seeding policy — shared by Union.log_v and the fused bound
# prologue (bounds/nautilus.py), which seeds a one-member union's
# counters inside its own dispatch. Changing the policy here keeps every
# counter accumulation on a Union statistically consistent.
MC_VOLUME_N_MIN = 100
MC_VOLUME_MAX_ITERS = 256


def split_accept(parent_log_v, child_log_vs):
    """Union.split's volume rule, shared with the host-side resolution of
    the prologue's first split attempt (bounds/nautilus.py): accept iff
    both child volumes are finite (a NaN fit must read as a failed split,
    not slip through the comparison) and their sum does not exceed the
    parent's volume (reference: nautilus/bounds/union.py:210-213)."""
    child_log_vs = np.asarray(child_log_vs, np.float64)
    if not np.all(np.isfinite(child_log_vs)):
        return False
    return logsumexp(child_log_vs) <= parent_log_v


def ellipsoids_overlap(params_list):
    """Whether any pair of ellipsoids overlaps.

    Exact pairwise test via the K-function of
    ieeexplore.ieee.org/document/6289830, as in the reference (reference:
    nautilus/bounds/union.py:14-40). Host-side: the number of modes is tiny.
    """
    cs = [np.asarray(p.c, np.float64) for p in params_list]
    a_invs = [np.asarray(p.B @ p.B.T, np.float64) for p in params_list]

    n = len(cs)
    for i in range(n):
        for j in range(i + 1, n):
            d = cs[i] - cs[j]

            def k(s):
                m = a_invs[i] / (1 - s) + a_invs[j] / s
                return 1 - d @ np.linalg.solve(m, d)

            result = minimize_scalar(
                k, bounds=(1e-9, 1 - 1e-9), method='bounded')
            if result.fun > 0:
                return True
    return False


class Union:
    r"""Union of possibly-overlapping bounds restricted to the unit cube.

    Reference: nautilus/bounds/union.py:43-450.
    """

    SAMPLE_BATCH = 1024

    def __init__(self):
        self.n_dim = None
        self.enlarge_per_dim = None
        self.n_points_min = None
        self.unit = True
        self.bound_class = Ellipsoid
        self.params_list = []
        self.points_bounds = []
        self.log_v_all = np.zeros(0)
        self.block = np.zeros(0, dtype=bool)
        self.points = None
        self.n_sample = 0
        self.n_reject = 0
        self.keys = None
        self._stacked_cache = None
        # Masked (device-block) mode: member point sets are boolean masks
        # over one shared device point block instead of host arrays —
        # coordinates never cross the device link during construction.
        self._masked = False
        self._pts_dev = None
        self._member_masks = None
        self._member_counts = None

    @classmethod
    def compute(cls, points, enlarge_per_dim=1.1, n_points_min=None,
                unit=True, bound_class=Ellipsoid, keys=None):
        """Create a single-member union enclosing ``points`` (reference:
        nautilus/bounds/union.py:63-122); grow it later with
        :meth:`split`."""
        points = np.asarray(points)
        bound = cls()
        bound.n_dim = points.shape[1]
        bound.enlarge_per_dim = float(enlarge_per_dim)
        bound.unit = unit
        bound.bound_class = bound_class
        bound.keys = keys if keys is not None else KeyStream()

        if n_points_min is None:
            bound.n_points_min = bound.n_dim + 1
        else:
            if n_points_min < bound.n_dim + 1:
                raise ValueError('The number of points per bound must be ' +
                                 'larger than the number of dimensions.')
            bound.n_points_min = int(n_points_min)

        bound.points_bounds = [points]
        bound.params_list = [bound._fit_member(points)]
        bound._refresh_bookkeeping()
        bound.block = np.atleast_1d(len(points) < 2 * bound.n_points_min)
        bound.points = np.zeros((0, bound.n_dim))
        return bound

    @classmethod
    def compute_masked(cls, pts_dev, mask_dev, n_points, enlarge_per_dim=1.1,
                       n_points_min=None, unit=True, bound_class=Ellipsoid,
                       keys=None, params0=None):
        """Build a union over a *device* point block selected by a mask.

        Device-block twin of :meth:`compute`: the point coordinates stay on
        device for the whole split/trim recursion; the host tracks only
        member counts and the tiny fitted geometries. ``params0`` accepts a
        pre-fitted root-member geometry (the bound builder fuses the fit
        into one combined dispatch — see NautilusBound.compute_device) so
        no extra device round trip happens here.
        """
        bound = cls()
        bound.n_dim = int(pts_dev.shape[1])
        bound.enlarge_per_dim = float(enlarge_per_dim)
        bound.unit = unit
        bound.bound_class = bound_class
        bound.keys = keys if keys is not None else KeyStream()

        if n_points_min is None:
            bound.n_points_min = bound.n_dim + 1
        else:
            if n_points_min < bound.n_dim + 1:
                raise ValueError('The number of points per bound must be ' +
                                 'larger than the number of dimensions.')
            bound.n_points_min = int(n_points_min)

        bound._masked = True
        bound._pts_dev = pts_dev
        bound._member_masks = [mask_dev]
        bound._member_counts = [int(n_points)]
        bound.points_bounds = None
        bound.params_list = [params0 if params0 is not None
                             else bound._fit_member_masked(mask_dev)]
        bound._refresh_bookkeeping()
        bound.block = np.atleast_1d(int(n_points) < 2 * bound.n_points_min)
        bound.points = np.zeros((0, bound.n_dim))
        return bound

    # ------------------------------------------------------------------ #
    # fitting helpers

    def _fit_member_masked(self, mask):
        """Fit one member bound over the masked device block."""
        if self.bound_class is Ellipsoid:
            return fit_ellipsoid_host(
                self._pts_dev, mask, np.ones(self.n_dim, bool),
                self.enlarge_per_dim)
        member = UnitCubeEllipsoidMixture.compute_masked(
            self._pts_dev, mask, enlarge_per_dim=self.enlarge_per_dim,
            keys=self.keys)
        return member.params

    def _points_bounds_host(self):
        """Host member point arrays (materializes the block in masked
        mode; used only for checkpoint writes)."""
        if not self._masked:
            return self.points_bounds
        pts = np.asarray(self._pts_dev, np.float64)
        return [pts[np.asarray(m)] for m in self._member_masks]

    def _fit_member(self, points):
        """Fit one member bound and return its EllParams."""
        if self.bound_class is Ellipsoid:
            # High pad floor: one compiled fit variant serves typical runs.
            pts, mask = pad_points(points, floor=2048)
            return fit_ellipsoid_host(
                pts, mask, np.ones(self.n_dim, bool), self.enlarge_per_dim)
        member = UnitCubeEllipsoidMixture.compute(
            points, enlarge_per_dim=self.enlarge_per_dim, keys=self.keys)
        return member.params

    def _refresh_bookkeeping(self):
        # A member's total log volume equals its ellipsoid-part log volume:
        # cube-bounded dims contribute a factor of one.
        self.log_v_all = np.array([float(p.log_v) for p in self.params_list])
        self._stacked_cache = None

    def _stacked(self):
        if self._stacked_cache is None:
            k_pad = bucket_size(len(self.params_list), floor=4)
            stacked, mask = G.stack_ell_params(self.params_list, k_pad)
            # One upload per refresh; kernels then reuse device buffers.
            self._stacked_cache = put_tree((stacked, mask))
        return self._stacked_cache

    # ------------------------------------------------------------------ #
    # splitting / trimming (host control, device kernels)

    def split(self, allow_overlap=True):
        """Split the largest unblocked member via a 2-component GMM.

        Reference: nautilus/bounds/union.py:153-229.
        """
        if not allow_overlap and self.bound_class is not Ellipsoid:
            raise ValueError("'allow_overlap' can only be False if " +
                             "bounds are ellipsoids.")

        if not np.any(~self.block):
            return False

        index = int(np.argmax(np.where(~self.block, self.log_v_all, -np.inf)))
        d = self.n_dim

        if self._masked:
            # Device-block mode: the two child membership masks stay on
            # device; only the packed child geometries and member counts
            # are fetched.
            member_mask = self._member_masks[index]
            if self.bound_class is Ellipsoid:
                small, m0, m1 = _split_ellipsoid_masked_jit(
                    self.params_list[index], self._pts_dev, member_mask,
                    self.keys.next(), int(self.n_points_min),
                    self.enlarge_per_dim)
                n_packed = d + 2 * d * d + 1
                vec = fetch(small, np.float64)
                new_params = [
                    unpack_ell(vec[i * n_packed:(i + 1) * n_packed], d)
                    for i in range(2)]
            else:
                small, m0, m1 = _split_mixture_masked_jit(
                    self.params_list[index], self._pts_dev, member_mask,
                    self.keys.next(), int(self.n_points_min),
                    self.enlarge_per_dim)
                n_packed = d + 2 * d * d + 1 + d
                vec = fetch(small, np.float64)
                new_params = []
                for i, child_mask in enumerate([m0, m1]):
                    child = vec[i * n_packed:(i + 1) * n_packed]
                    dim_cube = child[-d:] > 0.5
                    p = unpack_ell(child[:-d], d, ~dim_cube, dim_cube)
                    if float(p.log_v) > 0:
                        # Rare fallback: the greedy descent did not beat
                        # the unit cube; grow from empty instead.
                        member = UnitCubeEllipsoidMixture.compute_masked(
                            self._pts_dev, child_mask,
                            enlarge_per_dim=self.enlarge_per_dim,
                            keys=self.keys)
                        p = member.params
                    new_params.append(p)
            counts = vec[2 * n_packed:2 * n_packed + 2].astype(int)
            labels = None
            points = None
        else:
            points = self.points_bounds[index]
            pts_pad, mask = pad_points(points, floor=2048)

            if self.bound_class is Ellipsoid:
                # Fully fused: GMM + reassignment + both child fits, one
                # round trip.
                vec = fetch(_split_ellipsoid_jit(
                    self.params_list[index], pts_pad, mask, self.keys.next(),
                    int(self.n_points_min), self.enlarge_per_dim),
                    np.float64)
                n_packed = d + 2 * d * d + 1
                new_params = [
                    unpack_ell(vec[i * n_packed:(i + 1) * n_packed], d)
                    for i in range(2)]
                labels = vec[2 * n_packed:][:len(points)].astype(int)
            else:
                vec = fetch(_split_mixture_jit(
                    self.params_list[index], pts_pad, mask, self.keys.next(),
                    int(self.n_points_min), self.enlarge_per_dim),
                    np.float64)
                n_packed = d + 2 * d * d + 1 + d  # params vector + dim_cube
                labels = vec[2 * n_packed:][:len(points)].astype(int)
                new_params = []
                for i in range(2):
                    child = vec[i * n_packed:(i + 1) * n_packed]
                    dim_cube = child[-d:] > 0.5
                    p = unpack_ell(child[:-d], d, ~dim_cube, dim_cube)
                    if float(p.log_v) > 0:
                        # Rare fallback: the greedy descent did not beat the
                        # unit cube; rebuild this child on host with the
                        # full grow-from-empty search.
                        member = UnitCubeEllipsoidMixture.compute(
                            points[labels == i],
                            enlarge_per_dim=self.enlarge_per_dim,
                            keys=self.keys)
                        p = member.params
                    new_params.append(p)

        if not allow_overlap and ellipsoids_overlap(
                self.params_list[:index] + self.params_list[index + 1:] +
                new_params):
            return False

        log_v_new = [float(p.log_v) for p in new_params]
        if not split_accept(self.log_v_all[index], log_v_new):
            self.block[index] = True
            return self.split(allow_overlap=allow_overlap)

        if self._masked:
            self._member_masks.pop(index)
            self._member_masks.extend([m0, m1])
            self._member_counts.pop(index)
            self._member_counts.extend([int(counts[0]), int(counts[1])])
            child_n = counts
        else:
            self.points_bounds.pop(index)
            self.points_bounds.append(points[labels == 0])
            self.points_bounds.append(points[labels == 1])
            child_n = [len(self.points_bounds[-2]),
                       len(self.points_bounds[-1])]
        self.params_list.pop(index)
        self.params_list.extend(new_params)
        self.block = np.concatenate(
            (np.delete(self.block, index),
             [child_n[0] < 2 * self.n_points_min,
              child_n[1] < 2 * self.n_points_min]))
        self._refresh_bookkeeping()
        self.reset()
        return True

    def _adopt_first_split(self, child_params, child_masks, child_counts):
        """Install an externally computed split of the (single) root member.

        The fused bound prologue (see bounds/nautilus.py:_bound_prologue_jit)
        performs the first split attempt's GMM + child fits on device in the
        same dispatch as the root fits; when the host accepts that split,
        this applies the exact state mutation :meth:`split` would have.
        Masked (device-block) mode only.
        """
        assert self._masked and len(self.params_list) == 1
        self._member_masks = list(child_masks)
        self._member_counts = [int(c) for c in child_counts]
        self.params_list = list(child_params)
        self.block = np.array([int(c) < 2 * self.n_points_min
                               for c in child_counts])
        self._refresh_bookkeeping()
        self.reset()

    def trim(self, threshold=1e3):
        """Drop the lowest-density member if it is an extreme outlier.

        Reference: nautilus/bounds/union.py:231-267.
        """
        if len(self.params_list) == 1:
            return False

        if self._masked:
            log_n = np.log(self._member_counts)
        else:
            log_n = np.log([len(points) for points in self.points_bounds])
        log_r = log_n - self.log_v_all
        index = int(np.argmin(log_r))

        if log_r[index] - np.median(np.delete(log_r, index)) < -np.log(
                threshold):
            if self._masked:
                self._member_masks.pop(index)
                self._member_counts.pop(index)
            else:
                self.points_bounds.pop(index)
            self.params_list.pop(index)
            self.block = np.delete(self.block, index)
            self._refresh_bookkeeping()
            self.reset()
            return True
        return False

    # ------------------------------------------------------------------ #
    # queries

    def contains(self, points):
        """Whether each point lies in any member bound (fused stack kernel)."""
        single = np.asarray(points).ndim == 1
        pts, n = pad_batch(points)
        stacked, member_mask = self._stacked()
        result = fetch(_union_contains_jit(
            stacked, member_mask, pts, self.unit))[:n]
        return result[0] if single else result

    def sample(self, n_points=100):
        """Draw points uniformly from the union.

        Buffered fixed-batch rejection sampling; the buffer and the
        (n_sample, n_reject) counters persist across calls for the MC volume
        estimate, mirroring reference: nautilus/bounds/union.py:291-327.
        """
        while len(self.points) < n_points:
            stacked, member_mask = self._stacked()
            packed = fetch(_union_sample_jit(
                stacked, member_mask, self.keys.next(), self.SAMPLE_BATCH,
                self.unit), np.float64)
            accept = packed[:, -1] > 0.5
            batch = packed[:, :-1][accept]
            self.points = np.vstack([self.points, batch])
            self.n_sample += self.SAMPLE_BATCH
            self.n_reject += self.SAMPLE_BATCH - len(batch)

        points = self.points[:n_points]
        self.points = self.points[n_points:]
        return points

    @property
    def log_v(self):
        """Natural log of the estimated union volume."""
        if self.n_sample == 0:
            # Counter-only MC seeding: an 8-byte fetch instead of a point
            # batch (the points would be redrawn anyway).
            stacked, member_mask = self._stacked()
            counters = fetch(_union_mc_jit(
                stacked, member_mask, self.keys.next(), MC_VOLUME_N_MIN,
                self.SAMPLE_BATCH, MC_VOLUME_MAX_ITERS, self.unit), int)
            self.n_sample += int(counters[0])
            self.n_reject += int(counters[0] - counters[1])
        return float(logsumexp(self.log_v_all) +
                     np.log(1.0 - self.n_reject / self.n_sample))

    # ------------------------------------------------------------------ #
    # persistence

    def write(self, group):
        """Serialize the union (members, MC volume state) into an HDF5 group."""
        group.attrs['type'] = 'Union'
        group.attrs['n_dim'] = self.n_dim
        group.attrs['enlarge_per_dim'] = self.enlarge_per_dim
        group.attrs['n_points_min'] = self.n_points_min
        group.attrs['unit'] = self.unit
        group.attrs['n_sample'] = self.n_sample
        group.attrs['n_reject'] = self.n_reject
        group.attrs['log_v_all'] = self.log_v_all
        group.attrs['block'] = self.block
        group.attrs['bound_class'] = (
            'Ellipsoid' if self.bound_class is Ellipsoid
            else 'UnitCubeEllipsoidMixture')
        for i, params in enumerate(self.params_list):
            sub = group.create_group('member_{}'.format(i))
            for key in ['c', 'B', 'B_inv', 'dim_mask', 'dim_cube', 'log_v']:
                sub.attrs[key] = np.asarray(getattr(params, key))
        for i, points in enumerate(self._points_bounds_host()):
            group.create_dataset('points_bound_{}'.format(i), data=points)
        group.create_dataset('points', data=self.points,
                             maxshape=(None, self.n_dim))

    def update(self, group):
        """Refresh the serialized MC volume state in an existing HDF5 group."""
        group.attrs['n_sample'] = self.n_sample
        group.attrs['n_reject'] = self.n_reject
        group['points'].resize(self.points.shape)
        group['points'][...] = self.points

    @classmethod
    def read(cls, group, keys=None):
        """Reconstruct the union from an HDF5 group."""
        bound = cls()
        bound.keys = keys if keys is not None else KeyStream()
        bound.n_dim = int(group.attrs['n_dim'])
        bound.enlarge_per_dim = float(group.attrs['enlarge_per_dim'])
        bound.n_points_min = int(group.attrs['n_points_min'])
        bound.unit = bool(group.attrs['unit'])
        bound.n_sample = int(group.attrs['n_sample'])
        bound.n_reject = int(group.attrs['n_reject'])
        bound.block = np.asarray(group.attrs['block'], bool)
        bound.bound_class = (
            Ellipsoid if group.attrs['bound_class'] == 'Ellipsoid'
            else UnitCubeEllipsoidMixture)
        n_members = len(np.atleast_1d(group.attrs['log_v_all']))
        bound.params_list = []
        for i in range(n_members):
            sub = group['member_{}'.format(i)]
            bound.params_list.append(G.EllParams(
                c=np.asarray(sub.attrs['c'], np.float32),
                B=np.asarray(sub.attrs['B'], np.float32),
                B_inv=np.asarray(sub.attrs['B_inv'], np.float32),
                dim_mask=np.asarray(sub.attrs['dim_mask'], bool),
                dim_cube=np.asarray(sub.attrs['dim_cube'], bool),
                log_v=np.asarray(sub.attrs['log_v'], np.float32)))
        bound.points_bounds = [
            np.array(group['points_bound_{}'.format(i)])
            for i in range(n_members)]
        bound.points = np.array(group['points'])
        bound._refresh_bookkeeping()
        return bound

    def reset(self, keys=None):
        self.points = np.zeros((0, self.n_dim))
        self.n_sample = 0
        self.n_reject = 0
        if keys is not None:
            self.keys = keys
