"""Whole-run bound stack: every bound of the sampler in one pytree.

The sampler's hot loop — draw candidates from shell i's bound, reject
candidates that belong to a later shell, evaluate the likelihood — touches
every bound. On hardware where each host<->device round trip costs
milliseconds, dispatching one kernel per bound (as a direct translation of
the reference's per-bound Python loop would; reference:
nautilus/sampler.py:751-830) is latency-bound. Instead, all bounds are
stacked along a leading axis: the unit cube is slot 0 (represented as a
cube-only :class:`~nautilus_tpu.ops.geometry.EllParams`), every
NautilusBound occupies one slot with its outer union padded to a common
member count and its neural modes padded to a common mode count. One fused
program then samples from the bound selected by a *traced* index (so a
single compiled executable serves every shell), computes the full
(bounds x points) membership matrix, applies the shell rejection, and
optionally evaluates the user likelihood on the same batch.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as G
from .neural_stack import NeuralStack, neural_contains_any


class BoundStack(NamedTuple):
    """All bounds of a run, stacked (leading axis: bound slot)."""

    outer: G.EllParams    # leaves (B, K, ...): stacked outer unions
    outer_mask: jax.Array  # (B, K) bool: valid members per bound
    neural: NeuralStack   # leaves (B, M, ...), weights (B, M, E, ...)
    shift: jax.Array      # (B, d): mod-1 phase shift of periodic dims
    bound_mask: jax.Array  # (B,) bool: valid bound slots


def _slice_pytree(tree, index):
    """Dynamic-index the leading axis of every leaf (shapes stay static)."""
    return jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(
        a, index, axis=0, keepdims=False), tree)


@jax.jit
def stack_set_slot(stack, index, outer, outer_mask, ell, mean, scale, cut,
                   has_net, mode_mask, shift, valid):
    """Write one bound's geometry into slot ``index`` of a BoundStack.

    One dispatch replaces the full host restack + re-upload that a bound
    append would otherwise cost (the small host fields ride in as call
    arguments; the MLP weights are inserted separately on device by
    ``insert_neural_slot_jit``). ``valid=False`` clears a slot instead —
    used when a speculative bound is rejected.
    """
    def set_at(leaf, new):
        return leaf.at[index].set(jnp.asarray(new, leaf.dtype))

    neural = stack.neural._replace(
        ell=jax.tree.map(set_at, stack.neural.ell, ell),
        mean=set_at(stack.neural.mean, mean),
        scale=set_at(stack.neural.scale, scale),
        cut=set_at(stack.neural.cut, cut),
        has_net=set_at(stack.neural.has_net, has_net),
        mode_mask=set_at(stack.neural.mode_mask, mode_mask))
    return stack._replace(
        outer=jax.tree.map(set_at, stack.outer, outer),
        outer_mask=set_at(stack.outer_mask, outer_mask),
        neural=neural,
        shift=set_at(stack.shift, shift),
        bound_mask=stack.bound_mask.at[index].set(valid))


@jax.jit
def stack_clear_slot(stack, index):
    """Mark slot ``index`` invalid (speculative bound rejected)."""
    return stack._replace(
        bound_mask=stack.bound_mask.at[index].set(False))


def _neural_contains(neural, points):
    """Neural-bound membership for one bound slot; a slot with zero valid
    modes (the unit-cube slot) imposes no neural cut at all."""
    return neural_contains_any(neural, points, empty_means_all=True)


def bound_contains_matrix(stack, points):
    """Membership of each point in each bound: (B, n_points) bool.

    One fused computation replacing a Python loop of per-bound ``contains``
    dispatches (reference: nautilus/sampler.py:796-801, 1192-1221,
    1223-1251).
    """

    def one_bound(outer, outer_mask, neural, shift):
        pts = jnp.mod(points + shift, 1.0)
        in_outer = G.union_contains(outer, outer_mask, pts, unit=True)
        return in_outer & _neural_contains(neural, pts)

    member = jax.vmap(one_bound)(
        stack.outer, stack.outer_mask, stack.neural, stack.shift)
    return member & stack.bound_mask[:, None]


def shell_association_from_matrix(member, bound_mask):
    """Innermost (highest-index) bound containing each point; -1 if none."""
    b = member.shape[0]
    idx = jnp.arange(b)[:, None]
    return jnp.max(jnp.where(member, idx, -1), axis=0)


def stack_slot_contains(stack, index, points):
    """Membership of points in one bound slot of the run stack.

    Replaces host-side per-bound ``contains`` dispatches (reference:
    nautilus/sampler.py:1057-1060) with one fused kernel returning a bool
    vector — the only data fetched.
    """
    own = _slice_pytree(stack, index)
    pts = jnp.mod(points + own.shift, 1.0)
    in_outer = G.union_contains(own.outer, own.outer_mask, pts, unit=True)
    return in_outer & _neural_contains(own.neural, pts)


def arena_transfer_split(stack, index, pts, alive):
    """Move alive arena rows that fall inside bound ``index`` to the
    transfer set, on device.

    Returns the membership of every arena row packed to bits (the only
    data fetched — n/8 bytes) and the updated alive mask, which stays on
    device. Replaces per-shell host ``contains`` sweeps over coordinate
    arrays (reference: nautilus/sampler.py:1057-1060).
    """
    member = stack_slot_contains(stack, index, pts)
    moved = member & alive
    return jnp.packbits(moved), alive & ~moved


def mc_volume_counters(stack, index, key, n_min, chunk, max_iters):
    """Monte-Carlo volume seeding counters for one bound slot.

    Device-side analogue of ``NautilusBound.sample(n, return_points=False)``
    (reference: nautilus/bounds/nautilus.py:193-244): draws chunks from the
    slot's outer union and counts outer-union deliveries and neural-gate
    acceptances until ``n_min`` points were accepted. Only four counters
    are fetched: (candidates drawn, outer-delivered, neural-accepted,
    iterations).
    """
    own = _slice_pytree(stack, index)

    def cond(state):
        n_self, it = state[2], state[3]
        return (n_self < n_min) & (it < max_iters)

    def body(state):
        n_tot, n_outer, n_self, it = state
        sub = jax.random.fold_in(key, it)
        pts, outer_acc = G.union_sample_batch(
            own.outer, own.outer_mask, sub, chunk, unit=True)
        self_acc = outer_acc & _neural_contains(own.neural, pts)
        n_tot = n_tot + chunk
        n_outer = n_outer + jnp.sum(outer_acc.astype(jnp.int32))
        n_self = n_self + jnp.sum(self_acc.astype(jnp.int32))
        return (n_tot, n_outer, n_self, it + 1)

    zero = jnp.asarray(0, jnp.int32)
    state = jax.lax.while_loop(cond, body, (zero, zero, zero, zero))
    return jnp.stack(state)


def collect_shell_points(stack, index, key, n_target, chunk=2048,
                         eval_fn=None, max_iters=4096, need_member=True,
                         shard_fn=None, compact=None):
    """Collect exactly ``n_target`` shell points in one device program.

    Runs the sampler's rejection loop (reference:
    nautilus/sampler.py:751-830) entirely on device: a ``lax.while_loop``
    draws fixed-size candidate chunks from bound ``index``, applies the
    bound's neural gate and the later-bound shell rejection, optionally
    evaluates the (jittable) likelihood on every candidate, and compacts
    accepted points into a fixed-size output buffer. The host receives one
    small array per call instead of one large candidate batch per loop
    iteration — on hardware behind a low-bandwidth dispatch tunnel this is
    the difference between a latency-bound and a compute-bound sampler.

    Candidate accounting follows the reference's stopping rule: within the
    final chunk only candidates up to (and including) the one delivering
    the ``n_target``-th accepted point are counted, so every counter-based
    MC estimate downstream sees an admissible stopping time.

    Parameters
    ----------
    stack : BoundStack
    index : traced int, shell/bound slot to sample from.
    key : PRNG key; chunk keys are derived with ``fold_in`` so the drawn
        sequence depends only on (key, chunk index).
    n_target : static int, number of shell points to deliver.
    chunk : static int, candidates per loop iteration.
    eval_fn : optional callable points -> log_l or (log_l, \\*blobs); traced
        into the same program (prior transform + likelihood fused).
    max_iters : static int, safety cap on loop iterations.
    need_member : static bool. The full (bounds x points) membership
        matrix is only needed when later bounds exist (shell rejection) or
        transfer candidates await substitution (innermost-earlier-bound
        association). When the host knows neither applies — exploration
        batches from the newest bound with an exhausted transfer pool —
        the False variant skips the stack's entire MLP membership sweep,
        the dominant per-candidate cost.

    Returns
    -------
    packed : (n_target + 1, d + 2) float32 — per delivered point: the
        point, its log-likelihood (0 if ``eval_fn`` is None), and the
        innermost *earlier* bound containing it (-1 if none; feeds
        transfer-point substitution). The final row carries the counters
        ``(n_cand, n_outer, n_self, n_iter)``.
    blobs : tuple of (n_target,) + blob-shape buffers in the blob's own
        dtype (empty tuple when ``eval_fn`` returns only log_l).
    """
    d = stack.shift.shape[1]
    b = stack.bound_mask.shape[0]
    f32 = jnp.float32

    # Trace one candidate evaluation to learn the blob structure.
    if eval_fn is not None:
        out_shape = jax.eval_shape(
            eval_fn, jax.ShapeDtypeStruct((chunk, d), f32))
        blob_shapes = (tuple(out_shape[1:])
                       if isinstance(out_shape, tuple) else ())
    else:
        blob_shapes = ()

    buf0 = jnp.zeros((n_target + 1, d + 2), f32)
    blob_bufs0 = tuple(
        jnp.zeros((n_target,) + s.shape[1:], s.dtype) for s in blob_shapes)

    def cond(state):
        n_kept = state[2]
        it = state[6]
        return (n_kept < n_target) & (it < max_iters)

    def body(state):
        buf, blob_bufs, n_kept, n_cand, n_outer, n_self, it = state
        sub = jax.random.fold_in(key, it)
        if need_member:
            points, outer_acc, self_acc, shell_acc, shell_p, evaluable = \
                sample_shell_batch(stack, index, sub, chunk,
                                   shard_fn=shard_fn, compact=compact)
        else:
            own = _slice_pytree(stack, index)
            points_s, outer_acc = G.union_sample_batch(
                own.outer, own.outer_mask, sub, chunk, unit=True)
            if shard_fn is not None:
                points_s = shard_fn(points_s)
            self_acc = outer_acc & _neural_contains(own.neural, points_s)
            points = jnp.mod(points_s - own.shift, 1.0)
            shell_acc = self_acc
            shell_p = jnp.full(chunk, -1, jnp.int32)
            evaluable = jnp.ones(chunk, bool)

        if eval_fn is not None:
            result = eval_fn(points)
            if isinstance(result, tuple):
                log_l, blobs = result[0], result[1:]
            else:
                log_l, blobs = result, ()
        else:
            log_l, blobs = jnp.zeros(chunk, f32), ()

        # Stopping rule: consume candidates up to the one delivering the
        # missing-th accepted point; later candidates in the chunk are
        # discarded entirely.
        missing = n_target - n_kept
        acc_i = shell_acc.astype(jnp.int32)
        csum = jnp.cumsum(acc_i)
        use = ((csum - acc_i) < missing) & evaluable
        kept = shell_acc & use

        pos = jnp.where(kept, n_kept + csum - 1, n_target + 1)
        rows = jnp.concatenate([
            points.astype(f32), log_l[:, None].astype(f32),
            shell_p[:, None].astype(f32)], axis=1)
        buf = buf.at[pos].set(rows, mode='drop')
        blob_bufs = tuple(
            bb.at[pos].set(bl, mode='drop')
            for bb, bl in zip(blob_bufs, blobs))

        n_kept = n_kept + jnp.sum(kept.astype(jnp.int32))
        n_cand = n_cand + jnp.sum(use.astype(jnp.int32))
        n_outer = n_outer + jnp.sum((outer_acc & use).astype(jnp.int32))
        n_self = n_self + jnp.sum((self_acc & use).astype(jnp.int32))
        return (buf, blob_bufs, n_kept, n_cand, n_outer, n_self, it + 1)

    zero = jnp.asarray(0, jnp.int32)
    state = jax.lax.while_loop(
        cond, body, (buf0, blob_bufs0, zero, zero, zero, zero, zero))
    buf, blob_bufs = state[0], state[1]
    counters = jnp.zeros(d + 2, f32).at[:4].set(
        jnp.stack([state[3], state[4], state[5], state[6]]).astype(f32))
    buf = buf.at[n_target].set(counters)
    return buf, blob_bufs


def sampling_phase(stack, key, shell_n, shell_n_sample, m1, s1, m2, s2,
                   bound_log_v, blocked, n_batch, chunk, n_shell_min,
                   n_eff_target, max_batches, eval_fn, max_iters=4096,
                   n_budget=None, shard_fn=None, compact=None):
    """Drive the whole shell-filling ("sampling") phase on device.

    The reference's post-exploration loop (reference:
    nautilus/sampler.py:482-494) alternates tiny host decisions — fill any
    shell below ``n_shell``, else add a batch to the shell maximizing the
    variance-reduction criterion — with device work. Here up to
    ``max_batches`` such decisions run inside one program: per-shell
    streaming log-sum-exp accumulators track each shell's likelihood mass
    and effective sample size, the argmax criterion and the global
    ``n_eff`` stopping rule are evaluated on device, and every collected
    batch is appended to one fixed-capacity output buffer. The host
    receives a single payload per dispatch (typically one per run) and
    replays the recorded per-batch metadata into its bookkeeping.

    Accumulator convention: for each shell, ``m1/s1`` carry
    ``logsumexp(log_l) = m1 + log(s1)`` and ``m2/s2`` carry
    ``logsumexp(2 log_l)``.

    ``blocked`` marks starved shells (a previous dispatch failed to fill a
    batch from them within the candidate budget): they are excluded from
    both the fill rule and the variance-reduction argmax, so a dispatch
    never re-pays the full candidate budget on a shell known to be dry.
    When every targetable shell is blocked the phase stops immediately and
    the host decides (terminate with a warning rather than livelock).

    Returns
    -------
    buf : (max_batches * n_batch, d + 1) f32 — points and log_l, batch b
        occupying rows [b*n_batch, (b+1)*n_batch).
    blobs : tuple of (max_batches * n_batch, ...) blob buffers.
    meta : (max_batches, 5) i32 — per batch: target shell, candidates
        consumed, outer-union deliveries, bound deliveries, points kept
        (== n_batch unless the shell starved). Unused batch slots carry
        shell = -1.
    n_used : () i32 — batches actually run.
    """
    d = stack.shift.shape[1]
    b_slots = stack.bound_mask.shape[0]
    f32 = jnp.float32
    neg_inf = jnp.asarray(-jnp.inf, f32)

    if eval_fn is not None:
        out_shape = jax.eval_shape(
            eval_fn, jax.ShapeDtypeStruct((chunk, d), f32))
        blob_shapes = (tuple(out_shape[1:])
                       if isinstance(out_shape, tuple) else ())
    else:
        blob_shapes = ()

    cap = max_batches * n_batch
    buf0 = jnp.zeros((cap, d + 1), f32)
    blob_bufs0 = tuple(
        jnp.zeros((cap,) + s.shape[1:], s.dtype) for s in blob_shapes)
    meta0 = jnp.full((max_batches, 5), -1, jnp.int32)

    valid = stack.bound_mask
    blocked = jnp.asarray(blocked, bool)

    def stats(shell_n, shell_ns, m1, s1, m2, s2):
        n_f = shell_n.astype(f32)
        occupied = valid & (shell_n > 0)
        lse1 = jnp.where(occupied, m1 + jnp.log(jnp.maximum(s1, 1e-30)), 0.)
        lse2 = jnp.where(occupied, m2 + jnp.log(jnp.maximum(s2, 1e-30)), 0.)
        log_l_mean = lse1 - jnp.log(jnp.maximum(n_f, 1.0))
        log_v = bound_log_v + jnp.log(
            jnp.maximum(n_f, 1e-30) /
            jnp.maximum(shell_ns.astype(f32), 1.0))
        n_eff_shell = jnp.exp(2.0 * lse1 - lse2)
        log_z_shell = jnp.where(occupied, log_l_mean + log_v, neg_inf)
        w = jnp.exp(log_z_shell - jnp.max(log_z_shell))
        n_eff = jnp.sum(w) ** 2 / jnp.maximum(jnp.sum(
            jnp.where(occupied, w ** 2 / jnp.maximum(n_eff_shell, 1e-30),
                      0.0)), 1e-30)
        crit = jnp.where(
            occupied & ~blocked,
            log_l_mean + log_v - 0.5 * jnp.log(jnp.maximum(n_f, 1.0)) -
            0.5 * jnp.log(jnp.maximum(n_eff_shell, 1e-30)),
            neg_inf)
        return n_eff, crit

    def need_fill(shell_n):
        return valid & ~blocked & (shell_n < n_shell_min)

    def phase_done(shell_n, shell_ns, m1, s1, m2, s2):
        n_eff, _ = stats(shell_n, shell_ns, m1, s1, m2, s2)
        return ~jnp.any(need_fill(shell_n)) & (n_eff >= n_eff_target)

    # Dynamic batch budget: the caller bounds how many batches this
    # dispatch may run (e.g. the remaining n_like_max allowance) so the
    # run-level stopping rules keep the reference's one-batch granularity.
    budget = (jnp.asarray(max_batches, jnp.int32) if n_budget is None
              else jnp.minimum(jnp.asarray(n_budget, jnp.int32),
                               max_batches))

    def cond(state):
        b, starved = state[9], state[10]
        shell_n, shell_ns = state[3], state[4]
        m1, s1, m2, s2 = state[5], state[6], state[7], state[8]
        # No targetable shell (all blocked/invalid): stop and let the host
        # decide — never argmax into a blocked slot.
        _, crit = stats(shell_n, shell_ns, m1, s1, m2, s2)
        targetable = jnp.any(need_fill(shell_n)) | jnp.any(crit > neg_inf)
        return (b < budget) & ~starved & targetable & ~phase_done(
            shell_n, shell_ns, m1, s1, m2, s2)

    def body(state):
        (buf, blob_bufs, meta, shell_n, shell_ns,
         m1, s1, m2, s2, b, _) = state

        fill = need_fill(shell_n)
        _, crit = stats(shell_n, shell_ns, m1, s1, m2, s2)
        index = jnp.where(
            jnp.any(fill),
            jnp.argmax(fill),           # first under-filled shell
            jnp.argmax(crit))           # variance-reduction target

        # Inner rejection loop: collect exactly n_batch points of shell
        # `index` (same stopping rule as collect_shell_points).
        base = b * n_batch

        def in_cond(s):
            return (s[1] < n_batch) & (s[5] < max_iters)

        def in_body(s):
            ibuf, n_kept, n_cand, n_outer, n_self, it, bb = s
            sub = jax.random.fold_in(jax.random.fold_in(key, b), it)
            points, outer_acc, self_acc, shell_acc, _, evaluable = \
                sample_shell_batch(stack, index, sub, chunk,
                                   shard_fn=shard_fn, compact=compact)
            if eval_fn is not None:
                result = eval_fn(points)
                if isinstance(result, tuple):
                    log_l, blobs = result[0], result[1:]
                else:
                    log_l, blobs = result, ()
            else:
                log_l, blobs = jnp.zeros(chunk, f32), ()

            missing = n_batch - n_kept
            acc_i = shell_acc.astype(jnp.int32)
            csum = jnp.cumsum(acc_i)
            use = ((csum - acc_i) < missing) & evaluable
            kept = shell_acc & use
            pos = jnp.where(kept, base + n_kept + csum - 1, cap + 1)
            rows = jnp.concatenate(
                [points.astype(f32), log_l[:, None].astype(f32)], axis=1)
            ibuf = ibuf.at[pos].set(rows, mode='drop')
            bb = tuple(bbuf.at[pos].set(bl, mode='drop')
                       for bbuf, bl in zip(bb, blobs))
            n_kept = n_kept + jnp.sum(kept.astype(jnp.int32))
            n_cand = n_cand + jnp.sum(use.astype(jnp.int32))
            n_outer = n_outer + jnp.sum((outer_acc & use).astype(jnp.int32))
            n_self = n_self + jnp.sum((self_acc & use).astype(jnp.int32))
            return (ibuf, n_kept, n_cand, n_outer, n_self, it + 1, bb)

        zero = jnp.asarray(0, jnp.int32)
        buf, n_kept, n_cand, n_outer, n_self, _, blob_bufs = \
            jax.lax.while_loop(
                in_cond, in_body,
                (buf, zero, zero, zero, zero, zero, blob_bufs))

        # Streaming logsumexp update for the target shell from the rows
        # just written (a starved batch stops the phase; the host trims
        # it from the payload, so its accumulator garbage never counts).
        batch_l = jax.lax.dynamic_slice(
            buf, (base, d), (n_batch, 1))[:, 0]
        # -1e30 floor keeps all--inf batches NaN-free in the merges.
        bm1 = jnp.maximum(jnp.max(batch_l), -1e30)
        bs1 = jnp.sum(jnp.exp(batch_l - bm1))
        bm2 = 2.0 * bm1
        bs2 = jnp.sum(jnp.exp(2.0 * batch_l - bm2))

        def merge(m, s, bm, bs):
            mm = jnp.maximum(m, bm)
            return mm, s * jnp.exp(m - mm) + bs * jnp.exp(bm - mm)

        occupied = shell_n[index] > 0
        nm1, ns1 = merge(jnp.where(occupied, m1[index], -1e30),
                         jnp.where(occupied, s1[index], 0.0), bm1, bs1)
        nm2, ns2 = merge(jnp.where(occupied, m2[index], -1e30),
                         jnp.where(occupied, s2[index], 0.0), bm2, bs2)
        m1 = m1.at[index].set(nm1)
        s1 = s1.at[index].set(ns1)
        m2 = m2.at[index].set(nm2)
        s2 = s2.at[index].set(ns2)
        shell_n = shell_n.at[index].add(n_kept)
        shell_ns = shell_ns.at[index].add(n_self)

        meta = meta.at[b].set(jnp.stack(
            [index.astype(jnp.int32), n_cand, n_outer, n_self, n_kept]))
        starved = n_kept < n_batch
        return (buf, blob_bufs, meta, shell_n, shell_ns,
                m1, s1, m2, s2, b + 1, starved)

    state0 = (buf0, blob_bufs0, meta0,
              jnp.asarray(shell_n, jnp.int32),
              jnp.asarray(shell_n_sample, jnp.int32),
              jnp.asarray(m1, f32), jnp.asarray(s1, f32),
              jnp.asarray(m2, f32), jnp.asarray(s2, f32),
              jnp.asarray(0, jnp.int32), jnp.asarray(False))
    state = jax.lax.while_loop(cond, body, state0)
    return state[0], state[1], state[2], state[9]


def exploration_phase(arena_pts, arena_log_l, arena_alive, arena_shell,
                      arena_n, stack, key, index, shell_ns, m1, s1,
                      bound_log_v, slot_valid, log_l_min_last, n_total0,
                      n_update_rem, n_like_rem, f_live_target, n_live,
                      n_batch, chunk, max_batches, eval_fn, max_iters=4096,
                      n_budget=None, shard_fn=None):
    """Drive a slice of the exploration phase on device.

    The reference's exploration loop (reference:
    nautilus/sampler.py:436-480) alternates batches from the newest shell
    with two tiny host decisions: build a new bound once enough fresh
    above-threshold points accumulated, and end exploration once the live
    set holds less than ``f_live`` of the evidence. Here up to
    ``max_batches`` batches run inside one program: accepted points are
    written straight into the point arena (with their shell id), and both
    stopping rules are evaluated on device — the bound trigger from
    streaming counters, ``f_live`` exactly, via a top-``n_live`` scan of
    the arena's alive log-likelihoods combined with per-shell streaming
    log-sum-exp accumulators (per-point volume:
    ``bound_log_v[s] - log(shell_ns[s])``, reference:
    nautilus/sampler.py:1147-1169). The host fetches per-batch counters
    and the new rows' log-likelihoods — O(n_batch) floats per batch, no
    coordinates — then re-applies the rules in float64 at the dispatch
    boundary (the device decision only paces the batching).

    Exploration-specific assumptions: every batch targets the *last*
    bound, no later bound exists (the shell is the bound), and the
    transfer pool is empty — callers with pending transfer candidates must
    use the single-batch path.

    Returns ``(arena..., log_l_buf, meta, n_used)`` where ``meta`` rows
    are ``(n_cand, n_outer, n_self, n_kept, n_above)``.
    """
    f32 = jnp.float32
    d = arena_pts.shape[1]
    cap_a = arena_pts.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, f32)

    if eval_fn is not None:
        out_shape = jax.eval_shape(
            eval_fn, jax.ShapeDtypeStruct((chunk, d), f32))
        blob_shapes = (tuple(out_shape[1:])
                       if isinstance(out_shape, tuple) else ())
    else:
        blob_shapes = ()

    cap = max_batches * n_batch
    log_l_buf0 = jnp.zeros(cap, f32)
    blob_bufs0 = tuple(
        jnp.zeros((cap,) + s.shape[1:], s.dtype) for s in blob_shapes)
    meta0 = jnp.full((max_batches, 5), -1, jnp.int32)

    own = _slice_pytree(stack, index)

    def f_live(log_l_a, alive_a, shell_a, shell_ns_cur, m1_c, s1_c):
        log_v_pt = bound_log_v - jnp.log(
            jnp.maximum(shell_ns_cur.astype(f32), 1.0))
        occupied = slot_valid & (s1_c > 0)
        den_terms = jnp.where(
            occupied, m1_c + jnp.log(jnp.maximum(s1_c, 1e-30)) + log_v_pt,
            neg_inf)
        den = jax.scipy.special.logsumexp(den_terms)
        key_l = jnp.where(alive_a, log_l_a, neg_inf)
        top_l, top_i = jax.lax.top_k(key_l, n_live)
        tv = log_v_pt[shell_a[top_i]]
        num = jax.scipy.special.logsumexp(
            jnp.where(top_l > -1e30, top_l + tv, neg_inf))
        return jnp.exp(jnp.minimum(num - den, 0.0))

    def stop_now(state):
        (_, _, _, _, _, log_l_a, alive_a, shell_a,
         shell_ns_c, m1_c, s1_c, b, starved, upd_rem, like_rem,
         n_total) = state
        trigger = ((upd_rem <= 0) | (like_rem <= 0)) & (n_total > n_live)
        fl = f_live(log_l_a, alive_a, shell_a, shell_ns_c, m1_c, s1_c)
        return trigger | (fl <= f_live_target) | starved

    budget = (jnp.asarray(max_batches, jnp.int32) if n_budget is None
              else jnp.minimum(jnp.asarray(n_budget, jnp.int32),
                               max_batches))

    def cond(state):
        b, starved = state[11], state[12]
        return (b < budget) & ~stop_now(state)

    def body(state):
        (log_l_buf, blob_bufs, meta, pts_a, _unused, log_l_a, alive_a,
         shell_a, shell_ns_c, m1_c, s1_c, b, starved, upd_rem, like_rem,
         n_total) = state
        base_buf = b * n_batch
        base_arena = arena_n + b * n_batch

        def in_cond(s):
            return (s[1] < n_batch) & (s[10] < max_iters)

        def in_body(s):
            (pts_a, n_kept, n_cand, n_outer, n_self, n_above, log_l_a,
             alive_a, shell_a, lbuf, it, bb) = s
            sub = jax.random.fold_in(jax.random.fold_in(key, b), it)
            points_s, outer_acc = G.union_sample_batch(
                own.outer, own.outer_mask, sub, chunk, unit=True)
            if shard_fn is not None:
                points_s = shard_fn(points_s)
            self_acc = outer_acc & _neural_contains(own.neural, points_s)
            points = jnp.mod(points_s - own.shift, 1.0)

            if eval_fn is not None:
                result = eval_fn(points)
                if isinstance(result, tuple):
                    log_l, blobs = result[0], result[1:]
                else:
                    log_l, blobs = result, ()
            else:
                log_l, blobs = jnp.zeros(chunk, f32), ()

            missing = n_batch - n_kept
            acc_i = self_acc.astype(jnp.int32)
            csum = jnp.cumsum(acc_i)
            use = (csum - acc_i) < missing
            kept = self_acc & use

            pos_a = jnp.where(kept, base_arena + n_kept + csum - 1,
                              cap_a + 1)
            pts_a = pts_a.at[pos_a].set(points.astype(f32), mode='drop')
            log_l_a = log_l_a.at[pos_a].set(log_l.astype(f32), mode='drop')
            alive_a = alive_a.at[pos_a].set(True, mode='drop')
            shell_a = shell_a.at[pos_a].set(index.astype(jnp.int32),
                                            mode='drop')
            pos_b = jnp.where(kept, base_buf + n_kept + csum - 1, cap + 1)
            lbuf = lbuf.at[pos_b].set(log_l.astype(f32), mode='drop')
            bb = tuple(bbuf.at[pos_b].set(bl, mode='drop')
                       for bbuf, bl in zip(bb, blobs))

            n_kept = n_kept + jnp.sum(kept.astype(jnp.int32))
            n_cand = n_cand + jnp.sum(use.astype(jnp.int32))
            n_outer = n_outer + jnp.sum((outer_acc & use).astype(jnp.int32))
            n_self = n_self + jnp.sum((self_acc & use).astype(jnp.int32))
            n_above = n_above + jnp.sum(
                (kept & (log_l >= log_l_min_last)).astype(jnp.int32))
            return (pts_a, n_kept, n_cand, n_outer, n_self, n_above,
                    log_l_a, alive_a, shell_a, lbuf, it + 1, bb)

        zero = jnp.asarray(0, jnp.int32)
        (pts_a, n_kept, n_cand, n_outer, n_self, n_above, log_l_a,
         alive_a, shell_a, log_l_buf, _, blob_bufs) = jax.lax.while_loop(
            in_cond, in_body,
            (pts_a, zero, zero, zero, zero, zero, log_l_a, alive_a,
             shell_a, log_l_buf, zero, blob_bufs))

        # Streaming logsumexp update of the last shell's likelihood mass
        # (the -1e30 sentinel of an empty shell vanishes in the merge).
        batch_l = jax.lax.dynamic_slice(log_l_buf, (base_buf,), (n_batch,))
        bm1 = jnp.maximum(jnp.max(batch_l), -1e30)
        bs1 = jnp.sum(jnp.exp(batch_l - bm1))
        om = m1_c[index]
        mm = jnp.maximum(om, bm1)
        m1_c = m1_c.at[index].set(mm)
        s1_c = s1_c.at[index].set(
            s1_c[index] * jnp.exp(om - mm) + bs1 * jnp.exp(bm1 - mm))
        shell_ns_c = shell_ns_c.at[index].add(n_self)

        meta = meta.at[b].set(jnp.stack(
            [n_cand, n_outer, n_self, n_kept, n_above]))
        return (log_l_buf, blob_bufs, meta, pts_a, _unused, log_l_a,
                alive_a, shell_a, shell_ns_c, m1_c, s1_c, b + 1,
                n_kept < n_batch, upd_rem - n_above, like_rem - n_batch,
                n_total + n_kept)

    state0 = (log_l_buf0, blob_bufs0, meta0, arena_pts,
              jnp.asarray(0, jnp.int32), arena_log_l, arena_alive,
              arena_shell,
              jnp.asarray(shell_ns, jnp.int32), jnp.asarray(m1, f32),
              jnp.asarray(s1, f32), jnp.asarray(0, jnp.int32),
              jnp.asarray(False), jnp.asarray(n_update_rem, jnp.int32),
              jnp.asarray(n_like_rem, jnp.int32),
              jnp.asarray(n_total0, jnp.int32))
    state = jax.lax.while_loop(cond, body, state0)
    return (state[3], state[5], state[6], state[7],
            state[0], state[1], state[2], state[11])


def sample_shell_batch(stack, index, key, n_points, shard_fn=None,
                       compact=None):
    """One fused candidate batch for shell ``index``.

    Draws ``n_points`` candidates from bound ``index`` (a traced integer —
    one executable serves every shell), applies that bound's own neural
    rejection, and rejects candidates lying inside any later bound (the
    shell definition, reference: nautilus/sampler.py:790-801).

    ``compact`` (static) bounds how many candidates see the full
    bound-stack membership sweep: the sweep costs B_pad bound slots (each
    a union containment plus an MLP ensemble) PER CANDIDATE, yet its
    results only matter for candidates that already passed their own
    bound's gate — 0.4% of draws on the 50-D benchmark. With ``compact``
    set, the first ``compact`` self-accepted candidates (chunk order) are
    gathered into a compact sub-batch, the matrix runs on that sub-batch
    alone, and consumption stops at the ``compact``-th self-accept — an
    admissible stopping rule, so all downstream counter-based MC
    estimates stay unbiased; candidates past the cap are simply never
    consumed (redrawn fresh next iteration).

    Returns
    -------
    points : (n_points, d)
    outer_accept : (n_points,) bool — delivered by the outer union (raw
        draws minus overlap/cube rejections); feeds the outer union's
        MC-volume counters.
    self_accept : (n_points,) bool — also inside the bound's neural gate
        (= "delivered by bound.sample" in the reference's bookkeeping).
    shell_accept : (n_points,) bool — inside the shell (not in any later
        bound); always False outside ``evaluable``.
    shell_p : (n_points,) int32 — innermost EARLIER bound containing the
        candidate, -1 if none (feeds transfer-point substitution; only
        valid where ``evaluable``).
    evaluable : (n_points,) bool — candidates whose shell membership was
        computed; callers must restrict consumption (``use``) to these.
    """
    own = _slice_pytree(stack, index)

    # Draw in the sampled bound's (possibly phase-shifted) frame, gate by
    # its own neural bounds there, then map back to the common frame.
    points_s, outer_accept = G.union_sample_batch(
        own.outer, own.outer_mask, key, n_points, unit=True)
    if shard_fn is not None:
        # Device-mesh path: sharding the candidate axis here makes GSPMD
        # partition the whole downstream per-candidate chain — the MLP
        # membership sweep and the fused likelihood — across devices, the
        # TPU-native analogue of the reference's parallel bound sampling
        # (reference: nautilus/bounds/nautilus.py:223-237).
        points_s = shard_fn(points_s)
    self_accept = outer_accept & _neural_contains(own.neural, points_s)
    points = jnp.mod(points_s - own.shift, 1.0)

    b = stack.bound_mask.shape[0]
    bidx = jnp.arange(b)[:, None]
    later = (jnp.arange(b) > index)[:, None] & stack.bound_mask[:, None]

    if compact is None or compact >= n_points:
        member = bound_contains_matrix(stack, points)
        in_later = jnp.any(member & later, axis=0)
        older = member & (jnp.arange(b) < index)[:, None]
        shell_p = jnp.max(jnp.where(older, bidx, -1), axis=0)
        evaluable = jnp.ones(n_points, bool)
    else:
        # Stable argsort puts self-accepted candidates first, preserving
        # chunk order within each class.
        take = jnp.argsort(~self_accept)[:compact]
        member_sub = bound_contains_matrix(stack, points[take])
        in_later_sub = jnp.any(member_sub & later, axis=0)
        older_sub = member_sub & (jnp.arange(b) < index)[:, None]
        shell_p_sub = jnp.max(
            jnp.where(older_sub, bidx, -1), axis=0).astype(jnp.int32)
        in_later = jnp.zeros(n_points, bool).at[take].set(in_later_sub)
        shell_p = jnp.full(n_points, -1, jnp.int32).at[take].set(
            shell_p_sub)
        evaluable = jnp.cumsum(self_accept.astype(jnp.int32)) <= compact

    shell_accept = self_accept & ~in_later & evaluable
    return (points, outer_accept, self_accept, shell_accept, shell_p,
            evaluable)
