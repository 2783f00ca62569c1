"""Membership-sweep compaction: consistency with the exact-full path.

The compacted variant of :func:`sample_shell_batch` restricts the
bound-stack membership matrix to the first ``compact`` self-accepted
candidates; its accept decisions and shell associations must agree with
the full path wherever evaluable, and the consumption cap must be
honest (``evaluable`` ends exactly at the ``compact``-th self-accept).
"""

import numpy as np
import jax
import jax.numpy as jnp

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.ops.shell_stack import sample_shell_batch


def _run_sampler():
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')

    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)

    s = Sampler(prior, likelihood, n_live=200, seed=0,
                vectorized='jax', n_batch=64)
    assert s.run(n_eff=500)
    return s


def test_compact_agrees_with_full():
    s = _run_sampler()
    stack = s._ensure_stack()
    index = jnp.asarray(1, jnp.int32)
    key = jax.random.PRNGKey(7)
    n = 512
    compact = 64

    full = sample_shell_batch(stack, index, key, n)
    sub = sample_shell_batch(stack, index, key, n, compact=compact)

    pts_f, out_f, self_f, shell_f, shp_f, ev_f = [np.asarray(a)
                                                  for a in full]
    pts_c, out_c, self_c, shell_c, shp_c, ev_c = [np.asarray(a)
                                                  for a in sub]

    # Identical draws and own-bound gates (same key, same geometry).
    np.testing.assert_array_equal(pts_f, pts_c)
    np.testing.assert_array_equal(self_f, self_c)
    np.testing.assert_array_equal(out_f, out_c)

    # evaluable covers exactly the candidates up to the compact-th
    # self-accept.
    csum = np.cumsum(self_f.astype(int))
    np.testing.assert_array_equal(ev_c, csum <= compact)
    assert ev_f.all()

    # Wherever the compact path evaluated a self-accepted candidate, its
    # decisions match the full path's.
    both = self_f & ev_c
    np.testing.assert_array_equal(shell_f[both], shell_c[both])
    np.testing.assert_array_equal(shp_f[both], shp_c[both])
    # Outside evaluable nothing is accepted.
    assert not shell_c[~ev_c].any()


def test_compact_tier_selection():
    """The tier derives from checkpointed counters: no evidence -> exact
    full path; forced tiny acceptance -> the smallest tier."""
    s = _run_sampler()
    tier = s._membership_compact()
    chunk = s.SHELL_BATCH
    assert tier in (None, chunk // 2, chunk // 8)

    # Force a tiny self-acceptance rate through the counters.
    for b in s.bounds[1:]:
        b.outer_bound.n_sample = 10 ** 8
        b.outer_bound.n_reject = int(0.7 * 10 ** 8)
        b.n_sample = 3 * 10 ** 7
        b.n_reject = int(0.99 * 3 * 10 ** 7)
    assert s._membership_compact() == chunk // 8
