"""Serializable PRNG key stream shared across sampler components.

The reference threads a single mutable ``numpy.random.Generator`` through
every bound (reference: nautilus/sampler.py:305, bounds/basic.py:44-47). The
TPU-native analogue is a key *stream*: a serializable counter-based generator
that hands out fresh ``jax.random`` keys in a deterministic order. All bound
objects hold a reference to the sampler's stream, so results are bitwise
reproducible for a fixed seed and call order, including across
checkpoint/resume.
"""

import numpy as np
import jax
import jax.numpy as jnp


class KeyStream:
    """Deterministic, serializable stream of JAX PRNG keys."""

    def __init__(self, seed=None):
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**63)
        self._base = jax.random.key(np.uint64(seed).astype(np.int64))
        self._seed = int(seed)
        self._counter = 0

    def next(self):
        """Return a fresh key, advancing the stream."""
        key = jax.random.fold_in(self._base, self._counter)
        self._counter += 1
        return key

    def key_at(self, counter):
        """The key the stream produced (or will produce) at ``counter``,
        without advancing. Used to reconstruct in-flight speculative work
        after checkpoint resume."""
        return jax.random.fold_in(self._base, counter)

    def next_n(self, n):
        """Return ``n`` fresh independent keys."""
        keys = jax.vmap(
            lambda i: jax.random.fold_in(self._base, i))(
                jnp.arange(self._counter, self._counter + n))
        self._counter += n
        return keys

    @property
    def state(self):
        """Serializable counter state (for checkpoints); assignable."""
        return {'seed': self._seed, 'counter': self._counter}

    @state.setter
    def state(self, state):
        self._seed = int(state['seed'])
        self._base = jax.random.key(
            np.uint64(self._seed).astype(np.int64))
        self._counter = int(state['counter'])
