"""Host-side pool abstraction for non-JAX likelihood functions.

The TPU-native fast path evaluates jittable likelihoods on device and needs
no pools; this module exists for parity with the reference's support for
arbitrary Python likelihoods parallelized over multiprocessing / dask / MPI
map-style pools (reference: nautilus/pool.py).
"""

from multiprocessing import Pool


def initialize_worker(likelihood):
    """Cache the likelihood in a forked worker process."""
    global LIKELIHOOD
    LIKELIHOOD = likelihood


def likelihood_worker(*args):
    """Evaluate the cached likelihood in a worker process."""
    return LIKELIHOOD(*args)


class SamplerPool:
    """Uniform wrapper over map-style pools.

    Accepts an integer (spawns a ``multiprocessing.Pool``), a
    ``multiprocessing.Pool``, a ``concurrent.futures`` executor, a dask
    client, or an MPI pool executor.
    """

    def __init__(self, pool, likelihood=None):
        if isinstance(pool, int):
            self.pool = Pool(pool, initializer=initialize_worker,
                             initargs=(likelihood,))
        else:
            self.pool = pool

    def map(self, func, iterable):
        if 'distributed.client.Client' in str(type(self.pool)):
            return list(self.pool.gather(self.pool.map(func, iterable)))
        return list(self.pool.map(func, iterable))

    @property
    def size(self):
        if 'distributed.client.Client' in str(type(self.pool)):
            return len(self.pool.nthreads())
        for attr in ['_processes', '_max_workers', 'size', 'nt']:
            if hasattr(self.pool, attr):
                return getattr(self.pool, attr)
        raise ValueError('Cannot determine size of pool.')
