"""Host-side pool abstraction for non-JAX likelihood functions.

The TPU-native fast path evaluates jittable likelihoods on device and needs
no pools; this module exists for parity with the reference's support for
arbitrary Python likelihoods parallelized over multiprocessing / dask / MPI
map-style pools (reference: nautilus/pool.py).
"""

from multiprocessing import Pool

# Likelihood cached once per worker process so pool.map only ships the
# argument batches, never the (possibly heavyweight) likelihood closure.
_WORKER_LIKELIHOOD = None


def initialize_worker(likelihood):
    """Pool initializer: stash the likelihood in the worker process."""
    global _WORKER_LIKELIHOOD
    _WORKER_LIKELIHOOD = likelihood


def likelihood_worker(*args):
    """Evaluate the likelihood cached by :func:`initialize_worker`."""
    return _WORKER_LIKELIHOOD(*args)


def _is_dask_client(pool):
    """Duck-type check for a dask distributed Client (no dask import)."""
    mod = type(pool).__module__ or ''
    return mod.startswith('distributed') and hasattr(pool, 'gather')


class SamplerPool:
    """Uniform wrapper over map-style pools.

    Accepts an integer (spawns a ``multiprocessing.Pool`` whose workers
    cache the likelihood), an existing ``multiprocessing.Pool``, a
    ``concurrent.futures`` executor, a dask distributed client, or an MPI
    pool executor.
    """

    def __init__(self, pool, likelihood=None):
        if isinstance(pool, int):
            pool = Pool(pool, initializer=initialize_worker,
                        initargs=(likelihood,))
        self.pool = pool

    def map(self, func, iterable):
        """Apply ``func`` over ``iterable``, returning a list.

        dask clients return futures from ``map``; gather them so every
        backend presents identical call-and-collect semantics.
        """
        results = self.pool.map(func, iterable)
        if _is_dask_client(self.pool):
            results = self.pool.gather(results)
        return list(results)

    @property
    def size(self):
        """Worker count, probed across the supported pool flavors."""
        if _is_dask_client(self.pool):
            return len(self.pool.nthreads())
        for attr in ('_processes',     # multiprocessing.Pool
                     '_max_workers',   # concurrent.futures executors
                     'size',           # mpi4py MPIPoolExecutor (and alike)
                     'nt'):
            if hasattr(self.pool, attr):
                return getattr(self.pool, attr)
        raise ValueError(
            'Could not infer the worker count of {!r}; pass a pool type '
            'with a _processes, _max_workers, or size attribute.'.format(
                type(self.pool).__name__))
