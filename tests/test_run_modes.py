"""Cross of run modes (reference smoke matrix:
/root/reference/tests/test_sampler.py:25-66), degenerate shells, and the
non-multiprocessing pool flavors."""

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import jax.numpy as jnp

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.pool import SamplerPool


def _make_problem(vectorized, pass_dict, n_blobs):
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b', dist=(-0.5, 1.5))

    if vectorized == 'jax':
        def likelihood(x):
            log_l = -0.5 * jnp.sum(((x - 0.5) / 0.2) ** 2, axis=-1)
            if n_blobs == 0:
                return log_l
            blobs = tuple(x[..., 0] + i for i in range(n_blobs))
            return (log_l,) + blobs
    elif pass_dict:
        def likelihood(x):
            a = np.asarray(x['a'])
            b = np.asarray(x['b'])
            log_l = -0.5 * ((a - 0.5) ** 2 + (b - 0.5) ** 2) / 0.04
            if n_blobs == 0:
                return log_l
            blobs = tuple(a + i for i in range(n_blobs))
            return (log_l,) + blobs
    else:
        def likelihood(x):
            x = np.asarray(x)
            log_l = -0.5 * np.sum(((x - 0.5) / 0.2) ** 2, axis=-1)
            if n_blobs == 0:
                return log_l
            blobs = tuple(x[..., 0] + i for i in range(n_blobs))
            return (log_l,) + blobs

    return prior, likelihood


@pytest.mark.parametrize('n_networks', [0, 2])
@pytest.mark.parametrize('vectorized,pass_dict,pool,n_blobs', [
    ('jax', False, None, 0),
    ('jax', False, None, 2),
    ('jax', False, None, 1),
    (True, False, None, 1),
    (True, True, None, 0),
    (True, True, None, 2),
    (False, True, None, 1),
    (False, False, None, 0),
    (False, False, 2, 1),
    (False, True, 2, 0),
    (True, False, 2, 2),
    (True, True, 2, 1),
])
def test_run_mode_matrix(n_networks, vectorized, pass_dict, pool, n_blobs):
    prior, likelihood = _make_problem(vectorized, pass_dict, n_blobs)
    sampler = Sampler(prior, likelihood, n_live=120, n_networks=n_networks,
                      seed=5, vectorized=vectorized, pass_dict=pass_dict,
                      pool=pool)
    sampler.run(f_live=0.3, n_eff=300, n_like_max=2500)
    assert sampler.n_like > 0
    points, log_w, log_l = sampler.posterior(return_as_dict=False)
    assert len(points) == sampler.n_like
    assert np.isclose(np.exp(log_w).sum(), 1.0)
    if n_blobs > 0:
        _, _, _, blobs = sampler.posterior(return_as_dict=False,
                                           return_blobs=True)
        assert len(blobs) == len(points)
        if n_blobs > 1:
            assert len(blobs.dtype) == n_blobs


@pytest.mark.parametrize('vectorized', [False, 'jax'])
def test_empty_shells(vectorized):
    # Nearly-flat likelihood with n_update=1 produces shells holding ~one
    # point each, some empty at run end; the run must complete and
    # normalize (reference: tests/test_sampler.py:244-258).
    if vectorized == 'jax':
        def likelihood(x):
            return -jnp.sum((x - 0.5) ** 2, axis=-1) * 0.001
    else:
        def likelihood(x):
            return -np.linalg.norm(x - 0.5) ** 2 * 0.001

    def prior(x):
        return x

    sampler = Sampler(prior, likelihood, n_dim=2, n_networks=0, seed=0,
                      n_update=1, n_live=10, n_batch=1 if not vectorized
                      else 8, vectorized=vectorized)
    sampler.run(f_live=1e-3, n_eff=0)
    _, log_w, _ = sampler.posterior()
    assert np.isclose(np.exp(log_w).sum(), 1.0)


class _StubDaskClient:
    """Duck-typed stand-in for distributed.Client (dask is not installed
    in CI): exercises SamplerPool's map-returns-futures + gather branch."""

    def map(self, func, iterable):
        return [('future', func, item) for item in iterable]

    def gather(self, futures):
        return [func(item) for _, func, item in futures]

    def nthreads(self):
        return {'worker-0': 1, 'worker-1': 1}


# SamplerPool detects dask clients by module name.
_StubDaskClient.__module__ = 'distributed.client'


def test_dask_style_pool():
    pool = SamplerPool(_StubDaskClient())
    assert pool.size == 2
    assert pool.map(lambda x: x + 1, [1, 2, 3]) == [2, 3, 4]

    prior, likelihood = _make_problem(False, False, 0)
    sampler = Sampler(prior, likelihood, n_live=100, n_networks=0, seed=2,
                      vectorized=False, pass_dict=False,
                      pool=_StubDaskClient())
    sampler.run(f_live=0.4, n_eff=150, n_like_max=1200)
    assert sampler.n_like > 0


class _StubMPIPoolExecutor:
    """Duck-typed stand-in for mpi4py.futures.MPIPoolExecutor (MPI is not
    installed in CI): map-returns-lists semantics plus the ``size``
    attribute SamplerPool probes (reference documents MPI pools as a
    first-class path: docs/guides/parallelization.rst)."""

    size = 2

    def map(self, func, iterable):
        return [func(item) for item in iterable]


def test_mpi_style_pool():
    pool = SamplerPool(_StubMPIPoolExecutor())
    assert pool.size == 2
    assert pool.map(lambda x: x * 2, [1, 2]) == [2, 4]

    prior, likelihood = _make_problem(False, False, 0)
    sampler = Sampler(prior, likelihood, n_live=100, n_networks=0, seed=2,
                      vectorized=False, pass_dict=False,
                      pool=_StubMPIPoolExecutor())
    sampler.run(f_live=0.4, n_eff=150, n_like_max=1200)
    assert sampler.n_like > 0


def test_tuple_pool_first_slot_used():
    # Reference accepts pool=(pool_l, pool_s); device kernels replace the
    # bound-sampling pool here, so only the first slot drives likelihoods
    # (docs/parallelization.md "Host pools").
    prior, likelihood = _make_problem(False, False, 0)
    sampler = Sampler(prior, likelihood, n_live=100, n_networks=0, seed=2,
                      vectorized=False, pass_dict=False,
                      pool=(_StubMPIPoolExecutor(), _StubMPIPoolExecutor()))
    assert sampler.pool_l is not None and sampler.pool_l.size == 2
    sampler.run(f_live=0.4, n_eff=150, n_like_max=1200)
    assert sampler.n_like > 0


def test_executor_pool():
    prior, likelihood = _make_problem(False, False, 0)
    with ThreadPoolExecutor(max_workers=2) as executor:
        sampler = Sampler(prior, likelihood, n_live=100, n_networks=0,
                          seed=2, vectorized=False, pass_dict=False,
                          pool=executor)
        assert sampler.pool_l.size == 2
        sampler.run(f_live=0.4, n_eff=150, n_like_max=1200)
    assert sampler.n_like > 0


def test_sampling_starvation_recovers():
    # A shell that cannot deliver a full batch within the candidate budget
    # must be dropped from targeting (with a warning), not abort the run.
    import jax.numpy as jnp

    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.02) ** 2, axis=-1)

    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    sampler = Sampler(prior, likelihood, n_live=120, n_networks=2, seed=3,
                      vectorized='jax', n_batch=2048)
    assert sampler.run(f_live=0.05, n_eff=0)
    assert len(sampler.bounds) > 2

    # Tighten the candidate budget so every sampling-phase batch starves.
    sampler.MAX_COLLECT_ITERS = 1
    sampler.PHASE_MAX_BATCHES = 2
    with pytest.warns(RuntimeWarning, match='no longer be targeted'):
        sampler.run(n_eff=10 ** 9, n_like_max=sampler.n_like + 3000)
    assert len(sampler._starved) > 0
    _, log_w, _ = sampler.posterior()
    assert np.isclose(np.exp(log_w).sum(), 1.0)
