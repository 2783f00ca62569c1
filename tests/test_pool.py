"""Host-pool likelihood parallelization tests (reference: tests/test_pool.py)."""

import multiprocessing
import os

import numpy as np
import pytest

from nautilus_tpu import Prior, Sampler


def likelihood_with_pid(x):
    return (-0.5 * float(np.sum(((x - 0.5) / 0.1) ** 2)),
            float(os.getpid()))


@pytest.mark.skipif(
    multiprocessing.get_start_method() == 'spawn',
    reason='Worker PIDs only observable with fork start method.')
def test_pool_workers_used():
    # Pool of 2: blobs record worker PIDs; both workers must appear
    # (reference: tests/test_pool.py:25-48).
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    sampler = Sampler(prior, likelihood_with_pid, n_live=100, n_networks=0,
                      seed=0, pool=2, pass_dict=False)
    sampler.run(f_live=0.5, n_eff=100)
    points, log_w, log_l, blobs = sampler.posterior(return_blobs=True)
    assert len(np.unique(blobs)) == 2


def test_n_batch_rounding():
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')

    def likelihood(x):
        return 0.0

    sampler = Sampler(prior, likelihood, pool=3, pass_dict=False)
    # n_batch is the smallest multiple of the pool size >= 100.
    assert sampler.n_batch == 102
    sampler = Sampler(prior, likelihood, pool=None)
    assert sampler.n_batch == 100
