"""Multi-process ``jax.distributed`` control-path test.

Spawns a real 2-process JAX cluster (localhost coordinator, 1 virtual CPU
device per process) and drives the full Sampler through
``parallel.init_distributed`` in both processes — the stand-in for a
multi-host TPU pod, mirroring how the reference exercises its multi-node
path with an in-process dask Client (reference: tests/test_pool.py:38-48).
The heavier parity harness (2-process vs single-process bitwise logZ
comparison) lives in ``distributed_bench.py``; this test keeps the suite
fast by running only the cluster and checking cross-process agreement and
accuracy. Skippable via NAUTILUS_TPU_SKIP_DISTRIBUTED=1.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from distributed_bench import spawn  # noqa: E402


@pytest.mark.skipif(
    os.environ.get('NAUTILUS_TPU_SKIP_DISTRIBUTED') == '1',
    reason='distributed test disabled by environment')
def test_two_process_cluster(tmp_path):
    results, logs = spawn(2, 1, str(tmp_path / 'out'),
                          n_live=100, n_eff=200, timeout=420)
    for i, r in enumerate(results):
        assert r is not None, 'process {} died:\n{}'.format(i, logs[i][-3000:])
    # Every process runs the control loop in lockstep: identical results.
    assert results[0]['log_z'] == results[1]['log_z']
    assert results[0]['n_like'] == results[1]['n_like']
    assert results[0]['n_devices'] == 2
    # 3-D unit Gaussian in the unit cube: logZ ~ 0 well within tolerance.
    assert np.abs(results[0]['log_z']) < 0.3
