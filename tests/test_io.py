"""Checkpoint write/read round-trip tests (reference: tests/test_io.py)."""

import os

import h5py
import numpy as np
import pytest
import jax.numpy as jnp

from nautilus_tpu import Prior, Sampler
from nautilus_tpu.bounds import (
    UnitCube, Ellipsoid, UnitCubeEllipsoidMixture, Union, NeuralBound,
    NautilusBound)
from nautilus_tpu.neural import NeuralNetworkEmulator
from nautilus_tpu.utils.keys import KeyStream
import jax


@pytest.fixture
def h5file(tmp_path):
    path = tmp_path / 'test.hdf5'
    with h5py.File(path, 'w') as f:
        yield f


@pytest.fixture
def random_points():
    rng = np.random.default_rng(0)
    return rng.random((400, 3))


def test_emulator_io(h5file, random_points):
    y = np.linalg.norm(random_points - 0.5, axis=1)
    emulator = NeuralNetworkEmulator.train(
        random_points, y, key=jax.random.key(0))
    emulator.write(h5file.create_group('emulator'))
    emulator_read = NeuralNetworkEmulator.read(h5file['emulator'])
    assert np.all(emulator.predict(random_points) ==
                  emulator_read.predict(random_points))


def test_unit_cube_io(h5file):
    cube = UnitCube.compute(3, keys=KeyStream(1))
    cube.write(h5file.create_group('bound'))
    cube_read = UnitCube.read(h5file['bound'], keys=KeyStream(1))
    assert cube_read.n_dim == 3
    assert np.all(cube.sample(100) == cube_read.sample(100))


@pytest.mark.parametrize('rng_sync', [True, False])
@pytest.mark.parametrize('cls', [Ellipsoid, UnitCubeEllipsoidMixture])
def test_basic_bound_io(h5file, random_points, cls, rng_sync):
    # rng_sync axis mirrors the reference IO matrix (reference:
    # tests/test_io.py:34-110): with synced key streams the sample
    # streams must match bitwise; without, only the deterministic
    # queries (contains, log_v) must.
    bound = cls.compute(random_points, keys=KeyStream(2))
    bound.write(h5file.create_group('bound'))
    bound_read = cls.read(
        h5file['bound'], keys=KeyStream(2) if rng_sync else KeyStream(99))
    q = np.random.default_rng(1).random((200, 3))
    assert np.all(bound.contains(q) == bound_read.contains(q))
    assert bound.log_v == bound_read.log_v
    sample = bound_read.sample(100)
    if rng_sync:
        assert np.all(bound.sample(100) == sample)
    else:
        assert np.all(bound.contains(sample))


@pytest.mark.parametrize('rng_sync', [True, False])
def test_union_io(h5file, random_points, rng_sync):
    union = Union.compute(random_points, keys=KeyStream(3))
    union.split()
    union.sample(100)
    union.write(h5file.create_group('bound'))
    union_read = Union.read(h5file['bound'], keys=KeyStream(3))
    q = np.random.default_rng(2).random((200, 3))
    assert np.all(union.contains(q) == union_read.contains(q))
    assert union.n_sample == union_read.n_sample
    if rng_sync:
        # Restore the key stream position to match.
        union_read.keys.state = union.keys.state
        assert np.all(union.sample(100) == union_read.sample(100))
    else:
        assert np.all(union.contains(union_read.sample(100)))


@pytest.mark.parametrize('rng_sync', [True, False])
def test_nautilus_bound_io(h5file, random_points, rng_sync):
    log_l = -np.sum((random_points - 0.5) ** 2, axis=1)
    log_l_min = np.sort(log_l)[-100]
    bound = NautilusBound.compute(
        random_points, log_l, log_l_min, log_v_target=np.log(0.25),
        n_networks=1, keys=KeyStream(4))
    bound.sample(64, return_points=False)
    bound.write(h5file.create_group('bound'))
    bound_read = NautilusBound.read(h5file['bound'], keys=KeyStream(4))
    q = np.random.default_rng(3).random((200, 3))
    assert np.all(bound.contains(q) == bound_read.contains(q))
    assert bound.log_v == bound_read.log_v
    if rng_sync:
        bound_read.keys.state = bound.keys.state
        assert np.all(bound.sample(50) == bound_read.sample(50))
    else:
        assert np.all(bound.contains(bound_read.sample(50)))


def _gauss_sampler(filepath, seed=0, resume=True):
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')

    def likelihood(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.05) ** 2, axis=-1)

    return Sampler(prior, likelihood, n_live=200, n_networks=1, seed=seed,
                   vectorized='jax', filepath=filepath, resume=resume)


def test_sampler_checkpoint_resume(tmp_path):
    # Interrupted + resumed run must give bitwise-identical results to an
    # uninterrupted one (reference: tests/test_io.py:113-156).
    path = str(tmp_path / 'run.hdf5')

    sampler = _gauss_sampler(path, resume=False)
    sampler.run(n_eff=500, n_like_max=600)
    del sampler

    sampler_resumed = _gauss_sampler(path, resume=True)
    sampler_resumed.run(n_eff=500)

    sampler_full = _gauss_sampler(str(tmp_path / 'run2.hdf5'), resume=False)
    sampler_full.run(n_eff=500)

    assert sampler_resumed.log_z == sampler_full.log_z
    assert sampler_resumed.n_eff == sampler_full.n_eff
    p1, w1, l1 = sampler_resumed.posterior()
    p2, w2, l2 = sampler_full.posterior()
    assert np.all(p1 == p2)
    assert np.all(w1 == w2)
    assert np.all(l1 == l2)


def test_starved_checkpoint_resume(tmp_path):
    # A run that starved a shell must checkpoint the starved set: a
    # resumed run that forgot it would re-target the shell, re-pay the
    # candidate budget, and diverge from the uninterrupted continuation.
    import warnings

    path = str(tmp_path / 'run.hdf5')

    def make(resume):
        prior = Prior()
        prior.add_parameter('a')
        prior.add_parameter('b')

        def likelihood(x):
            return -0.5 * jnp.sum(((x - 0.5) / 0.02) ** 2, axis=-1)

        return Sampler(prior, likelihood, n_live=120, n_networks=2, seed=3,
                       vectorized='jax', n_batch=2048, filepath=path,
                       resume=resume)

    s1 = make(resume=False)
    assert s1.run(f_live=0.05, n_eff=0)
    # Tighten the candidate budget so sampling-phase batches starve.
    s1.MAX_COLLECT_ITERS = 1
    s1.PHASE_MAX_BATCHES = 2
    with pytest.warns(RuntimeWarning, match='no longer be targeted'):
        s1.run(n_eff=10 ** 9, n_like_max=s1.n_like + 3000)
    assert len(s1._starved) > 0
    s1.write(path, overwrite=True)

    s2 = make(resume=True)
    assert s2._starved == s1._starved
    s2.MAX_COLLECT_ITERS = 1
    s2.PHASE_MAX_BATCHES = 2

    # Continue both from the identical checkpointed state; the resumed
    # run must follow the original bitwise.
    target = s1.n_like + 2000
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', RuntimeWarning)
        s1.run(n_eff=10 ** 9, n_like_max=target)
        s2.run(n_eff=10 ** 9, n_like_max=target)
    assert s1.n_like == s2.n_like
    assert s1.log_z == s2.log_z
    assert s1._starved == s2._starved
    p1, w1, l1 = s1.posterior()
    p2, w2, l2 = s2.posterior()
    assert np.all(p1 == p2)
    assert np.all(w1 == w2)
    assert np.all(l1 == l2)


def test_sampler_checkpoint_no_resume(tmp_path):
    path = str(tmp_path / 'run.hdf5')
    sampler = _gauss_sampler(path, resume=False)
    sampler.run(n_eff=300)
    log_z = sampler.log_z
    # Overwrite from scratch.
    sampler2 = _gauss_sampler(path, resume=False)
    assert sampler2.n_like == 0
    assert os.path.exists(path)
    assert log_z is not None
