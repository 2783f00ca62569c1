"""Tests for Union, NeuralBound, and NautilusBound.

Modeled on the reference test strategy (reference: tests/test_bounds.py:
176-441): split/trim behavior, sampling purity, and determinism.
"""

import numpy as np
import pytest

from nautilus_tpu.bounds import (
    Union, Ellipsoid, UnitCubeEllipsoidMixture, NeuralBound, NautilusBound,
    PhaseShift)
from nautilus_tpu.utils.keys import KeyStream


@pytest.fixture
def two_blobs():
    rng = np.random.default_rng(0)
    a = 0.25 + 0.03 * rng.normal(size=(400, 2))
    b = 0.75 + 0.03 * rng.normal(size=(400, 2))
    return np.vstack([a, b])


def test_union_split(two_blobs):
    union = Union.compute(two_blobs, bound_class=Ellipsoid,
                          keys=KeyStream(1))
    assert len(union.params_list) == 1
    assert union.split(allow_overlap=False)
    assert len(union.params_list) == 2
    # Two tight blobs: no further non-overlapping split should reduce
    # volume indefinitely; must terminate.
    n = 0
    while union.split(allow_overlap=False) and n < 20:
        n += 1
    assert n < 20


def test_union_sample_contains(two_blobs):
    union = Union.compute(two_blobs, bound_class=Ellipsoid,
                          keys=KeyStream(2))
    union.split()
    points = union.sample(800)
    assert points.shape == (800, 2)
    assert np.all(union.contains(points))
    assert np.all(union.contains(two_blobs))


def test_union_volume(two_blobs):
    # The union volume of the two split blobs should roughly equal the sum
    # of two disjoint ellipsoid volumes and be much smaller than one
    # enclosing ellipsoid.
    union = Union.compute(two_blobs, bound_class=Ellipsoid,
                          keys=KeyStream(3))
    single_log_v = union.log_v_all[0]
    while union.split(allow_overlap=False):
        pass
    union.sample(2000)
    assert union.log_v < single_log_v - 1.0


def test_union_mixture_members(two_blobs):
    union = Union.compute(two_blobs, bound_class=UnitCubeEllipsoidMixture,
                          keys=KeyStream(4))
    union.split()
    points = union.sample(500)
    assert np.all(union.contains(points))
    with pytest.raises(ValueError):
        union.split(allow_overlap=False)


def test_union_trim():
    rng = np.random.default_rng(5)
    # Dense blob plus a sparse wide spread of points: after splitting, the
    # sparse member has far lower density and can be trimmed.
    dense = 0.5 + 0.005 * rng.normal(size=(500, 2))
    sparse = rng.random((40, 2))
    points = np.vstack([dense, sparse])
    union = Union.compute(points, keys=KeyStream(6))
    if union.split():
        trimmed = union.trim(threshold=1e2)
        assert isinstance(trimmed, (bool, np.bool_))


def test_neural_bound_purity():
    # Gaussian likelihood; neural bound should mostly contain points above
    # the threshold (reference gate: >= 90% purity,
    # tests/test_bounds.py:311).
    rng = np.random.default_rng(7)
    points = rng.random((2000, 2))
    log_l = -np.sum((points - 0.5) ** 2, axis=1) / 0.05 ** 2
    log_l_min = np.sort(log_l)[-500]
    bound = NeuralBound.compute(points, log_l, log_l_min, keys=KeyStream(8))
    in_bound = bound.contains(points)
    assert np.mean(log_l[in_bound] >= log_l_min) >= 0.9
    above = log_l >= log_l_min
    assert np.mean(in_bound[above]) >= 0.9


def test_nautilus_bound_two_peaks():
    # The reference scenario (reference: tests/test_bounds.py:379-407):
    # two widely separated tiny peaks. The bound must identify both modes,
    # match the true volume within 0.1 nat, and >= 90% of the points it
    # samples must lie above the likelihood threshold.
    rng = np.random.default_rng(0)
    radius = 1e-5
    points = np.vstack([rng.normal(size=(1000, 2)) * radius + 0.1,
                        rng.normal(size=(1000, 2)) * radius + 0.9])

    def likelihood(x):
        return -np.minimum(
            np.linalg.norm(x - 0.1, axis=-1),
            np.linalg.norm(x - 0.9, axis=-1)) / radius

    log_l = likelihood(points)
    log_l_min = -1.0
    log_v_target = np.log(2 * np.pi * radius ** 2)
    bound = NautilusBound.compute(
        points, log_l, log_l_min, log_v_target, n_networks=1,
        keys=KeyStream(10))
    assert len(bound.neural_bounds) == 2
    sample = bound.sample(10000)
    assert np.all(bound.contains(sample))
    assert np.isclose(bound.log_v, log_v_target, rtol=0, atol=0.1)
    assert np.mean(likelihood(sample) > log_l_min) > 0.9


def test_nautilus_bound_shell_volume():
    # Gaussian shell: bound volume should approximate the shell volume.
    rng = np.random.default_rng(11)
    points = rng.random((4000, 2))
    r = np.linalg.norm(points - 0.5, axis=1)
    log_l = -(r - 0.3) ** 2 / 0.03 ** 2
    log_l_min = -1.0
    above = log_l >= log_l_min
    bound = NautilusBound.compute(
        points, log_l, log_l_min, log_v_target=np.log(np.mean(above)),
        keys=KeyStream(12))
    bound.sample(2000, return_points=False)
    v_true = np.mean(above)  # MC truth from uniform points
    assert bound.log_v == pytest.approx(np.log(v_true), abs=np.log(2))


def test_nautilus_bound_deterministic():
    rng = np.random.default_rng(13)
    points = rng.random((1000, 2))
    log_l = -np.sum((points - 0.5) ** 2, axis=1) / 0.1 ** 2
    log_l_min = np.sort(log_l)[-300]

    samples = []
    for _ in range(2):
        bound = NautilusBound.compute(
            points, log_l, log_l_min, log_v_target=np.log(0.1),
            n_networks=1, keys=KeyStream(14))
        samples.append(bound.sample(100))
    assert np.all(samples[0] == samples[1])


def test_phase_shift():
    # Cluster straddling the boundary in dim 0: shift must center it.
    rng = np.random.default_rng(15)
    points = rng.random((500, 2))
    points[:, 0] = (0.05 * rng.normal(size=500)) % 1
    shift = PhaseShift.compute(points, periodic=[0])
    t = shift.transform(points)
    assert np.abs(np.mean(t[:, 0]) - 0.5) < 0.05
    back = shift.transform(t, inverse=True)
    assert np.allclose(back, points, atol=1e-9)
