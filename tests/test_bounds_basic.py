"""Tests for basic bounds: geometric invariants vs analytic truths.

Modeled on the reference test strategy (reference: tests/test_bounds.py):
MVEE recovery of a known sphere, sample-contains consistency, analytic
volumes, transform round trips, and seeded reproducibility.
"""

import numpy as np
import pytest
from scipy.special import gammaln

from nautilus_tpu.bounds import UnitCube, Ellipsoid, UnitCubeEllipsoidMixture
from nautilus_tpu.utils.keys import KeyStream


@pytest.fixture
def random_points():
    rng = np.random.default_rng(42)
    return rng.random((500, 4))


@pytest.fixture
def sphere_boundary_points():
    # Points on the unit-sphere boundary centered at 0.5.
    rng = np.random.default_rng(0)
    d = 3
    x = rng.normal(size=(200, d))
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    return 0.5 + 0.25 * x


def test_unit_cube():
    cube = UnitCube.compute(3, keys=KeyStream(0))
    points = cube.sample(321)
    assert points.shape == (321, 3)
    assert np.all(cube.contains(points))
    assert cube.log_v == 0.0
    outside = np.copy(points)
    outside[:, 0] += 1.0
    assert not np.any(cube.contains(outside))


def test_unit_cube_deterministic():
    a = UnitCube.compute(3, keys=KeyStream(7)).sample(100)
    b = UnitCube.compute(3, keys=KeyStream(7)).sample(100)
    assert np.all(a == b)


def test_mvee_recovers_sphere(sphere_boundary_points):
    ell = Ellipsoid.compute(sphere_boundary_points, enlarge_per_dim=1.0,
                            keys=KeyStream(1))
    # Volume should be close to that of the radius-0.25 sphere.
    d = 3
    log_v_true = (d * np.log(0.25) + 0.5 * d * np.log(np.pi) -
                  gammaln(d / 2 + 1))
    assert ell.log_v == pytest.approx(log_v_true, abs=0.1)
    assert np.all(ell.contains(sphere_boundary_points))


def test_ellipsoid_sample_and_contains(random_points):
    ell = Ellipsoid.compute(random_points, keys=KeyStream(2))
    sample = ell.sample(1000)
    assert sample.shape == (1000, 4)
    assert np.all(ell.contains(sample))
    assert np.all(ell.contains(random_points))


def test_ellipsoid_volume_montecarlo(random_points):
    # MC estimate of the containment fraction of an enclosing box must match
    # exp(log_v) / V_box.
    ell = Ellipsoid.compute(random_points, keys=KeyStream(3))
    rng = np.random.default_rng(1)
    lo, hi = -0.5, 1.5
    box = rng.random((200000, 4)) * (hi - lo) + lo
    frac = np.mean(ell.contains(box))
    v_box = (hi - lo) ** 4
    assert frac * v_box == pytest.approx(np.exp(ell.log_v), rel=0.05)


def test_ellipsoid_transform_roundtrip(random_points):
    ell = Ellipsoid.compute(random_points, keys=KeyStream(4))
    t = ell.transform(random_points)
    back = ell.transform(t, inverse=True)
    assert np.allclose(back, random_points, atol=5e-3)
    # Points inside the ellipsoid have |t| < 1.
    assert np.all(np.sum(t ** 2, axis=1) < 1.0 + 1e-5)


def test_ellipsoid_enlarge_ordering(random_points):
    small = Ellipsoid.compute(random_points, enlarge_per_dim=1.0,
                              keys=KeyStream(5))
    big = Ellipsoid.compute(random_points, enlarge_per_dim=1.2,
                            keys=KeyStream(5))
    d = 4
    assert big.log_v == pytest.approx(
        small.log_v + d * np.log(1.2), abs=1e-3)


def test_ellipsoid_errors(random_points):
    with pytest.raises(ValueError):
        Ellipsoid.compute(random_points, enlarge_per_dim=0.9)
    with pytest.raises(ValueError):
        Ellipsoid.compute(random_points[:3])


def test_ellipsoid_sample_deterministic(random_points):
    a = Ellipsoid.compute(random_points, keys=KeyStream(6)).sample(100)
    b = Ellipsoid.compute(random_points, keys=KeyStream(6)).sample(100)
    assert np.all(a == b)


def test_mixture_thin_gaussian():
    # A pancake distribution: two tight dims, two full-range dims. The
    # mixture should bound the full-range dims by the cube.
    rng = np.random.default_rng(8)
    points = rng.random((1000, 4))
    points[:, 1] = 0.5 + points[:, 1] * 0.01
    points[:, 3] = 0.2 + points[:, 3] * 0.01
    mix = UnitCubeEllipsoidMixture.compute(points, keys=KeyStream(9))
    assert mix.dim_cube[0] and mix.dim_cube[2]
    assert not mix.dim_cube[1] and not mix.dim_cube[3]
    assert mix.log_v < np.log(0.1)
    sample = mix.sample(1000)
    assert np.all(mix.contains(sample))
    assert np.all(mix.contains(points))


def test_mixture_uniform_is_cube():
    # Uniform points in the cube: no ellipsoid dim should reduce volume
    # enough; resulting volume must be ~ the cube's.
    rng = np.random.default_rng(10)
    points = rng.random((2000, 5))
    mix = UnitCubeEllipsoidMixture.compute(points, keys=KeyStream(11))
    assert mix.log_v <= 0.0 + 1e-6
    sample = mix.sample(500)
    assert np.all(mix.contains(sample))


def test_mixture_gaussian_blob():
    # Tight blob in all dims: all dims should be ellipsoid-bounded.
    rng = np.random.default_rng(12)
    points = 0.5 + 0.02 * rng.normal(size=(800, 3))
    mix = UnitCubeEllipsoidMixture.compute(points, keys=KeyStream(13))
    assert not np.any(mix.dim_cube)
    assert np.all(mix.contains(points))
    assert mix.log_v < np.log(0.01)
