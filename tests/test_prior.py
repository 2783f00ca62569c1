"""Tests for the Prior class (reference: tests/test_prior.py)."""

import numpy as np
import pytest
from scipy.stats import norm

from nautilus_tpu import Prior


def test_add_parameter_errors():
    prior = Prior()
    prior.add_parameter('a')
    with pytest.raises(ValueError):
        prior.add_parameter('a')
    with pytest.raises(TypeError):
        prior.add_parameter(1)
    with pytest.raises(ValueError):
        prior.add_parameter('b', dist='undefined_key')
    with pytest.raises(TypeError):
        prior.add_parameter('c', dist=[1, 2])


def test_dimensionality():
    prior = Prior()
    prior.add_parameter('a', dist=(0, 2))
    prior.add_parameter('b', dist=3.0)          # fixed
    prior.add_parameter('c', dist=norm())
    prior.add_parameter('d', dist='a')          # alias
    assert prior.dimensionality() == 2


def test_unit_to_physical():
    prior = Prior()
    prior.add_parameter('a', dist=(-1, 3))
    prior.add_parameter('b', dist=norm(loc=2, scale=0.5))
    u = np.array([[0.5, 0.5], [0.25, 0.9]])
    phys = prior.unit_to_physical(u)
    assert phys[0, 0] == pytest.approx(1.0)
    assert phys[0, 1] == pytest.approx(2.0)
    assert phys[1, 0] == pytest.approx(0.0)
    assert phys[1, 1] == pytest.approx(norm(2, 0.5).isf(0.1))


def test_unit_to_dictionary():
    prior = Prior()
    prior.add_parameter('a', dist=(0, 1))
    prior.add_parameter('fixed', dist=7.0)
    prior.add_parameter('alias', dist='a')
    prior.add_parameter('b', dist=(0, 2))
    d = prior.unit_to_dictionary(np.array([0.5, 0.5]))
    assert d['a'] == pytest.approx(0.5)
    assert d['fixed'] == pytest.approx(7.0)
    assert d['alias'] == pytest.approx(0.5)
    assert d['b'] == pytest.approx(1.0)


def test_dimension_mismatch():
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    with pytest.raises(ValueError):
        prior.unit_to_physical(np.zeros((5, 3)))


def test_is_uniform():
    prior = Prior()
    prior.add_parameter('a', dist=(0, 2))
    prior.add_parameter('b', dist=(-1, 1))
    assert prior.is_uniform()
    lo, hi = prior.uniform_bounds()
    assert np.allclose(lo, [0, -1])
    assert np.allclose(hi, [2, 1])

    prior.add_parameter('c', dist=norm())
    assert not prior.is_uniform()
