"""Tests for the benchmark model library."""

import numpy as np
import jax.numpy as jnp
import pytest

from nautilus_tpu.models import (
    correlated_gaussian, funnel, rosenbrock, eggbox, gaussian_shell,
    gaussian_mixture)
from nautilus_tpu.models.analytic import mc_log_z


@pytest.mark.parametrize('factory', [
    correlated_gaussian, funnel, rosenbrock, eggbox, gaussian_shell,
    gaussian_mixture])
def test_models_vectorized(factory):
    model = factory()
    x = np.random.default_rng(0).random((64, model.n_dim))
    log_l = np.asarray(model(jnp.asarray(x)))
    assert log_l.shape == (64,)
    assert np.all(np.isfinite(log_l))


def test_gaussian_log_z():
    model = correlated_gaussian(n_dim=3)
    log_z = mc_log_z(model, n=2 ** 21)
    assert log_z == pytest.approx(0.0, abs=0.05)


def test_mixture_log_z():
    model = gaussian_mixture()
    log_z = mc_log_z(model, n=2 ** 21)
    assert log_z == pytest.approx(0.0, abs=0.1)
