"""Tests for the MLP ensemble emulator (reference: tests/test_neural.py)."""

import numpy as np

from nautilus_tpu.neural import NeuralNetworkEmulator
from nautilus_tpu.bounds.neural import rank_scores
import jax


def test_emulator_rmse():
    # Reference gate: ensemble RMSE < 0.3 * std(y)
    # (reference: tests/test_neural.py:6-15).
    rng = np.random.default_rng(0)
    x = rng.random((1000, 3))
    y = np.linalg.norm(x - 0.5, axis=1)
    emulator = NeuralNetworkEmulator.train(
        x, y, key=jax.random.key(0))
    assert np.sqrt(np.mean((y - emulator.predict(x)) ** 2)) < 0.3 * np.std(y)


def test_emulator_ensemble_shape():
    rng = np.random.default_rng(1)
    x = rng.random((300, 2))
    y = x[:, 0]
    emulator = NeuralNetworkEmulator.train(
        x, y, n_networks=3, key=jax.random.key(1))
    assert emulator.params.weights[0].shape[0] == 3
    pred = emulator.predict(x[:10])
    assert pred.shape == (10,)


def test_rank_scores():
    log_l = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    score = rank_scores(log_l, 4.0)
    # Above threshold (4, 5, 6) in [0.5, 1]; below in [0, 0.5].
    assert np.all(score[log_l >= 4.0] >= 0.5)
    assert np.all(score[log_l < 4.0] < 0.5)
    # Monotonic in log_l.
    assert np.all(np.diff(score) > 0)


def test_rank_scores_plateau():
    # Ties must not produce NaN and keep group means.
    log_l = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    score = rank_scores(log_l, 2.0)
    assert np.all(np.isfinite(score))
    assert np.all(score[log_l >= 2.0] >= 0.5)
