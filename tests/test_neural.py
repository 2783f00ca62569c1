"""Tests for the MLP ensemble emulator (reference: tests/test_neural.py)."""

import numpy as np
import pytest

from nautilus_tpu.neural import NeuralNetworkEmulator, resolve_network_kwargs
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


def test_unsupported_network_kwargs_warn():
    # The reference forwards every key to sklearn's MLPRegressor
    # (reference: nautilus/neural.py:79-88); keys the device trainer has no
    # equivalent for must warn instead of silently changing behavior.
    import nautilus_tpu.neural as neural_mod
    neural_mod._warned_network_keys.discard('solver')
    with pytest.warns(Warning, match="solver"):
        cfg = resolve_network_kwargs({'solver': 'lbfgs', 'max_iter': 123})
    assert cfg['max_epochs'] == 123
    # One-time: a second resolve of the same key stays quiet.
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter('error')
        resolve_network_kwargs({'solver': 'lbfgs'})
    with pytest.warns(Warning, match="random_state"):
        resolve_network_kwargs({'random_state': 3})


def test_emulator_alpha_l2():
    # alpha (sklearn's L2 penalty; reference default alpha=0,
    # nautilus/neural.py:80) shrinks the trained weights and still fits.
    rng = np.random.default_rng(2)
    x = rng.random((400, 2))
    y = x[:, 0] + 0.5 * x[:, 1]

    def weight_norm(emulator):
        return float(sum(np.sum(np.asarray(w) ** 2)
                         for w in emulator.params.weights))

    em0 = NeuralNetworkEmulator.train(
        x, y, n_networks=2, key=jax.random.key(5))
    em1 = NeuralNetworkEmulator.train(
        x, y, n_networks=2, neural_network_kwargs={'alpha': 1.0},
        key=jax.random.key(5))
    assert weight_norm(em1) < weight_norm(em0)
    # Mild regularization must not break the fit.
    em2 = NeuralNetworkEmulator.train(
        x, y, n_networks=2, neural_network_kwargs={'alpha': 1e-4},
        key=jax.random.key(5))
    rmse = np.sqrt(np.mean((y - em2.predict(x)) ** 2))
    assert rmse < 0.3 * np.std(y)


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
