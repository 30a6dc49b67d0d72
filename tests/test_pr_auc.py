"""PR-AUC parity vs tf.keras.metrics.AUC (the reference's metric engine)."""

import numpy as np
import pytest

import jax.numpy as jnp

from strajnet_tpu.objective.pr_auc import pr_auc

tf = pytest.importorskip("tensorflow")


def _keras_auc(y_true, y_pred, num_thresholds=100):
    auc = tf.keras.metrics.AUC(num_thresholds=num_thresholds,
                               summation_method="interpolation", curve="PR")
    auc.update_state(y_true, y_pred)
    return float(auc.result())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pr_auc_matches_keras_random(seed):
    rng = np.random.RandomState(seed)
    y_true = (rng.rand(4, 32, 32, 1) > 0.8).astype(np.float32)
    y_pred = rng.rand(4, 32, 32, 1).astype(np.float32)
    ours = float(pr_auc(jnp.asarray(y_true), jnp.asarray(y_pred)))
    ref = _keras_auc(y_true, y_pred)
    assert ours == pytest.approx(ref, abs=2e-5)


def test_pr_auc_correlated_predictions():
    rng = np.random.RandomState(3)
    y_true = (rng.rand(2048) > 0.7).astype(np.float32)
    y_pred = np.clip(y_true * 0.6 + rng.rand(2048) * 0.4, 0, 1).astype(
        np.float32)
    ours = float(pr_auc(jnp.asarray(y_true), jnp.asarray(y_pred)))
    ref = _keras_auc(y_true, y_pred)
    assert ours == pytest.approx(ref, abs=2e-5)


def test_pr_auc_fractional_labels_cast_to_bool():
    """Keras casts y_true to bool — the flow-warped metric depends on this
    (reference occu_metric.py:121-126 passes a fractional product as y_true).
    """
    rng = np.random.RandomState(4)
    y_true = rng.rand(512).astype(np.float32) * (rng.rand(512) > 0.5)
    y_pred = rng.rand(512).astype(np.float32)
    ours = float(pr_auc(jnp.asarray(y_true), jnp.asarray(y_pred)))
    ref = _keras_auc(y_true, y_pred)
    assert ours == pytest.approx(ref, abs=2e-5)


def test_pr_auc_empty_scene_is_zero():
    y_true = np.zeros(256, np.float32)
    y_pred = np.random.RandomState(5).rand(256).astype(np.float32)
    assert float(pr_auc(jnp.asarray(y_true), jnp.asarray(y_pred))) == 0.0


def test_pr_auc_perfect_prediction():
    y_true = np.array([0, 0, 1, 1], np.float32)
    y_pred = np.array([0.0, 0.1, 0.9, 1.0], np.float32)
    ours = float(pr_auc(jnp.asarray(y_true), jnp.asarray(y_pred)))
    ref = _keras_auc(y_true, y_pred)
    assert ours == pytest.approx(ref, abs=1e-4)
    assert ours == pytest.approx(1.0, abs=1e-3)


def test_pr_auc_boundary_values_zero_and_one():
    y_true = np.array([1, 0, 1, 0, 1], np.float32)
    y_pred = np.array([1.0, 0.0, 0.0, 1.0, 0.5], np.float32)
    # XLA's vectorized f32 log is approximate (~6e-5 rel); exact-match vs
    # keras is bounded by that, not by the formula.
    ours = float(pr_auc(jnp.asarray(y_true), jnp.asarray(y_pred)))
    ref = _keras_auc(y_true, y_pred)
    assert ours == pytest.approx(ref, abs=1e-4)
