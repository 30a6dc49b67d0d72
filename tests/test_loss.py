"""Objective tests: TF-parity of primitive losses + behavior of the gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.config import LossConfig, TaskConfig
from strajnet_tpu.objective.loss import (
    OGMFlowLoss,
    WaypointGrids,
    _sigmoid_focal_xe,
    _sigmoid_xe,
    ogmflow_loss,
    split_pred_waypoints,
)

tf = pytest.importorskip("tensorflow")

H = W = 16
T = 4
CONFIG = TaskConfig(grid_height_cells=H, grid_width_cells=W, num_waypoints=T)


def _random_grids(rng, batch=2, logits=False):
    scale = 3.0 if logits else 1.0
    occ = lambda: (rng.rand(batch, T, H, W, 1) > 0.8).astype(np.float32)
    def logit():
        return (rng.randn(batch, T, H, W, 1) * scale).astype(np.float32)
    flow = (rng.randn(batch, T, H, W, 2) *
            (rng.rand(batch, T, H, W, 2) > 0.5)).astype(np.float32)
    if logits:
        return WaypointGrids(logit(), logit(),
                             rng.randn(batch, T, H, W, 2).astype(np.float32),
                             jnp.zeros((batch, T, H, W, 1)))
    return WaypointGrids(occ(), occ(), flow, occ())


def test_sigmoid_xe_matches_tf():
    rng = np.random.RandomState(0)
    labels = (rng.rand(64) > 0.5).astype(np.float32)
    logits = rng.randn(64).astype(np.float32) * 4
    ours = np.asarray(_sigmoid_xe(jnp.asarray(labels), jnp.asarray(logits)))
    ref = tf.nn.sigmoid_cross_entropy_with_logits(
        labels=labels, logits=logits).numpy()
    # tolerance bounded by XLA's approximate f32 exp/log1p
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_focal_matches_tfa_formula():
    """tfa.losses.sigmoid_focal_crossentropy element math (alpha=.25, g=2)."""
    rng = np.random.RandomState(1)
    labels = (rng.rand(32) > 0.5).astype(np.float32)
    logits = rng.randn(32).astype(np.float32)
    ours = np.asarray(_sigmoid_focal_xe(jnp.asarray(labels),
                                        jnp.asarray(logits), True))
    p = 1 / (1 + np.exp(-logits))
    ce = tf.nn.sigmoid_cross_entropy_with_logits(
        labels=labels, logits=logits).numpy()
    p_t = labels * p + (1 - labels) * (1 - p)
    ref = (labels * 0.25 + (1 - labels) * 0.75) * (1 - p_t) ** 2 * ce
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_loss_returns_four_finite_terms():
    rng = np.random.RandomState(2)
    true = jax.tree.map(jnp.asarray, _random_grids(rng))
    pred = jax.tree.map(jnp.asarray, _random_grids(rng, logits=True))
    out = ogmflow_loss(CONFIG, LossConfig(), true, pred)
    assert set(out) == {"observed_xe", "occluded_xe", "flow", "flow_warp_xe"}
    for k, v in out.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0.0, k


def test_loss_gate_zeroes_empty_scenes():
    """With all-empty GT, the gate kills flow terms entirely (use_gt=True)."""
    zeros1 = jnp.zeros((1, T, H, W, 1))
    zeros2 = jnp.zeros((1, T, H, W, 2))
    true = WaypointGrids(zeros1, zeros1, zeros2, zeros1)
    rng = np.random.RandomState(3)
    pred = jax.tree.map(jnp.asarray, _random_grids(rng, batch=1, logits=True))
    out = ogmflow_loss(CONFIG, LossConfig(use_gt=True), true, pred)
    assert float(out["flow"]) == 0.0
    assert float(out["flow_warp_xe"]) == 0.0


def test_loss_jits_and_grads():
    rng = np.random.RandomState(4)
    true = jax.tree.map(jnp.asarray, _random_grids(rng))
    pred = jax.tree.map(jnp.asarray, _random_grids(rng, logits=True))
    loss_fn = OGMFlowLoss(CONFIG)

    @jax.jit
    def total(p):
        d = loss_fn(true, p)
        return sum(d.values())

    g = jax.grad(lambda p: total(p))(pred)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_flow_l1_normalization():
    """flow term = sum(|ddx|+|ddy|) / (count/2) where count is over the
    [B,H,W,1] existence mask (loss.py:283-294): one cell off by (1,1) -> 4."""
    zeros1 = jnp.zeros((1, 1, 4, 4, 1))
    true_flow = np.zeros((1, 1, 4, 4, 2), np.float32)
    true_flow[0, 0, 1, 1] = [1.0, 1.0]
    ones = np.zeros((1, 1, 4, 4, 1), np.float32)
    ones[0, 0, 1, 1] = 1.0  # non-empty scene so the gate passes
    true = WaypointGrids(jnp.asarray(ones), zeros1, jnp.asarray(true_flow),
                         jnp.asarray(ones))
    pred = WaypointGrids(zeros1, zeros1, jnp.zeros((1, 1, 4, 4, 2)), zeros1)
    cfg = TaskConfig(grid_height_cells=4, grid_width_cells=4, num_waypoints=1)
    out = ogmflow_loss(cfg, LossConfig(), true, pred)
    # |1-0| + |1-0| = 2 over count 1/2 -> 4.0
    assert float(out["flow"]) == pytest.approx(4.0, abs=1e-5)


def test_split_pred_waypoints_layout():
    rng = np.random.RandomState(5)
    x = rng.randn(2, H, W, T * 4).astype(np.float32)
    grids = split_pred_waypoints(jnp.asarray(x), T)
    # channel k*4+0 = observed, +1 occluded, +2:4 flow (train.py:111-121)
    np.testing.assert_array_equal(
        np.asarray(grids.observed_occupancy[:, 2, ..., 0]), x[..., 2 * 4])
    np.testing.assert_array_equal(
        np.asarray(grids.flow[:, 1]), x[..., 1 * 4 + 2:1 * 4 + 4])


def test_gate_equivalence_with_full_pr_auc():
    """The cheap any(true_all) gate equals the reference's AUC>0 gate for
    this input family (preds >= 0): see loss.py gate comment."""
    from strajnet_tpu.core.sampling import flow_warp_origin
    from strajnet_tpu.objective.pr_auc import pr_auc

    rng = np.random.RandomState(7)
    for empty in (False, True):
        if empty:
            true_all = np.zeros((2, 16, 16, 1), np.float32)
        else:
            true_all = (rng.rand(2, 16, 16, 1) > 0.9).astype(np.float32)
        origin = (rng.rand(2, 16, 16, 1) > 0.9).astype(np.float32)
        flow = (rng.randn(2, 16, 16, 2) *
                (rng.rand(2, 16, 16, 2) > 0.5)).astype(np.float32)
        wp = flow_warp_origin(jnp.asarray(origin), jnp.asarray(flow))
        auc = float(pr_auc(jnp.asarray(true_all),
                           wp * jnp.asarray(true_all)))
        gate_ref = float(auc > 0.0)
        gate_cheap = float(jnp.any(jnp.asarray(true_all) != 0))
        assert gate_ref == gate_cheap, (empty, auc)
