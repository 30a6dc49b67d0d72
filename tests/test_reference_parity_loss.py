"""Golden parity of the FULL objective + challenge metrics vs the runnable
reference ``loss.py`` / ``occu_metric.py`` (imported via ref_loader stubs).

This pins the whole-loss composition — waypoint gating, denominators, the
use_pred branch selection (reference loss.py:151-158), and the probability-
as-logit warp quirk — not just the primitive formulas (those live in
test_loss.py). Marked slow: runs eager TF including stateful Keras AUC.
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.config import LossConfig, TaskConfig
from strajnet_tpu.objective.loss import WaypointGrids, ogmflow_loss
from strajnet_tpu.objective.metrics import (
    apply_sigmoid_to_occupancy_logits,
    compute_occupancy_flow_metrics,
)

from tests import ref_loader

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.slow

H = W = 32
T = 4
B = 2
CONFIG = TaskConfig(grid_height_cells=H, grid_width_cells=W, num_waypoints=T)


def _random_true(rng, empty_waypoints=()):
    """Binary GT grids; selected waypoints made fully empty (gate test)."""
    occ = (rng.rand(B, T, H, W, 1) > 0.85).astype(np.float32)
    occ2 = (rng.rand(B, T, H, W, 1) > 0.9).astype(np.float32)
    origin = (rng.rand(B, T, H, W, 1) > 0.85).astype(np.float32)
    flow = (rng.randn(B, T, H, W, 2) * 3.0 *
            (rng.rand(B, T, H, W, 1) > 0.5)).astype(np.float32)
    for k in empty_waypoints:
        occ[:, k] = 0.0
        occ2[:, k] = 0.0
        flow[:, k] = 0.0
    return WaypointGrids(occ, occ2, flow, origin)


def _random_pred(rng):
    logit = lambda: (rng.randn(B, T, H, W, 1) * 3.0).astype(np.float32)
    flow = (rng.randn(B, T, H, W, 2) * 3.0).astype(np.float32)
    return WaypointGrids(logit(), logit(), flow,
                         np.zeros((B, T, H, W, 1), np.float32))


def _to_ref_container(grids: WaypointGrids):
    """Stacked [B,T,...] arrays -> the reference's list-per-waypoint shape."""
    veh = types.SimpleNamespace(
        observed_occupancy=[tf.constant(grids.observed_occupancy[:, k])
                            for k in range(T)],
        occluded_occupancy=[tf.constant(grids.occluded_occupancy[:, k])
                            for k in range(T)],
        flow=[tf.constant(grids.flow[:, k]) for k in range(T)],
        flow_origin_occupancy=[
            tf.constant(grids.flow_origin_occupancy[:, k])
            for k in range(T)],
    )
    return types.SimpleNamespace(vehicles=veh)


@pytest.fixture(scope="module")
def ref_loss_mod():
    ref_loader.set_tfa_focal()
    return ref_loader.load_reference_module("loss")


@pytest.fixture(scope="module")
def ref_metric_mod():
    return ref_loader.load_reference_module("occu_metric")


@pytest.mark.parametrize("use_pred", [False, True])
@pytest.mark.parametrize("use_gt", [False, True])
@pytest.mark.parametrize("use_focal", [False, True])
def test_full_loss_matches_reference(ref_loss_mod, use_pred, use_gt,
                                     use_focal):
    rng = np.random.RandomState(42)
    # waypoint 2 empty: exercises the AUC gate + sum(f_c) denominator
    true = _random_true(rng, empty_waypoints=(2,) if use_gt else ())
    pred = _random_pred(rng)

    ref = ref_loss_mod.OGMFlow_loss(
        CONFIG, replica=1.0, no_use_warp=False, use_pred=use_pred,
        use_focal_loss=use_focal, use_gt=use_gt)
    ref_out = ref(_to_ref_container(pred), _to_ref_container(true),
                  tf.zeros((B, H, W, 1)))

    cfg = LossConfig(use_pred=use_pred, use_gt=use_gt,
                     use_focal_loss=use_focal)
    ours = ogmflow_loss(CONFIG, cfg, jax.tree.map(jnp.asarray, true),
                        jax.tree.map(jnp.asarray, pred))

    for key in ("observed_xe", "occluded_xe", "flow", "flow_warp_xe"):
        r = float(ref_out[key])
        o = float(ours[key])
        assert o == pytest.approx(r, rel=1e-4, abs=1e-5), \
            (key, use_pred, use_gt, use_focal, r, o)


def test_warp_loss_gradient_field_matches_reference(ref_loss_mod):
    """At use_pred=False the warp term's gradient must flow ONLY through
    pred_flow (reference loss.py:156-158 builds the multiplier from TRUE
    occupancies) — the round-1 bug routed it into the occupancy heads."""
    rng = np.random.RandomState(7)
    true = _random_true(rng)
    pred = _random_pred(rng)
    cfg = LossConfig(use_gt=False)

    def warp_term(p):
        return ogmflow_loss(CONFIG, cfg, jax.tree.map(jnp.asarray, true),
                            p)["flow_warp_xe"]

    g = jax.grad(warp_term)(jax.tree.map(jnp.asarray, pred))
    assert float(jnp.abs(g.observed_occupancy).max()) == 0.0
    assert float(jnp.abs(g.occluded_occupancy).max()) == 0.0
    assert float(jnp.abs(g.flow).max()) > 0.0

    # TF cross-check of the same three gradient blocks
    ref = ref_loss_mod.OGMFlow_loss(CONFIG, replica=1.0, use_pred=False,
                                    use_focal_loss=False, use_gt=False)
    tf_pred = _to_ref_container(pred)
    watch = (tf_pred.vehicles.observed_occupancy[0],
             tf_pred.vehicles.occluded_occupancy[0],
             tf_pred.vehicles.flow[0])
    with tf.GradientTape() as tape:
        tape.watch(watch)
        out = ref(tf_pred, _to_ref_container(true), tf.zeros((B, H, W, 1)))
        term = out["flow_warp_xe"]
    g_obs, g_occ, g_flow = tape.gradient(term, watch)
    assert g_obs is None or float(tf.reduce_max(tf.abs(g_obs))) == 0.0
    assert g_occ is None or float(tf.reduce_max(tf.abs(g_occ))) == 0.0
    assert float(tf.reduce_max(tf.abs(g_flow))) > 0.0

    # jax gradient wrt flow[0] matches TF elementwise
    g_flow_ours = np.asarray(g.flow[:, 0])
    np.testing.assert_allclose(g_flow_ours, g_flow.numpy(),
                               rtol=1e-3, atol=1e-6)


def test_challenge_metrics_match_reference(ref_metric_mod):
    """Batch-level golden test of compute_occupancy_flow_metrics
    (occu_metric.py:26-140): AUC/IoU/EPE/warp composition."""
    rng = np.random.RandomState(11)
    true = _random_true(rng)
    pred_logits = _random_pred(rng)
    pred = apply_sigmoid_to_occupancy_logits(
        jax.tree.map(jnp.asarray, pred_logits))

    ref_out = ref_metric_mod.compute_occupancy_flow_metrics(
        CONFIG, _to_ref_container(true),
        _to_ref_container(jax.tree.map(np.asarray, pred)), False)

    ours = compute_occupancy_flow_metrics(jax.tree.map(jnp.asarray, true),
                                          pred)
    for key in ("vehicles_observed_auc", "vehicles_occluded_auc",
                "vehicles_observed_iou", "vehicles_occluded_iou",
                "vehicles_flow_epe", "vehicles_flow_warped_occupancy_auc",
                "vehicles_flow_warped_occupancy_iou"):
        r = float(getattr(ref_out, key))
        o = float(ours[key])
        assert o == pytest.approx(r, rel=2e-4, abs=1e-5), (key, r, o)
