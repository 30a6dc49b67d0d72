"""Challenge metrics, fully jittable (parity: reference occu_metric.py:26-314).

Per waypoint: observed/occluded PR-AUC (Keras interpolation semantics via
:mod:`strajnet_tpu.objective.pr_auc`), mean-based Soft-IoU, Flow-EPE over
cells with nonzero GT flow, and flow-grounded occupancy AUC/IoU computed on
GT flow-origin occupancy warped by the *predicted* flow.

The reference cannot jit these (eager ``.numpy()`` means, stateful Keras AUC —
occu_metric.py:143-174); here everything is pure, so validation runs inside
the same pjit program as the forward pass. The waypoint-presence gating that
upstream Waymo code applies is intentionally disabled in the reference
(``if True:`` at occu_metric.py:85-102) and therefore here as well.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from strajnet_tpu.core.sampling import flow_warp_origin
from strajnet_tpu.objective.loss import WaypointGrids
from strajnet_tpu.objective.pr_auc import pr_auc


def _soft_iou(true_occ: jax.Array, pred_occ: jax.Array) -> jax.Array:
    """Mean-based soft IoU (occu_metric.py:177-199)."""
    t = true_occ.reshape(-1).astype(jnp.float32)
    p = pred_occ.reshape(-1).astype(jnp.float32)
    intersection = jnp.mean(p * t)
    denom = jnp.mean(p) + jnp.mean(t) - intersection
    return jnp.where(denom != 0, intersection / jnp.where(denom != 0, denom,
                                                          1.0), 0.0)


def _flow_epe(true_flow: jax.Array, pred_flow: jax.Array) -> jax.Array:
    """Mean L2 end-point error over cells with nonzero GT flow
    (occu_metric.py:202-252)."""
    diff = (true_flow - pred_flow).astype(jnp.float32)
    flow_exists = jnp.logical_or(true_flow[..., 0:1] != 0.0,
                                 true_flow[..., 1:2] != 0.0).astype(
                                     jnp.float32)
    diff = diff * flow_exists
    epe = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True))
    sum_epe = jnp.sum(epe)
    cnt = jnp.sum(flow_exists)
    return jnp.where(cnt != 0, sum_epe / jnp.where(cnt != 0, cnt, 1.0), 0.0)


def compute_occupancy_flow_metrics(true_waypoints: WaypointGrids,
                                   pred_waypoints: WaypointGrids,
                                   no_warp: bool = False
                                   ) -> Dict[str, jax.Array]:
    """Mean metric values over all waypoints (occu_metric.py:26-140).

    ``pred_waypoints`` carries post-sigmoid occupancies and raw flow.
    """
    n_wp = true_waypoints.observed_occupancy.shape[1]
    acc = {k: [] for k in (
        "vehicles_observed_auc", "vehicles_occluded_auc",
        "vehicles_observed_iou", "vehicles_occluded_iou",
        "vehicles_flow_epe", "vehicles_flow_warped_occupancy_auc",
        "vehicles_flow_warped_occupancy_iou")}

    warped_all = None
    if not no_warp:
        # One batched warp (S = B*T) instead of n_wp separate calls — same
        # per-sample math, single kernel launch on TPU (see loss.py).
        fo = true_waypoints.flow_origin_occupancy
        pf = pred_waypoints.flow
        bt = fo.shape[0] * fo.shape[1]
        warped_all = flow_warp_origin(
            fo.reshape((bt,) + fo.shape[2:]),
            pf.reshape((bt,) + pf.shape[2:])).reshape(fo.shape)

    for k in range(n_wp):
        true_obs = true_waypoints.observed_occupancy[:, k]
        pred_obs = pred_waypoints.observed_occupancy[:, k]
        true_occ = true_waypoints.occluded_occupancy[:, k]
        pred_occ = pred_waypoints.occluded_occupancy[:, k]
        true_flow = true_waypoints.flow[:, k]
        pred_flow = pred_waypoints.flow[:, k]

        acc["vehicles_observed_auc"].append(pr_auc(true_obs, pred_obs))
        acc["vehicles_observed_iou"].append(_soft_iou(true_obs, pred_obs))
        acc["vehicles_occluded_auc"].append(pr_auc(true_occ, pred_occ))
        acc["vehicles_occluded_iou"].append(_soft_iou(true_occ, pred_occ))
        acc["vehicles_flow_epe"].append(_flow_epe(true_flow, pred_flow))

        if not no_warp:
            true_all = jnp.clip(true_obs + true_occ, 0.0, 1.0)
            pred_all = jnp.clip(pred_obs + pred_occ, 0.0, 1.0)
            flow_grounded = pred_all * warped_all[:, k]
            # NOTE argument order follows the reference exactly
            # (occu_metric.py:121-126): the flow-grounded product is passed
            # as y_true and the binary GT as y_pred.
            acc["vehicles_flow_warped_occupancy_auc"].append(
                pr_auc(flow_grounded, true_all))
            acc["vehicles_flow_warped_occupancy_iou"].append(
                _soft_iou(flow_grounded, true_all))

    out = {}
    for k, v in acc.items():
        out[k] = (sum(v) / len(v)) if v else jnp.asarray(0.0, jnp.float32)
    return out


def apply_sigmoid_to_occupancy_logits(
        pred_logits: WaypointGrids) -> WaypointGrids:
    """Occupancy logits -> probabilities; flow passes through
    (train.py:142-154)."""
    return WaypointGrids(
        observed_occupancy=jax.nn.sigmoid(
            pred_logits.observed_occupancy.astype(jnp.float32)),
        occluded_occupancy=jax.nn.sigmoid(
            pred_logits.occluded_occupancy.astype(jnp.float32)),
        flow=pred_logits.flow,
        flow_origin_occupancy=pred_logits.flow_origin_occupancy,
    )


@dataclasses.dataclass
class MetricsAccumulator:
    """Running means of per-batch metric dicts (reference metrics.py:4-59)."""

    prefix: str = "val"
    no_warp: bool = False

    def __post_init__(self):
        self._sums: Dict[str, Any] = {}
        self._count = 0

    def reset_states(self):
        self._sums = {}
        self._count = 0

    def update_state(self, metrics: Dict[str, jax.Array]):
        # Device scalars accumulate with async device-side adds; the host
        # fetch happens once, in get_result (a per-batch float() here
        # would round-trip the remote-TPU tunnel every eval batch).
        for k, v in metrics.items():
            prev = self._sums.get(k)
            self._sums[k] = v if prev is None else prev + v
        self._count += 1

    def get_result(self) -> Dict[str, float]:
        if self._count == 0:
            return {}
        short = {
            "vehicles_observed_auc": "observed_auc",
            "vehicles_occluded_auc": "occluded_auc",
            "vehicles_observed_iou": "observed_iou",
            "vehicles_occluded_iou": "occluded_iou",
            "vehicles_flow_epe": "flow_epe",
            "vehicles_flow_warped_occupancy_auc": "flow_ogm_auc",
            "vehicles_flow_warped_occupancy_iou": "flow_ogm_iou",
        }
        out = {}
        for k, s in self._sums.items():
            name = short.get(k, k)
            if self.no_warp and name.startswith("flow_ogm"):
                continue
            out[f"{self.prefix}_{name}"] = float(s) / self._count
        return out


def print_metrics(res_dict: Dict[str, float], prefix: str = "val",
                  no_warp: bool = False) -> str:
    """Formatted metric block (reference metrics.py:61-71)."""
    lines = [
        f" |obs-AUC: {res_dict.get(f'{prefix}_observed_auc')}"
        f"|occ-AUC: {res_dict.get(f'{prefix}_occluded_auc')}",
        f" |obs-IOU: {res_dict.get(f'{prefix}_observed_iou')}"
        f"|occ-IOU: {res_dict.get(f'{prefix}_occluded_iou')}",
        f" |Flow-EPE: {res_dict.get(f'{prefix}_flow_epe')}|",
    ]
    if not no_warp:
        lines.append(
            f" |FlowOGM_AUC: {res_dict.get(f'{prefix}_flow_ogm_auc')}"
            f" |FlowOGM_IOU: {res_dict.get(f'{prefix}_flow_ogm_iou')}|")
    block = "\n".join(lines)
    print(block)
    return block
