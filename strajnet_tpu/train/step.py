"""Jitted train / eval steps (parity: reference train.py:199-292).

Differences by design:

- one jit program per step; loss *and* challenge metrics run on device (the
  reference's val path is eager-only because of stateful Keras AUC,
  occu_metric.py:148);
- loss normalization is global over the sharded batch — no ``/replica``
  bookkeeping (reference loss.py:200,229, train.py:226-229);
- under a mesh, batch arrays arrive sharded over 'data' and XLA inserts the
  gradient all-reduces.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from strajnet_tpu.config import LossConfig, ModelConfig, TaskConfig
from strajnet_tpu.objective.loss import (
    OGMFlowLoss,
    split_pred_waypoints,
    true_waypoints_from_batch,
)
from strajnet_tpu.objective.metrics import (
    apply_sigmoid_to_occupancy_logits,
    compute_occupancy_flow_metrics,
)


# Model-input rasters: the model itself casts these to its compute dtype
# (models/swin.py ogm/map astype), so compact uint8/f16 feeds pass through
# unwidened — uint8 -> bf16 directly instead of via a materialized f32
# copy. Exact either way: the grids are {0,1} and the map values k/256 are
# representable in bf16/f16/f32 alike.
_MODEL_RASTER_KEYS = ("ogm", "map_image")


def ensure_f32(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Casts compact-fed arrays (uint8 grids, f16 map — data/schema.py
    ``compact=True``) back to f32 inside the jitted step, except the
    model-input rasters (see _MODEL_RASTER_KEYS). The cast fuses into the
    consumers; feeding compact dtypes cuts host->device bytes 2.3x with
    bit-identical downstream numerics."""
    return {k: (v.astype(jnp.float32)
                if (hasattr(v, "dtype") and v.dtype != jnp.float32
                    and k not in _MODEL_RASTER_KEYS) else v)
            for k, v in batch.items()}


def _forward(state, params, batch, training, rng=None):
    kwargs = dict(
        ogm=batch["ogm"], map_img=batch["map_image"], obs=batch["actors"],
        occ=batch["occl_actors"], mapt=batch["centerlines"],
        flow=batch["vec_flow"], training=training)
    if training:
        return state.apply_fn({"params": params}, **kwargs,
                              rngs={"dropout": rng})
    return state.apply_fn({"params": params}, **kwargs)


LOSS_KEYS = ("observed_xe", "occluded_xe", "flow", "flow_warp_xe", "total")


def zero_loss_sums() -> Dict[str, jax.Array]:
    """Initial device-resident loss accumulator for the accumulating step."""
    return {k: jnp.zeros((), jnp.float32) for k in LOSS_KEYS}


def make_train_step(task_cfg: TaskConfig, loss_cfg: LossConfig,
                    num_waypoints: int = 8,
                    donate: bool = True,
                    accumulate: bool = False) -> Callable:
    """Jitted train step.

    With ``accumulate=False`` (default): ``step(state, batch, rng) ->
    (state, loss_dict)``. With ``accumulate=True``: ``step(state, batch,
    rng, loss_sums) -> (state, loss_sums + losses)`` — the running loss sums
    stay on device inside the one jitted program per step, so the training
    loop never forces a host sync to track losses (the reference's
    ``tf.keras.metrics.Mean`` equivalent without the per-step ``.numpy()``).
    """
    loss_fn = OGMFlowLoss(task_cfg, loss_cfg)

    def _step_math(state, batch, rng):
        batch = ensure_f32(batch)
        true_waypoints = true_waypoints_from_batch(batch)

        def compute_loss(params):
            outputs = _forward(state, params, batch, True, rng)
            logits = split_pred_waypoints(outputs, num_waypoints)
            loss_dict = loss_fn(true_waypoints, logits)
            total = (loss_dict["observed_xe"] + loss_dict["occluded_xe"] +
                     loss_dict["flow"] + loss_dict["flow_warp_xe"])
            return total, loss_dict

        (total, loss_dict), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, dict(loss_dict, total=total)

    if accumulate:
        def train_step(state, batch, rng, loss_sums):
            new_state, loss_dict = _step_math(state, batch, rng)
            new_sums = {k: loss_sums[k] + loss_dict[k] for k in loss_sums}
            return new_state, new_sums

        return jax.jit(train_step,
                       donate_argnums=(0, 3) if donate else ())

    def train_step(state, batch: Dict[str, jax.Array], rng: jax.Array):
        return _step_math(state, batch, rng)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(task_cfg: TaskConfig, loss_cfg: LossConfig,
                   num_waypoints: int = 8, no_warp: bool = False) -> Callable:
    loss_fn = OGMFlowLoss(task_cfg, loss_cfg)

    def eval_step(state, batch: Dict[str, jax.Array]):
        batch = ensure_f32(batch)
        true_waypoints = true_waypoints_from_batch(batch)
        outputs = _forward(state, state.params, batch, False)
        logits = split_pred_waypoints(outputs, num_waypoints)
        loss_dict = loss_fn(true_waypoints, logits)
        loss_dict = dict(loss_dict,
                         total=(loss_dict["observed_xe"] +
                                loss_dict["occluded_xe"] +
                                loss_dict["flow"] +
                                loss_dict["flow_warp_xe"]))
        pred_waypoints = apply_sigmoid_to_occupancy_logits(logits)
        metrics = compute_occupancy_flow_metrics(true_waypoints,
                                                 pred_waypoints,
                                                 no_warp=no_warp)
        return loss_dict, metrics

    return jax.jit(eval_step)


def make_predict_step(num_waypoints: int = 8) -> Callable:
    """Inference forward -> post-sigmoid waypoint grids (inference.py:145-158)."""

    def predict_step(state, batch: Dict[str, jax.Array]):
        outputs = _forward(state, state.params, ensure_f32(batch), False)
        logits = split_pred_waypoints(outputs, num_waypoints)
        return apply_sigmoid_to_occupancy_logits(logits)

    return jax.jit(predict_step)
