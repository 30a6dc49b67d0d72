"""Gradients flow through the bf16 compute path (the flagship precision).

Catches dtype-mismatch VJP bugs (e.g. preferred_element_type on the fused
dilated upconv) that f32-config tests cannot see.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from strajnet_tpu.config import (
    LossConfig,
    TaskConfig,
    ULTRA_TINY_MODEL_CONFIG,
    TrainConfig,
)
from strajnet_tpu.data.synthetic import synthetic_batch
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import make_train_step


def test_bf16_train_step():
    cfg = dataclasses.replace(ULTRA_TINY_MODEL_CONFIG, dtype="bfloat16")
    task = TaskConfig(grid_height_cells=cfg.output_size[0],
                      grid_width_cells=cfg.output_size[1],
                      num_waypoints=cfg.num_waypoints)
    state = create_train_state(cfg, TrainConfig(use_schedule=False))
    step = make_train_step(task, LossConfig(), cfg.num_waypoints,
                           donate=False)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, 2).items()}
    new_state, losses = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total"]))
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0
