"""Compile (don't run) the flagship train step and print XLA's memory
analysis — discriminates HBM-OOM from a genuine kernel fault for the
batch-16 attn-mode worker crash.

Usage: python -u tools/probe_train_mem.py <mode> <batch>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

mode_arg = sys.argv[1] if len(sys.argv) > 1 else "attn"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
mode = {"attn": "attn", "block": "block", "none": False}[mode_arg]

import dataclasses

from strajnet_tpu.config import (LossConfig, STRAJNET_CONFIG, TaskConfig,
                                 TrainConfig)
from strajnet_tpu.data.synthetic import synthetic_batch
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import make_train_step, zero_loss_sums

cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=mode)
print(f"backend={jax.default_backend()} mode={mode_arg} batch={batch}",
      flush=True)

task = TaskConfig(grid_height_cells=cfg.output_size[0],
                  grid_width_cells=cfg.output_size[1],
                  num_waypoints=cfg.num_waypoints)
state = create_train_state(cfg, TrainConfig(use_schedule=True))
step = make_train_step(task, LossConfig(), cfg.num_waypoints,
                       donate=True, accumulate=True)
b = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, batch, seed=0).items()}
rng = jax.random.PRNGKey(0)

compiled = step.lower(state, b, rng, zero_loss_sums()).compile()
try:
    ma = compiled.memory_analysis()
    print("memory_analysis:", ma, flush=True)
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"  {k}: {v/1e9:.3f} GB", flush=True)
except Exception as e:
    print("memory_analysis unavailable:", e, flush=True)
print("OK", flush=True)
