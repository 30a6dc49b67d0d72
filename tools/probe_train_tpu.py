"""TPU probe: one flagship train step, parameterized by Pallas mode/batch.

Usage: python -u tools/probe_train_tpu.py <mode> <batch> [donate] [accum] [wpp] [remat]
  mode: attn | block | none   (use_pallas_attention)
Mirrors bench.bench_training exactly (donate+accumulate step, synthetic
batch) so a pass here predicts a green bench training phase.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

mode_arg = sys.argv[1] if len(sys.argv) > 1 else "attn"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
donate = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
accumulate = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
wpp = int(sys.argv[5]) if len(sys.argv) > 5 else 0  # 0 = full-row strips
remat = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
mode = {"attn": "attn", "block": "block",
        "block_fwd": "block_fwd", "none": False}[mode_arg]

import dataclasses

from strajnet_tpu.config import (LossConfig, STRAJNET_CONFIG, TaskConfig,
                                 TrainConfig)
from strajnet_tpu.data.synthetic import synthetic_batch
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import make_train_step, zero_loss_sums

# wpp 0 stays 0 = EXPLICIT full row (config None now means backend auto)
cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=mode,
                          pallas_windows_per_program=wpp,
                          remat_encoder=remat)
print(f"backend={jax.default_backend()} mode={mode_arg} batch={batch} "
      f"donate={donate} accumulate={accumulate}", flush=True)

task = TaskConfig(grid_height_cells=cfg.output_size[0],
                  grid_width_cells=cfg.output_size[1],
                  num_waypoints=cfg.num_waypoints)
state = create_train_state(cfg, TrainConfig(use_schedule=True))
step = make_train_step(task, LossConfig(), cfg.num_waypoints,
                       donate=donate, accumulate=accumulate)
b = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, batch, seed=0).items()}
rng = jax.random.PRNGKey(0)

t0 = time.perf_counter()
if accumulate:
    st, sm = step(state, b, rng, zero_loss_sums())
else:
    st, sm = step(state, b, rng)
tot = float(sm["total"])
print(f"compile+first: {time.perf_counter()-t0:.1f}s loss={tot:.3f}",
      flush=True)

t0 = time.perf_counter()
N = 10
for _ in range(N):
    if accumulate:
        st, sm = step(st, b, rng, sm)
    else:
        st, sm = step(st, b, rng)
float(sm["total"])
dt = (time.perf_counter() - t0) / N
print(f"{dt*1e3:.1f} ms/step ({batch*1.0/dt:.1f} scenes/s)", flush=True)
print("OK", flush=True)
