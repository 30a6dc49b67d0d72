"""Training orchestration + CLI (parity target: reference train.py).

Usage:
    python -m strajnet_tpu.train.loop --save_dir ./ckpt \
        --file_dir ./Waymo_Dataset/preprocessed_data --batch_size 16 \
        --epochs 15 --lr 1e-4

Improvements over the reference entry point (which crashes as checked in —
SURVEY.md §2.8-1 — and trains eagerly on the val path):

- single jit'd train/eval program incl. challenge metrics;
- mesh data parallelism via shardings instead of MirroredStrategy;
- Orbax checkpoints with optimizer state + auto-resume;
- per-epoch CSV log (same ``train_log.csv`` convention, train.py:341-356).
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from strajnet_tpu.config import (
    LossConfig,
    ModelConfig,
    STRAJNET_CONFIG,
    TaskConfig,
    TrainConfig,
    WAYMO_TASK_CONFIG,
)
from strajnet_tpu.data.pipeline import (
    as_numpy,
    make_eval_dataset,
    make_train_dataset,
)
from strajnet_tpu.objective.metrics import MetricsAccumulator, print_metrics
from strajnet_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
from strajnet_tpu.train.checkpoints import CheckpointManager
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import make_eval_step, make_train_step


class LossMeans:
    """Running means of the loss dict (reference train.py:159-170)."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.count = 0

    def update(self, losses: Dict[str, jax.Array]):
        for k, v in losses.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v)
        self.count += 1

    def result(self) -> Dict[str, float]:
        return {k: s / max(self.count, 1) for k, s in self.sums.items()}

    def reset(self):
        self.sums, self.count = {}, 0


def train(model_cfg: ModelConfig = STRAJNET_CONFIG,
          task_cfg: TaskConfig = WAYMO_TASK_CONFIG,
          train_cfg: TrainConfig = TrainConfig(),
          loss_cfg: LossConfig = LossConfig(),
          model_axis: int = 1,
          log_every: int = 100,
          profile_dir: Optional[str] = None):
    mesh = create_mesh(model_axis=model_axis)
    print(f"mesh: {dict(mesh.shape)} on {jax.devices()[0].platform}")

    # Profiling hook (SURVEY.md §5 — the reference has none): captures an
    # xplane trace of steps 10..20 of the first epoch when requested.
    profile_state = {"started": False, "stopped": profile_dir is None}

    state = create_train_state(model_cfg, train_cfg)
    ckpt = CheckpointManager(train_cfg.save_dir)
    restored, step0 = ckpt.restore(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {step0}")

    train_step = make_train_step(task_cfg, loss_cfg, model_cfg.num_waypoints)
    eval_step = make_eval_step(task_cfg, loss_cfg, model_cfg.num_waypoints)

    with mesh:
        state = state.replace(params=shard_params(state.params, mesh))

        rng = jax.random.PRNGKey(train_cfg.seed)
        train_losses = LossMeans()
        val_losses = LossMeans()
        val_metrics = MetricsAccumulator("val")

        steps_per_epoch: Optional[int] = None
        start_epoch = int(state.step) // steps_per_epoch if steps_per_epoch \
            else 0

        log_path = os.path.join(train_cfg.save_dir, "train_log.csv")
        for epoch in range(start_epoch, train_cfg.epochs):
            print(f"\nepoch {epoch + 1}/{train_cfg.epochs}")
            ds = make_train_dataset(
                f"{train_cfg.file_dir}/train/*.tfrecords",
                train_cfg.batch_size, train_cfg.shuffle_buffer,
                seed=train_cfg.seed + epoch)
            t0 = time.perf_counter()
            n = 0
            for batch in as_numpy(ds):
                rng, sub = jax.random.split(rng)
                batch = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
                if not profile_state["stopped"]:
                    if n == 10 and not profile_state["started"]:
                        jax.profiler.start_trace(profile_dir)
                        profile_state["started"] = True
                    elif n == 20 and profile_state["started"]:
                        jax.profiler.stop_trace()
                        profile_state["stopped"] = True
                        print(f"  profiler trace written to {profile_dir}")
                state, losses = train_step(state, batch, sub)
                train_losses.update(losses)
                n += 1
                if n % log_every == 0:
                    r = train_losses.result()
                    rate = n * train_cfg.batch_size / (
                        time.perf_counter() - t0)
                    print(f"  step {n}: total={r.get('total', 0):.4f} "
                          f"obs={r.get('observed_xe', 0):.4f} "
                          f"({rate:.1f} scenes/s)")

            vds = make_eval_dataset(
                f"{train_cfg.file_dir}/val/*.tfrecords",
                train_cfg.batch_size)
            for batch in as_numpy(vds):
                batch = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
                losses, metrics = eval_step(state, batch)
                val_losses.update(losses)
                val_metrics.update_state(metrics)

            res = val_metrics.get_result()
            print_metrics(res, "val")

            log = {"epoch": epoch + 1,
                   "loss": train_losses.result().get("total", 0.0),
                   "val_loss": val_losses.result().get("total", 0.0)}
            log.update(res)
            write_header = not os.path.exists(log_path)
            with open(log_path, "a", newline="") as f:
                w = csv.writer(f)
                if write_header:
                    w.writerow(log.keys())
                w.writerow(log.values())

            ckpt.save(int(state.step), state,
                      metrics={"val_loss": log["val_loss"]})
            train_losses.reset()
            val_losses.reset()
            val_metrics.reset_states()

    ckpt.close()
    return state


def main():
    p = argparse.ArgumentParser(description="STrajNet-TPU training")
    p.add_argument("--save_dir", type=str, default="./checkpoints")
    p.add_argument("--file_dir", type=str,
                   default="./Waymo_Dataset/preprocessed_data")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--constant_lr", action="store_true",
                   help="reference-parity constant LR (train.py:197)")
    p.add_argument("--no_fg_msa", action="store_true",
                   help="train.py-parity variant without FG-MSA")
    p.add_argument("--model_axis", type=int, default=1)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of steps 10-20 here")
    args = p.parse_args()

    model_cfg = STRAJNET_CONFIG
    if args.no_fg_msa:
        from strajnet_tpu.config import STRAJNET_TRAIN_PY_CONFIG
        model_cfg = STRAJNET_TRAIN_PY_CONFIG

    train_cfg = TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                            lr=args.lr, use_schedule=not args.constant_lr,
                            save_dir=args.save_dir, file_dir=args.file_dir)
    train(model_cfg=model_cfg, train_cfg=train_cfg,
          model_axis=args.model_axis, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
