"""Training orchestration + CLI (parity target: reference train.py).

Usage:
    python -m strajnet_tpu.train.loop --save_dir ./ckpt \
        --file_dir ./Waymo_Dataset/preprocessed_data --batch_size 16 \
        --epochs 15 --lr 1e-4

Improvements over the reference entry point (which crashes as checked in —
SURVEY.md §2.8-1 — and trains eagerly on the val path):

- single jit'd train/eval program incl. challenge metrics;
- mesh data parallelism via shardings instead of MirroredStrategy, with
  multi-host feeding (per-process dataset shards assembled into global
  arrays by ``shard_batch_multihost``);
- loss means accumulate on device inside the train step — no per-step host
  sync; fetched only every ``log_every`` steps / at epoch end;
- background-thread prefetch overlaps H2D transfer with device compute;
- Orbax checkpoints with optimizer state + auto-resume, including the epoch
  counter (persisted in a metrics sidecar) so a restored run continues
  mid-schedule instead of replaying from epoch 0;
- per-epoch CSV log (same ``train_log.csv`` convention, train.py:341-356).
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from typing import Any, Dict, Optional

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
    prefetch_to_mesh,
)
from strajnet_tpu.objective.metrics import MetricsAccumulator, print_metrics
from strajnet_tpu.parallel.mesh import create_mesh, shard_params
from strajnet_tpu.train.checkpoints import CheckpointManager
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import (
    make_eval_step,
    make_train_step,
    zero_loss_sums,
)


class LossMeans:
    """Running means of the loss dict (reference train.py:159-170).

    Device scalars are accumulated with async device-side adds — NO host
    sync per update (through the remote-TPU tunnel a per-batch ``float()``
    fetch serializes the whole epoch). The single host conversion happens
    in :meth:`result`.
    """

    def __init__(self):
        self.sums: Dict[str, Any] = {}
        self.count = 0

    def update(self, losses: Dict[str, jax.Array], n: int = 1):
        for k, v in losses.items():
            prev = self.sums.get(k)
            self.sums[k] = v if prev is None else prev + v
        self.count += n

    def result(self) -> Dict[str, float]:
        return {k: float(s) / max(self.count, 1)
                for k, s in self.sums.items()}

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
    n_proc = jax.process_count()
    proc = jax.process_index()
    is_main = proc == 0
    print(f"mesh: {dict(mesh.shape)} on {jax.devices()[0].platform}, "
          f"process {proc}/{n_proc}")

    if train_cfg.batch_size % n_proc != 0:
        raise ValueError(f"global batch {train_cfg.batch_size} not divisible "
                         f"by process count {n_proc}")
    local_bs = train_cfg.batch_size // n_proc

    # The loss warp kernel and the attention-backward kernels co-exist
    # since the warps were batched into one launch (PARITY.md bisect) —
    # both stay on by default. LossConfig.warp_kernel=False remains the
    # escape hatch to route the loss warp through XLA (costs ~+220
    # ms/step at batch 16; only for isolating kernel interactions).

    # Profiling hook (SURVEY.md §5 — the reference has none): captures an
    # xplane trace of steps 10..20 of the first epoch when requested.
    profile_state = {"started": False, "stopped": profile_dir is None}

    state = create_train_state(model_cfg, train_cfg)
    ckpt = CheckpointManager(train_cfg.save_dir)
    restored, step0 = ckpt.restore(state)
    start_epoch = 0
    if restored is not None:
        state = restored
        start_epoch = int(ckpt.metadata(step0).get("epoch", 0))
        print(f"resumed from step {step0} (epoch {start_epoch})")

    train_step = make_train_step(task_cfg, loss_cfg, model_cfg.num_waypoints,
                                 accumulate=True)
    eval_step = make_eval_step(task_cfg, loss_cfg, model_cfg.num_waypoints)

    with mesh:
        state = state.replace(params=shard_params(state.params, mesh))

        rng = jax.random.PRNGKey(train_cfg.seed)
        val_losses = LossMeans()
        val_metrics = MetricsAccumulator("val")

        log_path = os.path.join(train_cfg.save_dir, "train_log.csv")
        for epoch in range(start_epoch, train_cfg.epochs):
            print(f"\nepoch {epoch + 1}/{train_cfg.epochs}")
            ds = make_train_dataset(
                f"{train_cfg.file_dir}/train/*.tfrecords",
                local_bs, train_cfg.shuffle_buffer,
                shard_index=proc, shard_count=n_proc,
                seed=train_cfg.seed + epoch,
                compact=train_cfg.compact_feed)
            t0 = time.perf_counter()
            n = 0
            loss_sums = zero_loss_sums()
            sums_at_log = {}
            for batch in prefetch_to_mesh(as_numpy(ds), mesh,
                                          multihost=n_proc > 1):
                rng, sub = jax.random.split(rng)
                if not profile_state["stopped"]:
                    if n == 10 and not profile_state["started"]:
                        jax.profiler.start_trace(profile_dir)
                        profile_state["started"] = True
                    elif n == 20 and profile_state["started"]:
                        jax.profiler.stop_trace()
                        profile_state["stopped"] = True
                        print(f"  profiler trace written to {profile_dir}")
                state, loss_sums = train_step(state, batch, sub, loss_sums)
                n += 1
                if n % log_every == 0:
                    # the only host<->device sync in the loop
                    sums_at_log = {k: float(v) for k, v in loss_sums.items()}
                    rate = n * train_cfg.batch_size / (
                        time.perf_counter() - t0)
                    print(f"  step {n}: "
                          f"total={sums_at_log['total'] / n:.4f} "
                          f"obs={sums_at_log['observed_xe'] / n:.4f} "
                          f"({rate:.1f} scenes/s)")

            train_means = ({k: float(v) / max(n, 1)
                            for k, v in loss_sums.items()} if n else {})

            # Ragged val tail: on a single-device data axis the tail batch
            # is evaluated (reference behavior — its val dataset batches
            # without drop_remainder, train.py:385); on a multi-device
            # mesh it is dropped, since every batch must divide the
            # 'data' axis.
            data_axis = mesh.shape.get("data", 1)
            vds = make_eval_dataset(
                f"{train_cfg.file_dir}/val/*.tfrecords", local_bs,
                shard_index=proc, shard_count=n_proc,
                compact=train_cfg.compact_feed,
                drop_remainder=(data_axis > 1 or n_proc > 1))
            for batch in prefetch_to_mesh(as_numpy(vds), mesh,
                                          multihost=n_proc > 1):
                losses, metrics = eval_step(state, batch)
                val_losses.update(losses)
                val_metrics.update_state(metrics)

            res = val_metrics.get_result()
            print_metrics(res, "val")

            log = {"epoch": epoch + 1,
                   "loss": train_means.get("total", 0.0),
                   "val_loss": val_losses.result().get("total", 0.0)}
            log.update(res)
            if is_main:
                write_header = not os.path.exists(log_path)
                with open(log_path, "a", newline="") as f:
                    w = csv.writer(f)
                    if write_header:
                        w.writerow(log.keys())
                    w.writerow(log.values())

            ckpt.save(int(state.step), state,
                      metrics={"val_loss": log["val_loss"],
                               "epoch": epoch + 1,
                               "steps_per_epoch": n})
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
    p.add_argument("--pallas", type=str, default="auto",
                   choices=["auto", "off", "attn", "block", "block_fwd"],
                   help="Pallas kernel mode (off = pure XLA escape hatch; "
                        "attn = fused window attention only; block = fully "
                        "fused Swin block)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder blocks in the backward "
                        "(trades one extra forward of FLOPs for several GB "
                        "of activation memory — enables larger batches)")
    args = p.parse_args()

    model_cfg = STRAJNET_CONFIG
    if args.no_fg_msa:
        from strajnet_tpu.config import STRAJNET_TRAIN_PY_CONFIG
        model_cfg = STRAJNET_TRAIN_PY_CONFIG
    import dataclasses as _dc
    if args.pallas != "auto":
        mode = {"off": False, "attn": "attn", "block": "block",
                "block_fwd": "block_fwd"}[args.pallas]
        model_cfg = _dc.replace(model_cfg, use_pallas_attention=mode)
    if args.remat:
        model_cfg = _dc.replace(model_cfg, remat_encoder=True)

    train_cfg = TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                            lr=args.lr, use_schedule=not args.constant_lr,
                            save_dir=args.save_dir, file_dir=args.file_dir)
    train(model_cfg=model_cfg, train_cfg=train_cfg,
          model_axis=args.model_axis, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
