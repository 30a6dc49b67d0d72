"""Standalone challenge-metric evaluation over a preprocessed val split.

The reference computes val metrics only inside its training loop
(train.py:252-282, eager); this CLI evaluates any checkpoint with the fully
jitted metric path.

Usage:
    python -m strajnet_tpu.infer.evaluate --file_dir .../preprocessed_data \
        --weight_path ./ckpt --batch_size 16
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp

from strajnet_tpu.config import (
    LossConfig,
    STRAJNET_CONFIG,
    TrainConfig,
    WAYMO_TASK_CONFIG,
)
from strajnet_tpu.data.pipeline import as_numpy, make_eval_dataset
from strajnet_tpu.objective.metrics import MetricsAccumulator, print_metrics
from strajnet_tpu.train.checkpoints import CheckpointManager
from strajnet_tpu.train.state import create_train_state
from strajnet_tpu.train.step import make_eval_step


def evaluate(file_pattern: str, weight_path: str = "", batch_size: int = 16,
             pallas: str = "auto", no_warp: bool = False,
             compact: bool = True):
    """``pallas`` takes the same mode choices as the train CLI
    (train/loop.py ``--pallas``): auto | off | attn | block | block_fwd."""
    cfg = STRAJNET_CONFIG
    if pallas != "auto":
        mode = {"off": False, "attn": "attn", "block": "block",
                "block_fwd": "block_fwd"}[pallas]
        cfg = dataclasses.replace(cfg, use_pallas_attention=mode)
    state = create_train_state(cfg, TrainConfig())
    if weight_path:
        ckpt = CheckpointManager(weight_path)
        restored, step = ckpt.restore(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {weight_path}")
        state = restored
        print(f"loaded checkpoint at step {step}")

    eval_step = make_eval_step(WAYMO_TASK_CONFIG, LossConfig(),
                               cfg.num_waypoints, no_warp=no_warp)
    acc = MetricsAccumulator("val", no_warp=no_warp)
    # Loss scalars accumulate as async device-side adds; the single host
    # fetch happens after the loop (a per-batch float() here round-trips
    # the remote-TPU tunnel every eval batch — same pattern as
    # MetricsAccumulator / the training loop's LossMeans).
    losses_sum, n = {}, 0
    # drop_remainder=False: evaluate the whole split exactly — the tail
    # batch costs one extra eval-step compile, not dropped records.
    for batch in as_numpy(make_eval_dataset(file_pattern, batch_size,
                                            compact=compact,
                                            drop_remainder=False)):
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        losses, metrics = eval_step(state, jbatch)
        acc.update_state(metrics)
        for k, v in losses.items():
            prev = losses_sum.get(k)
            losses_sum[k] = v if prev is None else prev + v
        n += 1
    if n == 0:
        raise FileNotFoundError(
            f"no records matched {file_pattern!r} — --file_dir should be "
            "the preprocessed-data ROOT (the CLI appends /val/*.tfrecords)")
    res = acc.get_result()
    res.update({f"val_{k}": float(v) / max(n, 1)
                for k, v in losses_sum.items()})
    print_metrics(res, "val", no_warp=no_warp)
    print(json.dumps(res))
    return res


def main():
    p = argparse.ArgumentParser(description="STrajNet-TPU evaluation")
    p.add_argument("--file_dir", type=str,
                   default="./Waymo_Dataset/preprocessed_data")
    p.add_argument("--weight_path", type=str, default="")
    p.add_argument("--batch_size", type=int, default=16,
                   help="16 = the measured v5e throughput knee (PARITY.md)")
    p.add_argument("--pallas", type=str, default="auto",
                   choices=["auto", "off", "attn", "block", "block_fwd"],
                   help="Pallas kernel mode (same choices as the train CLI)")
    p.add_argument("--no_compact", action="store_true",
                   help="feed f32 from the host instead of uint8/f16")
    args = p.parse_args()
    evaluate(f"{args.file_dir}/val/*.tfrecords", args.weight_path,
             args.batch_size, pallas=args.pallas,
             compact=not args.no_compact)


if __name__ == "__main__":
    main()
