"""Benchmark: STrajNet inference throughput on the flagship 512^2 config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no throughput
numbers; the driver's north-star is >=4x A100 scenes/sec/chip on TPU v5e at
256^2 x 8-waypoint inference. We report scenes/sec on this chip;
``vs_baseline`` is measured against an A100-class estimate for the reference
TF model (see BASELINE.json metadata) of ~25 scenes/sec — recorded here as
the comparison constant until a measured reference number exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Estimated reference throughput (scenes/sec on one A100, TF2 graph mode) —
# no published number exists; see BASELINE.md.
A100_REFERENCE_SCENES_PER_SEC = 25.0

BATCH = 16
WARMUP = 3
ITERS = 10


def main():
    from strajnet_tpu.config import STRAJNET_CONFIG as cfg
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    model = STrajNet(cfg=cfg)
    inputs = dummy_inputs(cfg, batch=BATCH, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    @jax.jit
    def forward(params, inputs):
        return model.apply(params, **inputs)

    # Reduce on device, fetch the scalar to host: forces real execution even
    # if the platform's block_until_ready is a no-op (axon tunnel).
    @jax.jit
    def forward_sum(params, inputs):
        return jnp.sum(forward(params, inputs))

    # compile + warmup
    float(forward_sum(params, inputs))
    for _ in range(WARMUP):
        float(forward_sum(params, inputs))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = float(forward_sum(params, inputs))
    dt = time.perf_counter() - t0

    scenes_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "inference_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/s/chip",
        "vs_baseline": round(scenes_per_sec / A100_REFERENCE_SCENES_PER_SEC,
                             3),
    }))


if __name__ == "__main__":
    main()
