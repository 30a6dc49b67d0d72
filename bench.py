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
ITERS = 20


def main():
    import dataclasses

    from strajnet_tpu.config import STRAJNET_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    # fused Pallas window attention on the inference path
    cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=True)
    model = STrajNet(cfg=cfg)
    inputs = dummy_inputs(cfg, batch=BATCH, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    @jax.jit
    def forward(params, inputs):
        return model.apply(params, **inputs)

    # Loop the forward on device via fori_loop so a single dispatch+readback
    # covers all ITERS iterations — the host<->device link (axon tunnel)
    # otherwise dominates the measurement. The carried sum (scaled by ~0 and
    # added to a dummy input channel) makes every iteration data-dependent so
    # XLA cannot elide the loop body.
    @jax.jit
    def forward_n(params, inputs, n):
        def body(_, carry):
            probed = dict(inputs)
            probed["flow"] = probed["flow"] + carry * 1e-30
            return jnp.sum(forward(params, probed))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # compile + warmup
    float(forward_n(params, inputs, WARMUP))

    t0 = time.perf_counter()
    s = float(forward_n(params, inputs, ITERS))
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
