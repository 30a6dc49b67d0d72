"""Measured same-host anchor for BASELINE.md's A100 estimate.

The reference publishes no throughput numbers, so ``bench.py``'s
``vs_baseline`` needs an auditable derivation. This tool measures, on THIS
host's CPU:

1. the actual reference TF2 STrajNet (loaded from /root/reference via the
   test stubs, tf.function graph mode, float32, paper variant
   ``fg_msa=True, fg=True``) — scenes/sec;
2. the achieved TF f32 matmul throughput of this CPU (TFLOP/s), as the
   hardware-capability yardstick.

Derivation recorded in BASELINE.md: assuming the reference's TF stack
achieves the same fraction of matmul peak on an A100 as it does here (same
framework, same graph), its A100-class throughput is

    ref_a100_est = ref_cpu_scenes_per_sec * (a100_matmul / cpu_matmul)

with a100_matmul = 100 TFLOP/s (measured cuBLAS TF32 throughput commonly
reported at ~60-70%% of the 156 TFLOP/s TF32 peak; TF enables TF32 on A100
matmuls by default).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_reference_cpu.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

BATCH = 2
ITERS = 5


def measure_cpu_matmul_tflops(tf) -> float:
    n = 4096
    a = tf.random.normal((n, n))
    b = tf.random.normal((n, n))

    @tf.function
    def mm(a, b):
        return tf.matmul(a, b)

    mm(a, b).numpy()  # build + warm
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = mm(a, b)
    out.numpy()
    dt = time.perf_counter() - t0
    return 2 * n ** 3 * reps / dt / 1e12


def main():
    import tensorflow as tf

    from tests.ref_loader import load_reference_module, set_tfa_mha
    from tests.test_reference_parity_trajnet import _make_tfa_mha_class

    set_tfa_mha(_make_tfa_mha_class())
    modules = load_reference_module("modules")

    cfg = dict(input_size=(512, 512), window_size=8, embed_dim=96,
               depths=[2, 2, 2], num_heads=[3, 6, 12])
    # paper/headline variant, matching bench.py's config (fg_msa on)
    model = modules.STrajNet(cfg, actor_only=True, sep_actors=False,
                             fg_msa=True, fg=True)

    ogm = tf.zeros((BATCH, 512, 512, 11, 2))
    map_img = tf.zeros((BATCH, 256, 256, 3))
    obs = tf.zeros((BATCH, 48, 11, 8))
    occ = tf.zeros((BATCH, 16, 11, 8))
    mapt = tf.zeros((BATCH, 256, 10, 7))
    flow = tf.zeros((BATCH, 512, 512, 2))

    @tf.function
    def forward():
        return model(ogm, map_img, training=False, obs=obs, occ=occ,
                     mapt=mapt, flow=flow)

    forward().numpy()  # trace + compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward()
    out.numpy()
    dt = time.perf_counter() - t0
    ref_cpu = BATCH * ITERS / dt

    cpu_tflops = measure_cpu_matmul_tflops(tf)
    a100_tflops = 100.0  # documented assumption, see module docstring
    ref_a100_est = ref_cpu * a100_tflops / cpu_tflops

    print(json.dumps({
        "ref_cpu_scenes_per_sec": round(ref_cpu, 3),
        "cpu_matmul_tflops": round(cpu_tflops, 2),
        "a100_matmul_tflops_assumed": a100_tflops,
        "ref_a100_scenes_per_sec_est": round(ref_a100_est, 1),
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
