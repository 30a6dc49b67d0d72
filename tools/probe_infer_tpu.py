"""TPU probe: flagship forward throughput by Pallas mode.

Usage: python -u tools/probe_infer_tpu.py <mode> [batch] [wpp|w0,w1,w2] [compact] [spp]
  mode: attn | block | none   (use_pallas_attention)
Mirrors bench.bench_inference (fori_loop-amortized dispatch).
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
mode = {"attn": "attn", "block": "block", "none": False}[mode_arg]

import dataclasses

from strajnet_tpu.config import STRAJNET_CONFIG
from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

_w = sys.argv[3] if len(sys.argv) > 3 else "0"  # 0 = full-row strips
# 0 stays 0 = EXPLICIT full row (config None now means backend auto)
wpp = (tuple(int(x) for x in _w.split(","))
       if "," in _w else int(_w))
compact = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
spp = int(sys.argv[5]) if len(sys.argv) > 5 else 1  # samples/program
cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=mode,
                          pallas_windows_per_program=wpp,
                          pallas_samples_per_program=spp)
print(f"backend={jax.default_backend()} mode={mode_arg} batch={batch} "
      f"wpp={wpp or 'row'} compact={compact} spp={spp}", flush=True)

model = STrajNet(cfg=cfg)
inputs = dummy_inputs(cfg, batch=batch, dtype=jnp.float32)
if compact:
    # production feed dtypes (compact pipeline): uint8 grids, f16 map
    inputs["ogm"] = inputs["ogm"].astype(jnp.uint8)
    inputs["map_img"] = inputs["map_img"].astype(jnp.float16)
# jitted one-program init via the kernels-off twin (identical param tree,
# ONE cached program shared across every mode/wpp/spp sweep point; eager
# init through the remote tunnel is RTT-bound at ~8 min — BASELINE.md
# "Bench wall anatomy")
_init_model = STrajNet(cfg=dataclasses.replace(
    cfg, use_pallas_attention=False))
params = jax.jit(lambda r, kw: _init_model.init(r, **kw))(
    jax.random.PRNGKey(0), dummy_inputs(cfg, batch=1, dtype=jnp.float32))


@jax.jit
def forward_n(params, inputs, n):
    def body(_, carry):
        probed = dict(inputs)
        probed["flow"] = probed["flow"] + carry * 1e-30
        return jnp.sum(model.apply(params, **probed))
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))


t0 = time.perf_counter()
s = float(forward_n(params, inputs, 3))
print(f"compile+warm {time.perf_counter()-t0:.1f}s sum={s:.3f}", flush=True)
t0 = time.perf_counter()
float(forward_n(params, inputs, 20))
dt = (time.perf_counter() - t0) / 20
print(f"{dt*1e3:.2f} ms/batch -> {batch/dt:.1f} scenes/s", flush=True)
print("OK", flush=True)
