"""Full-forward A/B probe: tail formulation x attention mode x batch.

Usage: python -u tools/probe_forward_modes.py [batch] [tail ...]
  tail: xla | phase | kernel   (cfg.use_pallas_decoder_tail; default both
        xla and phase)

Times the FLAGSHIP end-to-end forward (the bench_inference program) per
tail mode so formulation experiments are judged in-model, where layout
and fusion context differ from isolated-part timings (round-3 lesson:
the phase tail won isolated but regressed the full forward — PARITY.md).
Timing pattern per memory notes: fori_loop on device, scalar fetch sync.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from strajnet_tpu.config import STRAJNET_CONFIG

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
TAILS = sys.argv[2:] or ["xla", "phase"]
ITERS = int(os.environ.get("PROBE_ITERS", "20"))

from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

print(f"backend={jax.default_backend()} batch={B} tails={TAILS}", flush=True)

for tail in TAILS:
    cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=None,
                              use_pallas_decoder_tail=tail)
    model = STrajNet(cfg=cfg)
    inputs = dummy_inputs(cfg, batch=B, dtype=jnp.float32)
    # jitted one-program init via the kernels-off twin (eager init through
    # the remote tunnel is RTT-bound at ~8 min — BASELINE.md)
    _im = STrajNet(cfg=dataclasses.replace(cfg, use_pallas_attention=False))
    params = jax.jit(lambda r, kw: _im.init(r, **kw))(
        jax.random.PRNGKey(0), dummy_inputs(cfg, batch=1, dtype=jnp.float32))

    @jax.jit
    def forward_n(params, inputs, n, _m=model):
        def body(_, carry):
            probed = dict(inputs)
            probed["flow"] = probed["flow"] + carry * 1e-30
            return jnp.sum(_m.apply(params, **probed))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(forward_n(params, inputs, 3))
    print(f"tail={tail} compile+warmup {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    float(forward_n(params, inputs, ITERS))
    dt = time.perf_counter() - t0
    print(f"tail={tail:6s} batch={B}: {dt/ITERS*1e3:7.2f} ms/batch "
          f"({B*ITERS/dt:7.1f} scenes/s)", flush=True)
print("OK", flush=True)
