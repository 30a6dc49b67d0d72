"""TPU probe: fused decoder-tail kernel vs XLA composition at flagship
geometry (N=B*T=128, 128x128, 96->48->2, bf16). Run:
  python -u tools/probe_tail_tpu.py > /tmp/tail_probe.log 2>&1
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

from strajnet_tpu.ops.pallas_decoder_tail import (decoder_tail,
                                                  decoder_tail_phase,
                                                  decoder_tail_xla, supports)

N, H, W, CIN, CMID = 128, 128, 128, 96, 48
assert supports(H, W, CIN, CMID, 2)

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 5)
x = jax.random.normal(ks[0], (N, H, W, CIN), jnp.bfloat16)
w_up = jax.random.normal(ks[1], (3, 3, CIN, CMID), jnp.float32) * 0.1
b_up = jax.random.normal(ks[2], (CMID,), jnp.float32) * 0.1
w_out = jax.random.normal(ks[3], (3, 3, CMID, 2), jnp.float32) * 0.1
b_out = jax.random.normal(ks[4], (2,), jnp.float32) * 0.1


def loop20(fn):
    @jax.jit
    def run(x, w_up, b_up, w_out, b_out):
        def body(_, carry):
            probe = x + (carry * 1e-30).astype(x.dtype)
            y = fn(probe, w_up, b_up, w_out, b_out)
            return jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, 20, body, jnp.float32(0))
    return run


for name, fn in [("xla", decoder_tail_xla), ("phase", decoder_tail_phase),
                 ("kernel", decoder_tail)]:
    run = loop20(fn)
    t0 = time.perf_counter()
    s = float(run(x, w_up, b_up, w_out, b_out))
    print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s sum={s:.3f}",
          flush=True)
    t0 = time.perf_counter()
    float(run(x, w_up, b_up, w_out, b_out))
    dt = (time.perf_counter() - t0) / 20
    print(f"{name}: {dt*1e3:.2f} ms/call (N={N})", flush=True)

# numeric check on TPU lowering (not just interpret mode)
y_k = decoder_tail(x, w_up, b_up, w_out, b_out)
y_x = decoder_tail_xla(x, w_up, b_up, w_out, b_out)
import numpy as np
d = np.abs(np.asarray(y_k, np.float32) - np.asarray(y_x, np.float32))
s = np.abs(np.asarray(y_x, np.float32)) + 1.0
print("max rel-ish err vs xla-bf16:", float((d / s).max()),
      "mean:", float((d / s).mean()), flush=True)
print("OK", flush=True)
