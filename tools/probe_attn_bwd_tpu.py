"""TPU probe: standalone fused_window_attention fwd+bwd per stage geometry.

Usage: python -u tools/probe_attn_bwd_tpu.py [batch]
Isolates which (stage, masked) combination faults the TPU worker — run each
case in sequence; the first crash kills the process, so the last printed
line identifies the culprit.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from strajnet_tpu.ops.pallas_window_attention import fused_window_attention
from strajnet_tpu.ops.windows import shifted_window_mask

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
WS = 8
print("backend:", jax.default_backend(), "batch:", B, flush=True)

STAGES = [(128, 96, 3), (64, 192, 6), (32, 384, 12)]

for hw, c, heads in STAGES:
    for masked in (False, True):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, hw, hw, c), jnp.bfloat16)
        wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.05, jnp.float32)
        bqkv = jnp.zeros((3 * c,), jnp.float32)
        wproj = jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32)
        bproj = jnp.zeros((c,), jnp.float32)
        n = WS * WS
        rel = jnp.asarray(rng.randn(heads, n, n) * 0.02, jnp.float32)
        mask = None
        if masked:
            mask = jnp.asarray(shifted_window_mask(hw, hw, WS, WS // 2))

        def loss(x):
            y = fused_window_attention(x, wqkv, bqkv, wproj, bproj, rel,
                                       window_size=WS, num_heads=heads,
                                       mask=mask)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        t0 = time.perf_counter()
        g = jax.jit(jax.grad(loss))(x)
        s = float(jnp.sum(g.astype(jnp.float32)))
        print(f"stage hw={hw} c={c} heads={heads} masked={masked}: "
              f"bwd ok {time.perf_counter()-t0:.1f}s dsum={s:.3f}",
              flush=True)
print("ALL OK", flush=True)
