"""TPU probe: chained fused_window_attention blocks, fwd+bwd, mimicking the
encoder's structure (LN -> attn -> residual -> LN -> MLP -> residual, with
roll for odd blocks) without Flax — a minimal reproducer for the full-step
worker crash that stays under the remote-compile payload cap.

Usage: python -u tools/probe_attn_chain_tpu.py <nstages> <blocks_per_stage>
       [batch] [filler_gb] [droppath]
Stages use the flagship geometries (128^2/96/3h -> 64^2/192/6h ->
32^2/384/12h) with PatchMerging-style downsampling between them.
filler_gb > 0 pins a dummy HBM allocation first, pushing the program's
buffers toward the end of HBM (tests the placement-dependent-OOB theory
for the full-step worker crash). droppath=1 adds per-sample keep masks
after attn/mlp like training does.
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
from strajnet_tpu.ops.windows import shifted_window_mask_jnp

NSTAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 3
NBLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
FILLER_GB = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
DROPPATH = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
WS = 8
STAGES = [(128, 96, 3), (64, 192, 6), (32, 384, 12)][:NSTAGES]
print(f"backend={jax.default_backend()} stages={NSTAGES} "
      f"blocks={NBLOCKS} batch={B} filler={FILLER_GB}GB dp={DROPPATH}",
      flush=True)

filler = None
if FILLER_GB > 0:
    n = int(FILLER_GB * (1 << 30) // 4)
    filler = jax.device_put(jnp.ones((n,), jnp.float32))
    filler.block_until_ready()
    print("filler pinned:", float(filler[0]), flush=True)

rng = np.random.RandomState(0)


def mkparams():
    ps = []
    for hw, c, heads in STAGES:
        blocks = []
        for bi in range(NBLOCKS):
            blocks.append(dict(
                wqkv=jnp.asarray(rng.randn(c, 3 * c) * 0.05, jnp.float32),
                bqkv=jnp.zeros((3 * c,), jnp.float32),
                wproj=jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32),
                bproj=jnp.zeros((c,), jnp.float32),
                rel=jnp.asarray(rng.randn(heads, WS * WS, WS * WS) * 0.02,
                                jnp.float32),
                ln1s=jnp.ones((c,), jnp.float32),
                ln1b=jnp.zeros((c,), jnp.float32),
                ln2s=jnp.ones((c,), jnp.float32),
                ln2b=jnp.zeros((c,), jnp.float32),
                w1=jnp.asarray(rng.randn(c, 4 * c) * 0.03, jnp.float32),
                w2=jnp.asarray(rng.randn(4 * c, c) * 0.03, jnp.float32),
            ))
        merge = None
        if hw != STAGES[-1][0]:
            merge = jnp.asarray(rng.randn(4 * c, 2 * c) * 0.05, jnp.float32)
        ps.append((blocks, merge))
    return ps


def ln(x, s, b):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-5)) * s + b


def forward(params, x):
    bf = jnp.bfloat16
    for si, ((hw, c, heads), (blocks, merge)) in enumerate(
            zip(STAGES, params)):
        for bi, p in enumerate(blocks):
            shift = (WS // 2) if (bi % 2 == 1) else 0
            h = ln(x.astype(jnp.float32), p["ln1s"], p["ln1b"]).astype(bf)
            if shift:
                h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
                mask = shifted_window_mask_jnp(hw, hw, WS, shift)
            else:
                mask = None
            a = fused_window_attention(
                h, p["wqkv"].astype(bf), p["bqkv"].astype(bf),
                p["wproj"].astype(bf), p["bproj"].astype(bf),
                p["rel"], mask, window_size=WS, num_heads=heads)
            if shift:
                a = jnp.roll(a, (shift, shift), axis=(1, 2))
            if DROPPATH:
                keep = jnp.asarray(
                    rng.rand(B) > 0.1, jnp.float32)[:, None, None, None]
                a = a * keep.astype(a.dtype) / 0.9
            x = x + a.astype(x.dtype)
            m = ln(x.astype(jnp.float32), p["ln2s"], p["ln2b"]).astype(bf)
            m = jnp.dot(m.reshape(-1, c), p["w1"].astype(bf))
            m = jax.nn.gelu(m, approximate=True)
            m = jnp.dot(m, p["w2"].astype(bf)).reshape(x.shape)
            if DROPPATH:
                keep = jnp.asarray(
                    rng.rand(B) > 0.1, jnp.float32)[:, None, None, None]
                m = m * keep.astype(m.dtype) / 0.9
            x = x + m.astype(x.dtype)
        if merge is not None:
            b_, hh, ww, cc = x.shape
            q = x.reshape(b_, hh // 2, 2, ww // 2, 2, cc)
            q = jnp.concatenate(
                [q[:, :, 0, :, 0], q[:, :, 1, :, 0],
                 q[:, :, 0, :, 1], q[:, :, 1, :, 1]], axis=-1)
            x = jnp.dot(q.reshape(-1, 4 * cc),
                        merge.astype(x.dtype)).reshape(
                            b_, hh // 2, ww // 2, 2 * cc)
    return x


params = mkparams()
x0 = jnp.asarray(rng.randn(B, STAGES[0][0], STAGES[0][0], STAGES[0][1]),
                 jnp.bfloat16)


@jax.jit
def run(params, x0):
    def loss(ps):
        return jnp.sum(forward(ps, x0).astype(jnp.float32) ** 2)
    g = jax.grad(loss)(params)
    return sum(jnp.sum(v.astype(jnp.float32) ** 2)
               for v in jax.tree_util.tree_leaves(g))


t0 = time.perf_counter()
print("chain grad ok:", float(run(params, x0)),
      f"{time.perf_counter()-t0:.1f}s", flush=True)
print("OK", flush=True)
