"""Pallas TPU kernel: fused shifted-window attention.

Fuses, for one row of windows per program: the qkv projection, window
partition, per-window multi-head attention with relative-position bias and
SW-MSA mask, softmax, value aggregation, window merge, and the output
projection — everything VMEM-resident. This removes the partition/reverse
reshape round-trips through HBM that dominate the XLA lowering of the Swin
block (reference modules.py:227-255 materializes each of them).

The cyclic roll for shifted windows stays outside (a single cheap fused copy
each way); LayerNorm stays outside as well. The kernel therefore computes
exactly ``proj(attention(window_partition(x)))`` for pre-normalized,
pre-rolled inputs.

Layout per grid step (b, g):
  x tile [ws, W, C]  ->  qkv = x2d @ Wqkv  (MXU, [ws*W, 3C])
  for each of W/ws windows w and head h:
      q, k, v = slices of the qkv tile              (VMEM)
      logits = q k^T * scale + rel_bias[h] + mask[w]  (MXU + VPU)
      out_w[h] = softmax(logits) v                   (f32 softmax)
  out tile [ws*W, C] @ Wproj + bias -> out ref

Used for inference / benchmarking (`ModelConfig.use_pallas_attention`); the
training path keeps the XLA program (identical math, jax-differentiable).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            mask_ref, out_ref, *, window_size, num_heads, head_dim,
            use_mask):
    ws = window_size
    c = x_ref.shape[-1]
    w_full = x_ref.shape[2]
    n_win = w_full // ws
    n = ws * ws
    scale = head_dim ** -0.5

    x2d = x_ref[0].reshape(ws * w_full, c)
    qkv = jnp.dot(x2d, wqkv_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x2d.dtype)
    qkv = qkv.reshape(ws, w_full, 3 * c)

    win_outs = []
    for w in range(n_win):
        tile = qkv[:, w * ws:(w + 1) * ws, :]          # [ws, ws, 3C]
        tile = tile.reshape(n, 3 * c)
        outs = []
        for h in range(num_heads):
            off = h * head_dim
            q = tile[:, off:off + head_dim]
            k = tile[:, c + off:c + off + head_dim]
            v = tile[:, 2 * c + off:2 * c + off + head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bias_ref[h].astype(jnp.float32)
            if use_mask:
                logits = logits + mask_ref[w].astype(jnp.float32)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            outs.append(o)
        merged = jnp.concatenate(outs, axis=-1)       # [n, C]
        win_outs.append(merged.reshape(ws, ws, c))

    out = jnp.concatenate(win_outs, axis=1)           # [ws, W, C]
    out2d = out.reshape(ws * w_full, c).astype(x2d.dtype)
    y = jnp.dot(out2d, wproj_ref[:], preferred_element_type=jnp.float32)
    y = y + bproj_ref[:].astype(jnp.float32)
    out_ref[0] = y.reshape(ws, w_full, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window_size", "num_heads",
                                             "interpret"))
def fused_window_attention(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                           wproj: jax.Array, bproj: jax.Array,
                           rel_bias: jax.Array,
                           mask: Optional[jax.Array] = None,
                           *, window_size: int, num_heads: int,
                           interpret: bool = False) -> jax.Array:
    """Windowed MHA with bias/mask for pre-rolled, pre-normalized inputs.

    Args:
      x: [B, H, W, C].
      wqkv: [C, 3C]; bqkv: [3C].
      wproj: [C, C]; bproj: [C].
      rel_bias: [num_heads, ws*ws, ws*ws] relative-position bias.
      mask: optional [n_windows, ws*ws, ws*ws] additive SW-MSA mask
        (row-major window order over the full grid).

    Returns:
      [B, H, W, C] attention output (pre-residual).
    """
    b, h, w, c = x.shape
    ws = window_size
    head_dim = c // num_heads
    n_win_w = w // ws
    use_mask = mask is not None
    if mask is None:
        mask = jnp.zeros((n_win_w, ws * ws, ws * ws), jnp.float32)

    grid = (b, h // ws)

    in_specs = [
        pl.BlockSpec((1, ws, w, c), lambda bi, g: (bi, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wqkv
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wproj
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bproj
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rel_bias
        pl.BlockSpec((n_win_w, ws * ws, ws * ws),
                     lambda bi, g: (g if use_mask else 0, 0, 0),
                     memory_space=pltpu.VMEM),  # mask row block
    ]
    if use_mask:
        # full mask is [n_win_h * n_win_w, n, n]; row block g starts at
        # window g * n_win_w
        mask_in = mask.reshape(-1, n_win_w, ws * ws, ws * ws)
        in_specs[-1] = pl.BlockSpec(
            (1, n_win_w, ws * ws, ws * ws),
            lambda bi, g: (g, 0, 0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, window_size=ws,
                               num_heads=num_heads, head_dim=head_dim,
                               use_mask=use_mask)

    def kernel_wrap(x_ref, wq, bq, wp, bp, bias, m_ref, out_ref):
        if use_mask:
            class _M:
                def __getitem__(self, idx):
                    return m_ref[0][idx]
            m = _M()
        else:
            m = m_ref
        kernel(x_ref, wq, bq, wp, bp, bias, m, out_ref)

    return pl.pallas_call(
        kernel_wrap,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, w, c), lambda bi, g: (bi, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv, wproj, bproj, rel_bias,
      mask_in if use_mask else mask)
