"""Pallas TPU kernel: fused shifted-window attention (forward + backward).

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

Training support: the op carries a ``jax.custom_vjp`` whose backward is a
second Pallas kernel. It recomputes qkv and the per-window softmax in VMEM
(cheaper than saving [B,H,W,3C] intermediates to HBM) and produces dx as
tiles plus the weight/bias/rel-bias gradients accumulated across the
sequential TPU grid (all grid steps map onto one revisited VMEM block that is
zero-initialized on the first step). The SW-MSA mask is a constant — its
cotangent is zero.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_tile(qkv, bias_ref, mask_ref, *, window_size, num_heads, head_dim,
               use_mask, want_probs=False):
    """Per-window attention over one [ws, W, 3C] qkv tile.

    Returns out2d [ws*W, C] and, when ``want_probs``, the per-window/head
    softmax probabilities and (q, k, v) slices for the backward pass.
    """
    ws = window_size
    w_full = qkv.shape[1]
    c = qkv.shape[-1] // 3
    n_win = w_full // ws
    n = ws * ws
    scale = head_dim ** -0.5

    win_outs = []
    saved = []
    for w in range(n_win):
        tile = qkv[:, w * ws:(w + 1) * ws, :].reshape(n, 3 * c)
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
            if want_probs:
                saved.append((p, q, k, v))
        merged = jnp.concatenate(outs, axis=-1)       # [n, C] f32
        win_outs.append(merged.reshape(ws, ws, c))

    out = jnp.concatenate(win_outs, axis=1)           # [ws, W, C]
    return out.reshape(ws * w_full, c), saved


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            mask_ref, out_ref, *, window_size, num_heads, head_dim,
            use_mask):
    ws = window_size
    c = x_ref.shape[-1]
    w_full = x_ref.shape[2]

    x2d = x_ref[0].reshape(ws * w_full, c)
    qkv = jnp.dot(x2d, wqkv_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x2d.dtype)
    qkv = qkv.reshape(ws, w_full, 3 * c)

    out2d, _ = _attn_tile(qkv, bias_ref, mask_ref, window_size=ws,
                          num_heads=num_heads, head_dim=head_dim,
                          use_mask=use_mask)
    out2d = out2d.astype(x2d.dtype)
    y = jnp.dot(out2d, wproj_ref[:], preferred_element_type=jnp.float32)
    y = y + bproj_ref[:].astype(jnp.float32)
    out_ref[0] = y.reshape(ws, w_full, c).astype(out_ref.dtype)


def _bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref, mask_ref,
                dy_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                dbias_ref, *, window_size, num_heads, head_dim, use_mask):
    ws = window_size
    c = x_ref.shape[-1]
    w_full = x_ref.shape[2]
    n_win = w_full // ws
    n = ws * ws
    scale = head_dim ** -0.5

    is_first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(is_first)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # Recompute the forward in VMEM.
    x2d = x_ref[0].reshape(ws * w_full, c)
    qkv = jnp.dot(x2d, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x2d.dtype)
    qkv3 = qkv.reshape(ws, w_full, 3 * c)
    out2d, saved = _attn_tile(qkv3, bias_ref, mask_ref, window_size=ws,
                              num_heads=num_heads, head_dim=head_dim,
                              use_mask=use_mask, want_probs=True)

    dy2d = dy_ref[0].reshape(ws * w_full, c).astype(jnp.float32)

    # Output-projection gradients.
    dwproj_ref[...] += jax.lax.dot_general(
        out2d, dy2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(dy2d, axis=0, keepdims=True)
    dout2d = jax.lax.dot_general(
        dy2d, wproj_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dout = dout2d.reshape(ws, w_full, c)

    # Attention backward per window/head; assemble dqkv tile.
    dbias_acc = [jnp.zeros((n, n), jnp.float32) for _ in range(num_heads)]
    dqkv_wins = []
    si = 0
    for w in range(n_win):
        do_win = dout[:, w * ws:(w + 1) * ws, :].reshape(n, c)
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(num_heads):
            p, q, k, v = saved[si]
            si += 1
            do = do_win[:, h * head_dim:(h + 1) * head_dim]
            # dP = dO V^T ; dV = P^T dO
            dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # softmax backward
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_acc[h] = dbias_acc[h] + ds
            dq = jnp.dot(ds, k.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ) * scale
            dq_parts.append(dq)
            dk_parts.append(dk)
            dv_parts.append(dv)
        dqkv_win = jnp.concatenate(
            dq_parts + dk_parts + dv_parts, axis=-1)   # [n, 3C]
        dqkv_wins.append(dqkv_win.reshape(ws, ws, 3 * c))

    dqkv = jnp.concatenate(dqkv_wins, axis=1).reshape(ws * w_full, 3 * c)

    for h in range(num_heads):
        dbias_ref[h] += dbias_acc[h]

    # qkv-projection gradients + input gradient.
    dwqkv_ref[...] += jax.lax.dot_general(
        x2d.astype(jnp.float32), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dx2d = jax.lax.dot_general(
        dqkv, wqkv_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = dx2d.reshape(ws, w_full, c).astype(dx_ref.dtype)


def _mask_spec(use_mask, n_win_w, n):
    if use_mask:
        return pl.BlockSpec((1, n_win_w, n, n), lambda bi, g: (g, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((n_win_w, n, n), lambda bi, g: (0, 0, 0),
                        memory_space=pltpu.VMEM)


class _MaskRow:
    """Adapter so the kernel body indexes mask[w] uniformly whether the
    block carries a leading per-row axis (shifted case) or not."""

    def __init__(self, ref, has_row_axis):
        self._ref = ref
        self._has_row = has_row_axis

    def __getitem__(self, idx):
        return self._ref[0][idx] if self._has_row else self._ref[idx]


@functools.lru_cache(maxsize=None)
def _make_fused_fn(window_size: int, num_heads: int, use_mask: bool,
                   interpret: bool):
    """Builds the custom-vjp fused attention for a static geometry."""
    ws = window_size

    def fwd_call(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in):
        b, h, w, c = x.shape
        head_dim = c // num_heads
        n = ws * ws
        n_win_w = w // ws
        grid = (b, h // ws)
        kernel = functools.partial(_kernel, window_size=ws,
                                   num_heads=num_heads, head_dim=head_dim,
                                   use_mask=use_mask)

        def kernel_wrap(x_ref, wq, bq, wp, bp, bias, m_ref, out_ref):
            kernel(x_ref, wq, bq, wp, bp, bias,
                   _MaskRow(m_ref, use_mask), out_ref)

        return pl.pallas_call(
            kernel_wrap,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, ws, w, c), lambda bi, g: (bi, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # wqkv
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv
                pl.BlockSpec(memory_space=pltpu.VMEM),  # wproj
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bproj
                pl.BlockSpec(memory_space=pltpu.VMEM),  # rel_bias
                _mask_spec(use_mask, n_win_w, n),
            ],
            out_specs=pl.BlockSpec((1, ws, w, c),
                                   lambda bi, g: (bi, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            interpret=interpret,
        )(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in)

    def bwd_call(x, wqkv, bqkv, wproj, rel_bias, mask_in, dy):
        b, h, w, c = x.shape
        head_dim = c // num_heads
        n = ws * ws
        n_win_w = w // ws
        grid = (b, h // ws)
        kernel = functools.partial(_bwd_kernel, window_size=ws,
                                   num_heads=num_heads, head_dim=head_dim,
                                   use_mask=use_mask)

        def kernel_wrap(x_ref, wq, bq, wp, bias, m_ref, dy_ref, *outs):
            kernel(x_ref, wq, bq, wp, bias, _MaskRow(m_ref, use_mask),
                   dy_ref, *outs)

        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        acc = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda bi, g: (0,) * len(shape),
            memory_space=pltpu.VMEM)
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = pl.pallas_call(
            kernel_wrap,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, ws, w, c), lambda bi, g: (bi, g, 0, 0),
                             memory_space=pltpu.VMEM),
                full, full, full, full,
                _mask_spec(use_mask, n_win_w, n),
                pl.BlockSpec((1, ws, w, c), lambda bi, g: (bi, g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, ws, w, c), lambda bi, g: (bi, g, 0, 0),
                             memory_space=pltpu.VMEM),
                acc((c, 3 * c)), acc((1, 3 * c)),
                acc((c, c)), acc((1, c)),
                acc((num_heads, n, n)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
                jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
                jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
                jax.ShapeDtypeStruct((c, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((num_heads, n, n), jnp.float32),
            ],
            interpret=interpret,
        )(x, wqkv, bqkv, wproj, rel_bias, mask_in, dy)
        return dx, dwqkv, dbqkv[0], dwproj, dbproj[0], dbias

    @jax.custom_vjp
    def fused(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in):
        return fwd_call(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in)

    def fused_fwd(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in):
        y = fwd_call(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in)
        return y, (x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in)

    def fused_bwd(res, dy):
        x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in = res
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = bwd_call(
            x, wqkv, bqkv, wproj, rel_bias, mask_in, dy)
        return (dx, dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype),
                dbias.astype(rel_bias.dtype), jnp.zeros_like(mask_in))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


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

    Differentiable (custom_vjp backed by a Pallas backward kernel) — the
    training path uses the same fused program as inference.

    Returns:
      [B, H, W, C] attention output (pre-residual).
    """
    b, h, w, c = x.shape
    ws = window_size
    n_win_w = w // ws
    use_mask = mask is not None
    if not interpret and jax.default_backend() == "cpu":
        # CPU has no Mosaic backend — run the same kernel interpreted so the
        # pallas path stays testable on the virtual CPU mesh.
        interpret = True
    if mask is None:
        mask_in = jnp.zeros((n_win_w, ws * ws, ws * ws), jnp.float32)
    else:
        # full mask is [n_win_h * n_win_w, n, n]; row block g starts at
        # window g * n_win_w
        mask_in = mask.reshape(-1, n_win_w, ws * ws, ws * ws)

    fused = _make_fused_fn(ws, num_heads, use_mask, interpret)
    return fused(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in)
