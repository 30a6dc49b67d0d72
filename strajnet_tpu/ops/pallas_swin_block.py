"""Pallas TPU kernel: fully fused Swin transformer block (fwd + bwd).

The per-op XLA lowering of a Swin block at the 128^2-token stages is
HBM-bound: every LayerNorm / residual / MLP boundary streams a ~50 MB
activation, and fwd+bwd of ONE stage-0 block measures 17.7 ms at batch 16
(one LayerNorm alone: 2.9 ms) while its FLOPs justify ~3 ms. This kernel
computes the whole block per row strip of windows with every intermediate
VMEM-resident:

    r1  = x + dp1 * proj(attention(LN1(x)))      (dense-strip masked MHA)
    out = r1 + dp2 * MLP(LN2(r1))

- attention uses the dense block-diagonal formulation of
  ops/pallas_window_attention.py (cross-window logits get -1e9, softmax
  weights underflow to exact zeros: bit-identical to per-window softmax);
- LN statistics in f32, activations stream bf16 (matching models/swin.py's
  bf16 LayerNorm);
- dp1/dp2 are per-sample DropPath keep-scaled masks (1.0 when inactive) —
  one scalar per strip, so stochastic depth fuses too;
- the backward kernel recomputes the forward in VMEM and emits dx plus all
  parameter gradients through revisited accumulator blocks (bf16 matmul
  operands / f32 accumulate, like the attention backward).

The cyclic roll of shifted windows stays outside: LayerNorm, residuals and
the MLP are per-token, so the whole block commutes with the roll.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strajnet_tpu.ops.pallas_window_attention import (_BWD_SCRATCH,
                                                      _heads_qkv, _maskbig,
                                                      _offdiag_neg, _relbig,
                                                      _row_major,
                                                      _window_major)

_SQRT2PI = 0.7978845608028654  # sqrt(2/pi)
_GC = 0.044715


def _ln_f32(x, scale, bias, eps):
    """f32 LayerNorm; returns (y_f32, xhat, inv)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return (xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32),
            xhat, inv)


def _ln_bwd(dy, xhat, inv, scale):
    """LayerNorm input grad for f32 upstream grad + (dscale, dbias) sums."""
    dxhat = dy * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return (dx, jnp.sum(dy * xhat, axis=0, keepdims=True),
            jnp.sum(dy, axis=0, keepdims=True))


def _gelu_tanh(z):
    t = jnp.tanh(_SQRT2PI * (z + _GC * z * z * z))
    return 0.5 * z * (1.0 + t)


def _gelu_tanh_grad(z):
    u = _SQRT2PI * (z + _GC * z * z * z)
    t = jnp.tanh(u)
    du = _SQRT2PI * (1.0 + 3.0 * _GC * z * z)
    return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * du


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, relbig_ref,
                mask_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, w1_ref,
                b1_ref, w2_ref, b2_ref, dp_ref, out_ref, *, window_size,
                num_heads, head_dim, use_mask, eps, bpp=1):
    ws = window_size
    c = x_ref.shape[-1]
    w_full = x_ref.shape[2]
    n_win = w_full // ws
    n = ws * ws
    nt = n_win * n
    scale = head_dim ** -0.5
    dt = x_ref.dtype

    neg = _offdiag_neg(nt, n)
    # bpp samples per program: amortizes grid-step overhead over more work
    # without widening the dense strips (waste stays proportional to the
    # strip width, not bpp).
    for j in range(bpp):
        xw = _window_major(x_ref[j], ws, n_win, c)       # [N, C]
        bi = pl.program_id(2) * bpp + j
        dp1 = dp_ref[bi, 0]
        dp2 = dp_ref[bi, 1]

        h1, _, _ = _ln_f32(xw, ln1s_ref[0], ln1b_ref[0], eps)
        h1b = h1.astype(dt)
        qkv = jnp.dot(h1b, wqkv_ref[:], preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(dt)

        outs = []
        for h in range(num_heads):
            q, k, v = _heads_qkv(qkv, c, head_dim, h)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale
            s = s + relbig_ref[h].astype(jnp.float32) + neg
            if use_mask:
                s = s + mask_ref[0].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jnp.dot(p.astype(dt), v,
                                preferred_element_type=jnp.float32))
        merged = jnp.concatenate(outs, axis=-1).astype(dt)
        att = jnp.dot(merged, wproj_ref[:],
                      preferred_element_type=jnp.float32)
        att = att + bproj_ref[:].astype(jnp.float32)

        r1 = (xw.astype(jnp.float32) + dp1 * att).astype(dt)

        h2, _, _ = _ln_f32(r1, ln2s_ref[0], ln2b_ref[0], eps)
        h2b = h2.astype(dt)
        z1 = jnp.dot(h2b, w1_ref[:], preferred_element_type=jnp.float32)
        z1 = z1 + b1_ref[:].astype(jnp.float32)
        g1 = _gelu_tanh(z1).astype(dt)
        z2 = jnp.dot(g1, w2_ref[:], preferred_element_type=jnp.float32)
        z2 = z2 + b2_ref[:].astype(jnp.float32)

        out = (r1.astype(jnp.float32) + dp2 * z2).astype(dt)
        out_ref[j] = _row_major(out, ws, n_win, c)


def _bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, relbig_ref,
                mask_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, w1_ref,
                b1_ref, w2_ref, b2_ref, dp_ref, dy_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                dbias_ref, dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, *scratch_refs,
                window_size, num_heads, head_dim, use_mask, eps):
    ws = window_size
    c = x_ref.shape[-1]
    w_full = x_ref.shape[2]
    n_win = w_full // ws
    n = ws * ws
    nt = n_win * n
    scale = head_dim ** -0.5
    dt = x_ref.dtype
    bf = jnp.bfloat16

    out_refs = (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref,
                dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref, dw1_ref,
                db1_ref, dw2_ref, db2_ref)
    # scratch mode: accumulate in VMEM scratch (persistent across the
    # sequential TPU grid), flush to the outputs once on the last step —
    # see pallas_window_attention._BWD_SCRATCH.
    accs = scratch_refs if scratch_refs else out_refs

    is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                & (pl.program_id(2) == 0))

    @pl.when(is_first)
    def _init():
        for ref in accs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
    (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref, dln1s_ref,
     dln1b_ref, dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref,
     db2_ref) = accs

    xw = _window_major(x_ref[0], ws, n_win, c)
    dyw = _window_major(dy_ref[0], ws, n_win, c).astype(jnp.float32)
    bi = pl.program_id(2)
    dp1 = dp_ref[bi, 0]
    dp2 = dp_ref[bi, 1]

    # ---- forward recompute ----
    h1, xhat1, inv1 = _ln_f32(xw, ln1s_ref[0], ln1b_ref[0], eps)
    h1b = h1.astype(dt)
    qkv = jnp.dot(h1b, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(dt)

    neg = _offdiag_neg(nt, n)
    head_ps = []
    outs = []
    for h in range(num_heads):
        q, k, v = _heads_qkv(qkv, c, head_dim, h)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + relbig_ref[h].astype(jnp.float32) + neg
        if use_mask:
            s = s + mask_ref[0].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        head_ps.append(p.astype(bf))
        outs.append(jnp.dot(p.astype(dt), v,
                            preferred_element_type=jnp.float32))
    merged = jnp.concatenate(outs, axis=-1).astype(dt)
    att = jnp.dot(merged, wproj_ref[:], preferred_element_type=jnp.float32)
    att = att + bproj_ref[:].astype(jnp.float32)
    r1 = (xw.astype(jnp.float32) + dp1 * att).astype(dt)

    h2, xhat2, inv2 = _ln_f32(r1, ln2s_ref[0], ln2b_ref[0], eps)
    h2b = h2.astype(dt)
    z1 = jnp.dot(h2b, w1_ref[:], preferred_element_type=jnp.float32)
    z1 = z1 + b1_ref[:].astype(jnp.float32)
    g1 = _gelu_tanh(z1).astype(dt)

    # ---- backward ----
    # out = r1 + dp2 * (g1 @ w2 + b2)
    dz2 = dp2 * dyw                                       # [N, C] f32
    dz2b = dz2.astype(bf)
    dw2_ref[...] += jax.lax.dot_general(
        g1.astype(bf), dz2b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dz2, axis=0, keepdims=True)
    dg1 = jax.lax.dot_general(dz2b, w2_ref[:].astype(bf),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dz1 = dg1 * _gelu_tanh_grad(z1)
    dz1b = dz1.astype(bf)
    dw1_ref[...] += jax.lax.dot_general(
        h2b.astype(bf), dz1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)
    dh2 = jax.lax.dot_general(dz1b, w1_ref[:].astype(bf),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dr1_ln, dls2, dlb2 = _ln_bwd(dh2, xhat2, inv2, ln2s_ref[0])
    dln2s_ref[...] += dls2
    dln2b_ref[...] += dlb2
    dr1 = dyw + dr1_ln                                    # [N, C] f32

    # r1 = xw + dp1 * att(LN1(xw))
    datt = dp1 * dr1
    dattb = datt.astype(bf)
    dwproj_ref[...] += jax.lax.dot_general(
        merged.astype(bf), dattb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(datt, axis=0, keepdims=True)
    dmerged = jax.lax.dot_general(dattb, wproj_ref[:].astype(bf),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(num_heads):
        pb = head_ps[h]
        p = pb.astype(jnp.float32)
        q, k, v = _heads_qkv(qkv, c, head_dim, h)
        do = dmerged[:, h * head_dim:(h + 1) * head_dim].astype(bf)
        dp = jax.lax.dot_general(do, v.astype(bf), (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        acc = jnp.zeros((n, n), jnp.float32)
        for w in range(n_win):
            acc = acc + ds[w * n:(w + 1) * n, w * n:(w + 1) * n]
        dbias_ref[h] += acc
        dsb = ds.astype(bf)
        dq = jnp.dot(dsb, k.astype(bf),
                     preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(dsb, q.astype(bf), (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_parts.append(dq.astype(bf))
        dk_parts.append(dk.astype(bf))
        dv_parts.append(dv.astype(bf))
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)

    dwqkv_ref[...] += jax.lax.dot_general(
        h1b.astype(bf), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)
    dh1 = jax.lax.dot_general(dqkv, wqkv_ref[:].astype(bf),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dxw_ln, dls1, dlb1 = _ln_bwd(dh1, xhat1, inv1, ln1s_ref[0])
    dln1s_ref[...] += dls1
    dln1b_ref[...] += dlb1

    dxw = dr1 + dxw_ln
    dx_ref[0] = _row_major(dxw, ws, n_win, c).astype(dx_ref.dtype)

    if scratch_refs:
        is_last = ((pl.program_id(0) == pl.num_programs(0) - 1)
                   & (pl.program_id(1) == pl.num_programs(1) - 1)
                   & (pl.program_id(2) == pl.num_programs(2) - 1))

        @pl.when(is_last)
        def _flush():
            for out, acc in zip(out_refs, scratch_refs):
                out[...] = acc[...]


@functools.lru_cache(maxsize=None)
def _make_block_fn(window_size: int, num_heads: int, use_mask: bool,
                   eps: float, interpret: bool, wpp=None, bpp=1):
    ws = window_size

    def specs(b, h, w, c, wpp_, n, bpp_=1):
        xspec = pl.BlockSpec((bpp_, ws, wpp_ * ws, c),
                             lambda gr, gc, bi: (bi, gr, gc, 0),
                             memory_space=pltpu.VMEM)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        ncc = w // (wpp_ * ws)
        if use_mask:
            mspec = pl.BlockSpec((1, wpp_ * n, wpp_ * n),
                                 lambda gr, gc, bi: (gr * ncc + gc, 0, 0),
                                 memory_space=pltpu.VMEM)
        else:
            mspec = pl.BlockSpec((1, 1), lambda gr, gc, bi: (0, 0),
                                 memory_space=pltpu.SMEM)
        # Whole-array SMEM: Mosaic requires the last block dims to be
        # divisible by (8, 128) or equal to the array dims, so a (1, 2)
        # block over [B, 2] only lowers at B == 1. Kernels index the
        # batch row via pl.program_id(2) instead.
        dpspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        # x, wqkv, bqkv, wproj, bproj, relbig, mask, ln1s, ln1b, ln2s,
        # ln2b, w1, b1, w2, b2, dp
        ins = [xspec, full, full, full, full, full, mspec,
               full, full, full, full, full, full, full, full, dpspec]
        return xspec, ins

    def fwd_call(x, args, mask_in, dp):
        b, h, w, c = x.shape
        head_dim = c // num_heads
        n = ws * ws
        wpp_ = (w // ws) if wpp is None else wpp
        bpp_ = bpp if b % bpp == 0 else 1
        grid = (h // ws, w // (ws * wpp_), b // bpp_)
        kernel = functools.partial(_fwd_kernel, window_size=ws,
                                   num_heads=num_heads, head_dim=head_dim,
                                   use_mask=use_mask, eps=eps, bpp=bpp_)
        (wqkv, bqkv, wproj, bproj, rel_bias, ln1s, ln1b, ln2s, ln2b,
         w1, b1, w2, b2) = args
        relbig = _relbig(rel_bias, wpp_)
        xspec, ins = specs(b, h, w, c, wpp_, n, bpp_)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=ins, out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x, wqkv, bqkv, wproj, bproj, relbig, mask_in,
          ln1s.reshape(1, -1), ln1b.reshape(1, -1), ln2s.reshape(1, -1),
          ln2b.reshape(1, -1), w1, b1.reshape(1, -1), w2,
          b2.reshape(1, -1), dp)

    def bwd_call(x, args, mask_in, dp, dy):
        b, h, w, c = x.shape
        head_dim = c // num_heads
        n = ws * ws
        wpp_ = (w // ws) if wpp is None else wpp
        hidden = args[9].shape[-1]  # w1 [C, hidden]
        grid = (h // ws, w // (ws * wpp_), b)
        kernel = functools.partial(_bwd_kernel, window_size=ws,
                                   num_heads=num_heads, head_dim=head_dim,
                                   use_mask=use_mask, eps=eps)
        (wqkv, bqkv, wproj, bproj, rel_bias, ln1s, ln1b, ln2s, ln2b,
         w1, b1, w2, b2) = args
        relbig = _relbig(rel_bias, wpp_)
        xspec, ins = specs(b, h, w, c, wpp_, n)
        ins.append(xspec)  # dy
        acc = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda gr, gc, bi: (0,) * len(shape),
            memory_space=pltpu.VMEM)
        grad_shapes = [
            (c, 3 * c), (1, 3 * c),        # dwqkv, dbqkv
            (c, c), (1, c),                # dwproj, dbproj
            (num_heads, n, n),             # drel
            (1, c), (1, c),                # dln1s, dln1b
            (1, c), (1, c),                # dln2s, dln2b
            (c, hidden), (1, hidden),      # dw1, db1
            (hidden, c), (1, c),           # dw2, db2
        ]
        res = pl.pallas_call(
            kernel, grid=grid, in_specs=ins,
            out_specs=[xspec] + [acc(s) for s in grad_shapes],
            out_shape=[jax.ShapeDtypeStruct((b, h, w, c), x.dtype)] + [
                jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
            scratch_shapes=([pltpu.VMEM(s, jnp.float32)
                             for s in grad_shapes] if _BWD_SCRATCH else []),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x, wqkv, bqkv, wproj, bproj, relbig, mask_in,
          ln1s.reshape(1, -1), ln1b.reshape(1, -1), ln2s.reshape(1, -1),
          ln2b.reshape(1, -1), w1, b1.reshape(1, -1), w2,
          b2.reshape(1, -1), dp, dy)
        return res

    @jax.custom_vjp
    def block(x, args, mask_in, dp):
        return fwd_call(x, args, mask_in, dp)

    def block_fwd(x, args, mask_in, dp):
        return fwd_call(x, args, mask_in, dp), (x, args, mask_in, dp)

    def block_bwd(resid, dy):
        x, args, mask_in, dp = resid
        (dx, dwqkv, dbqkv, dwproj, dbproj, drel, dln1s, dln1b, dln2s,
         dln2b, dw1, db1, dw2, db2) = bwd_call(x, args, mask_in, dp, dy)
        (wqkv, bqkv, wproj, bproj, rel_bias, ln1s, ln1b, ln2s, ln2b,
         w1, b1, w2, b2) = args
        dargs = (dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
                 dwproj.astype(wproj.dtype), dbproj[0].astype(bproj.dtype),
                 drel.astype(rel_bias.dtype), dln1s[0].astype(ln1s.dtype),
                 dln1b[0].astype(ln1b.dtype), dln2s[0].astype(ln2s.dtype),
                 dln2b[0].astype(ln2b.dtype), dw1.astype(w1.dtype),
                 db1[0].astype(b1.dtype), dw2.astype(w2.dtype),
                 db2[0].astype(b2.dtype))
        return dx, dargs, jnp.zeros_like(mask_in), jnp.zeros_like(dp)

    block.defvjp(block_fwd, block_bwd)
    return block


@functools.partial(jax.jit, static_argnames=("window_size", "num_heads",
                                             "eps", "interpret",
                                             "windows_per_program",
                                             "samples_per_program"))
def fused_swin_block(x: jax.Array, wqkv, bqkv, wproj, bproj, rel_bias,
                     ln1_scale, ln1_bias, ln2_scale, ln2_bias,
                     w1, b1, w2, b2,
                     mask: Optional[jax.Array] = None,
                     drop_path: Optional[jax.Array] = None,
                     *, window_size: int, num_heads: int, eps: float = 1e-5,
                     interpret: bool = False,
                     windows_per_program: Optional[int] = None,
                     samples_per_program: int = 1) -> jax.Array:
    """One Swin block (LN -> W-MSA -> +res -> LN -> MLP -> +res), fused.

    Args:
      x: [B, H, W, C] pre-rolled input (roll for shifted windows commutes
        with every per-token op in the block and stays outside).
      wqkv/bqkv/wproj/bproj/rel_bias: attention params as in
        fused_window_attention.
      ln?_scale/ln?_bias: [C] f32 LayerNorm parameters.
      w1/b1: [C, hidden]/[hidden]; w2/b2: [hidden, C] MLP parameters.
      mask: optional [n_windows, ws*ws, ws*ws] SW-MSA additive mask.
      drop_path: optional [B, 2] keep-scaled per-sample DropPath
        multipliers for the two residual branches (1.0 = keep; the caller
        draws mask/keep once per sample).
      windows_per_program: dense-strip width in windows (must divide the
        per-row window count; None = full row) — see
        fused_window_attention. Narrower strips waste less logits/softmax
        work on the masked cross-window pairs.
      samples_per_program: batch samples processed per forward program
        (must divide B; amortizes grid-step overhead when strips are
        narrow). Forward-only: the backward kernel always runs one sample
        per program.

    Returns:
      [B, H, W, C] block output.
    """
    b, h, w, c = x.shape
    ws = window_size
    n = ws * ws
    n_win_w = w // ws
    wpp = windows_per_program
    if wpp is not None and wpp <= 0:
        wpp = None  # 0/negative = unset (probe convention: 0 = full row)
    if wpp is not None and (wpp > n_win_w or n_win_w % wpp):
        wpp = None  # fall back to full-row strips at incompatible widths
    use_mask = mask is not None
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if mask is None:
        mask_in = jnp.zeros((1, 1), jnp.float32)
    else:
        mask_in = _maskbig(mask, h // ws, n_win_w, n, wpp)
    if drop_path is None:
        dp = jnp.ones((b, 2), jnp.float32)
    else:
        dp = drop_path.astype(jnp.float32)

    args = (wqkv, bqkv, wproj, bproj, rel_bias.astype(jnp.float32),
            ln1_scale, ln1_bias, ln2_scale, ln2_bias, w1, b1, w2, b2)
    spp = samples_per_program
    if spp <= 0 or b % spp:
        spp = 1
    fn = _make_block_fn(ws, num_heads, use_mask, eps, interpret, wpp, spp)
    return fn(x, args, mask_in, dp)


def _xla_block_reference(x, wqkv, bqkv, wproj, bproj, rel_bias, ln1s, ln1b,
                         ln2s, ln2b, w1, b1, w2, b2, mask, dp, *,
                         window_size, num_heads, eps):
    """Pure-XLA twin of the fused block (same math, jnp ops) — the
    backward of the hybrid mode autodiffs through this."""
    b_, h, w, c = x.shape
    ws = window_size
    hd = c // num_heads
    n = ws * ws

    def ln(v, scale, bias):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mu), axis=-1, keepdims=True)
        return (vf - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    dt = x.dtype
    xn = ln(x, ln1s, ln1b).astype(dt)
    xw = xn.reshape(b_, h // ws, ws, w // ws, ws, c)
    xw = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(-1, n, c)
    qkv = xw @ wqkv.astype(dt) + bqkv.astype(dt)
    qkv = qkv.reshape(-1, n, 3, num_heads, hd)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k,
                      preferred_element_type=jnp.float32)
    attn = attn + rel_bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(-1, nw, num_heads, n, n) + jnp.asarray(
            mask, attn.dtype)[None, :, None]
        attn = attn.reshape(-1, num_heads, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(dt)
    out = jnp.einsum("bhnm,bhmd->bnhd", attn, v).reshape(-1, n, c)
    out = out @ wproj.astype(dt) + bproj.astype(dt)
    out = out.reshape(b_, h // ws, w // ws, ws, ws, c)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(b_, h, w, c)
    r1 = (x.astype(jnp.float32)
          + dp[:, 0, None, None, None] * out.astype(jnp.float32)).astype(dt)
    y = ln(r1, ln2s, ln2b).astype(dt)
    y = _gelu_tanh((y @ w1.astype(dt)
                    + b1.astype(dt)).astype(jnp.float32)).astype(dt)
    y = y @ w2.astype(dt) + b2.astype(dt)
    return (r1.astype(jnp.float32)
            + dp[:, 1, None, None, None] * y.astype(jnp.float32)).astype(dt)


@functools.partial(jax.jit, static_argnames=("window_size", "num_heads",
                                             "eps", "interpret",
                                             "windows_per_program",
                                             "samples_per_program"))
def fused_swin_block_xla_bwd(x: jax.Array, wqkv, bqkv, wproj, bproj,
                             rel_bias, ln1_scale, ln1_bias, ln2_scale,
                             ln2_bias, w1, b1, w2, b2,
                             mask: Optional[jax.Array] = None,
                             drop_path: Optional[jax.Array] = None,
                             *, window_size: int, num_heads: int,
                             eps: float = 1e-5, interpret: bool = False,
                             windows_per_program: Optional[int] = None,
                             samples_per_program: int = 1) -> jax.Array:
    """Hybrid block: Pallas-kernel FORWARD, XLA-autodiff BACKWARD.

    The backward pass is exactly the gradient of the pure-XLA block
    formulation at the same inputs (so training numerics match the XLA
    path bit-for-bit on the gradient side), while the forward runs the
    fused kernel. Useful both as a faster-forward training mode and as a
    bisection tool for the full-program TPU fault in the backward kernels
    (models/strajnet.py) — if training runs in this mode but crashes with
    "block", the fault is in the backward kernel.
    """
    b = x.shape[0]
    dp = (jnp.ones((b, 2), jnp.float32) if drop_path is None
          else drop_path.astype(jnp.float32))
    use_mask = mask is not None
    mask_arg = mask if use_mask else jnp.zeros((), jnp.float32)

    diff_args = (x, wqkv, bqkv, wproj, bproj, rel_bias, ln1_scale, ln1_bias,
                 ln2_scale, ln2_bias, w1, b1, w2, b2)

    # mask/dp ride as explicit (zero-cotangent) arguments: they may be
    # tracers of the surrounding program, which custom_vjp closures must
    # not capture.
    @jax.custom_vjp
    def hybrid(mask_a, dp_a, *args):
        return fused_swin_block(
            *args, mask_a if use_mask else None, dp_a,
            window_size=window_size, num_heads=num_heads,
            eps=eps, interpret=interpret,
            windows_per_program=windows_per_program,
            samples_per_program=samples_per_program)

    def hybrid_fwd(mask_a, dp_a, *args):
        return hybrid(mask_a, dp_a, *args), (mask_a, dp_a, args)

    def hybrid_bwd(res, dy):
        mask_a, dp_a, args = res
        _, vjp = jax.vjp(
            lambda *a: _xla_block_reference(
                *a, mask_a if use_mask else None, dp_a,
                window_size=window_size,
                num_heads=num_heads, eps=eps), *args)
        return (jnp.zeros_like(mask_a), jnp.zeros_like(dp_a)) + vjp(dy)

    hybrid.defvjp(hybrid_fwd, hybrid_bwd)
    return hybrid(mask_arg, dp, *diff_args)
