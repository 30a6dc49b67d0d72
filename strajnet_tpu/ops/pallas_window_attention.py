"""Pallas TPU kernel: fused shifted-window attention (forward + backward).

Fuses, for one row of windows per program: the qkv projection, window
partition, multi-head attention with relative-position bias and SW-MSA mask,
softmax, value aggregation, window merge, and the output projection —
everything VMEM-resident. This removes the partition/reverse reshape
round-trips through HBM that dominate the XLA lowering of the Swin block
(reference modules.py:227-255 materializes each of them).

The cyclic roll for shifted windows stays outside (a single cheap fused copy
each way); LayerNorm stays outside as well. The kernel therefore computes
exactly ``proj(attention(window_partition(x)))`` for pre-normalized,
pre-rolled inputs.

Dense-strip formulation: the W/ws windows of a row strip are attended as ONE
[N, N] masked attention per head (N = ws*W tokens in window-major order)
with a block-diagonal structure — cross-window logits get -1e9 from an
iota-built mask, so their softmax weights underflow to *exactly* zero and
the result is bit-identical to per-window softmax (adding exact zeros
changes no f32 sum). This replaces the per-(window, head) micro-matmuls of
the naive fusion — hundreds of [64, head_dim] MXU dispatches per strip,
which made the backward ~8x the forward's cost — with a handful of
[N, N]-scale matmuls per head. The per-window relative-position bias enters
as a host-precomputed tile-repeated [heads, N, N] table; the SW-MSA mask
(values in {0, -100}, exact in bf16) as a per-strip [N, N] block.

Training support: the op carries a ``jax.custom_vjp`` whose backward is a
second Pallas kernel with the same dense structure. It recomputes qkv and
the softmax in VMEM (cheaper than saving [B,H,W,3C] intermediates to HBM),
runs its matmuls with bf16 operands / f32 accumulation, and produces dx as
tiles plus the weight/bias/rel-bias gradients accumulated across the
sequential TPU grid (revisited VMEM blocks, zero-initialized on the first
step). The SW-MSA mask is a constant — its cotangent is zero.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Backward-kernel gradient accumulation strategy (A/B hook for the batch-16
# full-step TPU worker crash — see models/strajnet.py):
#   revisit (default): accumulate directly in revisited output blocks
#     (zero-initialized on the first step) — the round-1..3 formulation.
#   scratch (STRAJNET_BWD_SCRATCH=1): accumulate in VMEM scratch across the
#     sequential grid, write each gradient OUTPUT block exactly once on the
#     last step.
# Identical math either way (parity-tested both ways). The scratch form
# avoids Mosaic's revisited-output write-back machinery entirely — tested
# as a crash-fix candidate in round 4; the crash reproduced under scratch
# too (bisect log in PARITY.md), so the measured default stays.
_BWD_SCRATCH = os.environ.get("STRAJNET_BWD_SCRATCH", "0") == "1"


def _window_major(x3, ws, n_win, c):
    """[ws, W, C] row-major strip -> [N, C] window-major tokens."""
    return jnp.concatenate(
        [x3[:, i * ws:(i + 1) * ws, :].reshape(ws * ws, c)
         for i in range(n_win)], axis=0)


def _row_major(y2, ws, n_win, c):
    """[N, C] window-major tokens -> [ws, W, C] row-major strip."""
    n = ws * ws
    return jnp.concatenate(
        [y2[i * n:(i + 1) * n, :].reshape(ws, ws, c)
         for i in range(n_win)], axis=1)


def _offdiag_neg(n_tokens, n):
    """[N, N] f32: 0 on the block diagonal, -1e9 off it (cross-window)."""
    bi = jax.lax.broadcasted_iota(jnp.int32, (n_tokens, n_tokens), 0) // n
    bj = jax.lax.broadcasted_iota(jnp.int32, (n_tokens, n_tokens), 1) // n
    return jnp.where(bi == bj, 0.0, -1e9)


def _heads_qkv(qkv, c, head_dim, h):
    q = qkv[:, h * head_dim:(h + 1) * head_dim]
    k = qkv[:, c + h * head_dim:c + (h + 1) * head_dim]
    v = qkv[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
    return q, k, v


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, relbig_ref,
            mask_ref, out_ref, *, window_size, num_heads, head_dim,
            use_mask, bpp=1):
    ws = window_size
    c = x_ref.shape[-1]
    w_full = x_ref.shape[2]
    n_win = w_full // ws
    n = ws * ws
    nt = n_win * n
    scale = head_dim ** -0.5

    neg = _offdiag_neg(nt, n)
    # bpp samples per forward program — amortizes grid-step overhead when
    # strips are narrow (see fused_swin_block's samples_per_program).
    for j in range(bpp):
        xw = _window_major(x_ref[j], ws, n_win, c)       # [N, C]
        qkv = jnp.dot(xw, wqkv_ref[:], preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

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
            outs.append(jnp.dot(p.astype(xw.dtype), v,
                                preferred_element_type=jnp.float32))
        merged = jnp.concatenate(outs, axis=-1).astype(xw.dtype)  # [N, C]
        y = jnp.dot(merged, wproj_ref[:],
                    preferred_element_type=jnp.float32)
        y = y + bproj_ref[:].astype(jnp.float32)
        out_ref[j] = _row_major(y, ws, n_win, c).astype(out_ref.dtype)


def _bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, relbig_ref, mask_ref,
                dy_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                dbias_ref, *scratch_refs, window_size, num_heads, head_dim,
                use_mask):
    ws = window_size
    c = x_ref.shape[-1]
    w_full = x_ref.shape[2]
    n_win = w_full // ws
    n = ws * ws
    nt = n_win * n
    scale = head_dim ** -0.5
    bf = jnp.bfloat16

    out_refs = (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref)
    # scratch mode: accumulate in VMEM scratch (persistent across the
    # sequential TPU grid), flush to the outputs once on the last step.
    accs = scratch_refs if scratch_refs else out_refs

    is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                & (pl.program_id(2) == 0))

    @pl.when(is_first)
    def _init():
        for ref in accs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
    (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref) = accs

    # Recompute the forward's qkv in VMEM.
    xw = _window_major(x_ref[0], ws, n_win, c)           # [N, C]
    qkv = jnp.dot(xw, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

    dyw = _window_major(dy_ref[0], ws, n_win, c).astype(bf)   # [N, C]
    neg = _offdiag_neg(nt, n)

    # First pass: recompute per-head outputs for the projection gradients.
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
        outs.append((p, jnp.dot(p.astype(xw.dtype), v,
                                preferred_element_type=jnp.float32)))
    merged = jnp.concatenate([o for _, o in outs], axis=-1).astype(bf)

    # Output-projection gradients (bf16 operands, f32 accumulate).
    dwproj_ref[...] += jax.lax.dot_general(
        merged, dyw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(dyw.astype(jnp.float32), axis=0,
                               keepdims=True)
    dmerged = jax.lax.dot_general(
        dyw, wproj_ref[:].astype(bf), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [N, C] f32

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(num_heads):
        p, _ = outs[h]
        q, k, v = _heads_qkv(qkv, c, head_dim, h)
        do = dmerged[:, h * head_dim:(h + 1) * head_dim].astype(bf)
        pb = p.astype(bf)
        dp = jax.lax.dot_general(do, v.astype(bf), (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # softmax backward — off-diagonal blocks have p == 0 exactly, so ds
        # vanishes there and nothing leaks across windows.
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # rel-bias gradient: sum the diagonal [n, n] blocks over windows
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

    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts,
                           axis=-1)                          # [N, 3C] bf16

    # qkv-projection gradients + input gradient.
    dwqkv_ref[...] += jax.lax.dot_general(
        xw.astype(bf), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)
    dxw = jax.lax.dot_general(
        dqkv, wqkv_ref[:].astype(bf), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = _row_major(dxw, ws, n_win, c).astype(dx_ref.dtype)

    if scratch_refs:
        is_last = ((pl.program_id(0) == pl.num_programs(0) - 1)
                   & (pl.program_id(1) == pl.num_programs(1) - 1)
                   & (pl.program_id(2) == pl.num_programs(2) - 1))

        @pl.when(is_last)
        def _flush():
            for out, acc in zip(out_refs, scratch_refs):
                out[...] = acc[...]


def _relbig(rel_bias, n_win):
    """[heads, n, n] f32 -> [heads, N, N] tile-repeated (the off-diagonal
    values are dominated by the -1e9 cross-window mask in the kernel)."""
    return jnp.tile(rel_bias, (1, n_win, n_win))


def _maskbig(mask, n_win_h, n_win_w, n, wpp=None):
    """[n_windows, n, n] SW-MSA mask -> [n_strips, N, N] bf16
    block-diagonal per strip of ``wpp`` consecutive windows in a row
    (N = wpp*n; default wpp = the full row; mask values {0, -100} are
    exact in bf16).

    Built as one fused tile + iota-select: big[s, p, q] = m[s, p//n, p%n,
    q%n] on the block diagonal (p//n == q//n), 0 off it. The earlier
    eye-broadcast formulation materialized a [nh, nw, n, nw, n] f32
    intermediate — 268 MB at the flagship stage-0 geometry — inside every
    program containing the kernel."""
    nh, nw = n_win_h, n_win_w
    wpp = nw if wpp is None else wpp
    n_strips = nh * (nw // wpp)
    big_n = wpp * n
    m = mask.reshape(n_strips, wpp, n, n).astype(jnp.bfloat16)
    wi = jax.lax.broadcasted_iota(jnp.int32, (big_n, big_n), 0) // n
    wj = jax.lax.broadcasted_iota(jnp.int32, (big_n, big_n), 1) // n
    vals = jnp.tile(m.reshape(n_strips, big_n, n), (1, 1, wpp))
    return jnp.where((wi == wj)[None], vals, jnp.bfloat16(0))


@functools.lru_cache(maxsize=None)
def _make_fused_fn(window_size: int, num_heads: int, use_mask: bool,
                   interpret: bool, wpp: Optional[int] = None, bpp: int = 1):
    """Builds the custom-vjp fused attention for a static geometry.

    ``wpp`` (windows per program) sets the strip width: each program
    attends ``wpp`` consecutive windows of one row as a dense [wpp*n,
    wpp*n] masked attention. The dense formulation wastes a factor wpp in
    logits/softmax work on the -1e9 cross-window entries, so NARROWER
    strips do less arithmetic — but dispatch more programs with smaller
    matmuls. Default (None) = the full row (the round-1 formulation).
    """
    ws = window_size

    def specs(b, h, w, c, wpp_, n, with_bproj, bpp_=1):
        xspec = pl.BlockSpec((bpp_, ws, wpp_ * ws, c),
                             lambda gr, gc, bi: (bi, gr, gc, 0),
                             memory_space=pltpu.VMEM)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        ncc = w // (wpp_ * ws)
        ins = [xspec, full, full, full]
        if with_bproj:
            ins.append(full)
        ins.append(full)  # relbig
        if use_mask:
            ins.append(pl.BlockSpec((1, wpp_ * n, wpp_ * n),
                                    lambda gr, gc, bi: (gr * ncc + gc, 0, 0),
                                    memory_space=pltpu.VMEM))
        else:
            ins.append(pl.BlockSpec((1, 1), lambda gr, gc, bi: (0, 0),
                                    memory_space=pltpu.SMEM))
        return xspec, ins

    def fwd_call(x, wqkv, bqkv, wproj, bproj, rel_bias, mask_in):
        b, h, w, c = x.shape
        head_dim = c // num_heads
        n = ws * ws
        wpp_ = (w // ws) if wpp is None else wpp
        bpp_ = bpp if b % bpp == 0 else 1
        # grid (row, col-chunk, b): b iterates fastest, so the per-strip
        # mask block is fetched once per strip of windows.
        grid = (h // ws, w // (ws * wpp_), b // bpp_)
        kernel = functools.partial(_kernel, window_size=ws,
                                   num_heads=num_heads, head_dim=head_dim,
                                   use_mask=use_mask, bpp=bpp_)
        xspec, ins = specs(b, h, w, c, wpp_, n, with_bproj=True, bpp_=bpp_)
        relbig = _relbig(rel_bias, wpp_)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=ins,
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x, wqkv, bqkv, wproj, bproj, relbig, mask_in)

    def bwd_call(x, wqkv, bqkv, wproj, rel_bias, mask_in, dy):
        b, h, w, c = x.shape
        head_dim = c // num_heads
        n = ws * ws
        wpp_ = (w // ws) if wpp is None else wpp
        grid = (h // ws, w // (ws * wpp_), b)
        kernel = functools.partial(_bwd_kernel, window_size=ws,
                                   num_heads=num_heads, head_dim=head_dim,
                                   use_mask=use_mask)
        xspec, ins = specs(b, h, w, c, wpp_, n, with_bproj=False)
        ins.append(xspec)  # dy
        acc = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda gr, gc, bi: (0,) * len(shape),
            memory_space=pltpu.VMEM)
        relbig = _relbig(rel_bias, wpp_)
        grad_shapes = [(c, 3 * c), (1, 3 * c), (c, c), (1, c),
                       (num_heads, n, n)]
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=ins,
            out_specs=[xspec] + [acc(s) for s in grad_shapes],
            out_shape=[jax.ShapeDtypeStruct((b, h, w, c), x.dtype)] + [
                jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
            scratch_shapes=([pltpu.VMEM(s, jnp.float32)
                             for s in grad_shapes] if _BWD_SCRATCH else []),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x, wqkv, bqkv, wproj, relbig, mask_in, dy)
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
                                             "interpret",
                                             "windows_per_program",
                                             "samples_per_program"))
def fused_window_attention(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                           wproj: jax.Array, bproj: jax.Array,
                           rel_bias: jax.Array,
                           mask: Optional[jax.Array] = None,
                           *, window_size: int, num_heads: int,
                           interpret: bool = False,
                           windows_per_program: Optional[int] = None,
                           samples_per_program: int = 1) -> jax.Array:
    """Windowed MHA with bias/mask for pre-rolled, pre-normalized inputs.

    Args:
      x: [B, H, W, C].
      wqkv: [C, 3C]; bqkv: [3C].
      wproj: [C, C]; bproj: [C].
      rel_bias: [num_heads, ws*ws, ws*ws] relative-position bias.
      mask: optional [n_windows, ws*ws, ws*ws] additive SW-MSA mask
        (row-major window order over the full grid).
      windows_per_program: dense-strip width in windows (must divide the
        per-row window count; None = full row). Narrower strips spend
        proportionally less matmul/softmax work on masked cross-window
        pairs at the cost of more, smaller programs — a TPU tuning knob.

    Differentiable (custom_vjp backed by a Pallas backward kernel) — the
    training path uses the same fused program as inference.

    Returns:
      [B, H, W, C] attention output (pre-residual).
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
        # CPU has no Mosaic backend — run the same kernel interpreted so the
        # pallas path stays testable on the virtual CPU mesh.
        interpret = True
    if mask is None:
        mask_in = jnp.zeros((1, 1), jnp.float32)  # unused SMEM placeholder
    else:
        mask_in = _maskbig(mask, h // ws, n_win_w, n, wpp)

    spp = samples_per_program
    if spp <= 0 or b % spp:
        spp = 1
    fused = _make_fused_fn(ws, num_heads, use_mask, interpret, wpp, spp)
    return fused(x, wqkv, bqkv, wproj, bproj, rel_bias.astype(jnp.float32),
                 mask_in)
