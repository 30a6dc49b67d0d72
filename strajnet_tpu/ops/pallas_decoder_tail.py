"""Fused decoder-tail TPU kernel: upsample2x+conv3x3 -> elu -> conv3x3(->2).

Parity target: the final ``FusedUpConv`` + 2-channel output conv of each
Pyramid3DDecoder branch (reference modules.py:726-771, the ``out_conv`` /
``out_conv_f`` heads applied after the last upsample-conv stage).

Why a kernel: at the flagship geometry the tail expands [N,128,128,96] to a
[N,256,256,48] elu'd intermediate (~805 MB bf16 at N=128) that XLA
materialises in HBM between the transposed conv and the output conv — the
round trip plus the two convs measured ~14.6 ms of a 36.6 ms batch-16
forward (round-2 profile). The kernel keeps the intermediate entirely in
VMEM and writes only the 2-channel output (~33 MB).

NHWC-native design (pixels on sublanes, channels on lanes — no layout
conversion, the failure mode of two earlier rejected attempts, PARITY.md):

- Each image is zero-padded to [H+2, W+16] (1 row top/bottom, 8 columns
  left/right) and flattened to rows of a [(H+2)*(W+16), Cin] matrix. In
  this layout EVERY spatial tap shift (both the upconv's 2x2 phase taps
  and the outconv's 3x3 taps) becomes a pure SUBLANE offset
  ``di*(W+16)+dj`` — lanes (channels) are never shifted, and the padding
  columns double as the conv zero-border. The 8-wide column borders make
  the row stride (W+16) and every DYNAMIC store offset a multiple of 8,
  which Mosaic requires for stores indexed by loop variables (static
  offsets and all loads may be unaligned — measured on v5e).
- The transposed conv is phase-decomposed: output phase (a,b) at input
  pixel (i,j) is a 2x2-tap conv with per-phase summed kernels. All
  4 phases x 4 taps are packed along the matmul N dimension:
  ONE shift-free matmul  B = Xp @ Kbig  with Kbig [Cin, 16*Cmid]
  computes every (phase, tap) partial product at every pixel; the tap
  shifts are applied AFTERWARDS as 16 statically-offset slice-adds (VPU).
  No FLOP is wasted on phase packing and the MXU runs at K=Cin density.
- elu is applied in VMEM (manual exp(x)-1 — jax.nn.elu's expm1 has no
  Mosaic lowering) and the masked result stored per-phase into a
  [(H+2)*(W+2)+pad, 4*Cmid] phase-stacked buffer whose zero borders
  again double as the outconv's zero padding.
- The 3x3/stride-phase output conv is folded the same way: grouping its
  taps by INPUT-GRID shift (9 shifts, shared by all 4 output phases)
  gives  C = E @ Wbig  with Wbig [4*Cmid, 9*8] — one small matmul, then
  out[q, 0:8] = sum_s C[q + shift_s, 8s:8s+8], nine 8-lane-aligned
  slice-adds. Output leaves in phase layout [N,(H+2)*(W+2),8]; the
  caller's cheap XLA transpose interleaves it to [N,2H,2W,2].

The op is differentiable: a custom VJP routes the backward through the
XLA phase-form composition (ops/upconv.py), so enabling the kernel under
``grad`` is correct (if slower than the pure-XLA training path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strajnet_tpu.ops.upconv import fold_kernel_2x

# taps of the original 3x3 kernel contributing to output phase a at input
# offset delta = a-1+u (u in {0,1}): R[(a,u)] = list of 3x3 kernel rows.
_R = {(0, 0): (0,), (0, 1): (1, 2), (1, 0): (0, 1), (1, 1): (2,)}
_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_kbig(w3: jax.Array) -> jax.Array:
    """[3,3,Cin,Cmid] -> [Cin, 16*Cmid], column blocks ordered (p, u, v).

    Block (p=2a+b, u, v) holds the summed kernel K_{ab}[a-1+u, b-1+v]:
    y_{ab}[i,j] = sum_{u,v} Xp[i+a+u, j+b+v] @ block(p,u,v).
    """
    cin, cmid = w3.shape[2], w3.shape[3]
    blocks = []
    for a, b in _PHASES:
        for u in (0, 1):
            for v in (0, 1):
                k = sum(w3[kr, kc] for kr in _R[(a, u)] for kc in _R[(b, v)])
                blocks.append(k)
    return jnp.stack(blocks, axis=0).transpose(1, 0, 2).reshape(
        cin, 16 * cmid)


def _outconv_tap_map():
    """(a, kr) -> (source phase a', input-grid shift di).

    out[2i+a] tap kr reads upsampled row 2i+a+kr-1 = 2(i+di)+a'.
    """
    m = {}
    for a in (0, 1):
        for kr in (0, 1, 2):
            a2 = (a + kr - 1) % 2
            m[(a, kr)] = (a2, (a + kr - 1 - a2) // 2)
    return m


def build_wbig(wo: jax.Array) -> jax.Array:
    """[3,3,Cmid,2] -> [4*Cmid, 72], column blocks ordered by shift.

    Column 8*s + (p*2+o) contracts the phase-stacked elu buffer so that
    out_p[q,o] = sum_s C[q + shift_s, 8s + 2p+o]; the shift s = 3*(di+1)
    + (dj+1) is SHARED by all phases in the block, which is what makes
    the epilogue nine 8-lane-aligned slice-adds.
    """
    cmid = wo.shape[2]
    tap = _outconv_tap_map()
    wb = jnp.zeros((4, cmid, 9, 8), wo.dtype)
    for p, (a, b) in enumerate(_PHASES):
        for kr in range(3):
            a2, di = tap[(a, kr)]
            for kc in range(3):
                b2, dj = tap[(b, kc)]
                s = (di + 1) * 3 + (dj + 1)
                p2 = 2 * a2 + b2
                for o in (0, 1):
                    wb = wb.at[p2, :, s, p * 2 + o].add(wo[kr, kc, :, o])
    return wb.reshape(4 * cmid, 72)


_LEFT = 8  # column border width; keeps the row stride and store offsets %8==0
_EPB = 2048  # epilogue row-block size (bounds in-register live values)


def _tail_kernel(x_ref, kbig_ref, bu_ref, wbig_ref, out_ref,
                 xp, bbuf, ebuf, cbuf, *, h, w, cin, cmid, ch):
    wp, hp = w + 2 * _LEFT, h + 2
    nchunk = h // ch
    chunk_flat = ch * wp
    e_base = wp + 8

    # Zero the padded buffers once — every image rewrites the same interior
    # rows/cols, so the zero borders persist across grid steps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        xp[...] = jnp.zeros_like(xp)
        ebuf[...] = jnp.zeros_like(ebuf)

    def fill_row(i, carry):
        xp[pl.ds((i + 1) * wp + _LEFT, w), :] = x_ref[0, i, :, :]
        return carry

    jax.lax.fori_loop(0, h, fill_row, 0)

    # mask: padded columns (j >= w in chunk-local coords) of every flattened
    # row -> 0, making the phase buffer's garbage columns exact conv
    # zero-padding.
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk_flat, 1), 0) % wp
    mask = col < w

    def chunk(k, carry):
        base = k * chunk_flat
        bbuf[...] = jnp.dot(
            xp[pl.ds(base, bbuf.shape[0]), :], kbig_ref[...],
            preferred_element_type=jnp.float32).astype(bbuf.dtype)
        for p, (a, b) in enumerate(_PHASES):
            acc = None
            for u in (0, 1):
                for v in (0, 1):
                    # pixel (i,j) tap (u,v) reads xp row
                    # (i+a+u)*wp + _LEFT + j + b+v-1; bbuf row t = i*wp+j-base
                    off = (a + u) * wp + (b + v) + _LEFT - 1
                    blk = ((p * 2 + u) * 2 + v) * cmid
                    sl = bbuf[off:off + chunk_flat,
                              blk:blk + cmid].astype(jnp.float32)
                    acc = sl if acc is None else acc + sl
            yv = acc + bu_ref[...].astype(jnp.float32)
            ev = jnp.where(yv > 0, yv, jnp.exp(jnp.minimum(yv, 0.)) - 1.)
            ev = jnp.where(mask, ev, 0.).astype(ebuf.dtype)
            # E row of pixel q=(i,j) is (i+1)*wp+(j+_LEFT)+e_base; every
            # term of the store offset is a multiple of 8 (wp%8==0).
            ebuf[pl.ds(e_base + wp + _LEFT + base, chunk_flat),
                 p * cmid:(p + 1) * cmid] = ev
        return carry

    jax.lax.fori_loop(0, nchunk, chunk, 0)

    # Epilogue in Python-unrolled (static-offset) row blocks: un-chunked,
    # the full-height dot + 9 slice-adds keep tens of MB of vector values
    # live and overflow VMEM as compiler stack; static offsets also sidestep
    # Mosaic's dynamic-index alignment rule for the +-1 column shifts.
    e_rows = ebuf.shape[0]
    for base in range(0, e_rows, _EPB):
        sz = min(_EPB, e_rows - base)
        cbuf[base:base + sz, :] = jnp.dot(
            ebuf[base:base + sz, :], wbig_ref[...],
            preferred_element_type=jnp.float32)

    out_rows = hp * wp
    for base in range(0, out_rows, _EPB):
        sz = min(_EPB, out_rows - base)
        acc = None
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                s = (di + 1) * 3 + (dj + 1)
                lo = e_base + di * wp + dj + base
                sl = cbuf[lo:lo + sz, 8 * s:8 * s + 8]
                acc = sl if acc is None else acc + sl
        out_ref[0, base:base + sz, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_call(x, kbig, bu, wbig, interpret=False):
    n, h, w, cin = x.shape
    cmid = kbig.shape[1] // 16
    wp, hp = w + 2 * _LEFT, h + 2
    ch = min(16, h)
    assert h % ch == 0 and wp % 8 == 0
    nchunk = h // ch
    chunk_flat = ch * wp
    b_rows = _round_up(chunk_flat + 2 * wp + _LEFT + 2, 8)
    xp_rows = _round_up((nchunk - 1) * chunk_flat + b_rows, 8)
    e_base = wp + 8
    e_rows = _round_up(e_base + hp * wp + wp + 2, 8)

    kernel = functools.partial(_tail_kernel, h=h, w=w, cin=cin, cmid=cmid,
                               ch=ch)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp * wp, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp * wp, 8), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((xp_rows, cin), x.dtype),
            pltpu.VMEM((b_rows, 16 * cmid), x.dtype),
            pltpu.VMEM((e_rows, 4 * cmid), x.dtype),
            pltpu.VMEM((e_rows, 72), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, kbig, bu, wbig)


def decoder_tail_xla(x: jax.Array, w_up: jax.Array, b_up: jax.Array,
                     w_out: jax.Array, b_out: jax.Array) -> jax.Array:
    """Reference composition in plain XLA (also the VJP body)."""
    from strajnet_tpu.ops.upconv import upsample2x_conv3x3

    dt = x.dtype
    y = upsample2x_conv3x3(x, w_up.astype(dt), b_up)
    e = jax.nn.elu(y)
    o = jax.lax.conv_general_dilated(
        e, w_out.astype(dt), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return o + b_out.astype(dt)


def build_ky(wo: jax.Array) -> jax.Array:
    """[3,3,Cmid,2] -> [2,2,4*Cmid,8] offset-grid outconv kernel.

    The phase-stacked upconv output ``y`` lives on the (H+1)x(W+1) "offset
    grid" (phase (a,b) of upsampled pixel (2i+a, 2j+b) is ``y[a+i, b+j,
    block 2a+b]`` — see upconv._phases_uniform). On that grid the 3x3
    outconv over the 2x-upsampled image collapses to a 2x2 VALID conv:
    upsampled tap row 2i+a+kr-1 = 2(i+di)+a2 lands at offset-grid row
    i + (a2+di) with a2+di in {0,1}. ``build_ky`` re-buckets wo's taps
    accordingly; output lane (2a+b)*2+o holds out phase (a,b) channel o.
    """
    cmid = wo.shape[2]
    tap = _outconv_tap_map()
    ky = jnp.zeros((2, 2, 4, cmid, 8), wo.dtype)
    for a in (0, 1):
        for kr in range(3):
            a2, di = tap[(a, kr)]
            dr = a2 + di
            for b in (0, 1):
                for kc in range(3):
                    b2, dj = tap[(b, kc)]
                    dc = b2 + dj
                    p2, p = 2 * a2 + b2, 2 * a + b
                    for o in (0, 1):
                        ky = ky.at[dr, dc, p2, :, p * 2 + o].add(
                            wo[kr, kc, :, o])
    return ky.reshape(2, 2, 4 * cmid, 8)


@functools.lru_cache(maxsize=8)
def _offset_grid_mask(h: int, w: int) -> "jax.Array":
    """[h+1, w+1, 4] 0/1 mask killing offset-grid entries that stand for
    out-of-range upsampled pixels (the outconv's zero padding): block
    p2=2*a2+b2 at row 0 is E_{a2=1}[-1], at row h is E_{a2=0}[h]; columns
    symmetric."""
    import numpy as np

    m = np.ones((h + 1, w + 1, 4), np.float32)
    m[0, :, [2, 3]] = 0.0   # a2 == 1 blocks invalid at row 0
    m[h, :, [0, 1]] = 0.0   # a2 == 0 blocks invalid at row h
    m[:, 0, [1, 3]] = 0.0   # b2 == 1 blocks invalid at col 0
    m[:, w, [0, 2]] = 0.0   # b2 == 0 blocks invalid at col w
    return jnp.asarray(m)


def decoder_tail_phase(x: jax.Array, w_up: jax.Array, b_up: jax.Array,
                       w_out: jax.Array, b_out: jax.Array) -> jax.Array:
    """Fused tail entirely in the phase domain — pure XLA, no kernel.

    Same math as :func:`decoder_tail_xla`, but the elu'd intermediate is
    kept phase-stacked at low resolution ([N,H+1,W+1,4*Cmid]) and the
    output conv runs as a 2x2 VALID conv on that offset grid (build_ky),
    so XLA never materialises the [N,2H,2W,Cmid] interleaved intermediate
    — that interleave round-trip is ~1.6 GB of HBM traffic per 128-frame
    batch at the flagship tail geometry. One cheap depth-to-space at 2
    channels interleaves the final output. Differentiable with clean
    VALID-conv gradients (no custom VJP needed).
    """
    n, h, w, cin = x.shape
    cmid = w_up.shape[3]
    dt = x.dtype
    kf = fold_kernel_2x(w_up).astype(dt)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kf, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [N, h+1, w+1, 4*cmid]
    y = y + jnp.tile(b_up, 4).astype(y.dtype)
    mask = jnp.repeat(_offset_grid_mask(h, w), cmid, axis=-1).astype(y.dtype)
    e = jax.nn.elu(y) * mask
    o = jax.lax.conv_general_dilated(
        e, build_ky(w_out).astype(dt), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    o = o.reshape(n, h, w, 2, 2, 2).transpose(0, 1, 3, 2, 4, 5).reshape(
        n, 2 * h, 2 * w, 2)
    return o + b_out.astype(o.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _decoder_tail_cv(interpret, x, w_up, b_up, w_out, b_out):
    n, h, w, _ = x.shape
    cmid = w_up.shape[3]
    kbig = build_kbig(w_up).astype(x.dtype)
    wbig = build_wbig(wo=w_out).astype(x.dtype)
    bu = b_up.reshape(1, cmid).astype(jnp.float32)
    out = _tail_call(x, kbig, bu, wbig, interpret=interpret)
    wp, hp = w + 2 * _LEFT, h + 2
    o5 = out.reshape(n, hp, wp, 2, 2, 2)[:, 1:h + 1, _LEFT:_LEFT + w]
    o = o5.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, 2)
    return o + b_out.astype(o.dtype)


def _tail_fwd(interpret, x, w_up, b_up, w_out, b_out):
    return (_decoder_tail_cv(interpret, x, w_up, b_up, w_out, b_out),
            (x, w_up, b_up, w_out, b_out))


def _tail_bwd(interpret, resid, dy):
    _, vjp = jax.vjp(decoder_tail_xla, *resid)
    return vjp(dy)


_decoder_tail_cv.defvjp(_tail_fwd, _tail_bwd)


def decoder_tail(x: jax.Array, w_up: jax.Array, b_up: jax.Array,
                 w_out: jax.Array, b_out: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Fused tail: conv3x3(elu(upconv2x(x, w_up)+b_up), w_out)+b_out.

    Args:
      x: [N, H, W, Cin] activations (bf16 on the flagship path).
      w_up: [3, 3, Cin, Cmid] upconv kernel; b_up: [Cmid].
      w_out: [3, 3, Cmid, 2] output conv kernel; b_out: [2].

    Returns:
      [N, 2H, 2W, 2], numerically within bf16 noise of the XLA
      composition (partial sums are rounded to bf16 once per tap block).
      Differentiable — the backward routes through the XLA composition.
    """
    if not interpret and jax.default_backend() == "cpu":
        # CPU has no Mosaic backend — run the same kernel interpreted so
        # the lowering is testable off-TPU.
        interpret = True
    return _decoder_tail_cv(interpret, x, w_up, b_up, w_out, b_out)


def supports(h: int, w: int, cin: int, cmid: int, cout: int) -> bool:
    """Geometry gate: the packed-N layout needs 16*Cmid lane-tileable, the
    epilogue is specialised to 2 output channels, and the row-chunk loop
    needs h divisible by the chunk size min(16, h) (_tail_call)."""
    return (cout == 2 and (16 * cmid) % 128 == 0 and h == w
            and h % 8 == 0 and cin % 8 == 0
            and (h <= 16 or h % 16 == 0))
