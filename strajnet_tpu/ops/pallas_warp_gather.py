"""Pallas TPU kernel: dense bilinear warp-gather for the flow-warp terms.

The warp loss (reference loss.py:143-150) and the flow-grounded metrics
(reference occu_metric.py:255-314) both sample a [B, H, W, 1] occupancy grid
at ``identity + flow`` with INTEGER pixels and a ZERO border. On TPU the
4-corner scalar gather XLA emits for that is the single hottest op of the
training step (~123 ms of a 232 ms step at batch 8, measured): TPU has no
per-lane gather, so XLA serializes it.

This kernel rewrites the gather as one-hot matmuls that run on the MXU, with
every intermediate VMEM-resident (an equivalent pure-XLA einsum formulation
materializes the [S, N, W] one-hot/row tensors in HBM — 4+ GB at the loss
shapes — and OOMs under ``grad``):

  for a block of NB query points of one image slice:
    oh0 = onehot(y0), oh1 = onehot(y0 + 1)          # binary, bf16-exact
    r0 = oh0 @ img, r1 = oh1 @ img                  # MXU, f32 accumulate
    c00/c01 = row r0 masked at x0 / x0+1, summed    # VPU
    c10/c11 = row r1 masked at x0 / x0+1, summed

The matmul operands are a binary one-hot and the occupancy image; occupancy
is {0, 1}-valued, so the bf16 MXU path is *exact* (products and <=H+2-term
f32 accumulations of integers round-trip). The bilinear blend itself happens
outside the kernel in f32 jnp with the exact same expression tree as
:func:`strajnet_tpu.core.sampling.interpolate_bilinear`, so gradients through
the interpolation weights (clip/floor conventions included) are plain JAX
autodiff — identical to the portable path.

The custom VJP returns the image cotangent from a second Pallas kernel that
scatters ``g * onehot`` products back through the same matmuls (accumulated
across the sequential TPU grid). Call sites that never differentiate w.r.t.
the image (the loss and metrics: the warped grid is ground truth) get that
kernel dead-code-eliminated by XLA.

Layout note: query arrays are carried as [S, N/128, 128] so their blocks are
(1, NB/128, 128) native TPU tiles; inside the kernel only leading-dim
merge/split reshapes are used (free on the tiled layout), and the backward
matmul contracts dimension 0 via ``dot_general`` instead of materializing a
transposed one-hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Queries per grid step. 1024 keeps the block working set (~8 MB incl. the
# resident image and double buffering) inside VMEM.
_NB = 1024
_LANES = 128


def _fwd_kernel(img_ref, x0_ref, y0_ref, c00_ref, c01_ref, c10_ref, c11_ref):
    img = img_ref[0].astype(jnp.bfloat16)            # [Hp, Wp]
    hp, wp = img.shape
    y0 = y0_ref[0].astype(jnp.int32)                 # [NB/128, 128]
    x0 = x0_ref[0].astype(jnp.int32)
    rows, lanes = y0.shape
    nb = rows * lanes

    iy = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes, hp), 2)
    oh0 = (iy == y0[:, :, None]).astype(jnp.bfloat16).reshape(nb, hp)
    oh1 = (iy == (y0[:, :, None] + 1)).astype(jnp.bfloat16).reshape(nb, hp)
    r0 = jnp.dot(oh0, img, preferred_element_type=jnp.float32)  # [NB, Wp]
    r1 = jnp.dot(oh1, img, preferred_element_type=jnp.float32)
    r0 = r0.reshape(rows, lanes, wp)
    r1 = r1.reshape(rows, lanes, wp)

    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes, wp), 2)
    m0 = ix == x0[:, :, None]
    m1 = ix == (x0[:, :, None] + 1)
    zero = jnp.zeros((), jnp.float32)
    c00_ref[0] = jnp.sum(jnp.where(m0, r0, zero), axis=2)
    c01_ref[0] = jnp.sum(jnp.where(m1, r0, zero), axis=2)
    c10_ref[0] = jnp.sum(jnp.where(m0, r1, zero), axis=2)
    c11_ref[0] = jnp.sum(jnp.where(m1, r1, zero), axis=2)


def _bwd_kernel(x0_ref, y0_ref, g00_ref, g01_ref, g10_ref, g11_ref,
                dimg_ref):
    q = pl.program_id(1)
    hp, wp = dimg_ref.shape[1], dimg_ref.shape[2]
    y0 = y0_ref[0].astype(jnp.int32)                 # [NB/128, 128]
    x0 = x0_ref[0].astype(jnp.int32)
    rows, lanes = y0.shape
    nb = rows * lanes

    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes, wp), 2)
    m0 = (ix == x0[:, :, None]).astype(jnp.float32)
    m1 = (ix == (x0[:, :, None] + 1)).astype(jnp.float32)
    # row-cotangents of r0 / r1: [NB, Wp]. Full f32 here: this kernel is
    # dead-code-eliminated from the training step (the warped image is GT),
    # so precision costs nothing where it runs.
    t0 = (g00_ref[0][:, :, None] * m0 +
          g01_ref[0][:, :, None] * m1).reshape(nb, wp)
    t1 = (g10_ref[0][:, :, None] * m0 +
          g11_ref[0][:, :, None] * m1).reshape(nb, wp)

    iy = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes, hp), 2)
    oh0 = (iy == y0[:, :, None]).astype(jnp.float32).reshape(nb, hp)
    oh1 = (iy == (y0[:, :, None] + 1)).astype(jnp.float32).reshape(nb, hp)

    # d_img[h, w] = sum_n oh[n, h] * t[n, w]  — contract the query dim.
    contract0 = (((0,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(oh0, t0, dimension_numbers=contract0,
                               preferred_element_type=jnp.float32) +
           jax.lax.dot_general(oh1, t1, dimension_numbers=contract0,
                               preferred_element_type=jnp.float32))

    @pl.when(q == 0)
    def _():
        dimg_ref[0] = acc

    @pl.when(q != 0)
    def _():
        dimg_ref[0] = dimg_ref[0] + acc


def _block_rows(n: int) -> int:
    """Rows of 128 queries per grid step (0 if the shape doesn't tile)."""
    if n % _LANES != 0:
        return 0
    total_rows = n // _LANES
    rows = _NB // _LANES
    while rows >= 1:
        if total_rows % rows == 0:
            return rows
        rows //= 2
    return 0


def _qshape(x, n):
    return x.reshape(x.shape[0], n // _LANES, _LANES)


def _fwd_call(img, x0f, y0f, interpret):
    s, hp, wp = img.shape
    n = x0f.shape[1]
    rows = _block_rows(n)
    grid = (s, n // (rows * _LANES))
    qspec = pl.BlockSpec((1, rows, _LANES), lambda i, q: (i, q, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((s, n // _LANES, _LANES), jnp.float32)
    c = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda i, q: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec, qspec,
        ],
        out_specs=(qspec,) * 4,
        out_shape=(out,) * 4,
        interpret=interpret,
    )(img, _qshape(x0f, n), _qshape(y0f, n))
    return tuple(x.reshape(s, n) for x in c)


def _bwd_call(img_shape, x0f, y0f, gs, interpret):
    s, hp, wp = img_shape
    n = x0f.shape[1]
    rows = _block_rows(n)
    grid = (s, n // (rows * _LANES))
    qspec = pl.BlockSpec((1, rows, _LANES), lambda i, q: (i, q, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[qspec] * 6,
        out_specs=pl.BlockSpec((1, hp, wp), lambda i, q: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, hp, wp), jnp.float32),
        interpret=interpret,
    )(_qshape(x0f, n), _qshape(y0f, n), *(_qshape(g, n) for g in gs))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_corners(img, x0f, y0f, interpret=False):
    """4-corner gather: img [S, Hp, Wp] f32 (values exactly representable in
    bf16 — e.g. binary occupancy), x0f/y0f [S, N] f32 holding exact integer
    floor indices with x0f+1 < Wp, y0f+1 < Hp. Returns (c00, c01, c10, c11)
    each [S, N]: c_{ab} = img[y0+a, x0+b]."""
    return _fwd_call(img, x0f, y0f, interpret)


def _gather_fwd(img, x0f, y0f, interpret):
    return _fwd_call(img, x0f, y0f, interpret), (img.shape, x0f, y0f)


def _gather_bwd(interpret, res, gs):
    img_shape, x0f, y0f = res
    dimg = _bwd_call(img_shape, x0f, y0f, gs, interpret)
    # Integer-valued floor coordinates carry no useful tangent (zero a.e.);
    # zeros here are DCE'd alongside dimg when the caller never
    # differentiates w.r.t. them (the loss/metrics call sites).
    return dimg, jnp.zeros_like(x0f), jnp.zeros_like(y0f)


_gather_corners.defvjp(_gather_fwd, _gather_bwd)


def supports(image: jax.Array, warp: jax.Array) -> bool:
    """True when the Pallas fast path applies to this (image, warp) pair.

    ``STRAJNET_NO_WARP_KERNEL=1`` disables the route (debug hook for
    isolating Pallas-kernel interactions in full-program crash bisection).
    """
    import os
    if os.environ.get("STRAJNET_NO_WARP_KERNEL") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if image.ndim != 4 or image.shape[-1] != 1 or warp.shape[-1] != 2:
        return False
    n = 1
    for d in warp.shape[1:-1]:
        n *= d
    return _block_rows(n) != 0


def sample_dense(image: jax.Array, warp: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Bilinear ZERO-border INTEGER-pixel sampling (exactly the semantics of
    :func:`strajnet_tpu.core.sampling.sample` at its default flags) with the
    corner gather on the MXU.

    Args:
      image: [S, H, W, 1], values exactly representable in bf16 (binary
        occupancy at every call site).
      warp: [S, ..., 2] (x, y) query coordinates.

    Returns:
      [S, ..., 1], matching the portable path up to f32 blend rounding.
    """
    s, h, w, c = image.shape
    assert c == 1, image.shape
    hp, wp = h + 2, w + 2
    # Physical buffer padded up to native (8, 128) VMEM tiles. Mosaic pads
    # the [1, hp, wp] block to exactly these sizes in VMEM anyway (the MXU
    # work is identical); making the HBM array tile-aligned as well removes
    # the unaligned DMA edge rows/columns a [S, 258, 258] layout produces.
    # The extra area is zero and the clip bounds below keep every query
    # index inside the logical (h+2, w+2) region, so results are unchanged.
    hp_phys = -(-hp // 8) * 8
    wp_phys = -(-wp // _LANES) * _LANES
    img = jnp.pad(image[..., 0].astype(jnp.float32),
                  ((0, 0), (1, hp_phys - h - 1), (1, wp_phys - w - 1)))

    lead = warp.shape[:-1]
    q = warp.reshape(s, -1, 2).astype(jnp.float32)
    x = q[..., 0] + 1.0
    y = q[..., 1] + 1.0
    # identical floor/clip expression tree as interpolate_bilinear — the
    # autodiff behavior through clip boundaries matches the portable path.
    y0f = jnp.clip(jnp.floor(y), 0.0, hp - 2)
    ay = jnp.clip(y - y0f, 0.0, 1.0)
    x0f = jnp.clip(jnp.floor(x), 0.0, wp - 2)
    ax = jnp.clip(x - x0f, 0.0, 1.0)

    c00, c01, c10, c11 = _gather_corners(
        img, jax.lax.stop_gradient(x0f), jax.lax.stop_gradient(y0f),
        interpret)

    interp_top = ax * (c01 - c00) + c00
    interp_bottom = ax * (c11 - c10) + c10
    out = ay * (interp_bottom - interp_top) + interp_top
    return out.reshape(lead + (1,))
