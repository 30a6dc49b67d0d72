"""Bilinear image sampling with challenge-parity semantics, in pure JAX.

Numerically matches the reference's vendored tensorflow_graphics ``sample``
(reference occu_metric.py:345-409) built on TF-Addons
``interpolate_bilinear`` (reference tfa_image.py:24-173):

- queries are (x, y) pairs; ``PixelType.INTEGER`` treats integral coordinates
  as pixel centers, ``HALF_INTEGER`` shifts by -0.5 first;
- ``BorderType.ZERO`` pads the image with one zero pixel on each side and
  shifts the warp by +1 so out-of-range queries blend toward zero;
- floor indices are clamped to ``[0, size-2]`` and interpolation weights to
  ``[0, 1]`` (this is what produces DUPLICATE-style clamping at the far edge
  even under ZERO border — parity-relevant).

All call sites in the reference use ``pixel_type=INTEGER`` with the default
BILINEAR/ZERO modes (loss.py:146-150, occu_metric.py:307-311, FG_MSA.py:141).

TPU notes: the gather is expressed as one flat take along a linearized index,
which XLA lowers to a single gather op. For *small* source images (e.g. the
31x31 FG-MSA rpe table) prefer :func:`sample_small_table`, which rewrites the
4-corner gather as one-hot matmuls that run on the MXU instead of the slow
TPU gather path.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp


class ResamplingType(enum.Enum):
    NEAREST = 0
    BILINEAR = 1


class BorderType(enum.Enum):
    ZERO = 0
    DUPLICATE = 1


class PixelType(enum.Enum):
    INTEGER = 0
    HALF_INTEGER = 1


def interpolate_bilinear(grid: jax.Array, query_points: jax.Array,
                         indexing: str = "ij") -> jax.Array:
    """Bilinear interpolation on a regular grid (TF-Addons semantics).

    Args:
      grid: [B, H, W, C] source values.
      query_points: [B, N, 2] query coordinates. With ``indexing='ij'`` the
        last axis is (row, col); with ``'xy'`` it is (col, row).

    Returns:
      [B, N, C] interpolated values.
    """
    if indexing not in ("ij", "xy"):
        raise ValueError("Indexing mode must be 'ij' or 'xy'")
    b, h, w, c = grid.shape
    n = query_points.shape[1]

    index_order = (0, 1) if indexing == "ij" else (1, 0)
    sizes = (h, w)

    floors = []
    alphas = []
    for i, dim in enumerate(index_order):
        queries = query_points[..., dim]
        size = sizes[i]
        # max_floor keeps floor+1 a valid index (tfa_image.py:122-131).
        max_floor = jnp.asarray(size - 2, queries.dtype)
        floor_f = jnp.clip(jnp.floor(queries), 0.0, max_floor)
        floors.append(floor_f.astype(jnp.int32))
        alpha = jnp.clip((queries - floor_f).astype(grid.dtype), 0.0, 1.0)
        alphas.append(alpha[..., None])  # [B, N, 1]

    flat_grid = grid.reshape(b * h * w, c)
    batch_offsets = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]

    def gather(y_idx, x_idx):
        lin = batch_offsets + y_idx * w + x_idx
        return flat_grid[lin.reshape(-1)].reshape(b, n, c)

    y0, x0 = floors
    top_left = gather(y0, x0)
    top_right = gather(y0, x0 + 1)
    bottom_left = gather(y0 + 1, x0)
    bottom_right = gather(y0 + 1, x0 + 1)

    interp_top = alphas[1] * (top_right - top_left) + top_left
    interp_bottom = alphas[1] * (bottom_right - bottom_left) + bottom_left
    return alphas[0] * (interp_bottom - interp_top) + interp_top


def sample(image: jax.Array, warp: jax.Array,
           resampling_type: ResamplingType = ResamplingType.BILINEAR,
           border_type: BorderType = BorderType.ZERO,
           pixel_type: PixelType = PixelType.INTEGER) -> jax.Array:
    """Samples ``image`` at (x, y) coordinates ``warp``.

    Args:
      image: [B, H, W, C].
      warp: [B, ..., 2] with (x, y) coordinates (x indexes width).

    Returns:
      [B, ..., C] sampled values.
    """
    if image.ndim != 4:
        raise ValueError(f"image must be rank 4, got {image.ndim}")
    if warp.shape[-1] != 2 or warp.ndim < 2:
        raise ValueError(f"warp must be [..., 2] of rank>=2, got {warp.shape}")
    if image.shape[0] != warp.shape[0]:
        raise ValueError("image and warp batch dimensions must match")

    if pixel_type == PixelType.HALF_INTEGER:
        warp = warp - 0.5
    if resampling_type == ResamplingType.NEAREST:
        warp = jnp.round(warp)
    if border_type == BorderType.ZERO:
        image = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
        warp = warp + 1.0

    b = warp.shape[0]
    flat_warp = warp.reshape(b, -1, 2)
    flat_sampled = interpolate_bilinear(image, flat_warp, indexing="xy")
    return flat_sampled.reshape(warp.shape[:-1] + (image.shape[-1],))


def sample_small_table(table: jax.Array, warp: jax.Array,
                       pixel_type: PixelType = PixelType.INTEGER) -> jax.Array:
    """ZERO-border bilinear sampling of a *small* table via one-hot matmuls.

    Numerically identical to :func:`sample` (BILINEAR/ZERO) but expresses the
    4-corner gather as two one-hot contractions, which XLA maps onto the MXU —
    much faster than gathers on TPU when ``H*W`` of the table is small
    (e.g. the FG-MSA rpe table, reference FG_MSA.py:162-166).

    Args:
      table: [B, H, W, C] with small H, W (e.g. 31x31).
      warp: [B, ..., 2] (x, y) query coordinates.
    """
    b, h, w, c = table.shape
    if pixel_type == PixelType.HALF_INTEGER:
        warp = warp - 0.5
    # ZERO border: conceptually pad to (h+2, w+2) and shift by +1.
    hp, wp = h + 2, w + 2
    x = warp[..., 0] + 1.0
    y = warp[..., 1] + 1.0

    y0f = jnp.clip(jnp.floor(y), 0.0, hp - 2)
    x0f = jnp.clip(jnp.floor(x), 0.0, wp - 2)
    ay = jnp.clip(y - y0f, 0.0, 1.0).astype(table.dtype)[..., None]
    ax = jnp.clip(x - x0f, 0.0, 1.0).astype(table.dtype)[..., None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    # Row one-hots blend the two rows; col one-hots blend the two cols.
    iy = jnp.arange(hp, dtype=jnp.int32)
    ix = jnp.arange(wp, dtype=jnp.int32)
    wy = ((y0[..., None] == iy).astype(table.dtype) * (1.0 - ay) +
          ((y0 + 1)[..., None] == iy).astype(table.dtype) * ay)  # [B,...,hp]
    wx = ((x0[..., None] == ix).astype(table.dtype) * (1.0 - ax) +
          ((x0 + 1)[..., None] == ix).astype(table.dtype) * ax)  # [B,...,wp]

    padded = jnp.pad(table, ((0, 0), (1, 1), (1, 1), (0, 0)))
    lead = warp.shape[:-1]
    wy2 = wy.reshape(b, -1, hp)
    wx2 = wx.reshape(b, -1, wp)
    # [B,N,hp] x [B,hp,wp*C] -> [B,N,wp,C]; then contract wp.
    rows = jnp.einsum("bnh,bhwc->bnwc", wy2, padded)
    out = jnp.einsum("bnw,bnwc->bnc", wx2, rows)
    return out.reshape(lead + (c,))


def dense_image_warp(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Per-pixel backward warping (TF-Addons ``dense_image_warp`` parity).

    output[b, j, i] = image[b, j - flow[b,j,i,0], i - flow[b,j,i,1]]
    with bilinear interpolation and edge clamping (tfa_image.py:183-245).
    """
    b, h, w, _ = image.shape
    grid_y, grid_x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    stacked = jnp.stack([grid_y, grid_x], axis=-1).astype(flow.dtype)
    query = (stacked[None] - flow).reshape(b, h * w, 2)
    out = interpolate_bilinear(image, query, indexing="ij")
    return out.reshape(b, h, w, image.shape[-1])


def identity_warp_indices(height: int, width: int,
                          dtype=jnp.float32) -> jax.Array:
    """[H, W, 2] grid of (x, y) self-indices (reference loss.py:80-91)."""
    h_idx, w_idx = jnp.meshgrid(jnp.arange(height, dtype=dtype),
                                jnp.arange(width, dtype=dtype), indexing="ij")
    return jnp.stack((w_idx, h_idx), axis=-1)


def flow_warp_origin(flow_origin_occupancy: jax.Array,
                     flow: jax.Array,
                     use_kernel: bool = True) -> jax.Array:
    """Warps flow-origin occupancy by a (dx, dy) flow field.

    Shared by the warp loss (reference loss.py:143-150) and the flow-grounded
    metrics (occu_metric.py:255-314): sample origin occupancy at
    ``identity + flow`` with INTEGER pixels and ZERO border.

    Args:
      flow_origin_occupancy: [B, H, W, 1].
      flow: [B, H, W, 2] (dx, dy).
      use_kernel: route through the Pallas warp-gather kernel when it
        applies (set False by the training loss when the attention
        backward kernels are active — PARITY.md crash bisect).

    TPU note: on TPU this routes to the Pallas MXU warp-gather kernel
    (ops/pallas_warp_gather.py) — numerically the same interpolation tree,
    ~10x faster than the scalar 4-corner gather XLA otherwise emits (the
    warp term dominated the whole training step before this). The portable
    jnp path below runs everywhere else (CPU tests, golden parity).

    PRECONDITION for the kernel route: the kernel gathers via bf16 one-hot
    matmuls, so the result is exact only when the occupancy values are
    bf16-representable (the 0/1 grids of the loss/metrics call sites — the
    only callers). Passing non-binary occupancies (e.g. soft/averaged
    grids) on TPU would silently lose precision below ~3 significant
    digits; route such callers through ``sample`` directly instead.
    """
    _, h, w, _ = flow_origin_occupancy.shape
    warp = identity_warp_indices(h, w, flow.dtype)[None] + flow

    from strajnet_tpu.ops import pallas_warp_gather
    if use_kernel and pallas_warp_gather.supports(flow_origin_occupancy,
                                                  warp):
        # Mesh composition: on a >1-device mesh the pallas_call must ride
        # shard_map over the leading (batch-major S = B*T) axis — GSPMD
        # cannot partition an opaque custom call (parallel/mesh.py).
        from strajnet_tpu.parallel.mesh import active_mesh, data_shard_map
        mesh = active_mesh()
        if mesh is not None:
            if flow_origin_occupancy.shape[0] % mesh.shape["data"] == 0:
                return data_shard_map(
                    pallas_warp_gather.sample_dense, mesh, 2, 0)(
                        flow_origin_occupancy, warp)
            # indivisible shard: fall through to the portable XLA path,
            # which GSPMD partitions natively
        else:
            return pallas_warp_gather.sample_dense(flow_origin_occupancy,
                                                   warp)
    return sample(flow_origin_occupancy, warp, pixel_type=PixelType.INTEGER)
