"""Flow-guided deformable multi-head self-attention (FG-MSA).

Parity target: reference FG_MSA.py:20-183 (DAT-style deformable attention
over the 16x16x384 encoder bottleneck).

Reference quirk faithfully reproduced behind a flag: FG_MSA.py:142 overwrites
the deformably-sampled K/V features with a reshape of the *unsampled* input,
so the deformation only affects the relative-position bias and the returned
``pos`` / ``flow_hidden``. ``deform_kv=False`` (default) replicates that;
``deform_kv=True`` uses the actually-sampled features.

TPU notes: the continuous relative-position bias is sampled from the small
(2H-1)x(2W-1) rpe table with :func:`sample_small_table`, which turns the
TPU-hostile 4-corner gather into MXU matmuls.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from strajnet_tpu.core.sampling import PixelType, sample, sample_small_table
from strajnet_tpu.models.swin import LayerNorm, gelu_tanh
from strajnet_tpu.ops.rpe_window import rpe_window_bias

Dtype = Any
dense_init = nn.initializers.glorot_uniform()


def _ref_points(h: int, w: int, dtype) -> jax.Array:
    """Reference grid, channel order as in FG_MSA.py:95-104.

    ``tf.meshgrid(range(H), range(W))`` uses xy indexing, so
    ref[i, j] = (j, i) for square grids (the reference only uses H == W).
    """
    jj, ii = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="xy")
    return jnp.stack((jj, ii), axis=-1)  # [W, H, 2] == [H, W, 2] when square


class FGMSA(nn.Module):
    q_size: Tuple[int, int] = (16, 16)
    kv_size: Tuple[int, int] = (16, 16)
    n_heads: int = 8
    n_head_channels: int = 48
    n_groups: int = 8
    out_dim: int = 384
    in_dim: int = 384
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    offset_range_factor: float = 2.0
    use_pe: bool = True
    no_off: bool = False
    stage_idx: int = 3
    use_last_ref: bool = False
    fg: bool = False
    deform_kv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, last_reference: Optional[jax.Array] = None,
                 deterministic: bool = True):
        dt = self.dtype
        nc = self.n_head_channels * self.n_heads
        n_group_channels = nc // self.n_groups
        n_group_heads = self.n_heads // self.n_groups
        scale = self.n_head_channels ** -0.5
        b, h, w, c = x.shape
        hk, wk = self.q_size  # offsets keep the query resolution (stride 1)
        n_sample = hk * wk
        x = x.astype(dt)

        q = nn.Conv(nc, (1, 1), kernel_init=dense_init, dtype=dt,
                    name="proj_q")(x)

        # Offset network (FG_MSA.py:84-92): grouped conv -> LN -> GELU ->
        # per-group 1x1 conv to 2 offset channels.
        kk = [9, 7, 5, 3][self.stage_idx]
        off = nn.Conv(nc, (kk, kk), feature_group_count=self.n_groups,
                      kernel_init=dense_init, dtype=dt,
                      name="conv_offset_0")(q)
        off = off.reshape(-1, hk * wk, nc)
        off = LayerNorm(1e-3, dt, name="conv_norm")(off)
        off = off.reshape(-1, hk, wk, nc)
        off = gelu_tanh(off)
        # split groups into the batch axis: [B*G, H, W, C/G]
        off = off.reshape(-1, hk, wk, self.n_groups, n_group_channels)
        off = jnp.transpose(off, (0, 3, 1, 2, 4))
        off = off.reshape(-1, hk, wk, n_group_channels)
        offset = nn.Conv(2, (1, 1), use_bias=False, kernel_init=dense_init,
                         dtype=dt, name="conv_offset_proj")(off)

        if self.offset_range_factor > 0:
            offset_range = jnp.asarray([hk / 2.0, wk / 2.0], dt).reshape(
                1, 1, 1, 2)
            offset = jnp.tanh(offset) * offset_range

        flow_hidden = None
        if self.fg:
            time_offset = offset.reshape(-1, self.n_groups, hk, wk, 2)
            flow_hidden = nn.Conv(self.out_dim, (1, 1),
                                  kernel_init=dense_init, dtype=dt,
                                  name="conv_offset_proj2")(time_offset)

        if self.use_last_ref:
            reference = last_reference.reshape(-1, hk, wk, 2).astype(dt)
        else:
            ref = _ref_points(hk, wk, dt)
            reference = jnp.broadcast_to(ref[None],
                                         (b * self.n_groups, hk, wk, 2))

        if self.no_off:
            offset = jnp.zeros_like(offset)

        if self.offset_range_factor >= 0:
            pos = offset + reference
        else:
            pos = jnp.tanh(offset + reference)

        # group-split features [B*G, H, W, C/G]
        xg = x.reshape(b, h, w, self.n_groups, n_group_channels)
        xg = jnp.transpose(xg, (0, 3, 1, 2, 4))
        xg = xg.reshape(b * self.n_groups, h, w, n_group_channels)

        if self.deform_kv:
            warp = jnp.stack([pos[..., 1], pos[..., 0]], axis=-1)
            xs = sample(xg.astype(jnp.float32), warp.astype(jnp.float32),
                        pixel_type=PixelType.INTEGER).astype(dt)
            xs = xs.reshape(b, self.n_groups, n_sample, n_group_channels)
            xs = jnp.transpose(xs, (0, 2, 1, 3)).reshape(b, n_sample, 1, c)
        else:
            # Reference behavior (FG_MSA.py:142): K/V come from the
            # identity-grid features, sampling result discarded.
            xs = xg.reshape(b, self.n_groups, h, w, n_group_channels)
            xs = jnp.transpose(xs, (0, 2, 3, 1, 4)).reshape(b, n_sample, 1, c)

        def heads_to_batch(t, n):
            t = t.reshape(b, n, self.n_heads, self.n_head_channels)
            t = jnp.transpose(t, (0, 2, 1, 3))
            return t.reshape(b * self.n_heads, n, self.n_head_channels)

        qh = heads_to_batch(q, h * w)
        kh = heads_to_batch(nn.Conv(nc, (1, 1), kernel_init=dense_init,
                                    dtype=dt, name="proj_k")(xs), n_sample)
        vh = heads_to_batch(nn.Conv(nc, (1, 1), kernel_init=dense_init,
                                    dtype=dt, name="proj_v")(xs), n_sample)

        attn = jnp.einsum("bqc,bkc->bqk", qh, kh) * scale

        if self.use_pe:
            rpe_table = self.param(
                "rpe_table",
                nn.initializers.truncated_normal(stddev=0.01),
                (self.kv_size[0] * 2 - 1, self.kv_size[1] * 2 - 1,
                 self.n_heads), jnp.float32)
            # [B, 2H-1, 2W-1, G, gh] -> [B*G, 2H-1, 2W-1, gh]
            rpe = jnp.broadcast_to(rpe_table[None],
                                   (b,) + rpe_table.shape)
            rpe = rpe.reshape(b, 2 * h - 1, 2 * w - 1, self.n_groups,
                              n_group_heads)
            rpe = jnp.transpose(rpe, (0, 3, 1, 2, 4)).reshape(
                b * self.n_groups, 2 * h - 1, 2 * w - 1, n_group_heads)

            posk = pos.reshape(b * self.n_groups, n_sample, 2)
            # no_off with offset_range_factor < 0 is excluded: there
            # pos = tanh(reference) rather than the reference grid itself,
            # so the |pos - ref| <= bound precondition of rpe_window_bias
            # would not hold (bound would be 0).
            if not self.use_last_ref and (
                    (self.no_off and self.offset_range_factor >= 0)
                    or self.offset_range_factor > 0):
                # Queries form the integer grid and offsets are statically
                # bounded (tanh * range, or zero): the per-pair bilinear
                # sample collapses to a per-key blended window of the table
                # (ops/rpe_window.py) — ~3x fewer FLOPs and ~10x less HBM
                # traffic than the dense one-hot contraction.
                bound = 0.0 if self.no_off else max(hk, wk) / 2.0
                attn_bias = rpe_window_bias(
                    rpe, posk.astype(jnp.float32), (h, w),
                    bound=bound, compute_dtype=dt).astype(dt)
            else:
                # general fallback (data-dependent reference positions):
                # dense one-hot contraction in the compute dtype — bf16
                # halves its HBM-bound intermediates; f32 runs (CPU golden
                # parity) keep the f32 einsums bit-for-bit.
                q_grid = _ref_points(h, w, dt)
                q_grid = jnp.broadcast_to(q_grid.reshape(1, h * w, 2),
                                          (b * self.n_groups, h * w, 2))
                disp = q_grid[:, :, None, :] - posk[:, None]
                disp = jnp.stack([disp[..., 1], disp[..., 0]], axis=-1)
                attn_bias = sample_small_table(rpe.astype(dt),
                                               disp.astype(jnp.float32),
                                               PixelType.INTEGER).astype(dt)
            attn_bias = attn_bias.reshape(b * self.n_groups, h * w, n_sample,
                                          n_group_heads)
            attn_bias = jnp.transpose(attn_bias, (0, 3, 1, 2)).reshape(
                b * self.n_heads, h * w, n_sample)
            attn = attn + attn_bias

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=2).astype(dt)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bkv,bvc->bck", attn, vh)  # [B*h, ch, N]
        out = out.reshape(b, c, h, w)
        out = jnp.transpose(out, (0, 2, 3, 1))
        y = nn.Conv(self.out_dim, (1, 1), kernel_init=dense_init, dtype=dt,
                    name="proj_out")(out)
        y = nn.Dropout(self.proj_drop)(y, deterministic=deterministic)

        pos_out = pos.reshape(b, self.n_groups, hk, wk, 2)
        if self.fg:
            return y, pos_out, flow_hidden
        return y, pos_out, reference.reshape(b, self.n_groups, hk, wk, 2)
