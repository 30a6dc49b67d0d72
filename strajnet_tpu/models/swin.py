"""Swin-Transformer encoder, TPU-first.

Capability-parity rebuild of the reference encoder (reference modules.py:
Gelu:18, Mlp:31, WindowAttention:66, SwinTransformerBlock:163,
PatchMerging:265, PatchUpsampling:294, BasicLayer:317, PatchEmbed:417,
SwinTransformerEncoder:448) with TPU-idiomatic changes:

- the cyclic shift / window partition / reverse pipeline is pure
  reshape+transpose+roll, traced once under jit; masks and relative-position
  indices are numpy constants baked into the program;
- attention runs as batched einsums over [B*nW, heads, N, N] blocks that XLA
  tiles onto the MXU; softmax is computed in float32;
- compute dtype is configurable (bfloat16 by default at the top level), all
  parameters and LayerNorms stay float32.

Geometry is fully parametric (the reference hardcodes the 512-input shapes at
modules.py:583-585,615-622); center-crop/pad factors are derived from the
patch grid so tiny test configs compile the same program shape.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from strajnet_tpu.ops.windows import (
    relative_position_index,
    shifted_window_mask_jnp,
    window_partition,
    window_reverse,
)
from strajnet_tpu.parallel.mesh import active_mesh, data_shard_map

Dtype = Any

# Keras-parity initializers: Dense/Conv use glorot_uniform + zero bias.
dense_init = nn.initializers.glorot_uniform()


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximated GELU (reference modules.py:18-29)."""
    return jax.nn.gelu(x, approximate=True)


class LayerNorm(nn.Module):
    """LayerNorm with configurable epsilon (Keras default 1e-3).

    f32 runs keep full-f32 IO (golden-parity path). bf16 runs keep the
    statistics in f32 (flax upcasts internally) but stream activations at
    bf16 — LN is pure HBM traffic at the 128^2-token stages, and the f32
    round-trip doubled it.
    """

    epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.dtype == jnp.float32:
            y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                             param_dtype=jnp.float32)(x.astype(jnp.float32))
            return y.astype(self.dtype)
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype,
                            param_dtype=jnp.float32)(x.astype(self.dtype))


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, kernel_init=dense_init,
                     dtype=self.dtype, name="fc1")(x)
        x = gelu_tanh(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=dense_init,
                     dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (reference modules.py:137-160)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class _LNShellInner(nn.Module):
    """nn.LayerNorm's parameters (same names/init) without computing."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


class _LNShell(nn.Module):
    """Declares exactly LayerNorm's param tree (norm*/LayerNorm_0/...)."""

    features: int

    @nn.compact
    def __call__(self):
        return _LNShellInner(self.features, name="LayerNorm_0")()


class _MlpShell(nn.Module):
    """Declares exactly Mlp's param tree (mlp/fc1, mlp/fc2)."""

    hidden: int
    features: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.hidden, self.features, name="fc1")()
        w2, b2 = _DenseParams(self.features, self.hidden, name="fc2")()
        return w1, b1, w2, b2


class _DenseParams(nn.Module):
    """Dense parameters with nn.Dense-compatible naming (kernel/bias)."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", dense_init,
                       (self.in_features, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        return k, b


class WindowAttention(nn.Module):
    """W-MSA within a window with learned relative-position bias.

    Parity target: reference modules.py:66-134. Parameters are declared
    directly (same paths as the nn.Dense layout) so the fused Pallas kernel
    path can consume them too.
    """

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.qkv = _DenseParams(self.dim * 3, self.dim, self.qkv_bias,
                                name="qkv")
        self.proj = _DenseParams(self.dim, self.dim, True, name="proj")
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1),
             self.num_heads), jnp.float32)
        self._attn_dropout = nn.Dropout(self.attn_drop)
        self._proj_dropout = nn.Dropout(self.proj_drop)

    def rel_bias(self) -> jax.Array:
        """[num_heads, n, n] bias expanded from the learned table."""
        n = self.window_size[0] * self.window_size[1]
        rpi = relative_position_index(*self.window_size)  # numpy constant
        rel = self.relative_position_bias_table[rpi.reshape(-1)]
        return jnp.transpose(rel.reshape(n, n, -1), (2, 0, 1))

    def fused_params(self):
        """(wqkv, bqkv, wproj, bproj, rel_bias) for the Pallas kernel."""
        wqkv, bqkv = self.qkv()
        wproj, bproj = self.proj()
        if bqkv is None:
            bqkv = jnp.zeros((3 * self.dim,), jnp.float32)
        return wqkv, bqkv, wproj, bproj, self.rel_bias()

    def __call__(self, x: jax.Array, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True) -> jax.Array:
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        wqkv, bqkv = self.qkv()
        qkv = x @ wqkv.astype(self.dtype)
        if bqkv is not None:
            qkv = qkv + bqkv.astype(self.dtype)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = attn + self.rel_bias().astype(attn.dtype)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, self.num_heads, n, n)
            attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)

        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        attn = self._attn_dropout(attn, deterministic=deterministic)

        x = jnp.einsum("bhnm,bhmd->bnhd", attn, v.astype(self.dtype))
        x = x.reshape(b_, n, c)
        wproj, bproj = self.proj()
        x = x @ wproj.astype(self.dtype) + bproj.astype(self.dtype)
        x = self._proj_dropout(x, deterministic=deterministic)
        return x


class SwinTransformerBlock(nn.Module):
    """LN -> (shifted) W-MSA -> residual -> LN -> MLP -> residual.

    Parity target: reference modules.py:163-262.
    """

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: Union[bool, str] = False
    windows_per_program: Optional[int] = None
    samples_per_program: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h, w = self.input_resolution
        window_size, shift_size = self.window_size, self.shift_size
        if min(self.input_resolution) <= window_size:
            window_size = min(self.input_resolution)
            shift_size = 0
        assert 0 <= shift_size < window_size

        b, l, c = x.shape
        assert l == h * w, f"wrong token count {l} != {h}x{w}"

        mask = (shifted_window_mask_jnp(h, w, window_size, shift_size)
                if shift_size > 0 else None)
        attn_mod = WindowAttention(
            dim=self.dim, window_size=(window_size, window_size),
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            name="attn")

        # The fused Pallas kernel computes the entire block (LN -> W-MSA ->
        # +res -> LN -> MLP -> +res) VMEM-resident whenever the in-block
        # dropouts are inactive: always at inference, and in training when
        # attn_drop == drop == 0 (the reference training config; stochastic
        # depth is handled by per-sample keep masks passed to the kernel).
        # At the 128^2-token stages the per-op XLA lowering is HBM-bound —
        # every LN/residual/MLP boundary streams a ~50 MB activation.
        # use_pallas: False | "attn" (fused attention only, LN/MLP in XLA)
        # | True/"block" (fully fused block kernel).
        pallas_mode = self.use_pallas
        if pallas_mode is True:
            pallas_mode = "block"
        pallas_ok = (pallas_mode and not self.is_initializing()
                     and (deterministic
                          or (self.attn_drop == 0.0 and self.drop == 0.0)))

        if pallas_ok and pallas_mode in ("block", "block_fwd"):
            from strajnet_tpu.ops.pallas_swin_block import (
                fused_swin_block,
                fused_swin_block_xla_bwd,
            )

            # "block_fwd": kernel forward, XLA-autodiff backward (gradient
            # numerics identical to the pure-XLA path).
            block_fn = (fused_swin_block if pallas_mode == "block"
                        else fused_swin_block_xla_bwd)

            dt = self.dtype
            wqkv, bqkv, wproj, bproj, rel_bias = attn_mod.fused_params()
            ln1s, ln1b = _LNShell(c, name="norm1")()
            ln2s, ln2b = _LNShell(c, name="norm2")()
            hidden = int(self.dim * self.mlp_ratio)
            w1, b1_, w2, b2_ = _MlpShell(hidden, self.dim, name="mlp")()

            xb = x.reshape(-1, h, w, c).astype(dt)
            if shift_size > 0:
                # the roll commutes with every per-token op in the block
                xb = jnp.roll(xb, shift=(-shift_size, -shift_size),
                              axis=(1, 2))
            dpm = None
            if self.drop_path > 0.0 and not deterministic:
                keep = 1.0 - self.drop_path
                draws = []
                for _ in range(2):
                    rng = self.make_rng("dropout")
                    draws.append(jnp.floor(
                        keep + jax.random.uniform(rng, (xb.shape[0],))) / keep)
                dpm = jnp.stack(draws, axis=1)

            params = (wqkv.astype(dt), bqkv.astype(dt), wproj.astype(dt),
                      bproj.astype(dt), rel_bias.astype(jnp.float32),
                      ln1s, ln1b, ln2s, ln2b, w1.astype(dt), b1_,
                      w2.astype(dt), b2_)
            kwargs = dict(window_size=window_size,
                          num_heads=self.num_heads, eps=1e-5,
                          windows_per_program=self.windows_per_program,
                          samples_per_program=self.samples_per_program)
            mask_arr = jnp.asarray(mask) if mask is not None else None

            # Mesh composition (SURVEY §2.7): GSPMD cannot partition a bare
            # pallas_call, so on a >1-device mesh the kernel rides
            # shard_map over the batch ('data') axis — each device runs the
            # kernel on its local batch shard; replicated-param cotangents
            # psum at the boundary (standard shard_map autodiff).
            mesh = active_mesh()
            if mesh is not None and xb.shape[0] % mesh.shape["data"] == 0:
                dp_arr = (dpm if dpm is not None
                          else jnp.ones((xb.shape[0], 2), jnp.float32))
                extras = (params if mask_arr is None
                          else params + (mask_arr,))
                has_mask = mask_arr is not None

                def kern(xb_, dp_, *ps):
                    msk = ps[-1] if has_mask else None
                    return block_fn(xb_, *ps[:13], msk, dp_, **kwargs)

                y = data_shard_map(kern, mesh, 2, len(extras))(
                    xb, dp_arr, *extras)
            else:
                y = block_fn(xb, *params, mask_arr, dpm, **kwargs)
            if shift_size > 0:
                y = jnp.roll(y, shift=(shift_size, shift_size), axis=(1, 2))
            return y.reshape(-1, h * w, c)

        shortcut = x
        x = LayerNorm(1e-5, self.dtype, name="norm1")(x)
        x = x.reshape(-1, h, w, c)

        if shift_size > 0:
            x = jnp.roll(x, shift=(-shift_size, -shift_size), axis=(1, 2))

        if pallas_ok and pallas_mode == "attn":
            # Attention-only fused kernel: qkv + masked softmax + proj in
            # one VMEM-resident pallas_call on the pre-normalized, pre-
            # rolled [B, H, W, C] grid; LN/MLP/residuals stay in XLA.
            from strajnet_tpu.ops.pallas_window_attention import (
                fused_window_attention)

            dt = self.dtype
            wqkv, bqkv, wproj, bproj, rel_bias = attn_mod.fused_params()
            params = (wqkv.astype(dt), bqkv.astype(dt), wproj.astype(dt),
                      bproj.astype(dt), rel_bias.astype(jnp.float32))
            kwargs = dict(window_size=window_size,
                          num_heads=self.num_heads,
                          windows_per_program=self.windows_per_program,
                          samples_per_program=self.samples_per_program)
            mask_arr = jnp.asarray(mask) if mask is not None else None
            mesh = active_mesh()
            if mesh is not None and x.shape[0] % mesh.shape["data"] == 0:
                # same shard_map composition as the block kernel above
                extras = (params if mask_arr is None
                          else params + (mask_arr,))
                has_mask = mask_arr is not None

                def kern(x_, *ps):
                    msk = ps[-1] if has_mask else None
                    return fused_window_attention(x_, *ps[:5], msk,
                                                  **kwargs)

                x = data_shard_map(kern, mesh, 1, len(extras))(
                    x.astype(dt), *extras)
            else:
                x = fused_window_attention(x.astype(dt), *params,
                                           mask_arr, **kwargs)
        else:
            x_windows = window_partition(x, window_size)
            x_windows = x_windows.reshape(-1, window_size * window_size, c)
            attn_windows = attn_mod(x_windows, mask, deterministic)
            attn_windows = attn_windows.reshape(-1, window_size,
                                                window_size, c)
            x = window_reverse(attn_windows, window_size, h, w, c)

        if shift_size > 0:
            x = jnp.roll(x, shift=(shift_size, shift_size), axis=(1, 2))
        x = x.reshape(-1, h * w, c)

        x = shortcut + DropPath(self.drop_path)(x, deterministic)
        y = LayerNorm(1e-5, self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path)(y, deterministic)


class PatchMerging(nn.Module):
    """2x downsampling by 4-way strided slice concat -> LN -> Dense(2C).

    Parity target: reference modules.py:265-292.
    """

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        assert l == h * w and h % 2 == 0 and w % 2 == 0
        x = x.reshape(-1, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(-1, (h // 2) * (w // 2), 4 * c)
        x = LayerNorm(1e-5, self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, kernel_init=dense_init,
                        dtype=self.dtype, name="reduction")(x)


class PatchUpsampling(nn.Module):
    """2x nearest upsampling -> Dense(C/2) (reference modules.py:294-314).

    Used by :class:`BasicLayerDecoder`; STrajNet itself decodes with
    :class:`~strajnet_tpu.models.decoder.Pyramid3DDecoder`.
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Dense(self.dim // 2, use_bias=False, kernel_init=dense_init,
                        dtype=self.dtype, name="up_emb")(x)


class BasicLayer(nn.Module):
    """One Swin stage: ``depth`` blocks alternating shift 0 / ws//2, then an
    optional PatchMerging downsample. Returns (x_down, pre-downsample res).

    Parity target: reference modules.py:317-364.
    """

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    downsample: bool = False
    use_pallas: Union[bool, str] = False
    # int (all stages), or a per-stage tuple indexed by stage
    windows_per_program: Union[int, Tuple[int, ...], None] = None
    samples_per_program: int = 1
    remat: bool = False
    spatial_shard: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        # remat: recompute each block's forward during the backward instead
        # of saving its LN/attention/MLP intermediates — the classic
        # FLOPs-for-HBM trade (the flagship 512^2 train step at batch 16
        # carries ~14 GB of temps; the encoder blocks are the bulk).
        block_cls = (nn.remat(SwinTransformerBlock, static_argnums=(2,))
                     if self.remat else SwinTransformerBlock)
        for i in range(self.depth):
            dp = (self.drop_path[i] if isinstance(self.drop_path, (list, tuple))
                  else self.drop_path)
            x = block_cls(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop, drop_path=dp,
                use_pallas=self.use_pallas,
                windows_per_program=self.windows_per_program,
                samples_per_program=self.samples_per_program,
                dtype=self.dtype, name=f"blocks{i}")(x, deterministic)
            if self.spatial_shard:
                # sp: tokens sharded over 'model' (row-major L = H*W, so
                # this is an H split; GSPMD adds the shifted-window halo
                # exchanges). See parallel/mesh.py::sharding_hint.
                from strajnet_tpu.parallel.mesh import sharding_hint
                x = sharding_hint(x, "data", "model", None)
        res = x
        if self.downsample:
            x = PatchMerging(self.input_resolution, self.dim, self.dtype,
                             name="downsample")(x)
        return x, res


class BasicLayerDecoder(nn.Module):
    """Swin upsampling stage with 1x1-conv residual skip.

    Capability parity with reference modules.py:366-414 (defined there but
    not instantiated by STrajNet).
    """

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    res_connection: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, res: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        x = PatchUpsampling(self.dim, self.dtype, name="upsample")(x)
        b, h, w, c = x.shape
        if self.res_connection:
            res = res.reshape(b, h, w, c)
            res = nn.Conv(self.dim // 2, (1, 1), kernel_init=dense_init,
                          dtype=self.dtype, name="conv_layer")(res)
            x = x + res
        x = x.reshape(b, h * w, c)
        x = LayerNorm(1e-5, self.dtype, name="norm")(x)
        for i in range(self.depth):
            dp = (self.drop_path[i] if isinstance(self.drop_path, (list, tuple))
                  else self.drop_path)
            x = SwinTransformerBlock(
                dim=self.dim // 2, input_resolution=(h, w),
                num_heads=self.num_heads, window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop, drop_path=dp,
                dtype=self.dtype, name=f"blocks{i}")(x, deterministic)
        return x.reshape(b, h, w, c)


class PatchEmbed(nn.Module):
    """Strided-conv patchify -> tokens (reference modules.py:417-446)."""

    patch_size: Tuple[int, int]
    embed_dim: int
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = nn.Conv(self.embed_dim, self.patch_size, strides=self.patch_size,
                    kernel_init=dense_init, dtype=self.dtype, name="proj")(x)
        x = x.reshape(-1, (h // self.patch_size[0]) * (w // self.patch_size[1]),
                      self.embed_dim)
        if self.use_norm:
            x = LayerNorm(1e-5, self.dtype, name="norm")(x)
        return x


def _center_crop_tokens(res: jax.Array, grid: int, dim: int) -> jax.Array:
    """Center-crops a token grid to its middle half (reference modules.py:617-622)."""
    c_b, c_e = grid // 4, (3 * grid) // 4
    crop = grid // 2
    res = res.reshape(-1, grid, grid, dim)[:, c_b:c_e, c_b:c_e, :]
    return res.reshape(-1, crop * crop, dim)


class SwinTransformerEncoder(nn.Module):
    """3-branch hierarchical encoder over OGM / map / flow rasters.

    Parity target: reference modules.py:448-628 at the STrajNet flags
    ``sep_encode=True, flow_sep=True, use_flow=True`` (modules.py:782-785).

    Returns ``res_list``; at the training config (512^2 OGM, depths [2,2,2]):
    ``[flow_res 64^2x96, res0 64^2x96, res1 32^2x192, res2 16^2x384]``.
    """

    img_size: Tuple[int, int] = (512, 512)
    patch_size: Tuple[int, int] = (4, 4)
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    sep_encode: bool = True
    no_map: bool = False
    flow_sep: bool = True
    use_flow: bool = True
    large_input: bool = True
    use_pallas: Union[bool, str] = False
    # int (all stages), or a per-stage tuple indexed by stage
    windows_per_program: Union[int, Tuple[int, ...], None] = None
    samples_per_program: int = 1
    remat: bool = False
    spatial_shard: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ogm: jax.Array, map_img: jax.Array,
                 flow: Optional[jax.Array] = None,
                 deterministic: bool = True):
        num_layers = len(self.depths)
        pr = (self.img_size[0] // self.patch_size[0],
              self.img_size[1] // self.patch_size[1])
        dpr = list(np.linspace(0.0, self.drop_path_rate, sum(self.depths)))
        dt = self.dtype

        def make_stage(i, name, downsample):
            # windows_per_program: one global width, or a per-stage
            # sequence indexed by stage (the flow branch shares stage 0's
            # geometry and entry).
            wpp = self.windows_per_program
            if isinstance(wpp, (tuple, list)):
                wpp = wpp[i] if i < len(wpp) else None
            return BasicLayer(
                dim=int(self.embed_dim * 2 ** i),
                input_resolution=(pr[0] // (2 ** i), pr[1] // (2 ** i)),
                depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=tuple(dpr[sum(self.depths[:i]):
                                    sum(self.depths[:i + 1])]),
                downsample=downsample, use_pallas=self.use_pallas,
                windows_per_program=wpp,
                samples_per_program=self.samples_per_program,
                remat=self.remat, spatial_shard=self.spatial_shard,
                dtype=dt, name=name)

        ogm = ogm.astype(dt)
        map_img = map_img.astype(dt)
        flow_x = flow_res = None

        if self.sep_encode:
            # vehicles channel; the ped/cyclist channel is split out but not
            # consumed in the flow_sep path (reference modules.py:572-587).
            vec = ogm[..., 0]
            if self.no_map:
                x = PatchEmbed(self.patch_size, self.embed_dim,
                               self.patch_norm, dt,
                               name="patch_embed_vehicle")(vec)
            elif self.flow_sep and self.use_flow:
                f = PatchEmbed(self.patch_size, self.embed_dim,
                               self.patch_norm, dt,
                               name="patch_embed_flow")(flow.astype(dt))
                f = LayerNorm(1e-5, dt, name="flow_norm")(f)
                flow_x, flow_res = make_stage(
                    0, "flow_layer", downsample=(num_layers > 1))(
                        f, deterministic)
                x = PatchEmbed(self.patch_size, self.embed_dim,
                               self.patch_norm, dt,
                               name="patch_embed_vehicle")(vec)
                maps = PatchEmbed(self.patch_size, self.embed_dim,
                                  self.patch_norm, dt,
                                  name="patch_embed_map")(map_img)
                if self.large_input:
                    # map raster covers the center half of the patch grid:
                    # zero-pad it out to the full grid (modules.py:582-587).
                    mg = pr[0] // 2
                    pad = pr[0] // 4
                    maps = maps.reshape(-1, mg, mg, self.embed_dim)
                    maps = jnp.pad(maps, ((0, 0), (pad, pad), (pad, pad),
                                          (0, 0)))
                    maps = maps.reshape(-1, pr[0] * pr[1], self.embed_dim)
                x = x + maps
            else:
                x = PatchEmbed(self.patch_size, self.embed_dim,
                               self.patch_norm, dt,
                               name="patch_embed_vehicle")(vec)
                if not self.no_map:
                    x = x + PatchEmbed(self.patch_size, self.embed_dim,
                                       self.patch_norm, dt,
                                       name="patch_embed_map")(map_img)
                if self.use_flow:
                    x = x + PatchEmbed(self.patch_size, self.embed_dim,
                                       self.patch_norm, dt,
                                       name="patch_embed_flow")(
                                           flow.astype(dt))
        else:
            b, h, w, t, cc = ogm.shape
            x = ogm.reshape(-1, h, w, t * cc)
            if not self.no_map and self.use_flow:
                x = jnp.concatenate([x, map_img, flow.astype(dt)], axis=-1)
            elif not self.use_flow:
                x = jnp.concatenate([x, map_img], axis=-1)
            x = PatchEmbed(self.patch_size, self.embed_dim, self.patch_norm,
                           dt, name="patch_embed_vehicle")(x)

        if self.ape:
            pos = self.param("absolute_pos_embed", nn.initializers.zeros,
                             (1, pr[0] * pr[1], self.embed_dim), jnp.float32)
            x = x + pos.astype(dt)

        x = LayerNorm(1e-5, dt, name="all_patch_norm")(x)

        res_list = []
        for i in range(num_layers):
            x, res = make_stage(i, f"layers{i}",
                                downsample=(i < num_layers - 1))(
                                    x, deterministic)
            if i == 0 and self.flow_sep and self.use_flow:
                x = x + flow_x
                if self.large_input:
                    flow_res = _center_crop_tokens(flow_res, pr[0],
                                                   self.embed_dim)
                res_list.append(flow_res)
            if self.large_input:
                init_res = pr[0] // (2 ** i)
                dim = self.embed_dim * (2 ** i)
                res = _center_crop_tokens(res, init_res, dim)
            res_list.append(res)
        return res_list
