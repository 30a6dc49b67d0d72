"""FPN-style 3D pyramid decoder over the waypoint axis.

Parity target: reference modules.py:630-772 (``Pyramid3DDecoder``).

Per decode step: 2x spatial upsampling of the [B, T, H, W, C] volume followed
by a time-shared Conv2D(3x3, elu). Pyramid skips repeat an encoder residual
over the 8 waypoints and fuse it through a Conv3D with kernel (T,1,1)
(temporal mixing). A separate 2-stage flow head branches off at the 64^2
level, seeded by the flow-stage residual through its own Conv3D.

TPU notes: time-shared Conv2D folds T into the batch axis; UpSampling3D is a
reshape-free ``jnp.repeat``; Conv3D(T,1,1) is expressed as a dense temporal
contraction (einsum over a [T_k, C_in, C_out] kernel) which is exactly the
same math but avoids XLA's generic 3D conv path.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from strajnet_tpu.ops.upconv import upsample2x_conv3x3

Dtype = Any
dense_init = nn.initializers.glorot_uniform()


def _upsample2x_time(x: jax.Array) -> jax.Array:
    """UpSampling3D(size=(1,2,2)): nearest 2x over H and W."""
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


class _ConvParams(nn.Module):
    """3x3 conv parameters with nn.Conv-compatible naming."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", dense_init,
                       (3, 3, self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class FusedUpConv(nn.Module):
    """UpSampling3D(1,2,2) + time-shared Conv2D(3x3, elu), fused.

    Same parameters (and param paths) as upsample + TimeSharedConv, computed
    via phase decomposition on the low-res grid (ops/upconv.py): ~2.25x fewer
    FLOPs and no 2x-materialized intermediate — this is the decoder's hot
    path (76% of forward time before fusion).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        kernel, bias = _ConvParams(self.features, c, name="conv")()
        y = upsample2x_conv3x3(x.reshape(b * t, h, w, c).astype(self.dtype),
                               kernel.astype(self.dtype),
                               bias)
        y = nn.elu(y)
        return y.reshape(b, t, 2 * h, 2 * w, self.features)


class TimeSharedConv(nn.Module):
    """Conv2D applied independently per waypoint (Keras Conv2D on 5D input)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        y = nn.Conv(self.features, self.kernel, padding="SAME",
                    kernel_init=dense_init, dtype=self.dtype, name="conv")(
                        x.reshape(b * t, h, w, c))
        y = nn.elu(y)
        return y.reshape(b, t, h, w, self.features)


class TemporalConv(nn.Module):
    """Conv3D with kernel (kt, 1, 1), SAME padding over time, elu.

    Equivalent to the reference's pyramid-skip Conv3D (modules.py:709-717)
    but lowered to MXU matmuls:

    - general input [B, T, H, W, C]: the temporal conv over a length-T axis
      is a dense banded (T_in x T_out) mixing matrix; one einsum with
      contraction dim T*C reads the input once;
    - time-constant input [B, 1, H, W, C] (the decoder's rep_res pyramid
      skips repeat one residual over all T waypoints): the band collapses
      exactly to per-output-step summed kernels — a single [C, T_out*F]
      matmul, kt-times fewer FLOPs.
    """

    features: int
    kt: int = 8
    num_steps: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t_in, h, w, c = x.shape
        t = self.num_steps
        kernel = self.param("kernel", dense_init, (self.kt, c, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        pad_lo = (self.kt - 1) // 2

        # band[dt_k, to] = 1 where tap dt_k of output step `to` hits a valid
        # input step ti = to + dt_k - pad_lo.
        ti_of = (np.arange(self.kt)[:, None] + np.arange(t)[None, :]
                 - pad_lo)  # [kt, T_out]

        if t_in == 1:
            # summed kernel per output step: K_sum[to] = sum_valid k[dt]
            valid = ((ti_of >= 0) & (ti_of < t)).astype(np.float32)
            ksum = jnp.einsum("kcf,ko->ocf", kernel, jnp.asarray(valid))
            y = jnp.einsum("bhwc,ocf->bohwf", x[:, 0].astype(self.dtype),
                           ksum.astype(self.dtype))
        else:
            assert t_in == t, (t_in, t)
            # dense temporal mixing: W2[ti, to, c, f]
            w2 = np.zeros((t, t, 1, 1), np.float32)
            kidx = np.zeros((t, t), np.int32)
            mask = np.zeros((t, t), np.float32)
            for dt in range(self.kt):
                for to in range(t):
                    ti = to + dt - pad_lo
                    if 0 <= ti < t:
                        kidx[ti, to] = dt
                        mask[ti, to] = 1.0
            wfull = (kernel[jnp.asarray(kidx)] *
                     jnp.asarray(mask)[..., None, None])  # [T,T,C,F]
            y = jnp.einsum("bihwc,iocf->bohwf", x.astype(self.dtype),
                           wfull.astype(self.dtype))
        y = y + bias.astype(self.dtype)
        return nn.elu(y)


class ConvLSTM2D(nn.Module):
    """Minimal ConvLSTM over the waypoint axis (reference conv_cnn/sep_conv
    decoder variants, modules.py:652-659,681-684 — dead in the training
    config but part of the component inventory).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        conv_x = nn.Conv(4 * self.features, self.kernel, padding="SAME",
                         kernel_init=dense_init, dtype=self.dtype,
                         name="conv_x")
        conv_h = nn.Conv(4 * self.features, self.kernel, padding="SAME",
                         use_bias=False, kernel_init=nn.initializers.orthogonal(),
                         dtype=self.dtype, name="conv_h")

        # Keras ConvLSTM2D(activation='elu'): elu replaces tanh for the cell
        # candidate/output activations; gates stay sigmoid.
        def step(carry, xt):
            hprev, cprev = carry
            gates = conv_x(xt) + conv_h(hprev)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            cnew = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * nn.elu(g)
            hnew = jax.nn.sigmoid(o) * nn.elu(cnew)
            return (hnew, cnew), hnew

        h0 = jnp.zeros((b, h, w, self.features), self.dtype)
        carry = (h0, h0)
        outs = []
        for k in range(t):
            carry, y = step(carry, x[:, k])
            outs.append(y)
        return jnp.stack(outs, axis=1)


class _TailParams(nn.Module):
    """Parameter shell matching FusedUpConv's tree (``<name>/conv/{kernel,
    bias}``) so the fused-tail path stays checkpoint-compatible with the
    module-based path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _ConvParams(self.features, self.in_features, name="conv")()


def _tail_fn(mode):
    # Lazy import: keep Mosaic/pallas machinery off the import path of
    # CPU-only runs (same convention as models/swin.py's kernel branches).
    from strajnet_tpu.ops.pallas_decoder_tail import (decoder_tail,
                                                      decoder_tail_phase,
                                                      decoder_tail_xla)

    return {
        False: decoder_tail_xla, None: decoder_tail_xla,
        "xla": decoder_tail_xla, "phase": decoder_tail_phase,
        True: decoder_tail, "kernel": decoder_tail,
    }[mode]


def _tail_supports(*args) -> bool:
    from strajnet_tpu.ops.pallas_decoder_tail import supports

    return supports(*args)


def _apply_tail(x5: jax.Array, ku: jax.Array, kb: jax.Array,
                ko: jax.Array, bo: jax.Array, dt: Dtype,
                mode) -> jax.Array:
    """Last upconv + elu + output conv of one branch, from raw params.

    ``mode`` selects the formulation (all mathematically identical, see
    ops/pallas_decoder_tail.py): False/"xla" the naive composition (the
    default — fastest IN-MODEL), "phase" the offset-grid form (wins
    isolated, 5.69 vs 6.17 ms, but regressed the full forward ~7 ms/batch
    on v5e — PARITY.md), True/"kernel" the Pallas kernel (measured 17.4 ms
    isolated; recorded negative)."""
    b, t, h, w, c = x5.shape
    xf = x5.reshape(b * t, h, w, c).astype(dt)
    y = _tail_fn(mode)(xf, ku, kb, ko, bo)
    return y.reshape(b, t, 2 * h, 2 * w, ko.shape[-1])


class Pyramid3DDecoder(nn.Module):
    use_pyramid: bool = True
    shallow_decode: int = 1
    flow_sep_decode: bool = True
    conv_cnn: bool = False
    sep_conv: bool = False
    rep_res: bool = True
    stp_grad: bool = False
    num_waypoints: int = 8
    bottleneck_size: Tuple[int, int] = (16, 16)
    dtype: Dtype = jnp.float32
    # Tail formulation: False/"xla" naive composition (default),
    # "phase" offset-grid form, True/"kernel" Pallas kernel, "infer" ->
    # kernel only when deterministic. See _apply_tail.
    use_tail_kernel: Any = False
    # sp: annotate the [B,T,H,W,C] volumes H-sharded over 'model' under an
    # active mesh (parallel/mesh.py::sharding_hint).
    spatial_shard: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, res_list: Optional[List[jax.Array]] = None,
                 deterministic: bool = True) -> jax.Array:
        dt = self.dtype
        decode_inds = [4, 3, 2, 1, 0][self.shallow_decode:]
        decoder_channels = [48, 96, 128, 192, 384]
        t = self.num_waypoints
        x = x.astype(dt)

        if self.stp_grad:
            x = jax.lax.stop_gradient(x)

        flow_res = None
        if self.flow_sep_decode and res_list is not None:
            flow_res = res_list[0]
            res_list = res_list[1:]

        ind_list = [2, 1, 0][self.shallow_decode:]
        # spatial sizes of the pyramid skips, derived from the bottleneck
        reshape_dim = [self.bottleneck_size[0] * (2 ** (k + 1))
                       for k in range(len(ind_list))]

        tail_mode = self.use_tail_kernel
        if tail_mode == "infer":
            tail_mode = deterministic

        # Peel the last occ stage (always a FusedUpConv at out_dim == 2)
        # off the loop so it can fuse with the output conv — param tree
        # and numerics are unchanged when the kernel is off.
        occ_inds = decode_inds
        occ_tail_di = None
        if self.flow_sep_decode and not (self.conv_cnn
                                         and len(decode_inds) == 1):
            occ_tail_di = decode_inds[-1]
            occ_inds = decode_inds[:-1]

        def _sp(v):
            if not self.spatial_shard or v is None:
                return v
            from strajnet_tpu.parallel.mesh import sharding_hint
            return sharding_hint(v, "data", None, "model", None, None)

        flow_x = None
        for i, di in enumerate(occ_inds):
            if self.conv_cnn and i == 0:
                x = _upsample2x_time(x)
                x = ConvLSTM2D(decoder_channels[di], dtype=dt,
                               name=f"uplstmconv_{di}_0")(x)
            else:
                x = FusedUpConv(decoder_channels[di], dtype=dt,
                                name=f"upconv_{di}_0")(x)
            x = _sp(x)

            if self.use_pyramid and res_list is not None and i <= len(ind_list) - 1:
                res = res_list[ind_list[i]]
                hdim = res.shape[-1]
                if self.rep_res:
                    # time-constant skip: let TemporalConv use its collapsed
                    # single-matmul path instead of repeating T times.
                    res = res.astype(dt).reshape(
                        -1, 1, reshape_dim[i], reshape_dim[i], hdim)
                else:
                    res = res.astype(dt).reshape(
                        -1, t, reshape_dim[i], reshape_dim[i], hdim)
                if self.stp_grad:
                    res = jax.lax.stop_gradient(res)
                x = x + TemporalConv(decoder_channels[di], t, t, dtype=dt,
                                     name=f"resconv_{di}")(res)

            if (self.flow_sep_decode and res_list is not None
                    and i == len(ind_list) - 1):
                fdim = flow_res.shape[-1]
                fr = flow_res.astype(dt).reshape(
                    -1, 1, reshape_dim[-1], reshape_dim[-1], fdim)
                flow_x = x + TemporalConv(128, t, t, dtype=dt,
                                          name="resconv_f")(fr)

        out_dim = 2 if self.flow_sep_decode else 4
        if occ_tail_di is not None:
            feat = decoder_channels[occ_tail_di]
            _, _, hh, ww, cc = x.shape
            ku, kb = _TailParams(feat, cc, name=f"upconv_{occ_tail_di}_0")()
            ko, bo = _ConvParams(out_dim, feat, name="outconv")()
            mode = tail_mode
            if mode in (True, "kernel") and not _tail_supports(
                    hh, ww, cc, feat, out_dim):
                mode = False
            y = _apply_tail(x, ku, kb, ko, bo, dt, mode)
        else:
            b, _, h, w, c = x.shape
            y = nn.Conv(out_dim, (3, 3), padding="SAME",
                        kernel_init=dense_init, dtype=dt, name="outconv")(
                            x.reshape(b * t, h, w, c))
            y = y.reshape(b, t, h, w, out_dim)

        if self.flow_sep_decode:
            f = flow_x
            fl_inds = list(decode_inds[-2:])
            flow_tail_di = None
            if not (self.sep_conv and len(fl_inds) == 1):
                flow_tail_di = fl_inds[-1]
                fl_inds = fl_inds[:-1]
            for j, di in enumerate(fl_inds):
                if self.sep_conv and j == 0:
                    f = _upsample2x_time(f)
                    f = ConvLSTM2D(96, dtype=dt, name=f"upconvf_{di}_0")(f)
                else:
                    f = FusedUpConv(decoder_channels[di], dtype=dt,
                                    name=f"upconvf_{di}_0")(f)
                f = _sp(f)
            if flow_tail_di is not None:
                featf = decoder_channels[flow_tail_di]
                _, _, hf, wf, cf = f.shape
                ku2, kb2 = _TailParams(featf, cf,
                                       name=f"upconvf_{flow_tail_di}_0")()
                ko2, bo2 = _ConvParams(2, featf, name="outconv_f")()
                mode2 = tail_mode
                if mode2 in (True, "kernel") and not _tail_supports(
                        hf, wf, cf, featf, 2):
                    mode2 = False
                fo = _apply_tail(f, ku2, kb2, ko2, bo2, dt, mode2)
            else:
                bf, _, hf, wf, cf = f.shape
                fo = nn.Conv(2, (3, 3), padding="SAME",
                             kernel_init=dense_init, dtype=dt,
                             name="outconv_f")(f.reshape(bf * t, hf, wf, cf))
                fo = fo.reshape(bf, t, hf, wf, 2)
            y = jnp.concatenate([y, fo], axis=-1)

        return y
