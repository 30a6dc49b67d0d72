"""STrajNet top-level model (parity target: reference modules.py:777-839).

Wiring: Swin encoder -> optional FG-MSA over the bottleneck -> waypoint-
repeated query (+ optional flow-reference injection) -> per-waypoint
trajectory cross-attention -> 3D pyramid decoder -> waypoint-major output
[B, H, W, T*4] with channel k*4+{0: observed, 1: occluded, 2: dx, 3: dy}.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from strajnet_tpu.config import ModelConfig
from strajnet_tpu.models.decoder import Pyramid3DDecoder
from strajnet_tpu.models.fgmsa import FGMSA
from strajnet_tpu.models.swin import SwinTransformerEncoder
from strajnet_tpu.models.trajnet import TrajNetCrossAttention


def resolve_kernel_knobs(cfg: ModelConfig):
    """Resolves the None=AUTO kernel knobs against the active backend.

    Returns ``(use_pallas, windows_per_program, samples_per_program)``:
    on TPU the fused block kernels with the measured v5e optimum
    wpp=2/spp=8 (PARITY.md "Strip-width sweep"); elsewhere pure XLA with
    full-row strips (narrow strips multiply the CPU interpreter's grid
    steps). Explicit config values pass through unchanged (<=0 = full
    row at the kernel layer). This is THE source of truth for the
    kernel defaults the README points at."""
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = cfg.use_pallas_attention
    if use_pallas is None:
        use_pallas = "block" if on_tpu else False
    wpp = cfg.pallas_windows_per_program
    if wpp is None:
        wpp = 2 if on_tpu else 0
    spp = cfg.pallas_samples_per_program
    if spp is None:
        spp = 8 if on_tpu else 1
    return use_pallas, wpp, spp


class STrajNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, ogm: jax.Array, map_img: jax.Array,
                 obs: Optional[jax.Array] = None,
                 occ: Optional[jax.Array] = None,
                 mapt: Optional[jax.Array] = None,
                 flow: Optional[jax.Array] = None,
                 training: bool = False) -> jax.Array:
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        deterministic = not training
        t = cfg.num_waypoints
        bh, bw = cfg.bottleneck_size
        bd = cfg.bottleneck_dim

        # None = auto on TPU backends (the CPU fallback would run
        # interpreted): the fully fused block kernel for BOTH paths. The
        # round-1..3 batch-16 training crash (kernel backward + warp-gather
        # kernel co-occurring in one program) was resolved in round 4 by
        # batching the loss warps into one launch — full bisect + the
        # refuted candidates in PARITY.md. Measured at batch 16 flagship:
        # block 222.8 ms/step vs 264.7 pure-XLA (attn 242.8). Escape
        # hatches stay: use_pallas_attention=False / --pallas off, and
        # LossConfig.warp_kernel=False for the loss-warp route.
        use_pallas, wpp, spp = resolve_kernel_knobs(cfg)

        res_list = SwinTransformerEncoder(
            img_size=cfg.input_size,
            patch_size=(cfg.patch_size, cfg.patch_size),
            embed_dim=cfg.embed_dim, depths=cfg.depths,
            num_heads=cfg.num_heads, window_size=cfg.window_size,
            mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            drop_rate=cfg.drop_rate, attn_drop_rate=cfg.attn_drop_rate,
            drop_path_rate=cfg.drop_path_rate, ape=cfg.ape,
            patch_norm=cfg.patch_norm, sep_encode=cfg.sep_encode,
            no_map=cfg.no_map, flow_sep=cfg.flow_sep, use_flow=cfg.use_flow,
            large_input=cfg.large_input,
            use_pallas=use_pallas,
            windows_per_program=wpp,
            samples_per_program=spp,
            remat=cfg.remat_encoder,
            spatial_shard=cfg.spatial_shard, dtype=dt,
            name="encoder")(ogm, map_img, flow, deterministic)

        q = res_list[-1]  # [B, bh*bw, bd]

        ref = None
        if cfg.fg_msa:
            q = q.reshape(-1, bh, bw, bd)
            res, pos, ref = FGMSA(
                q_size=(bh, bw), kv_size=(bh, bw), n_heads=cfg.fgmsa_heads,
                n_head_channels=cfg.fgmsa_head_channels,
                n_groups=cfg.fgmsa_groups, out_dim=bd, in_dim=bd,
                fg=cfg.fg, deform_kv=cfg.deform_kv, dtype=dt,
                name="fg_msa_layer")(q, deterministic=deterministic)
            q = res + q
            q = q.reshape(-1, bh * bw, bd)

        query = jnp.repeat(q[:, None], t, axis=1)  # [B, T, N, D]
        if cfg.fg_msa and cfg.fg:
            # Project per-group flow features onto the waypoint axis
            # (reference modules.py:828-831: n_groups is reused as T).
            query = ref.reshape(-1, t, bh * bw, bd) + query

        obs_value = TrajNetCrossAttention(
            pic_size=(bh, bw), pic_dim=bd, obs_actors=cfg.obs_actors,
            occ_actors=cfg.occ_actors, traj_heads=cfg.traj_heads,
            att_heads=cfg.att_heads, out_dim=cfg.traj_out_dim,
            actor_only=cfg.actor_only, sep_actors=cfg.sep_actors,
            num_waypoints=t, map_points=cfg.map_points, dtype=dt,
            name="trajnet_attn")(query, obs, occ, mapt, deterministic)

        # None = auto: the naive XLA tail (fastest in-model on v5e). The
        # "phase" offset-grid form and the Pallas kernel stay selectable
        # as recorded experiments (PARITY.md).
        use_tail = cfg.use_pallas_decoder_tail
        if use_tail is None:
            use_tail = False

        y = Pyramid3DDecoder(
            use_pyramid=cfg.use_pyramid, shallow_decode=cfg.shallow_decode,
            flow_sep_decode=cfg.flow_sep_decode, conv_cnn=cfg.conv_cnn,
            sep_conv=cfg.sep_conv,
            rep_res=cfg.rep_res, stp_grad=cfg.stp_grad, num_waypoints=t,
            bottleneck_size=(bh, bw), dtype=dt, use_tail_kernel=use_tail,
            spatial_shard=cfg.spatial_shard,
            name="decoder")(obs_value, res_list, deterministic)

        # [B, T, H, W, 4] -> waypoint-major channels [B, H, W, T*4]
        _, _, oh, ow, c = y.shape
        y = jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(-1, oh, ow, t * c)
        return y.astype(jnp.float32)


def build_model(cfg: ModelConfig) -> STrajNet:
    return STrajNet(cfg=cfg)


def dummy_inputs(cfg: ModelConfig, batch: int = 1, dtype=jnp.float32):
    """Zero inputs with the exact parsed-TFRecord shapes (train.py:85-103)."""
    h, w = cfg.input_size
    mh, mw = cfg.map_size
    return dict(
        ogm=jnp.zeros((batch, h, w, cfg.ogm_past_steps, cfg.ogm_classes),
                      dtype),
        map_img=jnp.zeros((batch, mh, mw, 3), dtype),
        obs=jnp.zeros((batch, cfg.obs_actors, cfg.actor_steps,
                       cfg.actor_feats), dtype),
        occ=jnp.zeros((batch, cfg.occ_actors, cfg.actor_steps,
                       cfg.actor_feats), dtype),
        mapt=jnp.zeros((batch, cfg.map_segments, cfg.map_points,
                        cfg.map_feats), dtype),
        flow=jnp.zeros((batch, h, w, 2), dtype),
    )
