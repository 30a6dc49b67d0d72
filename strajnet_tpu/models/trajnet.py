"""Vectorized trajectory / map encoders + cross-attention fusion.

Parity target: reference trajNet.py (MapEncoder:7, TrajEncoder:29,
TrajEncoderLSTM:50, Cross_Attention:65, TrajNet:91, Cross_AttentionT:189,
TrajNetCrossAttention:236).

TPU-first deviations from the reference:

- the reference encodes 48+16 actors with a *Python loop* of 64 sequential
  encoder calls (trajNet.py:128-133); here all actors fold into the batch
  axis and run as one fused program;
- the 8 per-waypoint cross-attention layers (trajNet.py:257,305-314) are
  expressed with ``nn.vmap`` over the waypoint axis: independent parameters
  per waypoint (weight parity) but a single batched einsum program.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from strajnet_tpu.ops.attention import TfaMultiHeadAttention

Dtype = Any
dense_init = nn.initializers.glorot_uniform()


class _PointNetEncoder(nn.Module):
    """Shared polyline/track encoder pattern.

    Conv1D(64) over the first ``num_geom_feats`` features -> tfa-style MHA
    with an outer-product validity mask -> masked global max-pool -> concat a
    Dense(64) "vector feature" of the one-hot type features at step 0 ->
    Dense(out_dim, elu). Parity: reference trajNet.py:7-48.
    """

    num_geom_feats: int
    num_heads: int
    mha_out: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: jax.Array, mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        dt = self.dtype
        inputs = inputs.astype(dt)
        m = mask.astype(jnp.int32)
        attn_mask = m[:, :, None] * m[:, None, :]
        nodes = nn.Conv(64, (1,), kernel_init=dense_init, dtype=dt,
                        name="node_feature")(
                            inputs[:, :, :self.num_geom_feats])
        nodes = nn.elu(nodes)
        nodes = TfaMultiHeadAttention(
            num_heads=self.num_heads, head_size=64, output_size=self.mha_out,
            dropout=0.1, dtype=dt, name="node_attention")(
                nodes, nodes, nodes, mask=attn_mask,
                deterministic=deterministic)
        nodes = jnp.max(nodes, axis=1)  # GlobalMaxPooling1D
        vector = nn.Dense(64, use_bias=False, kernel_init=dense_init,
                          dtype=dt, name="vector_feature")(
                              inputs[:, 0, self.num_geom_feats:])
        out = jnp.concatenate([nodes, vector], axis=1)
        out = nn.Dense(self.out_dim, kernel_init=dense_init, dtype=dt,
                       name="sublayer")(out)
        return nn.elu(out)


class MapEncoder(nn.Module):
    """Centerline-segment encoder (reference trajNet.py:7-26)."""

    num_heads: int = 4
    out_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask, deterministic: bool = True):
        return _PointNetEncoder(num_geom_feats=4, num_heads=self.num_heads,
                                mha_out=64 * 4, out_dim=self.out_dim,
                                dtype=self.dtype, name="enc")(
                                    inputs, mask, deterministic)


class TrajEncoder(nn.Module):
    """Agent-track encoder (reference trajNet.py:29-48)."""

    num_heads: int = 4
    out_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask, deterministic: bool = True):
        return _PointNetEncoder(num_geom_feats=5, num_heads=self.num_heads,
                                mha_out=64 * 5, out_dim=self.out_dim,
                                dtype=self.dtype, name="enc")(
                                    inputs, mask, deterministic)


class TrajEncoderLSTM(nn.Module):
    """LSTM track encoder (capability parity; reference trajNet.py:50-62)."""

    out_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask=None, deterministic: bool = True):
        x = nn.Conv(64, (1,), kernel_init=dense_init, dtype=self.dtype,
                    name="embed")(inputs.astype(self.dtype))
        x = nn.elu(x)
        lstm = nn.OptimizedLSTMCell(self.out_dim, dtype=self.dtype)
        carry = lstm.initialize_carry(jax.random.PRNGKey(0),
                                      x[:, 0].shape)
        def step(carry, xt):
            carry, y = lstm(carry, xt)
            return carry, y
        carry, ys = nn.scan(
            lambda mdl, c, xs: mdl(c, xs), variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1)(
                lstm, carry, x)
        return ys[:, -1]


class CrossAttention(nn.Module):
    """Post-LN cross-attention block (reference trajNet.py:65-87):
    MHA -> LN -> FFN(4x, elu) -> Dense -> LN. No internal residual.
    """

    num_heads: int
    key_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, mask=None, deterministic: bool = True):
        dt = self.dtype
        v = TfaMultiHeadAttention(
            num_heads=self.num_heads, head_size=self.key_dim // self.num_heads,
            output_size=self.key_dim, dropout=0.1, dtype=dt, name="mha")(
                query, key, mask=mask, deterministic=deterministic)
        v = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="norm1")(
            v.astype(jnp.float32)).astype(dt)
        v = nn.Dense(4 * self.key_dim, kernel_init=dense_init, dtype=dt,
                     name="FFN1")(v)
        v = nn.elu(v)
        v = nn.Dropout(0.1)(v, deterministic=deterministic)
        v = nn.Dense(self.key_dim, kernel_init=dense_init, dtype=dt,
                     name="FFN2")(v)
        v = nn.Dropout(0.1)(v, deterministic=deterministic)
        v = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="norm2")(
            v.astype(jnp.float32)).astype(dt)
        return v


class CrossAttentionT(nn.Module):
    """Cross-attention block with distinct key/output dims and optional
    pre-stage actor self-attention (reference trajNet.py:189-234).
    """

    num_heads: int
    key_dim: int
    output_dim: int
    sep_actors: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, mask, deterministic: bool = True,
                 actor_mask=None):
        dt = self.dtype
        if self.sep_actors:
            org = key
            k = TfaMultiHeadAttention(
                num_heads=self.num_heads,
                head_size=self.key_dim // self.num_heads,
                output_size=self.key_dim, dropout=0.1, dtype=dt,
                name="actor_mha")(key, key, mask=actor_mask,
                                  deterministic=deterministic)
            k = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                             name="actor_norm")(
                                 k.astype(jnp.float32)).astype(dt)
            k = nn.Dense(4 * self.key_dim, kernel_init=dense_init, dtype=dt,
                         name="aFFN1")(k)
            k = nn.elu(k)
            k = nn.Dropout(0.1)(k, deterministic=deterministic)
            k = nn.Dense(self.output_dim, kernel_init=dense_init, dtype=dt,
                         name="aFFN2")(k)
            k = nn.Dropout(0.1)(k, deterministic=deterministic)
            key = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                               name="actor_norm2")(
                                   (k + org).astype(jnp.float32)).astype(dt)
        v = TfaMultiHeadAttention(
            num_heads=self.num_heads, head_size=self.key_dim // self.num_heads,
            output_size=self.key_dim, dropout=0.1, dtype=dt, name="mha")(
                query, key, mask=mask, deterministic=deterministic)
        v = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="norm1")(
            v.astype(jnp.float32)).astype(dt)
        v = nn.Dense(4 * self.key_dim, kernel_init=dense_init, dtype=dt,
                     name="FFN1")(v)
        v = nn.elu(v)
        v = nn.Dropout(0.1)(v, deterministic=deterministic)
        v = nn.Dense(self.output_dim, kernel_init=dense_init, dtype=dt,
                     name="FFN2")(v)
        v = nn.Dropout(0.1)(v, deterministic=deterministic)
        v = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="norm2")(
            v.astype(jnp.float32)).astype(dt)
        return v


class TrajNet(nn.Module):
    """Actor interaction encoder (reference trajNet.py:91-187).

    Encodes observed+occluded actor tracks (batched, not looped), adds a
    learned segment embedding of the fixed obs/occ binary code, runs one
    masked self/cross-attention over all actors, and returns per-group
    LayerNorm'd features plus the actor validity mask.
    """

    obs_actors: int = 48
    occ_actors: int = 16
    traj_heads: int = 4
    att_heads: int = 6
    out_dim: int = 384
    no_attn: bool = False
    double_net: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs_traj: jax.Array, occ_traj: jax.Array,
                 deterministic: bool = True):
        dt = self.dtype
        b = obs_traj.shape[0]
        n_obs, n_occ = self.obs_actors, self.occ_actors
        steps, feats = obs_traj.shape[2], obs_traj.shape[3]

        encoder = TrajEncoder(num_heads=self.traj_heads, out_dim=self.out_dim,
                              dtype=dt, name="traj_encoder")

        # Validity: feature-0 nonzero per (actor, step) (trajNet.py:127,131).
        obs_mask = obs_traj[..., 0] != 0  # [B, n_obs, T]
        occ_mask = occ_traj[..., 0] != 0  # [B, n_occ, T]

        # Fold actors into the batch axis: one fused encoder call replaces the
        # reference's 64 sequential calls (trajNet.py:128-133).
        all_traj = jnp.concatenate([obs_traj, occ_traj], axis=1)
        all_mask = jnp.concatenate([obs_mask, occ_mask], axis=1)
        enc = encoder(all_traj.reshape(b * (n_obs + n_occ), steps, feats),
                      all_mask.reshape(b * (n_obs + n_occ), steps),
                      deterministic)
        enc = enc.reshape(b, n_obs + n_occ, self.out_dim)
        obs, occ = enc[:, :n_obs], enc[:, n_obs:]

        # Learned segment embedding of the fixed [48x(1,0); 16x(0,1)] code
        # (trajNet.py:119-120,135-136).
        bi = np.repeat(np.array([[1.0, 0.0], [0.0, 1.0]], np.float32),
                       [n_obs, n_occ], axis=0)
        embed = nn.Dense(self.out_dim, use_bias=False, kernel_init=dense_init,
                         dtype=dt, name="seg_embed")(jnp.asarray(bi, dt))
        embed = jnp.broadcast_to(embed[None], (b,) + embed.shape)

        # Actor-level validity: any valid step (trajNet.py:138-139).
        c_attn_mask = (jnp.sum(all_mask.astype(jnp.int32), -1) != 0)
        c_attn_mask = c_attn_mask.astype(jnp.int32)  # [B, 64]

        if self.no_attn:
            if self.double_net:
                concat = jnp.concatenate([obs, occ], axis=1)
                o1 = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                                  name="obs_norm")(
                    (concat + embed).astype(jnp.float32)).astype(dt)
                o2 = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                                  name="occ_norm")(
                    (concat + embed).astype(jnp.float32)).astype(dt)
                return o1, o2, c_attn_mask
            o1 = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                              name="obs_norm")(
                (obs + embed[:, :n_obs]).astype(jnp.float32)).astype(dt)
            o2 = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                              name="occ_norm")(
                (occ + embed[:, n_obs:]).astype(jnp.float32)).astype(dt)
            return o1, o2, c_attn_mask

        concat = jnp.concatenate([obs, occ], axis=1)
        concat = c_attn_mask[:, :, None].astype(dt) * concat
        query = concat + embed
        attn_mask = c_attn_mask[:, :, None] * c_attn_mask[:, None, :]

        if self.double_net:
            val = CrossAttentionT(self.att_heads, 192, self.out_dim, dtype=dt,
                                  name="cross_attention_0")(
                query, concat, attn_mask, deterministic)
            val_f = CrossAttentionT(self.att_heads, 192, self.out_dim,
                                    dtype=dt, name="cross_attention_1")(
                query, concat, attn_mask, deterministic)
            obs2 = obs + val[:, :n_obs]
            occ2 = occ + val[:, n_obs:]
            ogm = jnp.concatenate([obs2, occ2], axis=1) + embed
            flow = (jnp.concatenate([obs2 + val_f[:, :n_obs],
                                     occ2 + val_f[:, n_obs:]], axis=1)
                    + embed)
            o1 = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                              name="obs_norm")(
                ogm.astype(jnp.float32)).astype(dt)
            o2 = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                              name="occ_norm")(
                flow.astype(jnp.float32)).astype(dt)
            return o1, o2, c_attn_mask

        val = CrossAttention(self.att_heads, self.out_dim, dtype=dt,
                             name="cross_attention")(
            query, concat, attn_mask, deterministic)
        obs = obs + val[:, :n_obs]
        occ = occ + val[:, n_obs:]
        obs = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="obs_norm")(
            (obs + embed[:, :n_obs]).astype(jnp.float32)).astype(dt)
        occ = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="occ_norm")(
            (occ + embed[:, n_obs:]).astype(jnp.float32)).astype(dt)
        return obs, occ, c_attn_mask


class TrajNetCrossAttention(nn.Module):
    """Per-waypoint fusion of the visual query with actor features.

    Parity target: reference trajNet.py:236-319. The 8 independent
    ``Cross_AttentionT`` layers are vmapped over the waypoint axis.
    """

    pic_size: Tuple[int, int] = (16, 16)
    pic_dim: int = 384
    obs_actors: int = 48
    occ_actors: int = 16
    traj_heads: int = 4
    att_heads: int = 6
    out_dim: int = 384
    actor_only: bool = True
    sep_actors: bool = False
    multi_modal: bool = True
    num_waypoints: int = 8
    map_points: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pic_encode: jax.Array, obs_traj: jax.Array,
                 occ_traj: jax.Array, map_traj: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        dt = self.dtype
        h, w = self.pic_size
        t = self.num_waypoints

        obs, occ, traj_mask = TrajNet(
            obs_actors=self.obs_actors, occ_actors=self.occ_actors,
            traj_heads=self.traj_heads, att_heads=self.att_heads,
            out_dim=self.out_dim, no_attn=self.sep_actors, dtype=dt,
            name="traj_net")(obs_traj, occ_traj, deterministic)

        actor_mask = None
        if self.sep_actors:
            actor_mask = traj_mask[:, :, None] * traj_mask[:, None, :]

        flat = pic_encode.reshape(-1, t, h * w, self.pic_dim).astype(dt)
        pic_mask = jnp.ones_like(flat[:, 0, :, 0], jnp.int32)
        obs_attn_mask = pic_mask[:, :, None] * traj_mask[:, None, :]
        key = jnp.concatenate([obs, occ], axis=1)

        # One Cross_AttentionT per waypoint, batched via nn.vmap: parameters
        # stack over the waypoint axis, computation fuses into one program.
        PerWaypoint = nn.vmap(
            CrossAttentionT,
            in_axes=(1, None, None, None, None), out_axes=1,
            variable_axes={"params": 0}, split_rngs={"params": True,
                                                     "dropout": True})
        o = PerWaypoint(num_heads=3, key_dim=128, output_dim=self.pic_dim,
                        sep_actors=self.sep_actors, dtype=dt,
                        name="cross_attn_obs")(
            flat, key, obs_attn_mask, deterministic, actor_mask)
        v = o + flat

        if not self.actor_only:
            segs = map_traj.shape[1]
            map_mask = (map_traj[..., 0] != 0)  # [B, segs, pts]
            amap_mask = map_mask.reshape(-1, self.map_points)
            mt = map_traj.reshape(-1, self.map_points, map_traj.shape[-1])
            map_enc = MapEncoder(num_heads=self.traj_heads,
                                 out_dim=self.out_dim, dtype=dt,
                                 name="map_encoder")(mt, amap_mask,
                                                     deterministic)
            map_enc = map_enc.reshape(-1, segs, self.out_dim)
            map_enc = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32,
                                   name="map_norm")(
                map_enc.astype(jnp.float32)).astype(dt)
            map_mask_seg = map_mask[:, :, 0].astype(jnp.int32)
            map_attn_mask = pic_mask[:, :, None] * map_mask_seg[:, None, :]
            MapPerWaypoint = nn.vmap(
                CrossAttentionT,
                in_axes=(1, None, None, None, None), out_axes=1,
                variable_axes={"params": 0}, split_rngs={"params": True,
                                                         "dropout": True})
            mv = MapPerWaypoint(num_heads=3, key_dim=128,
                                output_dim=self.pic_dim,
                                sep_actors=self.sep_actors, dtype=dt,
                                name="map_cross_attn")(
                o, map_enc, map_attn_mask, deterministic, None)
            v = mv + o + flat

        return v.reshape(-1, t, h, w, self.pic_dim)
