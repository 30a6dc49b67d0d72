"""Capability tests for reference config variants beyond the training flags:
map cross-attention (actor_only=False), sep_actors, double_net, no_map,
non-large input, LSTM encoder, ConvLSTM decoder, deform_kv."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.config import TINY_MODEL_CONFIG
from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs
from strajnet_tpu.models.trajnet import TrajEncoderLSTM, TrajNet


def _build_and_run(cfg, batch=1):
    model = STrajNet(cfg=cfg)
    inputs = dummy_inputs(cfg, batch=batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(params, **inputs)
    oh, ow = cfg.output_size
    assert out.shape == (batch, oh, ow, cfg.num_waypoints * 4)
    return out


def test_actor_only_false_map_cross_attention():
    cfg = dataclasses.replace(TINY_MODEL_CONFIG, actor_only=False)
    _build_and_run(cfg)


def test_sep_actors_variant():
    cfg = dataclasses.replace(TINY_MODEL_CONFIG, sep_actors=True)
    _build_and_run(cfg)


def test_conv_lstm_decoder_variant():
    cfg = dataclasses.replace(TINY_MODEL_CONFIG, conv_cnn=True)
    _build_and_run(cfg)


def test_sep_conv_flow_head_variant():
    """ConvLSTM first stage of the flow head (reference modules.py:681-684),
    selectable from the top-level config."""
    cfg = dataclasses.replace(TINY_MODEL_CONFIG, sep_conv=True)
    _build_and_run(cfg)


def test_deform_kv_variant_differs_from_compat():
    cfg_compat = TINY_MODEL_CONFIG
    cfg_deform = dataclasses.replace(TINY_MODEL_CONFIG, deform_kv=True)
    m1, m2 = STrajNet(cfg=cfg_compat), STrajNet(cfg=cfg_deform)
    inputs = dummy_inputs(cfg_compat, batch=1)
    rng = np.random.RandomState(0)
    inputs["ogm"] = jnp.asarray(
        (rng.rand(*inputs["ogm"].shape) > 0.7).astype(np.float32))
    inputs["flow"] = jnp.asarray(
        rng.randn(*inputs["flow"].shape).astype(np.float32))
    params = m1.init(jax.random.PRNGKey(0), **inputs)
    o1 = m1.apply(params, **inputs)
    o2 = m2.apply(params, **inputs)  # same params, different K/V source
    assert o1.shape == o2.shape
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_double_net_trajnet():
    tn = TrajNet(obs_actors=4, occ_actors=2, traj_heads=2, att_heads=2,
                 out_dim=32, double_net=True, dtype=jnp.float32)
    obs = jnp.asarray(np.random.RandomState(0).randn(2, 4, 11, 8),
                      jnp.float32)
    occ = jnp.asarray(np.random.RandomState(1).randn(2, 2, 11, 8),
                      jnp.float32)
    params = tn.init(jax.random.PRNGKey(0), obs, occ)
    o, c, mask = tn.apply(params, obs, occ)
    # double_net returns OGM- and flow-branch features over ALL actors
    # (reference trajNet.py:157-174)
    assert o.shape == (2, 6, 32) and c.shape == (2, 6, 32)


def test_traj_encoder_lstm():
    enc = TrajEncoderLSTM(out_dim=16, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 11, 8), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (3, 16)


def test_small_input_non_large_variant():
    """The reference smoke config: 256^2 input, large_ogm=False semantics
    (map at full input size, no crops) — here scaled down."""
    cfg = dataclasses.replace(TINY_MODEL_CONFIG, large_input=False)
    _build_and_run(cfg)
