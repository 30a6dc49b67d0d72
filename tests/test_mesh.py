"""Mesh/sharding rule tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from strajnet_tpu.parallel.mesh import (
    create_mesh,
    param_partition_spec,
    shard_batch,
    shard_params,
)


def test_param_rules_shard_attention_and_mlp():
    mesh = create_mesh(8, model_axis=2)
    # qkv column-parallel
    assert param_partition_spec("encoder/layers0/blocks0/attn/qkv/kernel",
                                (96, 288), mesh) == P(None, "model")
    # proj row-parallel
    assert param_partition_spec("encoder/layers0/blocks0/attn/proj/kernel",
                                (96, 96), mesh) == P("model", None)
    # mlp
    assert param_partition_spec("encoder/layers0/blocks0/mlp/fc1/kernel",
                                (96, 384), mesh) == P(None, "model")
    # biases / LN replicate
    assert param_partition_spec("encoder/layers0/blocks0/attn/qkv/bias",
                                (288,), mesh) == P()
    assert param_partition_spec(
        "encoder/layers0/blocks0/norm1/LayerNorm_0/scale", (96,),
        mesh) == P()


def test_divisibility_guard_falls_back_to_replication():
    mesh = create_mesh(8, model_axis=2)
    # 3-head tfa kernel [3, in, d]: head axis not divisible by 2 -> replicate
    assert param_partition_spec(
        "trajnet_attn/cross_attn_obs/mha/query_kernel", (3, 384, 42),
        mesh) == P()
    # 6-head kernel is shardable
    assert param_partition_spec(
        "trajnet_attn/traj_net/cross_attention/mha/query_kernel",
        (6, 384, 64), mesh) == P("model", None, None)


def test_shard_batch_places_on_data_axis():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_axis=2)
    batch = {"x": jnp.zeros((8, 4)), "y": jnp.zeros((8, 2, 2))}
    sharded = shard_batch(batch, mesh)
    for v in sharded.values():
        assert v.sharding.spec == P("data")


def test_shard_params_executes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(8, model_axis=2)
    params = {"attn": {"qkv": {"kernel": jnp.zeros((96, 288)),
                               "bias": jnp.zeros((288,))}}}
    sharded = shard_params(params, mesh)
    assert sharded["attn"]["qkv"]["kernel"].sharding.spec == P(None, "model")
    assert sharded["attn"]["qkv"]["bias"].sharding.spec == P()


def test_spatial_shard_loss_parity():
    """spatial_shard=True (sp activation sharding over 'model') computes
    the same forward as the unsharded model, with decoder/encoder
    activations actually partitioned under the mesh."""
    import dataclasses

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from strajnet_tpu.config import TINY_MODEL_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs
    from strajnet_tpu.parallel.mesh import shard_batch

    cfg = TINY_MODEL_CONFIG
    sp_cfg = dataclasses.replace(cfg, spatial_shard=True)
    model = STrajNet(cfg=cfg)
    sp_model = STrajNet(cfg=sp_cfg)
    inputs = dummy_inputs(cfg, batch=8)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    ref = model.apply(params, **inputs)

    mesh = create_mesh(8, model_axis=2)
    sp_inputs = shard_batch(inputs, mesh)
    with mesh:
        got = jax.jit(lambda p, kw: sp_model.apply(p, **kw))(params,
                                                             sp_inputs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
