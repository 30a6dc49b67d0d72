"""Model stack shape/behavior tests at the tiny config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.config import TINY_MODEL_CONFIG as CFG
from strajnet_tpu.config import ModelConfig
from strajnet_tpu.models.decoder import Pyramid3DDecoder
from strajnet_tpu.models.fgmsa import FGMSA
from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs
from strajnet_tpu.models.swin import SwinTransformerEncoder
from strajnet_tpu.models.trajnet import TrajNet, TrajNetCrossAttention


@pytest.fixture(scope="module")
def model_and_params():
    model = STrajNet(cfg=CFG)
    inputs = dummy_inputs(CFG, batch=2)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    return model, params


def test_full_forward_shape(model_and_params):
    model, params = model_and_params
    inputs = dummy_inputs(CFG, batch=2)
    out = model.apply(params, **inputs)
    oh, ow = CFG.output_size
    assert out.shape == (2, oh, ow, CFG.num_waypoints * 4)
    assert out.dtype == jnp.float32


def test_forward_is_jittable_and_batch_poly(model_and_params):
    model, params = model_and_params
    fwd = jax.jit(lambda p, kw: model.apply(p, **kw))
    for b in (1, 3):
        out = fwd(params, dummy_inputs(CFG, batch=b))
        assert out.shape[0] == b


def test_encoder_res_list_shapes():
    enc = SwinTransformerEncoder(
        img_size=CFG.input_size, embed_dim=CFG.embed_dim, depths=CFG.depths,
        num_heads=CFG.num_heads, window_size=CFG.window_size,
        large_input=True, dtype=jnp.float32)
    h, w = CFG.input_size
    ogm = jnp.zeros((1, h, w, 11, 2))
    mp = jnp.zeros((1, h // 2, w // 2, 3))
    fl = jnp.zeros((1, h, w, 2))
    params = enc.init(jax.random.PRNGKey(0), ogm, mp, fl)
    res = enc.apply(params, ogm, mp, fl)
    p = h // 4  # patch grid
    e = CFG.embed_dim
    # [flow_res, res0, res1, res2] with center-half crops
    assert res[0].shape == (1, (p // 2) ** 2, e)
    assert res[1].shape == (1, (p // 2) ** 2, e)
    assert res[2].shape == (1, (p // 4) ** 2, 2 * e)
    assert res[3].shape == (1, (p // 8) ** 2, 4 * e)


def test_trajnet_masks_and_shapes():
    tn = TrajNet(obs_actors=CFG.obs_actors, occ_actors=CFG.occ_actors,
                 traj_heads=CFG.traj_heads, att_heads=CFG.att_heads,
                 out_dim=CFG.traj_out_dim, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    obs = rng.randn(2, CFG.obs_actors, 11, 8).astype(np.float32)
    occ = rng.randn(2, CFG.occ_actors, 11, 8).astype(np.float32)
    occ[:, 1:] = 0.0  # only first occluded actor valid
    params = tn.init(jax.random.PRNGKey(0), jnp.asarray(obs),
                     jnp.asarray(occ))
    o, c, mask = tn.apply(params, jnp.asarray(obs), jnp.asarray(occ))
    assert o.shape == (2, CFG.obs_actors, CFG.traj_out_dim)
    assert c.shape == (2, CFG.occ_actors, CFG.traj_out_dim)
    assert mask.shape == (2, CFG.obs_actors + CFG.occ_actors)
    np.testing.assert_array_equal(
        np.asarray(mask[:, CFG.obs_actors + 1:]), 0)
    np.testing.assert_array_equal(np.asarray(mask[:, :CFG.obs_actors]), 1)


def test_fgmsa_shapes():
    bh, bw = CFG.bottleneck_size
    bd = CFG.bottleneck_dim
    m = FGMSA(q_size=(bh, bw), kv_size=(bh, bw), n_heads=CFG.fgmsa_heads,
              n_head_channels=CFG.fgmsa_head_channels,
              n_groups=CFG.fgmsa_groups, out_dim=bd, in_dim=bd, fg=True,
              dtype=jnp.float32)
    x = jnp.zeros((2, bh, bw, bd))
    params = m.init(jax.random.PRNGKey(0), x)
    y, pos, flow_hidden = m.apply(params, x)
    assert y.shape == (2, bh, bw, bd)
    assert pos.shape == (2, CFG.fgmsa_groups, bh, bw, 2)
    assert flow_hidden.shape == (2, CFG.fgmsa_groups, bh, bw, bd)


def test_fgmsa_offsets_bounded():
    """tanh-bounded offsets keep positions within +-(H/2, W/2) of the grid."""
    bh, bw = CFG.bottleneck_size
    bd = CFG.bottleneck_dim
    m = FGMSA(q_size=(bh, bw), kv_size=(bh, bw), n_heads=CFG.fgmsa_heads,
              n_head_channels=CFG.fgmsa_head_channels,
              n_groups=CFG.fgmsa_groups, out_dim=bd, in_dim=bd, fg=True,
              dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, bh, bw, bd),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)
    _, pos, _ = m.apply(params, x)
    assert float(jnp.max(pos)) <= (bh - 1) + bh / 2 + 1e-5
    assert float(jnp.min(pos)) >= -bh / 2 - 1e-5


def test_decoder_output_shape():
    bh, bw = CFG.bottleneck_size
    bd = CFG.bottleneck_dim
    e = CFG.embed_dim
    t = CFG.num_waypoints
    dec = Pyramid3DDecoder(shallow_decode=CFG.shallow_decode,
                           bottleneck_size=(bh, bw), num_waypoints=t,
                           dtype=jnp.float32)
    x = jnp.zeros((2, t, bh, bw, bd))
    res_list = [
        jnp.zeros((2, (bh * 4) ** 2, e)),       # flow_res
        jnp.zeros((2, (bh * 4) ** 2, e)),       # res0
        jnp.zeros((2, (bh * 2) ** 2, 2 * e)),   # res1
        jnp.zeros((2, bh * bw, 4 * e)),         # res2
    ]
    params = dec.init(jax.random.PRNGKey(0), x, res_list)
    y = dec.apply(params, x, res_list)
    oh, ow = CFG.output_size
    assert y.shape == (2, t, oh, ow, 4)


def test_train_py_variant_builds():
    """fg_msa off (the checked-in reference training flags)."""
    cfg = ModelConfig(**{**CFG.__dict__, "fg_msa": False, "fg": False})
    model = STrajNet(cfg=cfg)
    inputs = dummy_inputs(cfg, batch=1)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(params, **inputs)
    oh, ow = cfg.output_size
    assert out.shape == (1, oh, ow, cfg.num_waypoints * 4)


def test_dropout_rng_paths_in_training_mode(model_and_params):
    model, params = model_and_params
    inputs = dummy_inputs(CFG, batch=1)
    out1 = model.apply(params, **inputs, training=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = model.apply(params, **inputs, training=True,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    # dropout actually fires (drop_path_rate > 0 in tiny cfg? drop=0 but
    # drop_path=0.1 and attention dropout 0.1 in trajnet) -> different outputs
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_remat_encoder_identical_outputs_and_grads(model_and_params):
    """remat_encoder changes memory behavior only: same params tree, same
    forward, same gradients (jax.checkpoint recomputes, never re-derives)."""
    import dataclasses

    model, params = model_and_params
    rcfg = dataclasses.replace(CFG, remat_encoder=True)
    rmodel = STrajNet(cfg=rcfg)
    inputs = dummy_inputs(CFG, batch=2)

    rparams = rmodel.init(jax.random.PRNGKey(0), **inputs)
    assert (jax.tree_util.tree_structure(rparams)
            == jax.tree_util.tree_structure(params))

    y = model.apply(params, **inputs)
    ry = rmodel.apply(params, **inputs)
    np.testing.assert_array_equal(np.asarray(ry), np.asarray(y))

    def loss(m, p):
        out = m.apply(p, **dict(inputs, training=True),
                      rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(lambda p: loss(model, p))(params)
    rg = jax.grad(lambda p: loss(rmodel, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(rg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
