"""End-to-end golden parity: full STrajNet vs the reference's STrajNet.call
(reference modules.py:777-839) with COPIED weights at the real 512^2
training config, paper variant ``fg_msa=True, fg=True``.

This pins the top-level wiring the component tests cannot see: the waypoint
query repeat, the fg flow-ref injection reshape (n_groups reused as T,
modules.py:827-831), the decoder res_list routing, and the final
transpose/reshape channel order.

Note: the reference's own 256^2 smoke config (modules.py:842-851,
``test_SwinT``) CRASHES as checked in — the encoder's large_input path
hardcodes the 512^2 grid constants (modules.py:583-585), so
``patch_embed_map`` output cannot reshape at 256^2. Verified in this
environment; hence parity runs at the 512^2 training config (train.py:183).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = [pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference not mounted"),
              pytest.mark.slow]


@pytest.fixture(scope="module")
def ref_model():
    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    from tests.ref_loader import load_reference_module, set_tfa_mha
    from tests.test_reference_parity_trajnet import _make_tfa_mha_class

    set_tfa_mha(_make_tfa_mha_class())
    modules = load_reference_module("modules")
    cfg = dict(input_size=(512, 512), window_size=8, embed_dim=96,
               depths=[2, 2, 2], num_heads=[3, 6, 12])
    return modules.STrajNet(cfg=cfg, fg_msa=True, fg=True)


def test_full_strajnet_matches_reference(ref_model):
    tf = pytest.importorskip("tensorflow")
    import flax

    from strajnet_tpu.config import STRAJNET_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet
    from tests.test_reference_parity import (
        _keras_name_to_flax_path,
        _set_in,
    )
    from tests.test_reference_parity_fgmsa import (
        _assign_by_order,
        decoder_order,
        fgmsa_order,
    )
    from tests.test_reference_parity_trajnet import assign_trajnet_weights

    rng = np.random.RandomState(0)
    ref = ref_model
    for w in ref.weights:
        if "relative_position_index" in w.name or "attn_mask" in w.name:
            continue
        w.assign(rng.randn(*w.shape).astype(np.float32) * 0.05)

    ogm = (rng.rand(1, 512, 512, 11, 2) > 0.7).astype(np.float32)
    map_img = rng.rand(1, 256, 256, 3).astype(np.float32)
    flow = rng.randn(1, 512, 512, 2).astype(np.float32)
    obs = rng.randn(1, 48, 11, 8).astype(np.float32)
    obs[:, 30:] = 0.0
    occ = rng.randn(1, 16, 11, 8).astype(np.float32)
    occ[:, 5:] = 0.0
    mapt = np.zeros((1, 256, 10, 7), np.float32)

    ref_out = np.asarray(ref(tf.constant(ogm), tf.constant(map_img),
                             training=False, obs=tf.constant(obs),
                             occ=tf.constant(occ), mapt=tf.constant(mapt),
                             flow=tf.constant(flow)))

    import dataclasses
    cfg = dataclasses.replace(STRAJNET_CONFIG, dtype="float32")
    ours = STrajNet(cfg=cfg)
    inputs = dict(ogm=jnp.asarray(ogm), map_img=jnp.asarray(map_img),
                  obs=jnp.asarray(obs), occ=jnp.asarray(occ),
                  mapt=jnp.asarray(mapt), flow=jnp.asarray(flow))
    variables = ours.init(jax.random.PRNGKey(0), **inputs)
    params = flax.core.unfreeze(variables["params"])

    # 1. encoder: name-based mapping (Keras duplicates explicit names;
    #    occurrence-indexed — tests/test_reference_parity.py).
    seen = {}
    copied = 0
    for w in ref.encoder.weights:
        if "relative_position_index" in w.name or "attn_mask" in w.name:
            continue
        parts = _keras_name_to_flax_path(w.name, seen)
        _set_in(params["encoder"], parts, np.asarray(w))
        copied += 1
    assert copied >= 50

    # 2. FG-MSA + decoder: construction-order mapping.
    params["fg_msa_layer"] = _assign_by_order(
        params["fg_msa_layer"], fgmsa_order(), ref.fg_msa_layer.weights)
    params["decoder"] = _assign_by_order(
        params["decoder"], decoder_order(), ref.decoder.weights)

    # 3. trajectory cross-attention: construction order incl. the 8 stacked
    #    per-waypoint layers.
    params["trajnet_attn"] = assign_trajnet_weights(
        params["trajnet_attn"], ref.trajnet_attn.weights)

    our_out = np.asarray(ours.apply({"params": params}, **inputs))

    assert our_out.shape == ref_out.shape == (1, 256, 256, 32)
    err = np.abs(our_out - ref_out).max() / (np.abs(ref_out).mean() + 1e-6)
    assert err < 5e-3, err
