"""Numerical parity of FGMSA and Pyramid3DDecoder vs the reference TF code.

Both reference modules are tfa-free, so they run directly (with waymo import
stubs). Weights are copied by construction-order position with shape checks.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_env():
    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    from tests.ref_loader import load_reference_module

    return load_reference_module("modules")


def _assign_by_order(params, order, ref_weights, skip_names=()):
    """Copies ref weights (construction order) into flax paths by position.

    ``order`` is a list of (path_tuple, reshape_fn or None). Index into a
    stacked (vmapped) param with an int component.
    """
    import flax

    params = flax.core.unfreeze(params)
    weights = [w for w in ref_weights
               if not any(s in w.name for s in skip_names)]
    assert len(weights) == len(order), (
        [w.name for w in weights], len(order))
    for (path, reshape), w in zip(order, weights):
        node = params
        for p in path[:-1]:
            node = node[p] if not isinstance(p, int) else node
        leaf = path[-1]
        value = np.asarray(w)
        if reshape is not None:
            value = reshape(value)
        idx = [p for p in path if isinstance(p, int)]
        node2 = params
        for p in path[:-1]:
            if isinstance(p, int):
                continue
            node2 = node2[p]
        if idx:
            cur = node2[leaf]
            assert cur.shape[1:] == value.shape, (path, cur.shape,
                                                  value.shape)
            node2[leaf] = jnp.asarray(np.asarray(cur).copy()).at[
                idx[0]].set(value)
        else:
            assert node2[leaf].shape == value.shape, (path,
                                                      node2[leaf].shape,
                                                      value.shape)
            node2[leaf] = jnp.asarray(value)
    return params


def fgmsa_order():
    """Construction order of reference FGMSA weights (FG_MSA.py __init__)."""
    return [
        (("conv_offset_0", "kernel"), None),
        (("conv_offset_0", "bias"), None),
        (("conv_norm", "LayerNorm_0", "scale"), None),
        (("conv_norm", "LayerNorm_0", "bias"), None),
        (("conv_offset_proj", "kernel"), None),
        (("conv_offset_proj2", "kernel"), None),
        (("conv_offset_proj2", "bias"), None),
        (("proj_q", "kernel"), None),
        (("proj_q", "bias"), None),
        (("proj_k", "kernel"), None),
        (("proj_k", "bias"), None),
        (("proj_v", "kernel"), None),
        (("proj_v", "bias"), None),
        (("proj_out", "kernel"), None),
        (("proj_out", "bias"), None),
        (("rpe_table",), None),
    ]


def _conv3d_to_temporal(v):  # (8,1,1,Cin,Cout) -> (8,Cin,Cout)
    return v[:, 0, 0]


def decoder_order():
    """Reference Pyramid3DDecoder weight order at the training config
    (modules.py __init__): upsample(no w), upconv_0s [3,2,1,0], then flow
    branch (upsample_f, upconv_f [1,0], res_f, 'outconv_f'), then res_layer
    [3,2], output_layer."""
    order = [
        (("upconv_3_0", "conv", "kernel"), None),
        (("upconv_3_0", "conv", "bias"), None),
        (("upconv_2_0", "conv", "kernel"), None),
        (("upconv_2_0", "conv", "bias"), None),
        (("upconv_1_0", "conv", "kernel"), None),
        (("upconv_1_0", "conv", "bias"), None),
        (("upconv_0_0", "conv", "kernel"), None),
        (("upconv_0_0", "conv", "bias"), None),
        (("upconvf_1_0", "conv", "kernel"), None),
        (("upconvf_1_0", "conv", "bias"), None),
        (("upconvf_0_0", "conv", "kernel"), None),
        (("upconvf_0_0", "conv", "bias"), None),
        (("resconv_f", "kernel"), _conv3d_to_temporal),
        (("resconv_f", "bias"), None),
        (("outconv_f", "kernel"), None),
        (("outconv_f", "bias"), None),
        (("resconv_3", "kernel"), _conv3d_to_temporal),
        (("resconv_3", "bias"), None),
        (("resconv_2", "kernel"), _conv3d_to_temporal),
        (("resconv_2", "bias"), None),
        (("outconv", "kernel"), None),
        (("outconv", "bias"), None),
    ]
    return order


def test_fgmsa_matches_reference(ref_env):
    tf = pytest.importorskip("tensorflow")
    from tests.ref_loader import load_reference_module
    RefFGMSA = load_reference_module("FG_MSA").FGMSA
    from strajnet_tpu.models.fgmsa import FGMSA

    rng = np.random.RandomState(0)
    ref = RefFGMSA(q_size=(16, 16), kv_size=(16, 16), n_heads=8,
                   n_head_channels=48, n_groups=8, out_dim=384, fg=True,
                   in_dim=384)
    for w in ref.weights:
        w.assign(rng.randn(*w.shape).astype(np.float32) * 0.05)

    x = rng.randn(2, 16, 16, 384).astype(np.float32)
    ref_y, ref_pos, ref_hidden = ref(tf.constant(x), training=False)

    ours = FGMSA(q_size=(16, 16), kv_size=(16, 16), n_heads=8,
                 n_head_channels=48, n_groups=8, out_dim=384, in_dim=384,
                 fg=True, dtype=jnp.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _assign_by_order(variables["params"], fgmsa_order(),
                              ref.weights)

    y, pos, hidden = ours.apply({"params": params}, jnp.asarray(x))

    for name, a, b in (("y", y, ref_y), ("pos", pos, ref_pos),
                       ("hidden", hidden, ref_hidden)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == np.asarray(b).shape, name
        err = np.abs(a - b).max() / (np.abs(b).mean() + 1e-6)
        assert err < 5e-3, (name, err)


def test_decoder_matches_reference(ref_env):
    tf = pytest.importorskip("tensorflow")
    ref_modules = ref_env
    from strajnet_tpu.models.decoder import Pyramid3DDecoder

    rng = np.random.RandomState(1)
    ref = ref_modules.Pyramid3DDecoder(
        config=None, img_size=(512, 512), use_pyramid=True,
        timestep_split=True, shallow_decode=1, flow_sep_decode=True,
        conv_cnn=False)

    x = rng.randn(1, 8, 16, 16, 384).astype(np.float32) * 0.3
    res_list = [rng.randn(1, 64 * 64, 96).astype(np.float32) * 0.3,
                rng.randn(1, 64 * 64, 96).astype(np.float32) * 0.3,
                rng.randn(1, 32 * 32, 192).astype(np.float32) * 0.3,
                rng.randn(1, 16 * 16, 384).astype(np.float32) * 0.3]
    _ = ref(tf.constant(x), training=False,
            res_list=[tf.constant(r) for r in res_list])  # build
    for w in ref.weights:
        w.assign(rng.randn(*w.shape).astype(np.float32) * 0.05)
    ref_y = np.asarray(ref(tf.constant(x), training=False,
                           res_list=[tf.constant(r) for r in res_list]))

    ours = Pyramid3DDecoder(shallow_decode=1, bottleneck_size=(16, 16),
                            dtype=jnp.float32)
    jres = [jnp.asarray(r) for r in res_list]
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jres)

    params = _assign_by_order(variables["params"], decoder_order(),
                              ref.weights)

    y = ours.apply({"params": params}, jnp.asarray(x), jres)
    y = np.asarray(y)
    assert y.shape == ref_y.shape
    err = np.abs(y - ref_y).max() / (np.abs(ref_y).mean() + 1e-6)
    assert err < 5e-3, err
