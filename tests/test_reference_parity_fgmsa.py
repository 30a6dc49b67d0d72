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


# Mapping machinery promoted to strajnet_tpu.interop.ref_import (used by
# the checkpoint importer); aliased here for the sibling parity tests.
from strajnet_tpu.interop.ref_import import (  # noqa: E402
    assign_by_order as _assign_by_order,
    decoder_order,
    fgmsa_order,
)


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
