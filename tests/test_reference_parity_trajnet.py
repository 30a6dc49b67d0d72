"""Numerical parity of the trajectory fusion stack vs the reference TF code.

The reference trajNet.py depends on tfa.layers.MultiHeadAttention (not
installed); a faithful Keras-2 reimplementation of tfa's documented einsum
formulation is injected into the stub so the reference constructs and runs.
The parity target is therefore the reference's *wiring* (masks, segment
embeddings, residual order, per-waypoint layers) — the MHA math itself is
covered by the shared spec both sides implement.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


# tfa-MHA reimplementation + mapping machinery promoted to
# strajnet_tpu.interop (used by the checkpoint importer).
from strajnet_tpu.interop.ref_import import (  # noqa: E402
    assign_trajnet_weights,
    trajnet_order,
)
from strajnet_tpu.interop.refload import (  # noqa: E402
    make_tfa_mha_class as _make_tfa_mha_class,
)


@pytest.fixture(scope="module")
def ref_trajnet():
    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    from tests.ref_loader import load_reference_module, set_tfa_mha

    set_tfa_mha(_make_tfa_mha_class())
    return load_reference_module("trajNet")


@pytest.mark.slow
def test_trajnet_cross_attention_matches_reference(ref_trajnet):
    tf = pytest.importorskip("tensorflow")
    from strajnet_tpu.models.trajnet import TrajNetCrossAttention
    from tests.test_reference_parity_fgmsa import _assign_by_order

    rng = np.random.RandomState(0)
    traj_cfg = dict(traj_heads=4, att_heads=6, out_dim=384, no_attn=False)
    ref = ref_trajnet.TrajNetCrossAttention(
        traj_cfg, actor_only=True, pic_size=(16, 16), pic_dim=384,
        multi_modal=True, sep_actors=False)
    for w in ref.weights:
        w.assign(rng.randn(*w.shape).astype(np.float32) * 0.05)

    pic = rng.randn(2, 8, 16, 16, 384).astype(np.float32) * 0.3
    obs = rng.randn(2, 48, 11, 8).astype(np.float32)
    obs[:, 20:] = 0.0  # some invalid actors
    occ = rng.randn(2, 16, 11, 8).astype(np.float32)
    occ[:, 4:] = 0.0
    mapt = np.zeros((2, 256, 10, 7), np.float32)

    ref_out = np.asarray(ref(tf.constant(pic), tf.constant(obs),
                             tf.constant(occ), tf.constant(mapt),
                             training=False))

    ours = TrajNetCrossAttention(pic_size=(16, 16), pic_dim=384,
                                 dtype=jnp.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(pic),
                          jnp.asarray(obs), jnp.asarray(occ),
                          jnp.asarray(mapt))

    params = assign_trajnet_weights(variables["params"], ref.weights)

    out = ours.apply({"params": params}, jnp.asarray(pic), jnp.asarray(obs),
                     jnp.asarray(occ), jnp.asarray(mapt))
    out = np.asarray(out)
    assert out.shape == ref_out.shape
    err = np.abs(out - ref_out).max() / (np.abs(ref_out).mean() + 1e-6)
    assert err < 5e-3, err
