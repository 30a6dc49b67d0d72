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


def _make_tfa_mha_class():
    import tensorflow as tf
    import tf_keras

    class TfaMHA(tf_keras.layers.Layer):
        """tfa.layers.MultiHeadAttention (einsum form), Keras-2."""

        def __init__(self, num_heads, head_size, output_size=None,
                     dropout=0.0, **kwargs):
            super().__init__()
            self.num_heads = num_heads
            self.head_size = head_size
            self.output_size = output_size
            self.dropout = tf_keras.layers.Dropout(dropout)

        def build(self, input_shape):
            num_query = input_shape[0][-1]
            num_key = input_shape[1][-1]
            num_value = (input_shape[2][-1] if len(input_shape) > 2
                         else num_key)
            out = (self.output_size if self.output_size is not None
                   else num_value)
            init = tf_keras.initializers.GlorotUniform()
            self.query_kernel = self.add_weight(
                "query_kernel", shape=[self.num_heads, num_query,
                                       self.head_size], initializer=init)
            self.key_kernel = self.add_weight(
                "key_kernel", shape=[self.num_heads, num_key,
                                     self.head_size], initializer=init)
            self.value_kernel = self.add_weight(
                "value_kernel", shape=[self.num_heads, num_value,
                                       self.head_size], initializer=init)
            self.projection_kernel = self.add_weight(
                "projection_kernel", shape=[self.num_heads, self.head_size,
                                            out], initializer=init)
            self.projection_bias = self.add_weight(
                "projection_bias", shape=[out],
                initializer=tf_keras.initializers.Zeros())
            self.built = True

        def call(self, inputs, mask=None, training=None):
            query = inputs[0]
            key = inputs[1]
            value = inputs[2] if len(inputs) > 2 else key
            q = tf.einsum("...NI,HIO->...NHO", query, self.query_kernel)
            k = tf.einsum("...MI,HIO->...MHO", key, self.key_kernel)
            v = tf.einsum("...MI,HIO->...MHO", value, self.value_kernel)
            q = q / tf.sqrt(tf.cast(self.head_size, q.dtype))
            logits = tf.einsum("...NHO,...MHO->...HNM", q, k)
            if mask is not None:
                m = tf.cast(mask, tf.float32)
                if len(m.shape) < len(logits.shape):
                    m = tf.expand_dims(m, -3)
                logits += -1e10 * (1.0 - m)
            attn = tf.nn.softmax(logits)
            attn = self.dropout(attn, training=training)
            out = tf.einsum("...HNM,...MHI->...NHI", attn, v)
            out = tf.einsum("...NHI,HIO->...NO", out,
                            self.projection_kernel)
            return out + self.projection_bias

    return TfaMHA


@pytest.fixture(scope="module")
def ref_trajnet():
    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    from tests.ref_loader import load_reference_module, set_tfa_mha

    set_tfa_mha(_make_tfa_mha_class())
    return load_reference_module("trajNet")


def _mha_order(prefix):
    return [(prefix + (n,), None) for n in
            ("query_kernel", "key_kernel", "value_kernel",
             "projection_kernel", "projection_bias")]


def _conv1d_reshape(v):
    return v  # keras Conv1D kernel (1, in, out) == flax


def trajnet_order(num_waypoints=8):
    """Reference TrajNetCrossAttention weight order = sublayer construction
    order: TrajNet (traj_encoder: Conv1D, MHA, vector_feature, sublayer;
    cross_attention: mha, norm1, norm2, FFN1, FFN2; obs_norm, occ_norm,
    seg_embed); then num_waypoints x Cross_AttentionT (mha, norm1, norm2,
    FFN1, FFN2) stacked into our vmapped cross_attn_obs params."""
    enc = ("traj_net", "traj_encoder", "enc")
    ca = ("traj_net", "cross_attention")
    order = [
        ((*enc, "node_feature", "kernel"), _conv1d_reshape),
        ((*enc, "node_feature", "bias"), None),
        *_mha_order((*enc, "node_attention")),
        ((*enc, "vector_feature", "kernel"), None),
        ((*enc, "sublayer", "kernel"), None),
        ((*enc, "sublayer", "bias"), None),
        *_mha_order((*ca, "mha")),
        ((*ca, "norm1", "scale"), None),
        ((*ca, "norm1", "bias"), None),
        ((*ca, "norm2", "scale"), None),
        ((*ca, "norm2", "bias"), None),
        ((*ca, "FFN1", "kernel"), None),
        ((*ca, "FFN1", "bias"), None),
        ((*ca, "FFN2", "kernel"), None),
        ((*ca, "FFN2", "bias"), None),
        (("traj_net", "obs_norm", "scale"), None),
        (("traj_net", "obs_norm", "bias"), None),
        (("traj_net", "occ_norm", "scale"), None),
        (("traj_net", "occ_norm", "bias"), None),
        (("traj_net", "seg_embed", "kernel"), None),
    ]
    for i in range(num_waypoints):
        cao = ("cross_attn_obs",)
        order += [((*cao, "mha", n), None, i) for n in
                  ("query_kernel", "key_kernel", "value_kernel",
                   "projection_kernel", "projection_bias")]
        order += [((*cao, "norm1", "scale"), None, i),
                  ((*cao, "norm1", "bias"), None, i),
                  ((*cao, "norm2", "scale"), None, i),
                  ((*cao, "norm2", "bias"), None, i),
                  ((*cao, "FFN1", "kernel"), None, i),
                  ((*cao, "FFN1", "bias"), None, i),
                  ((*cao, "FFN2", "kernel"), None, i),
                  ((*cao, "FFN2", "bias"), None, i)]
    return order


def assign_trajnet_weights(params, ref_weights, num_waypoints=8):
    """Copies reference TrajNetCrossAttention weights into our param tree
    (third spec element = waypoint index into the vmap-stacked layer)."""
    import flax
    import jax.numpy as jnp

    params = flax.core.unfreeze(params)
    order = trajnet_order(num_waypoints)
    weights = list(ref_weights)
    assert len(weights) == len(order), (len(weights), len(order))
    for spec, w in zip(order, weights):
        path = spec[0]
        reshape = spec[1]
        idx = spec[2] if len(spec) > 2 else None
        value = np.asarray(w)
        if reshape is not None:
            value = reshape(value)
        node = params
        for p in path[:-1]:
            node = node[p]
        cur = np.asarray(node[path[-1]])
        if idx is None:
            assert cur.shape == value.shape, (path, cur.shape, value.shape)
            node[path[-1]] = jnp.asarray(value)
        else:
            assert cur.shape[1:] == value.shape, (path, cur.shape,
                                                  value.shape)
            node[path[-1]] = jnp.asarray(cur).at[idx].set(value)
    return params


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
