"""Reference-checkpoint importer: Keras weights -> Flax parameter tree.

The reference saves ``model.save_weights('...model_{ep}_{...}.tf')`` (TF
checkpoint format, reference train.py:358) and reloads via
``model.load_weights(--weight_path)`` (inference.py:283). This module maps
that weight set onto this framework's Flax params, using three mapping
strategies (one per subtree, matching how each reference sub-model names
its weights):

1. encoder — NAME-based: the reference passes explicit ``name=`` strings
   (layers0/blocks0/attn/qkv, ...); Keras prefixes them with auto class
   scopes and DUPLICATES several (three ``patch_embed/proj/kernel``, two
   ``all_norm/gamma``), disambiguated by occurrence index in ``.weights``
   order (= construction order).
2. FG-MSA + decoder — CONSTRUCTION-ORDER-based tables (``fgmsa_order``,
   ``decoder_order``).
3. trajectory cross-attention — construction order incl. the 8 per-waypoint
   layers stacked into our ``nn.vmap`` parameter (waypoint index in the
   spec).

Every mapping is golden-verified by the copied-weights forward-parity tests
(tests/test_reference_parity*.py), which drive these exact functions.
"""

from __future__ import annotations

import re

import numpy as np

import jax.numpy as jnp


# The reference passes fixed name= strings, so several weights share the
# exact same Keras name (verified empirically against the built model).
_DUP_MAP = {
    "patch_embed": ["patch_embed_vehicle", "patch_embed_flow",
                    "patch_embed_map"],
    "all_norm": ["flow_norm", "all_patch_norm"],
}

_EXPLICIT_HEAD = re.compile(
    r"^(flow_layers\d+|layers\d+|patch_embed|all_norm)$")


def keras_name_to_flax_path(name, seen_counts):
    """Maps a Keras encoder weight name to a flax param path tuple.

    Keras prefixes weights with auto-generated class-name scopes
    (basic_layer_3/swin_transformer_block_7/...); the reference's explicit
    ``name=`` strings appear as the suffix — find the first explicit
    component and keep from there.
    """
    name = name.split(":")[0]
    comps = name.split("/")
    for i, c in enumerate(comps):
        if _EXPLICIT_HEAD.match(c):
            comps = comps[i:]
            break
    name = "/".join(comps)
    head = comps[0]
    if head in _DUP_MAP:
        idx = seen_counts.get(name, 0)
        seen_counts[name] = idx + 1
        name = _DUP_MAP[head][idx] + name[len(head):]
    name = name.replace("flow_layers0/", "flow_layer/")
    parts = [p for p in name.split("/") if p]
    # keras LN params (gamma/beta) -> our LayerNorm wrapper's nn.LayerNorm
    if parts[-1] == "gamma":
        parts = parts[:-1] + ["LayerNorm_0", "scale"]
    elif parts[-1] == "beta":
        parts = parts[:-1] + ["LayerNorm_0", "bias"]
    return parts


def set_in(tree, parts, value):
    """Writes ``value`` at ``parts`` in a (mutable) nested-dict tree."""
    node = tree
    for p in parts[:-1]:
        if p not in node:
            raise KeyError(f"missing path {parts} at {p}: "
                           f"have {list(node.keys())}")
        node = node[p]
    if parts[-1] not in node:
        raise KeyError(f"missing leaf {parts}: have {list(node.keys())}")
    assert node[parts[-1]].shape == value.shape, (
        parts, node[parts[-1]].shape, value.shape)
    node[parts[-1]] = jnp.asarray(value)


def assign_by_order(params, order, ref_weights, skip_names=()):
    """Copies ref weights (construction order) into flax paths by position.

    ``order`` is a list of (path_tuple, reshape_fn or None). An int path
    component indexes into a stacked (vmapped) parameter.
    """
    import flax

    params = flax.core.unfreeze(params)
    weights = [w for w in ref_weights
               if not any(s in w.name for s in skip_names)]
    assert len(weights) == len(order), (
        [w.name for w in weights], len(order))
    for (path, reshape), w in zip(order, weights):
        leaf = path[-1]
        value = np.asarray(w)
        if reshape is not None:
            value = reshape(value)
        idx = [p for p in path if isinstance(p, int)]
        node = params
        for p in path[:-1]:
            if isinstance(p, int):
                continue
            node = node[p]
        if idx:
            cur = node[leaf]
            assert cur.shape[1:] == value.shape, (path, cur.shape,
                                                  value.shape)
            node[leaf] = jnp.asarray(np.asarray(cur).copy()).at[
                idx[0]].set(value)
        else:
            assert node[leaf].shape == value.shape, (path, node[leaf].shape,
                                                     value.shape)
            node[leaf] = jnp.asarray(value)
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
    return [
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


def _mha_order(prefix):
    return [(prefix + (n,), None) for n in
            ("query_kernel", "key_kernel", "value_kernel",
             "projection_kernel", "projection_bias")]


def trajnet_order(num_waypoints=8):
    """Reference TrajNetCrossAttention weight order = sublayer construction
    order: TrajNet (traj_encoder: Conv1D, MHA, vector_feature, sublayer;
    cross_attention: mha, norm1, norm2, FFN1, FFN2; obs_norm, occ_norm,
    seg_embed); then num_waypoints x Cross_AttentionT (mha, norm1, norm2,
    FFN1, FFN2) stacked into our vmapped cross_attn_obs params."""
    enc = ("traj_net", "traj_encoder", "enc")
    ca = ("traj_net", "cross_attention")
    order = [
        ((*enc, "node_feature", "kernel"), None),
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

    params = flax.core.unfreeze(params)
    order = trajnet_order(num_waypoints)
    weights = list(ref_weights)
    assert len(weights) == len(order), (len(weights), len(order))
    for spec, w in zip(order, weights):
        path, reshape = spec[0], spec[1]
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


_SKIP = ("relative_position_index", "attn_mask")


def copy_strajnet_weights(ref_model, params):
    """Copies a built reference STrajNet's weights into our param tree.

    ``params`` is the (unfrozen) ``variables["params"]`` of
    :class:`strajnet_tpu.models.strajnet.STrajNet` at the matching config.
    Returns the updated tree. Sub-models absent from the config (e.g.
    ``fg_msa_layer`` when fg_msa=False) are skipped automatically.
    """
    import flax

    params = flax.core.unfreeze(params)

    seen = {}
    copied = 0
    for w in ref_model.encoder.weights:
        if any(s in w.name for s in _SKIP):
            continue
        set_in(params["encoder"], keras_name_to_flax_path(w.name, seen),
               np.asarray(w))
        copied += 1
    assert copied >= 50, copied

    if "fg_msa_layer" in params:
        params["fg_msa_layer"] = assign_by_order(
            params["fg_msa_layer"], fgmsa_order(),
            ref_model.fg_msa_layer.weights)
    params["decoder"] = assign_by_order(
        params["decoder"], decoder_order(), ref_model.decoder.weights)
    params["trajnet_attn"] = assign_trajnet_weights(
        params["trajnet_attn"], ref_model.trajnet_attn.weights)
    return params


def import_ref_checkpoint(weight_path, model_cfg=None, ref_dir=None):
    """Published reference ``.tf`` checkpoint -> Flax params.

    Builds the actual reference model (from ``ref_dir``), restores the
    checkpoint into it via Keras ``load_weights`` (the reference's own
    load path, inference.py:283), and copies every weight into a fresh
    Flax parameter tree for ``model_cfg``.

    Returns ``(params, model_cfg)``.
    """
    import jax

    from strajnet_tpu.config import STRAJNET_CONFIG
    from strajnet_tpu.interop import refload
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    if model_cfg is None:
        model_cfg = STRAJNET_CONFIG
    ref_cfg = dict(input_size=tuple(model_cfg.input_size),
                   window_size=model_cfg.window_size,
                   embed_dim=model_cfg.embed_dim,
                   depths=list(model_cfg.depths),
                   num_heads=list(model_cfg.num_heads))
    ref = refload.build_reference_strajnet(
        cfg=ref_cfg, fg_msa=model_cfg.fg_msa, fg=model_cfg.fg,
        ref_dir=ref_dir or refload.DEFAULT_REF_DIR)
    ref.load_weights(weight_path).expect_partial()

    ours = STrajNet(cfg=model_cfg)
    variables = ours.init(jax.random.PRNGKey(0),
                          **dummy_inputs(model_cfg, batch=1))
    return copy_strajnet_weights(ref, variables["params"]), model_cfg
