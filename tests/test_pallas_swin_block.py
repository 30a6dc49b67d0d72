"""Fused Swin-block kernel parity vs an XLA formulation (interpret on CPU).

Dedicated coverage for ops/pallas_swin_block.py — in particular batch >= 2
(the Mosaic BlockSpec rule that rejected a (1, 2) SMEM block over a [B, 2]
array only triggers at B > 1, and the per-sample DropPath multipliers are
read via the grid's batch program_id) and per-sample stochastic-depth masks
with DISTINCT values per sample, which would expose any mis-indexing.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.ops.pallas_swin_block import fused_swin_block
from strajnet_tpu.ops.windows import (
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _xla_block(x, wqkv, bqkv, wproj, bproj, rel_bias, ln1s, ln1b, ln2s,
               ln2b, w1, b1, w2, b2, mask, dp, ws, heads):
    """Straight-line XLA Swin block on pre-rolled [B, H, W, C] input."""
    b, h, w, c = x.shape
    hd = c // heads
    n = ws * ws
    xn = _ln(x, ln1s, ln1b)
    xw = window_partition(xn, ws).reshape(-1, n, c)
    qkv = xw @ wqkv + bqkv
    qkv = qkv.reshape(-1, n, 3, heads, hd)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k)
    attn = attn + rel_bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(-1, nw, heads, n, n) + jnp.asarray(
            mask, attn.dtype)[None, :, None]
        attn = attn.reshape(-1, heads, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bnhd", attn, v).reshape(-1, n, c)
    out = out @ wproj + bproj
    out = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w, c)
    r1 = x + dp[:, 0, None, None, None] * out
    y = _ln(r1, ln2s, ln2b)
    y = jax.nn.gelu(y @ w1 + b1, approximate=True)
    y = y @ w2 + b2
    return r1 + dp[:, 1, None, None, None] * y


def _make_inputs(b, h, w, c, ws, heads, seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))  # noqa
    hidden = 4 * c
    return dict(
        x=f(b, h, w, c) * 0.5,
        wqkv=f(c, 3 * c) * 0.2, bqkv=f(3 * c) * 0.1,
        wproj=f(c, c) * 0.2, bproj=f(c) * 0.1,
        rel_bias=f(heads, ws * ws, ws * ws) * 0.3,
        ln1s=1.0 + 0.1 * f(c), ln1b=0.1 * f(c),
        ln2s=1.0 + 0.1 * f(c), ln2b=0.1 * f(c),
        w1=f(c, hidden) * 0.2, b1=f(hidden) * 0.1,
        w2=f(hidden, c) * 0.2, b2=f(c) * 0.1,
    )


@pytest.mark.parametrize("shift", [0, 2])
@pytest.mark.parametrize("batch", [2, 3])
def test_fused_swin_block_batch_ge2_with_droppath(batch, shift):
    """Forward parity at batch >= 2 with DISTINCT per-sample drop-path
    multipliers (catches both the SMEM BlockSpec lowering rule and any
    batch-index mistake in dp_ref reads)."""
    b, h, w, c, ws, heads = batch, 16, 16, 8, 4, 2
    a = _make_inputs(b, h, w, c, ws, heads)
    mask = (jnp.asarray(shifted_window_mask(h, w, ws, shift))
            if shift > 0 else None)
    # keep-scaled per-sample multipliers: sample 0 drops branch 1, sample 1
    # drops branch 2, remaining samples keep both (scaled).
    dp = np.full((b, 2), 1.0 / 0.9, np.float32)
    dp[0, 0] = 0.0
    dp[1 % b, 1] = 0.0
    dp = jnp.asarray(dp)

    ref = _xla_block(a["x"], a["wqkv"], a["bqkv"], a["wproj"], a["bproj"],
                     a["rel_bias"], a["ln1s"], a["ln1b"], a["ln2s"],
                     a["ln2b"], a["w1"], a["b1"], a["w2"], a["b2"],
                     mask, dp, ws, heads)
    ours = fused_swin_block(
        a["x"], a["wqkv"], a["bqkv"], a["wproj"], a["bproj"], a["rel_bias"],
        a["ln1s"], a["ln1b"], a["ln2s"], a["ln2b"], a["w1"], a["b1"],
        a["w2"], a["b2"], mask, dp, window_size=ws, num_heads=heads,
        interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("shift", [0, 2])
def test_fused_swin_block_backward_batch_ge2(shift):
    """custom_vjp backward kernel vs autodiff of the XLA block at batch 3
    with active per-sample drop-path masks: dx and all parameter grads."""
    b, h, w, c, ws, heads = 3, 16, 16, 8, 4, 2
    a = _make_inputs(b, h, w, c, ws, heads, seed=1)
    mask = (jnp.asarray(shifted_window_mask(h, w, ws, shift))
            if shift > 0 else None)
    dp = np.full((b, 2), 1.0 / 0.9, np.float32)
    dp[0, 0] = 0.0
    dp[2, 1] = 0.0
    dp = jnp.asarray(dp)
    rng = np.random.RandomState(2)
    cot = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    names = ["x", "wqkv", "bqkv", "wproj", "bproj", "rel_bias", "ln1s",
             "ln1b", "ln2s", "ln2b", "w1", "b1", "w2", "b2"]

    def loss_ref(vals):
        d = dict(zip(names, vals))
        y = _xla_block(d["x"], d["wqkv"], d["bqkv"], d["wproj"], d["bproj"],
                       d["rel_bias"], d["ln1s"], d["ln1b"], d["ln2s"],
                       d["ln2b"], d["w1"], d["b1"], d["w2"], d["b2"],
                       mask, dp, ws, heads)
        return jnp.sum(y * cot)

    def loss_ours(vals):
        d = dict(zip(names, vals))
        y = fused_swin_block(
            d["x"], d["wqkv"], d["bqkv"], d["wproj"], d["bproj"],
            d["rel_bias"], d["ln1s"], d["ln1b"], d["ln2s"], d["ln2b"],
            d["w1"], d["b1"], d["w2"], d["b2"], mask, dp,
            window_size=ws, num_heads=heads, interpret=True)
        return jnp.sum(y * cot)

    vals = [a[k] for k in names]
    g_ref = jax.grad(loss_ref)(vals)
    g_our = jax.grad(loss_ours)(vals)
    for nm, gr, go in zip(names, g_ref, g_our):
        gr, go = np.asarray(gr), np.asarray(go)
        scale = max(np.abs(gr).max(), 1e-6)
        # 1%-of-scale: the backward kernel runs bf16-operand matmuls with
        # f32 accumulate; the XLA reference autodiff is pure f32.
        assert np.abs(go - gr).max() <= 1e-2 * scale, (
            nm, np.abs(go - gr).max(), scale)


@pytest.mark.parametrize("wpp", [1, 2])
@pytest.mark.parametrize("shift", [0, 2])
def test_fused_swin_block_narrow_strips(shift, wpp):
    """windows_per_program < full row: forward + backward parity vs the
    full-row strip formulation (same math, narrower dense blocks)."""
    b, h, w, c, ws, heads = 2, 16, 16, 8, 4, 2
    a = _make_inputs(b, h, w, c, ws, heads, seed=3)
    mask = (jnp.asarray(shifted_window_mask(h, w, ws, shift))
            if shift > 0 else None)
    rng = np.random.RandomState(4)
    cot = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    def run(wpp_):
        def f(x):
            y = fused_swin_block(
                x, a["wqkv"], a["bqkv"], a["wproj"], a["bproj"],
                a["rel_bias"], a["ln1s"], a["ln1b"], a["ln2s"], a["ln2b"],
                a["w1"], a["b1"], a["w2"], a["b2"], mask, None,
                window_size=ws, num_heads=heads, interpret=True,
                windows_per_program=wpp_)
            return jnp.sum(y * cot), y

        (val, y), g = jax.value_and_grad(f, has_aux=True)(a["x"])
        return y, g

    y_full, g_full = run(None)
    y_n, g_n = run(wpp)
    np.testing.assert_allclose(np.asarray(y_n), np.asarray(y_full),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_full),
                               rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("spp", [2, 4])
def test_fused_swin_block_samples_per_program(spp):
    """samples_per_program > 1 (forward batching inside one program) is
    output-identical to the default, including per-sample drop-path
    indexing across the packed samples."""
    b, h, w, c, ws, heads = 4, 16, 16, 8, 4, 2
    a = _make_inputs(b, h, w, c, ws, heads, seed=6)
    mask = jnp.asarray(shifted_window_mask(h, w, ws, 2))
    dp = np.full((b, 2), 1.0 / 0.9, np.float32)
    dp[1, 0] = 0.0
    dp[3, 1] = 0.0
    dp = jnp.asarray(dp)

    def run(spp_):
        return fused_swin_block(
            a["x"], a["wqkv"], a["bqkv"], a["wproj"], a["bproj"],
            a["rel_bias"], a["ln1s"], a["ln1b"], a["ln2s"], a["ln2b"],
            a["w1"], a["b1"], a["w2"], a["b2"], mask, dp,
            window_size=ws, num_heads=heads, interpret=True,
            windows_per_program=2, samples_per_program=spp_)

    np.testing.assert_allclose(np.asarray(run(spp)), np.asarray(run(1)),
                               rtol=1e-6, atol=1e-6)


def test_model_narrow_strip_config_matches_xla():
    """pallas_windows_per_program plumbs config -> encoder -> kernels and
    keeps model-level forward parity with the XLA path."""
    import dataclasses

    from strajnet_tpu.config import TINY_MODEL_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    cfg_x = dataclasses.replace(TINY_MODEL_CONFIG, drop_path_rate=0.0)
    cfg_p = dataclasses.replace(cfg_x, use_pallas_attention="block",
                                pallas_windows_per_program=2)
    mx, mp = STrajNet(cfg=cfg_x), STrajNet(cfg=cfg_p)
    inputs = dummy_inputs(cfg_x, batch=2)
    rng = np.random.RandomState(5)
    inputs["flow"] = jnp.asarray(
        rng.randn(*inputs["flow"].shape).astype(np.float32))
    params = mx.init(jax.random.PRNGKey(0), **inputs)
    ox = mx.apply(params, **inputs)
    op = mp.apply(params, **inputs)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                               rtol=2e-4, atol=2e-4)


def test_model_block_path_batch2_matches_xla():
    """Tiny STrajNet, batch 2, Pallas block mode vs pure XLA: forward and
    gradients match (drop_path 0 so paths share rng-free determinism)."""
    import dataclasses

    from strajnet_tpu.config import TINY_MODEL_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    cfg_x = dataclasses.replace(TINY_MODEL_CONFIG, drop_path_rate=0.0)
    cfg_p = dataclasses.replace(cfg_x, use_pallas_attention="block")
    mx, mp = STrajNet(cfg=cfg_x), STrajNet(cfg=cfg_p)
    inputs = dummy_inputs(cfg_x, batch=2)
    rng = np.random.RandomState(0)
    inputs["ogm"] = jnp.asarray(
        (rng.rand(*inputs["ogm"].shape) > 0.7).astype(np.float32))
    inputs["flow"] = jnp.asarray(
        rng.randn(*inputs["flow"].shape).astype(np.float32))
    params = mx.init(jax.random.PRNGKey(0), **inputs)

    ox = mx.apply(params, **inputs)
    op = mp.apply(params, **inputs)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                               rtol=2e-4, atol=2e-4)

    def loss(m):
        def f(p):
            return jnp.sum(jnp.square(m.apply(
                p, **inputs, training=True,
                rngs={"dropout": jax.random.PRNGKey(1)})))
        return f

    kx = jax.grad(loss(mx))(params)
    kp = jax.grad(loss(mp))(params)
    global_max = max(float(jnp.abs(l).max())
                     for l in jax.tree_util.tree_leaves(kx))
    floor = 1e-6 * global_max
    kp_flat = dict(jax.tree_util.tree_leaves_with_path(kp))
    for path, gx in jax.tree_util.tree_leaves_with_path(kx):
        gp = np.asarray(kp_flat[path])
        gx = np.asarray(gx)
        scale = max(np.abs(gx).max(), floor)
        # 2%-of-scale: both paths use bf16 matmul operands but different
        # accumulation groupings, and the sum-of-squares loss amplifies
        # that through the whole model (per-kernel parity is tested
        # tightly above; batch-2 measured max deviation is ~1.1%).
        assert np.abs(gp - gx).max() <= 2e-2 * scale, (
            path, np.abs(gp - gx).max(), scale)


def test_model_block_fwd_hybrid_matches_xla():
    """'block_fwd' (kernel forward, XLA-autodiff backward) matches the XLA
    path on forward outputs and parameter gradients."""
    import dataclasses

    from strajnet_tpu.config import TINY_MODEL_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    cfg_x = dataclasses.replace(TINY_MODEL_CONFIG, drop_path_rate=0.0)
    cfg_h = dataclasses.replace(cfg_x, use_pallas_attention="block_fwd")
    mx, mh = STrajNet(cfg=cfg_x), STrajNet(cfg=cfg_h)
    inputs = dummy_inputs(cfg_x, batch=2)
    rng = np.random.RandomState(9)
    inputs["flow"] = jnp.asarray(
        rng.randn(*inputs["flow"].shape).astype(np.float32))
    params = mx.init(jax.random.PRNGKey(0), **inputs)
    np.testing.assert_allclose(np.asarray(mh.apply(params, **inputs)),
                               np.asarray(mx.apply(params, **inputs)),
                               rtol=2e-4, atol=2e-4)

    def loss(m):
        def f(p):
            return jnp.sum(jnp.square(m.apply(
                p, **inputs, training=True,
                rngs={"dropout": jax.random.PRNGKey(1)})))
        return f

    gx = jax.grad(loss(mx))(params)
    gh = jax.grad(loss(mh))(params)
    gm = max(float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(gx))
    worst = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gh)))
    assert worst <= 2e-2 * gm, (worst, gm)


def test_model_attn_mode_batch2_matches_xla():
    """'attn' mode (fused window attention only) stays selectable and
    matches the XLA path at batch 2."""
    import dataclasses

    from strajnet_tpu.config import TINY_MODEL_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    cfg_x = dataclasses.replace(TINY_MODEL_CONFIG, drop_path_rate=0.0)
    cfg_a = dataclasses.replace(cfg_x, use_pallas_attention="attn")
    mx, ma = STrajNet(cfg=cfg_x), STrajNet(cfg=cfg_a)
    inputs = dummy_inputs(cfg_x, batch=2)
    params = mx.init(jax.random.PRNGKey(0), **inputs)
    ox = mx.apply(params, **inputs)
    oa = ma.apply(params, **inputs)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ox),
                               rtol=2e-4, atol=2e-4)


def test_resolve_kernel_knobs_auto(monkeypatch):
    """None=AUTO kernel knobs resolve per backend: block/wpp2/spp8 on
    TPU, XLA/full-row/1 elsewhere; explicit values pass through."""
    import dataclasses

    from strajnet_tpu.config import TINY_MODEL_CONFIG
    from strajnet_tpu.models import strajnet as sn

    auto = dataclasses.replace(TINY_MODEL_CONFIG, use_pallas_attention=None,
                               pallas_windows_per_program=None,
                               pallas_samples_per_program=None)
    explicit = dataclasses.replace(auto, use_pallas_attention="attn",
                                   pallas_windows_per_program=(4, 2, 2),
                                   pallas_samples_per_program=16)

    monkeypatch.setattr(sn.jax, "default_backend", lambda: "cpu")
    assert sn.resolve_kernel_knobs(auto) == (False, 0, 1)
    assert sn.resolve_kernel_knobs(explicit) == ("attn", (4, 2, 2), 16)

    monkeypatch.setattr(sn.jax, "default_backend", lambda: "tpu")
    assert sn.resolve_kernel_knobs(auto) == ("block", 2, 8)
    assert sn.resolve_kernel_knobs(explicit) == ("attn", (4, 2, 2), 16)
