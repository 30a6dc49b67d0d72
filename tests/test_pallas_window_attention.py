"""Fused window attention kernel parity vs the reference XLA formulation
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.ops.pallas_window_attention import fused_window_attention
from strajnet_tpu.ops.windows import (
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def _xla_reference(x, wqkv, bqkv, wproj, bproj, rel_bias, mask, ws, heads):
    b, h, w, c = x.shape
    hd = c // heads
    n = ws * ws
    xw = window_partition(x, ws).reshape(-1, n, c)
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
    out = out.reshape(-1, ws, ws, c)
    return window_reverse(out, ws, h, w, c)


@pytest.mark.parametrize("shift", [0, 2])
@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 4, 2),
                                   (1, 32, 32, 24, 8, 3),
                                   # map-branch-like: ws=8 strips at c=96
                                   pytest.param((1, 64, 64, 96, 8, 3),
                                                marks=pytest.mark.slow)])
def test_fused_window_attention_matches_xla(shape, shift):
    b, h, w, c, ws, heads = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    rel_bias = jnp.asarray(
        rng.randn(heads, ws * ws, ws * ws).astype(np.float32) * 0.3)
    mask = (jnp.asarray(shifted_window_mask(h, w, ws, shift))
            if shift > 0 else None)

    ref = _xla_reference(x, wqkv, bqkv, wproj, bproj, rel_bias, mask, ws,
                         heads)
    ours = fused_window_attention(x, wqkv, bqkv, wproj, bproj, rel_bias,
                                  mask, window_size=ws, num_heads=heads,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("wpp", [1, 2])
@pytest.mark.parametrize("shift", [0, 2])
def test_fused_window_attention_narrow_strips(shift, wpp):
    """windows_per_program < full row: forward + input-grad parity vs the
    XLA reference (same math, narrower dense strips)."""
    b, h, w, c, ws, heads = 2, 16, 16, 8, 4, 2
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    rel_bias = jnp.asarray(
        rng.randn(heads, ws * ws, ws * ws).astype(np.float32) * 0.3)
    mask = (jnp.asarray(shifted_window_mask(h, w, ws, shift))
            if shift > 0 else None)
    cot = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    def loss(fn):
        return lambda xx: jnp.sum(fn(xx) * cot)

    ref_fn = loss(lambda xx: _xla_reference(
        xx, wqkv, bqkv, wproj, bproj, rel_bias, mask, ws, heads))
    our_fn = loss(lambda xx: fused_window_attention(
        xx, wqkv, bqkv, wproj, bproj, rel_bias, mask, window_size=ws,
        num_heads=heads, interpret=True, windows_per_program=wpp))

    y_ref, g_ref = jax.value_and_grad(ref_fn)(x)
    y_our, g_our = jax.value_and_grad(our_fn)(x)
    np.testing.assert_allclose(float(y_our), float(y_ref), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g_our), np.asarray(g_ref),
                               rtol=4e-3, atol=4e-3)


def test_fused_window_attention_samples_per_program():
    """samples_per_program packs batch samples into one forward program;
    output-identical to the default."""
    b, h, w, c, ws, heads = 4, 16, 16, 8, 4, 2
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    rel_bias = jnp.asarray(
        rng.randn(heads, ws * ws, ws * ws).astype(np.float32) * 0.3)
    mask = jnp.asarray(shifted_window_mask(h, w, ws, 2))

    def run(spp):
        return fused_window_attention(
            x, wqkv, bqkv, wproj, bproj, rel_bias, mask, window_size=ws,
            num_heads=heads, interpret=True, windows_per_program=2,
            samples_per_program=spp)

    np.testing.assert_allclose(np.asarray(run(2)), np.asarray(run(1)),
                               rtol=1e-6, atol=1e-6)


def test_model_pallas_path_matches_xla_forward_and_grad():
    """Full tiny STrajNet with use_pallas_attention on vs off: identical
    forward outputs and parameter gradients (the training path now runs the
    fused kernel via its custom_vjp; CPU auto-interprets the kernel)."""
    import dataclasses

    from strajnet_tpu.config import TINY_MODEL_CONFIG
    from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs

    cfg_x = dataclasses.replace(TINY_MODEL_CONFIG, drop_path_rate=0.0)
    cfg_p = dataclasses.replace(cfg_x, use_pallas_attention=True)
    mx, mp = STrajNet(cfg=cfg_x), STrajNet(cfg=cfg_p)
    inputs = dummy_inputs(cfg_x, batch=1)
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
    leaves_x = jax.tree_util.tree_leaves_with_path(kx)
    kp_flat = dict(jax.tree_util.tree_leaves_with_path(kp))
    # Leaves whose true gradient is cancellation noise (e.g. K-projection
    # bias: softmax is near-invariant to uniform logit shifts) can differ
    # 100% relatively while being ~1e-10 of the gradient field — compare
    # against a global noise floor.
    global_max = max(float(jnp.abs(l).max())
                     for l in jax.tree_util.tree_leaves(kx))
    floor = 1e-6 * global_max
    checked = 0
    for path, gx in leaves_x:
        gp = np.asarray(kp_flat[path])
        gx = np.asarray(gx)
        scale = max(np.abs(gx).max(), floor)
        # 1%-of-scale: both paths compute bf16-operand gradients but with
        # different accumulation groupings (the kernel's backward runs bf16
        # matmuls with f32 accumulate).
        assert np.abs(gp - gx).max() <= 1e-2 * scale, (
            path, np.abs(gp - gx).max(), scale)
        checked += 1
    assert checked > 50


@pytest.mark.parametrize("shift", [0, 2])
def test_fused_window_attention_backward_matches_xla(shift):
    """custom_vjp (Pallas backward kernel, interpret mode) vs jax autodiff of
    the XLA reference program — all 6 gradient groups."""
    b, h, w, c, ws, heads = 2, 16, 16, 8, 4, 2
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    rel_bias = jnp.asarray(
        rng.randn(heads, ws * ws, ws * ws).astype(np.float32) * 0.3)
    mask = (jnp.asarray(shifted_window_mask(h, w, ws, shift))
            if shift > 0 else None)
    cot = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    def loss_ref(args):
        y = _xla_reference(*args, mask, ws, heads)
        return jnp.sum(y * cot)

    def loss_fused(args):
        y = fused_window_attention(*args, mask, window_size=ws,
                                   num_heads=heads, interpret=True)
        return jnp.sum(y * cot)

    args = (x, wqkv, bqkv, wproj, bproj, rel_bias)
    g_ref = jax.grad(loss_ref)(args)
    g_fused = jax.grad(loss_fused)(args)
    names = ("x", "wqkv", "bqkv", "wproj", "bproj", "rel_bias")
    for name, a, b_ in zip(names, g_ref, g_fused):
        a = np.asarray(a)
        # The backward kernel runs its matmuls with bf16 operands / f32
        # accumulate (f32 MXU matmuls made it ~9x the forward's cost) —
        # compare against the f32 reference at bf16 precision, scaled per
        # gradient group. The rest of the model's bf16 layers have the same
        # gradient precision.
        tol = 8e-3 * max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(b_), a, rtol=0, atol=tol,
                                   err_msg=name)


def test_backward_scratch_accumulators_match_xla(monkeypatch):
    """STRAJNET_BWD_SCRATCH=1 path: gradients accumulate in VMEM scratch and
    the outputs are written once on the last grid step — parity vs the XLA
    reference. Distinct geometry from the revisit-mode test above so the two
    modes can't share a jit trace."""
    import strajnet_tpu.ops.pallas_window_attention as pwa

    monkeypatch.setattr(pwa, "_BWD_SCRATCH", True)
    b, h, w, c, ws, heads = 3, 8, 16, 16, 4, 2
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.2)
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1)
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.2)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    rel_bias = jnp.asarray(
        rng.randn(heads, ws * ws, ws * ws).astype(np.float32) * 0.3)
    mask = jnp.asarray(shifted_window_mask(h, w, ws, 2))
    cot = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    def loss_ref(args):
        return jnp.sum(_xla_reference(*args, mask, ws, heads) * cot)

    def loss_fused(args):
        y = pwa.fused_window_attention(*args, mask, window_size=ws,
                                       num_heads=heads, interpret=True)
        return jnp.sum(y * cot)

    args = (x, wqkv, bqkv, wproj, bproj, rel_bias)
    g_ref = jax.grad(loss_ref)(args)
    g_fused = jax.grad(loss_fused)(args)
    for name, a, b_ in zip(("x", "wqkv", "bqkv", "wproj", "bproj",
                            "rel_bias"), g_ref, g_fused):
        a = np.asarray(a)
        tol = 8e-3 * max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(b_), a, rtol=0, atol=tol,
                                   err_msg=name)
