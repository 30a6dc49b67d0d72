"""Fused upsample+conv parity vs the naive materialized computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strajnet_tpu.ops.upconv import (
    fold_kernel_2x,
    upsample2x_conv3x3,
    upsample2x_conv3x3_phases,
)


def _naive(x, w3, bias):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = jax.lax.conv_general_dilated(
        up, w3, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + bias


@pytest.mark.parametrize("shape", [(2, 5, 7, 3, 4), (1, 16, 16, 8, 6)])
def test_fused_matches_naive(shape):
    n, h, w, cin, cout = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    w3 = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))

    fused = upsample2x_conv3x3(x, w3, bias)
    naive = _naive(x, w3, bias)
    assert fused.shape == (n, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-4, atol=1e-4)
    phased = upsample2x_conv3x3_phases(x, w3, bias)
    np.testing.assert_allclose(np.asarray(phased), np.asarray(naive),
                               rtol=1e-4, atol=1e-4)


def test_folded_kernel_shape():
    w3 = jnp.ones((3, 3, 5, 7))
    kf = fold_kernel_2x(w3)
    assert kf.shape == (2, 2, 5, 28)
    # every phase kernel's entries sum to the full 3x3 sum
    for p in range(4):
        np.testing.assert_allclose(
            np.asarray(kf[..., p * 7:(p + 1) * 7].sum()), 9 * 5 * 7)


@pytest.mark.parametrize("with_bias", [True, False])
def test_custom_vjp_matches_naive_autodiff(with_bias):
    """The phase-form backward (custom VJP) must equal autodiff of the
    naive materialized computation for dx, dw3 and db."""
    n, h, w, cin, cout = 2, 6, 10, 3, 4
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    w3 = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    cot = jnp.asarray(rng.randn(n, 2 * h, 2 * w, cout).astype(np.float32))

    if with_bias:
        ref = jax.grad(lambda *a: jnp.sum(_naive(*a) * cot),
                       argnums=(0, 1, 2))(x, w3, bias)
        got = jax.grad(
            lambda *a: jnp.sum(upsample2x_conv3x3(*a) * cot),
            argnums=(0, 1, 2))(x, w3, bias)
    else:
        ref = jax.grad(lambda xx, ww: jnp.sum(_naive(xx, ww, 0.0) * cot),
                       argnums=(0, 1))(x, w3)
        got = jax.grad(
            lambda xx, ww: jnp.sum(upsample2x_conv3x3(xx, ww) * cot),
            argnums=(0, 1))(x, w3)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_native_vjp_matches_naive_autodiff(monkeypatch):
    """The TPU-default native formulation (autodiff straight through the
    lhs-dilated conv, ops/upconv.py::_use_native_vjp) must produce the same
    gradients as the naive computation — tiny shapes keep the CPU lowering
    cheap here; the flagship-shape CPU pathology is why phase remains the
    CPU default."""
    from strajnet_tpu.ops import upconv

    monkeypatch.setattr(upconv, "_VJP_MODE", "native")
    n, h, w, cin, cout = 2, 6, 10, 3, 4
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    w3 = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    cot = jnp.asarray(rng.randn(n, 2 * h, 2 * w, cout).astype(np.float32))

    ref = jax.grad(lambda *a: jnp.sum(_naive(*a) * cot),
                   argnums=(0, 1, 2))(x, w3, bias)
    got = jax.grad(
        lambda *a: jnp.sum(upsample2x_conv3x3(*a) * cot),
        argnums=(0, 1, 2))(x, w3, bias)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("vjp_mode", ["phase", "native"])
def test_custom_vjp_mixed_dtype(monkeypatch, vjp_mode):
    """bf16 x/w3 with an f32 bias (the FusedUpConv training dtypes) must
    differentiate under BOTH gradient formulations — regression for the
    mixed-dtype gradient-conv TypeError; the native path is what the TPU
    training default runs (ADVICE r4)."""
    from strajnet_tpu.ops import upconv

    monkeypatch.setattr(upconv, "_VJP_MODE", vjp_mode)
    n, h, w, cin, cout = 2, 4, 4, 3, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, h, w, cin), jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))

    dx, dw3, db = jax.grad(
        lambda *a: jnp.sum(upsample2x_conv3x3(*a).astype(jnp.float32)),
        argnums=(0, 1, 2))(x, w3, bias)
    assert dx.dtype == jnp.bfloat16 and dw3.dtype == jnp.bfloat16
    assert db.dtype == jnp.float32
    ref = jax.grad(
        lambda *a: jnp.sum(_naive(*[t.astype(jnp.float32) for t in a])),
        argnums=(0, 1, 2))(x, w3, bias)
    for r, g in zip(ref, (dx, dw3, db)):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r), rtol=0.1, atol=0.1)
