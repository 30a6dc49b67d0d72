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
