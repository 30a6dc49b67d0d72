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
                                   (1, 32, 32, 24, 8, 3)])
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
