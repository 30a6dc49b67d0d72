"""rpe_window_bias vs sample_small_table on FG-MSA's displacement structure.

ops/rpe_window.py must reproduce exactly what FGMSA computes through
core.sampling.sample_small_table (reference FG_MSA.py:150-172): bilinear
ZERO-border sampling of the rpe table at q_grid - pos, including the
edge-clamp semantics when deformed positions leave the table.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strajnet_tpu.core.sampling import PixelType, sample_small_table
from strajnet_tpu.models.fgmsa import _ref_points
from strajnet_tpu.ops.rpe_window import rpe_window_bias


def _reference_bias(table, pos, h, w):
    """The einsum path exactly as models/fgmsa.py builds it."""
    s = table.shape[0]
    k = pos.shape[1]
    q_grid = jnp.broadcast_to(
        _ref_points(h, w, jnp.float32).reshape(1, h * w, 2), (s, h * w, 2))
    disp = q_grid[:, :, None, :] - pos[:, None]
    disp = jnp.stack([disp[..., 1], disp[..., 0]], axis=-1)
    return sample_small_table(table, disp, PixelType.INTEGER)


@pytest.mark.parametrize("gh", [1, 2])
@pytest.mark.parametrize("spread", [0.0, 4.0, 30.0])
def test_matches_einsum_path(gh, spread):
    h = w = 8
    s, k = 3, h * w
    rng = np.random.RandomState(int(spread) + gh)
    table = jnp.asarray(rng.randn(s, 2 * h - 1, 2 * w - 1, gh) * 0.1,
                        jnp.float32)
    ref = _ref_points(h, w, jnp.float32).reshape(1, k, 2)
    offsets = jnp.asarray(rng.uniform(-spread, spread, (s, k, 2)), jnp.float32)
    pos = ref + offsets  # spread=30 drives windows fully off the table

    want = np.asarray(_reference_bias(table, pos, h, w))
    # under jit: all values (incl. python-constant bounds) must stay static
    got = np.asarray(jax.jit(
        lambda t, p: rpe_window_bias(t, p, (h, w), bound=spread))(table, pos))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bf16_compute_dtype_close_to_f32():
    """The production FGMSA path passes compute_dtype=bf16 (fgmsa.py); pin
    its accuracy against the f32 path so a cast-placement regression (e.g.
    bf16 accumulation) cannot hide behind the f32-only equivalence tests."""
    h = w = 8
    s, k = 3, h * w
    rng = np.random.RandomState(5)
    table = jnp.asarray(rng.randn(s, 2 * h - 1, 2 * w - 1, 2) * 0.1,
                        jnp.float32)
    ref = _ref_points(h, w, jnp.float32).reshape(1, k, 2)
    pos = ref + jnp.asarray(rng.uniform(-4, 4, (s, k, 2)), jnp.float32)

    f32 = np.asarray(rpe_window_bias(table, pos, (h, w), bound=4.0))
    b16 = np.asarray(rpe_window_bias(table, pos, (h, w), bound=4.0,
                                     compute_dtype=jnp.bfloat16))
    # one bf16 rounding of operands + f32-accumulated contraction:
    # error stays at the operand-rounding scale (~2^-8 relative)
    assert np.abs(b16 - f32).max() <= 8e-3 * max(np.abs(f32).max(), 1e-6)


def test_gradients_match():
    h = w = 8
    s, k = 2, h * w
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(s, 2 * h - 1, 2 * w - 1, 1) * 0.1,
                        jnp.float32)
    ref = _ref_points(h, w, jnp.float32).reshape(1, k, 2)
    offsets = jnp.asarray(rng.uniform(-3, 3, (s, k, 2)), jnp.float32)

    def loss_ref(t, o):
        return jnp.sum(_reference_bias(t, ref + o, h, w) ** 2)

    def loss_fast(t, o):
        return jnp.sum(rpe_window_bias(t, ref + o, (h, w), bound=4.0) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(table, offsets)
    gf = jax.grad(loss_fast, argnums=(0, 1))(table, offsets)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
