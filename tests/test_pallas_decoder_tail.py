"""Parity tests for the fused decoder-tail kernel (interpret mode on CPU).

The kernel fuses upconv2x + elu + 3x3 output conv (reference
modules.py:726-771 tail); parity target is the XLA composition the
decoder uses when the kernel is off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strajnet_tpu.ops.pallas_decoder_tail import (decoder_tail,
                                                  decoder_tail_phase,
                                                  decoder_tail_xla, supports)


def _rand_params(rng, cin, cmid, cout=2):
    w_up = jnp.asarray(rng.randn(3, 3, cin, cmid).astype(np.float32)) * 0.2
    b_up = jnp.asarray(rng.randn(cmid).astype(np.float32)) * 0.1
    w_out = jnp.asarray(rng.randn(3, 3, cmid, cout).astype(np.float32)) * 0.2
    b_out = jnp.asarray(rng.randn(cout).astype(np.float32)) * 0.1
    return w_up, b_up, w_out, b_out


@pytest.mark.parametrize("h", [8, 16])
def test_tail_matches_xla_f32(h):
    n, w, cin, cmid = 3, h, 16, 48
    assert supports(h, w, cin, cmid, 2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    w_up, b_up, w_out, b_out = _rand_params(rng, cin, cmid)

    got = decoder_tail(x, w_up, b_up, w_out, b_out, interpret=True)
    ref = decoder_tail_xla(x, w_up, b_up, w_out, b_out)
    assert got.shape == (n, 2 * h, 2 * w, 2)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("h", [8, 16])
def test_tail_bf16_error_comparable_to_xla_bf16(h):
    """At bf16 the kernel rounds partial sums per tap block, so it cannot be
    elementwise-close to the XLA bf16 path (different accumulation order).
    The meaningful contract: its error vs the f32 reference is no worse than
    ~2x the XLA bf16 path's own error."""
    n, w, cin, cmid = 3, h, 16, 48
    rng = np.random.RandomState(0)
    xf = rng.randn(n, h, w, cin).astype(np.float32)
    w_up, b_up, w_out, b_out = _rand_params(rng, cin, cmid)

    ref32 = np.asarray(decoder_tail_xla(
        jnp.asarray(xf), w_up, b_up, w_out, b_out))
    x16 = jnp.asarray(xf, jnp.bfloat16)
    got = decoder_tail(x16, w_up, b_up, w_out, b_out, interpret=True)
    assert got.dtype == jnp.bfloat16
    xla16 = decoder_tail_xla(x16, w_up.astype(jnp.bfloat16), b_up,
                             w_out.astype(jnp.bfloat16), b_out)

    err_kernel = np.abs(np.asarray(got, np.float32) - ref32)
    err_xla = np.abs(np.asarray(xla16, np.float32) - ref32)
    scale = np.abs(ref32) + 1.0
    assert np.max(err_kernel / scale) <= 2.0 * max(
        np.max(err_xla / scale), 0.005)
    # and the typical error is bf16-rounding-sized
    assert np.mean(err_kernel / scale) < 0.01


@pytest.mark.parametrize("h", [8, 16])
def test_tail_phase_matches_xla_f32(h):
    """The offset-grid (phase-domain) XLA tail is the same function."""
    n, w, cin, cmid = 3, h, 16, 48
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    w_up, b_up, w_out, b_out = _rand_params(rng, cin, cmid)

    got = decoder_tail_phase(x, w_up, b_up, w_out, b_out)
    ref = decoder_tail_xla(x, w_up, b_up, w_out, b_out)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_tail_phase_gradients_match_xla():
    n, h, w, cin, cmid = 2, 8, 8, 8, 48
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    params = _rand_params(rng, cin, cmid)
    cot = jnp.asarray(rng.randn(n, 2 * h, 2 * w, 2).astype(np.float32))

    ref = jax.grad(lambda *a: jnp.sum(decoder_tail_xla(*a) * cot),
                   argnums=(0, 1, 2, 3, 4))(x, *params)
    got = jax.grad(lambda *a: jnp.sum(decoder_tail_phase(*a) * cot),
                   argnums=(0, 1, 2, 3, 4))(x, *params)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_tail_zero_border_handling():
    """Border pixels exercise every zero-pad path of both convs: compare
    against a brute-force upsample+conv at the edges specifically."""
    n, h, w, cin, cmid = 1, 8, 8, 8, 48
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    w_up, b_up, w_out, b_out = _rand_params(rng, cin, cmid)

    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = jax.lax.conv_general_dilated(
        up, w_up, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_up
    e = jax.nn.elu(y)
    ref = jax.lax.conv_general_dilated(
        e, w_out, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_out

    got = decoder_tail(x, w_up, b_up, w_out, b_out, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tail_gradients_route_through_xla():
    n, h, w, cin, cmid = 2, 8, 8, 8, 48
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    params = _rand_params(rng, cin, cmid)
    cot = jnp.asarray(rng.randn(n, 2 * h, 2 * w, 2).astype(np.float32))

    ref = jax.grad(lambda *a: jnp.sum(decoder_tail_xla(*a) * cot),
                   argnums=(0, 1, 2, 3, 4))(x, *params)
    got = jax.grad(
        lambda *a: jnp.sum(decoder_tail(*a, interpret=True) * cot),
        argnums=(0, 1, 2, 3, 4))(x, *params)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", [True, "phase"])
def test_decoder_tail_flag_parity_and_param_tree(mode):
    """Pyramid3DDecoder with each alternate tail formulation must match
    the default XLA tail and keep a bit-identical parameter tree."""
    from strajnet_tpu.models.decoder import Pyramid3DDecoder

    b, t, bott, e = 1, 8, 4, 48
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, t, bott, bott, 8 * e).astype(np.float32))
    # [flow_res, res0, res1, res2] (see test_model.py::test_decoder_output_shape)
    res = [
        jnp.asarray(rng.randn(b, (bott * 4) ** 2, e).astype(np.float32)),
        jnp.asarray(rng.randn(b, (bott * 4) ** 2, e).astype(np.float32)),
        jnp.asarray(rng.randn(b, (bott * 2) ** 2, 2 * e).astype(np.float32)),
        jnp.asarray(rng.randn(b, bott * bott, 4 * e).astype(np.float32)),
    ]

    kw = dict(shallow_decode=1, flow_sep_decode=True, num_waypoints=t,
              bottleneck_size=(bott, bott), dtype=jnp.float32)
    dec_off = Pyramid3DDecoder(use_tail_kernel=False, **kw)
    dec_on = Pyramid3DDecoder(use_tail_kernel=mode, **kw)

    v_off = dec_off.init(jax.random.PRNGKey(0), x, res)
    v_on = dec_on.init(jax.random.PRNGKey(0), x, res)
    ps_off = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_off)
    ps_on = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_on)
    assert ps_off == ps_on
    for a, bb in zip(jax.tree_util.tree_leaves(v_off),
                     jax.tree_util.tree_leaves(v_on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    y_off = dec_off.apply(v_off, x, res)
    y_on = dec_on.apply(v_off, x, res)
    assert y_off.shape == y_on.shape
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=2e-4, atol=2e-4)
