"""Parity tests for core bilinear sampling vs the reference TF implementation.

Golden source: the reference's self-contained tfa_image.py (vendored
TF-Addons) is runnable on CPU TF in this environment; ``sample`` semantics
(pad + shift + interpolate, reference occu_metric.py:345-409) are rebuilt
here in TF directly from its documented transform.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from strajnet_tpu.core.sampling import (
    PixelType,
    ResamplingType,
    dense_image_warp,
    flow_warp_origin,
    interpolate_bilinear,
    sample,
    sample_small_table,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


def _ref_interpolate(grid, query, indexing):
    sys.path.insert(0, REF)
    try:
        import tfa_image  # noqa: the reference's vendored TF-Addons module
        out = tfa_image.interpolate_bilinear(grid, query, indexing=indexing)
        return np.asarray(out)
    finally:
        sys.path.remove(REF)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("indexing", ["ij", "xy"])
def test_interpolate_bilinear_matches_reference(indexing):
    rng = np.random.RandomState(0)
    grid = rng.randn(2, 9, 7, 3).astype(np.float32)
    # include far out-of-range and edge queries
    query = rng.uniform(-3.0, 12.0, size=(2, 50, 2)).astype(np.float32)
    ours = np.asarray(interpolate_bilinear(jnp.asarray(grid),
                                           jnp.asarray(query), indexing))
    ref = _ref_interpolate(grid, query, indexing)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_sample_matches_reference_semantics():
    """sample() = pad 1px + warp+1 + interpolate_bilinear(xy), INTEGER pixels
    (reference occu_metric.py:394-409)."""
    rng = np.random.RandomState(1)
    image = rng.rand(2, 8, 8, 1).astype(np.float32)
    warp = rng.uniform(-4.0, 12.0, size=(2, 5, 6, 2)).astype(np.float32)

    ours = np.asarray(sample(jnp.asarray(image), jnp.asarray(warp),
                             pixel_type=PixelType.INTEGER))

    padded = np.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat_warp = (warp + 1.0).reshape(2, -1, 2)
    ref = _ref_interpolate(padded, flat_warp, "xy").reshape(2, 5, 6, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_sample_zero_border_blends_to_zero():
    image = jnp.ones((1, 4, 4, 1), jnp.float32)
    # query centered half a pixel outside the image: blends 50% zero pad
    warp = jnp.asarray([[[-0.5, 0.0]]], jnp.float32)
    out = sample(image, warp, pixel_type=PixelType.INTEGER)
    np.testing.assert_allclose(np.asarray(out), [[[0.5]]], atol=1e-6)


def test_sample_identity_warp_is_identity():
    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(1, 6, 6, 2).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    warp = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    out = sample(image, warp, pixel_type=PixelType.INTEGER)
    np.testing.assert_allclose(np.asarray(out), np.asarray(image), atol=1e-6)


def test_nearest_resampling():
    image = jnp.asarray(
        np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    warp = jnp.asarray([[[1.4, 2.6]]], jnp.float32)  # rounds to (1, 3)
    out = sample(image, warp, resampling_type=ResamplingType.NEAREST,
                 pixel_type=PixelType.INTEGER)
    assert float(out[0, 0, 0]) == 13.0  # row 3, col 1


def test_half_integer_shift():
    image = jnp.asarray(
        np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    out_int = sample(image, jnp.asarray([[[1.5, 1.5]]], jnp.float32),
                     pixel_type=PixelType.HALF_INTEGER)
    out_ref = sample(image, jnp.asarray([[[1.0, 1.0]]], jnp.float32),
                     pixel_type=PixelType.INTEGER)
    np.testing.assert_allclose(np.asarray(out_int), np.asarray(out_ref))


def test_sample_small_table_matches_sample():
    rng = np.random.RandomState(3)
    table = jnp.asarray(rng.randn(3, 31, 31, 2).astype(np.float32))
    warp = jnp.asarray(
        rng.uniform(-35.0, 65.0, size=(3, 17, 2)).astype(np.float32))
    a = sample(table, warp, pixel_type=PixelType.INTEGER)
    b = sample_small_table(table, warp, PixelType.INTEGER)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)


def test_flow_warp_origin_shifts_mass():
    # occupancy at (y=2, x=2); flow (dx=1, dy=0) at every cell samples from
    # x+1, so the mass appears at x=1 (backward warp).
    occ = np.zeros((1, 5, 5, 1), np.float32)
    occ[0, 2, 2, 0] = 1.0
    flow = np.zeros((1, 5, 5, 2), np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(flow_warp_origin(jnp.asarray(occ), jnp.asarray(flow)))
    assert out[0, 2, 1, 0] == pytest.approx(1.0)
    assert out[0, 2, 2, 0] == pytest.approx(0.0)


def test_dense_image_warp_identity():
    rng = np.random.RandomState(4)
    image = jnp.asarray(rng.rand(2, 5, 7, 3).astype(np.float32))
    flow = jnp.zeros((2, 5, 7, 2), jnp.float32)
    out = dense_image_warp(image, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(image), atol=1e-6)
