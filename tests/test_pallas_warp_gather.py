"""Pallas warp-gather kernel vs the portable bilinear sampler.

The kernel (ops/pallas_warp_gather.py) must match
core.sampling.sample(..., INTEGER, ZERO-border) — the semantics of the
reference's vendored sample() (reference occu_metric.py:345-409) used by the
warp loss (loss.py:143-150) and flow-grounded metrics (occu_metric.py:255).
Runs in interpreter mode on the CPU test mesh; on TPU the same code path is
taken by flow_warp_origin automatically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strajnet_tpu.core.sampling import (PixelType, identity_warp_indices,
                                        sample)
from strajnet_tpu.ops.pallas_warp_gather import sample_dense, supports

B, H, W = 2, 16, 16


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    origin = (jax.random.uniform(k1, (B, H, W, 1)) > 0.7).astype(jnp.float32)
    flow = jax.random.normal(k2, (B, H, W, 2)) * 3.0
    # exercise exact-integer coords (clip boundaries) and far out-of-range
    flow = flow.at[:, :2].set(jnp.round(flow[:, :2]))
    flow = flow.at[:, 2:3].set(100.0)
    flow = flow.at[:, 3:4].set(-100.0)
    warp = identity_warp_indices(H, W, flow.dtype)[None] + flow
    return origin, flow, warp


def test_forward_matches_sample(data):
    origin, _, warp = data
    ref = sample(origin, warp, pixel_type=PixelType.INTEGER)
    got = sample_dense(origin, warp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_flow_gradient_matches(data):
    origin, flow, _ = data

    def loss(fn, flow):
        w = identity_warp_indices(H, W, flow.dtype)[None] + flow
        return jnp.sum(fn(origin, w) ** 2)

    g_ref = jax.grad(lambda f: loss(
        lambda o, w: sample(o, w, pixel_type=PixelType.INTEGER), f))(flow)
    g_fast = jax.grad(lambda f: loss(
        lambda o, w: sample_dense(o, w, interpret=True), f))(flow)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=0, atol=1e-5)


def test_image_gradient_matches(data):
    origin, _, warp = data
    g_ref = jax.grad(lambda o: jnp.sum(
        sample(o, warp, pixel_type=PixelType.INTEGER) ** 2))(origin)
    g_fast = jax.grad(lambda o: jnp.sum(
        sample_dense(o, warp, interpret=True) ** 2))(origin)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=0, atol=1e-4)


def test_under_sharded_jit(data):
    """Under a data-sharded mesh jit the kernel stays correct (XLA treats
    the pallas call as an opaque region and re-gathers its operands) — the
    multi-chip training step hits exactly this structure."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    origin, _, warp = data
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    s = NamedSharding(mesh, P("data"))
    origin_s = jax.device_put(origin, s)
    warp_s = jax.device_put(warp, s)

    out = jax.jit(lambda o, w: sample_dense(o, w, interpret=True))(
        origin_s, warp_s)
    ref = sample(origin, warp, pixel_type=PixelType.INTEGER)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_supports_gate(data):
    origin, _, warp = data
    # CPU test mesh: the fast path must decline so flow_warp_origin keeps
    # the portable sampler (TPU flips this to True for these shapes).
    assert supports(origin, warp) == (jax.default_backend() == "tpu")
    # channel > 1 and non-tileable query counts must always decline
    assert not supports(jnp.zeros((2, 16, 16, 3)), warp)
    assert not supports(origin, jnp.zeros((2, 5, 2)))
