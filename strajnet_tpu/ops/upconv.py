"""Fused nearest-2x-upsample + 3x3 conv, exact and TPU-efficient.

The decoder's hot path is ``UpSampling3D(1,2,2)`` followed by a time-shared
``Conv2D(3x3, SAME)`` (reference modules.py:649-673). Computing the conv on
the materialized 2x grid does 9 taps at 4x the pixels (36 tap-equivalents)
and, at the 256^2 stages, emits 48-channel outputs that pad poorly onto the
128-lane MXU.

Phase decomposition computes the *identical* function directly on the
low-res input: for output phase (a, b) in {0,1}^2, every 3x3 tap lands on
one of 2x2 low-res neighbors, so the 3x3 kernel collapses (by summing
entries) into four 2x2 kernels — 16 tap-equivalents, 2.25x fewer FLOPs, no
upsampled intermediate, and the 4 phases stack into one conv with 4*Cout
output channels (>=128 lanes). A final reshape/transpose interleaves the
phases back to the 2x grid.

Derivation: out[2y+a, 2x+b] = sum_{dy,dx} W[dy,dx] * up[2y+a+dy, 2x+b+dx]
with up[p, q] = x[p//2, q//2]; floor((a+dy)/2) maps taps to low-res rows
{y-1, y, y+1} depending on the phase:
  a=0: row y-1 <- {dy=-1},  row y <- {dy=0, dy=1}
  a=1: row y   <- {dy=-1, dy=0},  row y+1 <- {dy=1}
(and symmetrically for columns), i.e. each phase is a 2x2 conv whose kernel
entries are sums of W entries.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Backward-formulation selection (see upsample2x_conv3x3): "native" lets
# XLA autodiff the lhs-dilated conv directly — measured 22 ms/step faster
# at the flagship batch-16 train step on v5e (203.5 vs 225.5 ms, PARITY.md)
# because TPU's conv pipeline lowers the rhs-dilated/strided gradient convs
# natively — but catastrophic on CPU (measured 740 s/step), where the
# phase-stack gradient form runs in seconds. Default: native on TPU, phase
# elsewhere; STRAJNET_UPCONV_VJP=native|phase overrides. NOTE: the backend
# default is per-process (jax.default_backend()), not per-lowering — a
# program explicitly lowered for CPU on a TPU host should set the env var.
_VJP_MODE = os.environ.get("STRAJNET_UPCONV_VJP", "")
if _VJP_MODE not in ("", "native", "phase"):
    raise ValueError(
        f"STRAJNET_UPCONV_VJP={_VJP_MODE!r}: expected 'native', 'phase', "
        "or unset")


def _use_native_vjp() -> bool:
    if _VJP_MODE:
        return _VJP_MODE == "native"
    return jax.default_backend() == "tpu"

# _ROW_SETS[a][r] = list of 3x3 kernel row indices folded into low-res tap r.
_ROW_SETS = (
    ((0,), (1, 2)),   # phase a=0: taps (y-1, y)
    ((0, 1), (2,)),   # phase a=1: taps (y, y+1)
)


def fold_kernel_2x(w3: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] -> [2, 2, Cin, 4*Cout] phase-folded kernel.

    Output channel block p = 2*a + b holds phase (a, b)'s 2x2 kernel.
    """
    cin, cout = w3.shape[2], w3.shape[3]
    blocks = []
    for a in (0, 1):
        for b in (0, 1):
            k = jnp.zeros((2, 2, cin, cout), w3.dtype)
            for r, rows in enumerate(_ROW_SETS[a]):
                for s, cols in enumerate(_ROW_SETS[b]):
                    acc = sum(w3[dy, dx] for dy in rows for dx in cols)
                    k = k.at[r, s].set(acc)
            blocks.append(k)
    return jnp.concatenate(blocks, axis=-1)


def compose_upsample_kernel(w3: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] -> the 4x4 kernel of the equivalent stride-2
    transposed conv: K4[u, v] = sum_{a,b in {0,1}} W3[u-a, v-b]."""
    cin, cout = w3.shape[2], w3.shape[3]
    k4 = jnp.zeros((4, 4, cin, cout), w3.dtype)
    for a in (0, 1):
        for b in (0, 1):
            k4 = k4.at[a:a + 3, b:b + 3].add(w3)
    return k4


def _upsample2x_conv3x3_dilated(x: jax.Array, w3: jax.Array,
                                bias: jax.Array | None) -> jax.Array:
    """Single lhs-dilated (transposed) conv with the composed 4x4 kernel."""
    k4 = compose_upsample_kernel(w3)
    # No preferred_element_type: the MXU accumulates bf16 convs in f32
    # natively, and a dtype-changing conv breaks the transposed-conv VJP.
    y = jax.lax.conv_general_dilated(
        x, k4.astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


@jax.custom_vjp
def _upconv_phase_vjp(x: jax.Array, w3: jax.Array,
                      bias: jax.Array | None = None) -> jax.Array:
    """conv3x3(SAME)(nearest_upsample_2x(x)) without materializing the 2x grid.

    Forward: one lhs-dilated (transposed) conv with the composed 4x4
    kernel — XLA's TPU backend phase-decomposes dilated convs natively, so
    this beats both the naive path (~5.5x) and an explicit phase-stack
    formulation (~2.5x) at the decoder's hot shapes.

    Backward (custom VJP): autodiff through the phase-stack formulation —
    mathematically the same function, but its gradients are plain VALID
    2x2 convs. Autodiff of the lhs-dilated conv emits rhs-dilated/strided
    gradient convs that XLA-CPU lowers catastrophically (measured: the
    flagship decoder backward alone took 740 s/step on the virtual-mesh
    CPU path vs 2.9 s for the whole encoder); the phase-form gradients
    run in seconds on CPU and lower cleanly on TPU too.

    Args:
      x: [N, H, W, Cin].
      w3: [3, 3, Cin, Cout] canonical conv kernel (same params as the naive
        path — checkpoints stay compatible).
      bias: optional [Cout].

    Returns:
      [N, 2H, 2W, Cout], numerically identical to the naive computation.
    """
    return _upsample2x_conv3x3_dilated(x, w3, bias)


def _phases_uniform(x: jax.Array, w3: jax.Array,
                    bias: jax.Array) -> jax.Array:
    """Phase-stack formulation with dtype-uniform convs.

    Same math as :func:`upsample2x_conv3x3_phases` but without the
    dtype-changing ``preferred_element_type`` conv — a mixed-dtype conv's
    transpose rule emits a conv whose operands disagree (bf16 activations x
    f32 cotangent), which ``lax.conv_general_dilated`` rejects. Used only
    as the autodiff body of the custom VJP below.
    """
    n, h, w, _ = x.shape
    cout = w3.shape[-1]
    kf = fold_kernel_2x(w3).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kf, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            p = 2 * a + b
            phases.append(y[:, a:a + h, b:b + w,
                            p * cout:(p + 1) * cout])
    stacked = jnp.stack(phases, axis=3).reshape(n, h, w, 2, 2, cout)
    out = jnp.transpose(stacked, (0, 1, 3, 2, 4, 5)).reshape(
        n, 2 * h, 2 * w, cout)
    return out + bias.astype(out.dtype)


def _upconv_fwd(x, w3, bias):
    return _upsample2x_conv3x3_dilated(x, w3, bias), (x, w3, bias)


def _upconv_bwd(resid, dy):
    x, w3, bias = resid
    _, vjp = jax.vjp(
        _phases_uniform, x, w3,
        bias if bias is not None else jnp.zeros((w3.shape[-1],), w3.dtype))
    dx, dw3, db = vjp(dy)
    return dx, dw3, (db if bias is not None else None)


_upconv_phase_vjp.defvjp(_upconv_fwd, _upconv_bwd)


def upsample2x_conv3x3(x: jax.Array, w3: jax.Array,
                       bias: jax.Array | None = None) -> jax.Array:
    """Public entry — same forward either way; backend default (native
    gradients on TPU, phase-form on CPU) or the STRAJNET_UPCONV_VJP env
    hook selects which gradient formulation autodiff sees."""
    if _use_native_vjp():
        return _upsample2x_conv3x3_dilated(x, w3, bias)
    return _upconv_phase_vjp(x, w3, bias)


def upsample2x_conv3x3_phases(x: jax.Array, w3: jax.Array,
                              bias: jax.Array | None = None) -> jax.Array:
    """Explicit phase-stack formulation (kept for cross-checking)."""
    n, h, w, cin = x.shape
    cout = w3.shape[-1]
    kf = fold_kernel_2x(w3)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kf, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)  # [N, H+1, W+1, 4*Cout]

    phases = []
    for a in (0, 1):
        for b in (0, 1):
            p = 2 * a + b
            phases.append(y[:, a:a + h, b:b + w,
                            p * cout:(p + 1) * cout])
    stacked = jnp.stack(phases, axis=3).reshape(n, h, w, 2, 2, cout)
    out = jnp.transpose(stacked, (0, 1, 3, 2, 4, 5)).reshape(
        n, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
