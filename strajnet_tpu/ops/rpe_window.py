"""FG-MSA continuous relative-position bias via window extraction.

The reference samples its rpe table at ``q_grid[q] - pos[k]`` for every
(query, key) pair (reference FG_MSA.py:150-172), which the straightforward
MXU formulation (core/sampling.py::sample_small_table) turns into one-hot
contractions over HW*N = 65k pairs — HBM-bound at ~3 ms of the FGMSA forward.

This module exploits the structure of those displacements: the queries form
the integer grid, so for a fixed key k

    y(q, k) = q0(q) - pos0(k) + 1          (q0 integer, pos0 continuous)

has a *constant fractional part per key*. The bilinear sample over all
queries therefore reduces to extracting one (h+1)x(w+1) window of the
(zero-extended) table at an integer offset per key and blending its four
corner sub-windows with per-key weights:

    bias[:, k] = (1-ax_k) [ (1-ay_k) W[0:h,0:w] + ay_k W[1:,0:w] ]
               +    ax_k  [ (1-ay_k) W[0:h,1:]  + ay_k W[1:,1:]  ]

Work drops from O(S*HW*N*T) to O(S*N*(h+1)*T) contractions (~3x fewer FLOPs
and ~10x less HBM traffic at the flagship 16x16/8-group config), all in
plain XLA. Numerically equivalent to ``sample_small_table`` — the
ZERO-border clamping semantics collapse to reads of the zero-extended table
(every clamped path lands on a zero row/column), which the test suite pins.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rpe_window_bias(table: jax.Array, pos: jax.Array, q_hw, bound: float
                    ) -> jax.Array:
    """Equivalent of ``sample_small_table(table, disp_swapped)`` for FG-MSA's
    regular-grid displacements.

    Args:
      table: [S, Th, Tw, G] rpe table (Th = 2h-1, Tw = 2w-1).
      pos: [S, K, 2] deformed positions in ``_ref_points`` component order
        (component 0 indexes the table's row axis, as in the FGMSA call).
      q_hw: (h, w) query grid shape; the flat query order matches
        ``_ref_points(h, w).reshape(h*w, 2)``.
      bound: static bound on |pos - reference| (e.g. h/2 for tanh-bounded
        offsets); sets the zero padding so no window leaves the padded table.

    Returns:
      [S, h*w, K, G] bias, matching the sample_small_table formulation.
    """
    h, w = q_hw
    s, th, tw, g = table.shape
    k = pos.shape[1]
    pos = pos.astype(jnp.float32)

    # padded table: TP[v] = T[v - p] zero-extended
    # static padding (math.ceil: jnp ops on python constants still trace
    # to abstract values under jit)
    cb = math.ceil(bound)
    ph = th // 2 + 1 + cb + 2
    pw = tw // 2 + 1 + cb + 2
    tp = jnp.pad(table.astype(jnp.float32),
                 ((0, 0), (ph, ph), (pw, pw), (0, 0)))

    # per-key integer window start + constant fractional blend weight:
    # y(q,k) = q0 + (1 - pos0); rows accessed: floor(1-pos0) + q0 + {0,1}.
    fy = jnp.floor(1.0 - pos[..., 0])
    ay = (1.0 - pos[..., 0]) - fy                      # [S, K]
    fx = jnp.floor(1.0 - pos[..., 1])
    ax = (1.0 - pos[..., 1]) - fx

    # Tz index u corresponds to padded index u - 1 + p (Tz row 0 is the
    # ZERO-border ring, i.e. raw table index -1).
    rowstart = fy.astype(jnp.int32) - 1 + ph           # [S, K]
    colstart = fx.astype(jnp.int32) - 1 + pw

    # Enumerate every reachable window start (the offset bound makes the
    # candidate set small and static), materialize all sliding windows
    # once per slice, and pick per key with ONE one-hot contraction whose
    # batch is only S — per-(S,K) batched micro-matmuls (a naive row/col
    # one-hot pair) dispatch 30k+ tiny MXU ops and measure slower than the
    # dense formulation.
    rbase = (1 - h - cb) - 1 + ph
    cbase = (1 - w - cb) - 1 + pw
    nr = h + 2 * cb + 1
    nc = w + 2 * cb + 1
    rows_z = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(tp, rbase + z, h + 1, axis=1)
         for z in range(nr)], axis=1)                  # [S, nr, h+1, Wp, G]
    win_z = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(rows_z, cbase + z, w + 1, axis=3)
         for z in range(nc)], axis=2)                  # [S,nr,nc,h+1,w+1,G]
    win_flat = win_z.reshape(s, nr * nc, (h + 1) * (w + 1) * g)

    zidx = (rowstart - rbase) * nc + (colstart - cbase)     # [S, K]
    zsel = (zidx[:, :, None] ==
            jnp.arange(nr * nc, dtype=jnp.int32)).astype(jnp.float32)
    win = jnp.einsum("skz,szp->skp", zsel, win_flat).reshape(
        s, k, h + 1, w + 1, g)

    ayb = ay[:, :, None, None, None]
    axb = ax[:, :, None, None, None]
    ybl0 = (1.0 - ayb) * win[:, :, 0:h, 0:w] + ayb * win[:, :, 1:h + 1, 0:w]
    ybl1 = (1.0 - ayb) * win[:, :, 0:h, 1:w + 1] + \
        ayb * win[:, :, 1:h + 1, 1:w + 1]
    out = (1.0 - axb) * ybl0 + axb * ybl1                 # [S,K,h(q0),w(q1)]

    # flat query order of _ref_points(h, w).reshape(h*w, 2): n = q1*h + q0
    out = jnp.transpose(out, (0, 3, 2, 1, 4))             # [S,q1,q0,K,G]
    return out.reshape(s, h * w, k, g)
