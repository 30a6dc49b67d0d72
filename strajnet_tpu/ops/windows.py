"""Window partition/merge + shifted-window attention masks.

Functional equivalents of the reference's reshape/transpose helpers
(reference modules.py:49-63) and the SW-MSA additive mask
(modules.py:189-218). ``shifted_window_mask`` builds the mask with numpy
(host constant, used by tests); the model uses ``shifted_window_mask_jnp``,
which emits the identical values as a handful of iota ops — the stage-0
mask is a [256, 64, 64] f32 tensor that, as a literal, put 4.2 MB into
every program containing it (twice for fwd+bwd, overflowing the axon
remote-compile payload cap for encoder training programs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """[B, H, W, C] -> [B * nH * nW, ws, ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size,
                  window_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, window_size, window_size, c)


def window_reverse(windows: jax.Array, window_size: int, h: int, w: int,
                   c: int) -> jax.Array:
    """[B * nH * nW, ws, ws, C] -> [B, H, W, C]."""
    x = windows.reshape(-1, h // window_size, w // window_size, window_size,
                        window_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, h, w, c)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(height: int, width: int, window_size: int,
                        shift_size: int) -> np.ndarray:
    """Additive attention mask for SW-MSA: [nW, ws*ws, ws*ws] with 0 / -100.

    Matches reference modules.py:190-212: cells are labeled by which of the
    3x3 shift regions they fall in; pairs from different regions within the
    same (rolled) window get -100 added to their attention logit.
    """
    img_mask = np.zeros((height, width), dtype=np.float32)
    slices = (slice(0, -window_size),
              slice(-window_size, -shift_size),
              slice(-shift_size, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[hs, ws] = cnt
            cnt += 1

    nh, nw = height // window_size, width // window_size
    m = img_mask.reshape(nh, window_size, nw, window_size)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def shifted_window_mask_jnp(height: int, width: int, window_size: int,
                            shift_size: int) -> jax.Array:
    """On-device SW-MSA mask, value-identical to :func:`shifted_window_mask`.

    Built from iotas so it enters the program as a few hundred bytes of ops
    instead of an [nW, ws^2, ws^2] f32 literal (equivalence pinned by
    tests/test_windows.py)."""
    ws, ss = window_size, shift_size

    def cat(n: int) -> jax.Array:
        i = jnp.arange(n)
        return ((i >= n - ws).astype(jnp.int32)
                + (i >= n - ss).astype(jnp.int32))

    lab = 3 * cat(height)[:, None] + cat(width)[None, :]       # [H, W]
    nh, nw = height // ws, width // ws
    m = lab.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(
        nh * nw, ws * ws)
    diff = m[:, None, :] != m[:, :, None]
    return jnp.where(diff, jnp.float32(-100.0), jnp.float32(0.0))


@functools.lru_cache(maxsize=None)
def relative_position_index(window_h: int, window_w: int) -> np.ndarray:
    """[ws*ws, ws*ws] indices into the (2h-1)(2w-1) relative bias table.

    Matches reference modules.py:88-98.
    """
    coords_h = np.arange(window_h)
    coords_w = np.arange(window_w)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_h - 1
    rel[:, :, 1] += window_w - 1
    rel[:, :, 0] *= 2 * window_w - 1
    return rel.sum(-1).astype(np.int32)
