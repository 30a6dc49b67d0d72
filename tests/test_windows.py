"""Equivalence of the iota-built SW-MSA mask with the numpy reference.

The model uses shifted_window_mask_jnp (a few hundred bytes of ops in the
program); shifted_window_mask is the straight transcription of reference
modules.py:189-218. They must agree exactly.
"""

import numpy as np
import pytest

from strajnet_tpu.ops.windows import (shifted_window_mask,
                                      shifted_window_mask_jnp)


@pytest.mark.parametrize("h,w,ws,shift", [
    (128, 128, 8, 4),   # flagship stage 0
    (64, 64, 8, 4),     # stage 1
    (32, 32, 8, 4),     # stage 2
    (16, 16, 8, 4),     # bottleneck-scale
    (24, 16, 8, 4),     # non-square
    (16, 16, 4, 2),     # small window
    (16, 16, 8, 3),     # shift != ws // 2
])
def test_mask_jnp_matches_numpy(h, w, ws, shift):
    ref = shifted_window_mask(h, w, ws, shift)
    got = np.asarray(shifted_window_mask_jnp(h, w, ws, shift))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)
