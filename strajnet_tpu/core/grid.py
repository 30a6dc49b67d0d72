"""World <-> grid coordinate transforms (reference grid_utils.py:18-60 parity)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from strajnet_tpu.config import TaskConfig


def transform_to_image_coordinates(points_x, points_y, config: TaskConfig,
                                   larger_box: bool = False,
                                   extra_m: int = 20):
    """Maps ego-frame metric points to integer grid cells + in-FOV mask.

    Mirrors ``_transform_to_image_coordinates`` (reference grid_utils.py:18-60):
    ``x_img = round(x * ppm) + sdc_x``, ``y_img = round(-y * ppm) + sdc_y``.
    With ``larger_box`` the validity margin is extended by ``extra_m * ppm``
    cells on each side (used for occluded-actor candidate selection).

    Returns:
      (x_img, y_img, point_is_in_fov) — int32 grids and bool mask.
    """
    ppm = config.pixels_per_meter
    x_img = jnp.round(points_x * ppm).astype(jnp.int32) + config.sdc_x_in_grid
    y_img = jnp.round(-points_y * ppm).astype(jnp.int32) + config.sdc_y_in_grid

    if larger_box:
        margin = int(extra_m * ppm)
        lo_x, lo_y = -margin, -margin
        hi_x = config.grid_width_cells + margin
        hi_y = config.grid_height_cells + margin
    else:
        lo_x = lo_y = 0
        hi_x, hi_y = config.grid_width_cells, config.grid_height_cells

    in_fov = ((x_img >= lo_x) & (x_img < hi_x) &
              (y_img >= lo_y) & (y_img < hi_y))
    return x_img, y_img, in_fov


def rotate_points_around_origin(x, y, angle) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotates 2D points about the origin by ``angle`` radians."""
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    return x * cos - y * sin, x * sin + y * cos
