from strajnet_tpu.core.sampling import (
    BorderType,
    PixelType,
    ResamplingType,
    dense_image_warp,
    interpolate_bilinear,
    sample,
)
from strajnet_tpu.core.grid import transform_to_image_coordinates

__all__ = [
    "BorderType",
    "PixelType",
    "ResamplingType",
    "dense_image_warp",
    "interpolate_bilinear",
    "sample",
    "transform_to_image_coordinates",
]
