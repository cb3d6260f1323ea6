"""Offline preprocessing: tiling, tissue filters, feature extraction, clustering."""

from murcl_tpu.preprocess.filters import (
    MASK_ALGORITHMS,
    RGB_filter,
    adaptive,
    filter_blue_pen,
    filter_grays,
    filter_green_channel,
    filter_green_pen,
    filter_red_pen,
    filter_remove_small_objects,
    mask_percent,
    otsu,
    saturation,
    tissue_percent,
)
from murcl_tpu.preprocess.kmeans import kmeans
from murcl_tpu.preprocess.slide_io import (
    ImageSlide,
    downsample_image,
    get_three_points,
    keep_patch,
    open_slide,
    out_of_bound,
)
from murcl_tpu.preprocess.tiling import infer_level0_magnification, run_tiling, tiling

__all__ = [
    "ImageSlide",
    "MASK_ALGORITHMS",
    "RGB_filter",
    "adaptive",
    "downsample_image",
    "filter_blue_pen",
    "filter_grays",
    "filter_green_channel",
    "filter_green_pen",
    "filter_red_pen",
    "filter_remove_small_objects",
    "get_three_points",
    "infer_level0_magnification",
    "keep_patch",
    "kmeans",
    "mask_percent",
    "open_slide",
    "otsu",
    "out_of_bound",
    "run_tiling",
    "saturation",
    "tiling",
    "tissue_percent",
]
