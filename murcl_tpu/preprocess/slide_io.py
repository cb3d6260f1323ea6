"""Slide IO abstraction: OpenSlide when present, pure-PIL fallback otherwise.

The reference depends directly on ``openslide`` (``create_patches.py:36``;
``extract_features.py``), which is not installed in this environment. The
tiling/extraction code here talks to a minimal slide interface —
``properties``, ``dimensions``, ``level_dimensions``, ``level_downsamples``,
``get_best_level_for_downsample``, ``read_region``, ``get_thumbnail`` —
provided by real OpenSlide when importable and by :class:`ImageSlide`
(single-level, any PIL-readable image) otherwise, so the whole
preprocessing pipeline is testable with generated fixture slides.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from PIL import Image

try:  # pragma: no cover - depends on environment
    import openslide as _openslide

    HAS_OPENSLIDE = True
except ImportError:  # pragma: no cover
    _openslide = None
    HAS_OPENSLIDE = False


class ImageSlide:
    """Single-level slide over a PIL-readable image (fixture/fallback path).

    ``properties`` may carry ``aperio.AppMag`` / ``openslide.mpp-x`` via a
    sidecar ``<image>.props.json`` file, mirroring real slide metadata.
    """

    def __init__(self, filepath, image: Optional[Image.Image] = None,
                 properties: Optional[dict] = None):
        self._filepath = str(filepath)
        if image is None:
            Image.MAX_IMAGE_PIXELS = None
            image = Image.open(filepath).convert("RGB")
        self._image = image
        if properties is None:
            properties = {}
            sidecar = Path(str(filepath) + ".props.json")
            if sidecar.exists():
                import json

                properties = json.loads(sidecar.read_text())
        self.properties = properties

    @property
    def dimensions(self) -> Tuple[int, int]:
        return self._image.size  # (width, height)

    @property
    def level_count(self) -> int:
        return 1

    @property
    def level_dimensions(self):
        return (self._image.size,)

    @property
    def level_downsamples(self):
        return (1.0,)

    def get_best_level_for_downsample(self, downsample: float) -> int:
        return 0

    def read_region(self, location, level, size) -> Image.Image:
        assert level == 0, "ImageSlide has a single level"
        x, y = location
        w, h = size
        region = Image.new("RGBA", (w, h))
        box = (x, y, min(x + w, self._image.size[0]), min(y + h, self._image.size[1]))
        if box[2] > box[0] and box[3] > box[1]:
            region.paste(self._image.crop(box).convert("RGBA"), (0, 0))
        return region

    def get_thumbnail(self, size) -> Image.Image:
        img = self._image.copy()
        img.thumbnail(size, Image.LANCZOS)
        return img


def open_slide(filepath):
    """OpenSlide when available and the format needs it; ImageSlide otherwise."""
    filepath = str(filepath)
    if HAS_OPENSLIDE:
        try:
            return _openslide.open_slide(filepath)
        except Exception:
            pass
    return ImageSlide(filepath)


def downsample_image(slide, downsampling_factor: float = 16, mode: str = "numpy"):
    """Read the best pyramid level and resize to ``dims/downsampling_factor``
    (reference ``wsi_processing/utils.py:12-26``)."""
    level = slide.get_best_level_for_downsample(downsampling_factor + 0.1)
    img = slide.read_region((0, 0), level, slide.level_dimensions[level])
    target = tuple(int(x // downsampling_factor) for x in slide.dimensions)
    img = img.resize(target)
    if mode == "numpy":
        img = np.array(img.convert("RGB"))
    return img, level


def get_three_points(x_step: int, y_step: int, size) -> tuple:
    """Grid cell -> (top_left, bottom_right, center) pixel coordinates."""
    top_left = (int(x_step * size), int(y_step * size))
    bottom_right = (int(top_left[0] + size), int(top_left[1] + size))
    center = ((top_left[0] + bottom_right[0]) // 2, (top_left[1] + bottom_right[1]) // 2)
    return top_left, bottom_right, center


def keep_patch(mask_patch: np.ndarray, thresh: float, bg_color: np.ndarray) -> bool:
    """True when the mask tile's background proportion is <= 1 - thresh."""
    bg = np.all(mask_patch == bg_color, axis=2)
    return (bg.sum() / bg.size) <= (1 - thresh)


def out_of_bound(w: int, h: int, x: int, y: int) -> bool:
    return x >= w or y >= h
