"""Heatmap pixel parity: our create_heatmap vs the reference's, same inputs."""

import sys
import types

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

from murcl_tpu.preprocess.heatmaps import create_heatmap as ours_create_heatmap
from murcl_tpu.preprocess.slide_io import ImageSlide


@pytest.fixture()
def fixture_slide_and_coord(tmp_path):
    rng = np.random.default_rng(0)
    img = np.full((512, 768, 3), 255, dtype=np.uint8)
    img[100:400, 100:600] = rng.integers(100, 230, (300, 500, 3), dtype=np.uint8)
    slide = ImageSlide("hm.png", image=Image.fromarray(img),
                       properties={"aperio.AppMag": "20"})

    coords = []
    for row in range(4):
        for col in range(6):
            coords.append({"row": row, "col": col, "x": col * 64, "y": row * 64})
    coord = {
        "slide_filepath": "hm.png", "magnification": 20,
        "magnification_level0": 20, "num_row": 4, "num_col": 6,
        "patch_size": 64, "patch_size_level0": 64,
        "num_patches": len(coords), "coords": coords,
    }
    import json

    path = tmp_path / "hm.json"
    path.write_text(json.dumps(coord))
    attention = rng.random(len(coords))
    return slide, path, attention


def test_pixel_parity_with_reference(fixture_slide_and_coord, monkeypatch):
    slide, coord_path, attention = fixture_slide_and_coord

    # our implementation
    import murcl_tpu.preprocess.heatmaps as hm

    monkeypatch.setattr(hm, "open_slide", lambda _: slide)
    got = ours_create_heatmap(coord_path, attention, slide_level=0)

    # the reference implementation, imported read-only with openslide mocked
    fake_openslide = types.ModuleType("openslide")
    fake_openslide.open_slide = lambda _: slide
    monkeypatch.setitem(sys.modules, "openslide", fake_openslide)
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/scripts")
    try:
        torch.Tensor.cuda = lambda self, *a, **k: self
        import importlib

        ref = importlib.import_module("create_heatmaps")
        # the reference assumed an older cv2 where applyColorMap of a 1-D
        # array yields (N,1,3); feed (N,1) to reproduce that environment
        want = ref.create_heatmap(str(coord_path), attention.reshape(-1, 1),
                                  slide_level=0)
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove("/root/reference/scripts")

    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_xml_roi_contour_parity(fixture_slide_and_coord, monkeypatch, tmp_path):
    """Camelyon16 annotation XML -> contours -> drawContours: bit-identical
    to the reference path (create_heatmaps.py:75-87,128-130)."""
    slide, coord_path, attention = fixture_slide_and_coord

    # Camelyon16/ASAP-style annotation XML: two ROI polygons
    xml = tmp_path / "roi.xml"
    xml.write_text(
        """<?xml version="1.0"?>
<ASAP_Annotations>
  <Annotations>
    <Annotation Name="_0" Type="Polygon" PartOfGroup="Tumor">
      <Coordinates>
        <Coordinate Order="0" X="120.5" Y="110.25"/>
        <Coordinate Order="1" X="400.0" Y="130.75"/>
        <Coordinate Order="2" X="380.25" Y="360.5"/>
        <Coordinate Order="3" X="150.75" Y="340.0"/>
      </Coordinates>
    </Annotation>
    <Annotation Name="_1" Type="Polygon" PartOfGroup="Tumor">
      <Coordinates>
        <Coordinate Order="0" X="500.0" Y="150.0"/>
        <Coordinate Order="1" X="640.5" Y="180.25"/>
        <Coordinate Order="2" X="600.0" Y="300.0"/>
      </Coordinates>
    </Annotation>
  </Annotations>
</ASAP_Annotations>
"""
    )

    import murcl_tpu.preprocess.heatmaps as hm

    monkeypatch.setattr(hm, "open_slide", lambda _: slide)
    ours_contours = hm.load_annotations_xml(xml)
    assert len(ours_contours) == 2
    assert ours_contours[0].shape == (4, 1, 2)
    got = ours_create_heatmap(coord_path, attention, slide_level=0,
                              contours=ours_contours)
    got_plain = ours_create_heatmap(coord_path, attention, slide_level=0)
    assert (got != got_plain).any(), "contours drew nothing — vacuous test"

    fake_openslide = types.ModuleType("openslide")
    fake_openslide.open_slide = lambda _: slide
    monkeypatch.setitem(sys.modules, "openslide", fake_openslide)
    # the reference uses the removed np.float alias (create_heatmaps.py:83)
    monkeypatch.setattr(np, "float", np.float64, raising=False)
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/scripts")
    try:
        torch.Tensor.cuda = lambda self, *a, **k: self
        import importlib

        ref = importlib.import_module("create_heatmaps")
        ref_contours = ref.load_annotations_xml(str(xml))
        assert len(ref_contours) == len(ours_contours)
        for a, b in zip(ours_contours, ref_contours):
            np.testing.assert_array_equal(a, b)
        want = ref.create_heatmap(str(coord_path), attention.reshape(-1, 1),
                                  slide_level=0, contours=ref_contours)
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove("/root/reference/scripts")

    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
