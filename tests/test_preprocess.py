"""Preprocessing tests: filters, tiling, extraction, k-means, heatmaps.

Uses a generated fixture slide (tissue-like blobs on white background +
pen marks) through the ImageSlide fallback — no OpenSlide needed.
"""

import numpy as np
import pytest
from PIL import Image

from murcl_tpu.preprocess import filters
from murcl_tpu.preprocess.slide_io import ImageSlide, keep_patch


@pytest.fixture(scope="module")
def fake_slide():
    """2048x1536 white slide with a pink tissue blob and pen marks."""
    rng = np.random.default_rng(0)
    img = np.full((1536, 2048, 3), 255, dtype=np.uint8)
    # tissue: pinkish elliptical blob with texture
    yy, xx = np.mgrid[0:1536, 0:2048]
    blob = ((yy - 700) / 450) ** 2 + ((xx - 900) / 600) ** 2 < 1.0
    tissue = np.stack([
        rng.integers(180, 230, blob.sum()),
        rng.integers(120, 170, blob.sum()),
        rng.integers(160, 210, blob.sum()),
    ], axis=1).astype(np.uint8)
    img[blob] = tissue
    # red pen stroke
    img[100:140, 200:1800] = np.array([230, 30, 40], dtype=np.uint8)
    # blue pen stroke
    img[1300:1340, 100:1000] = np.array([40, 50, 220], dtype=np.uint8)
    return ImageSlide("fake.png", image=Image.fromarray(img),
                      properties={"aperio.AppMag": "20"})


def test_rgb_filter_masks_tissue_not_pen(fake_slide):
    mask, bg = filters.RGB_filter(fake_slide, mask_downsample=8)
    m = np.asarray(mask)  # 255 = background, 0 = tissue
    h, w = m.shape
    # tissue blob center is kept (0), pen strokes are background (255)
    assert m[700 // 8, 900 // 8] == 0
    assert m[120 // 8, 1000 // 8] == 255  # red pen
    assert m[1320 // 8, 500 // 8] == 255  # blue pen
    assert m[50 // 8, 50 // 8] == 255  # white background


def test_otsu_and_adaptive_run(fake_slide):
    for fn in (filters.otsu, filters.adaptive):
        mask, bg = fn(fake_slide, mask_downsample=8)
        assert np.asarray(mask).shape == (1536 // 8, 2048 // 8)
        assert (bg == 255).all()


def test_filter_helpers():
    rgb = np.full((10, 10, 3), 128, dtype=np.uint8)  # pure gray
    assert not filters.filter_grays(rgb).any()
    rgb2 = rgb.copy()
    rgb2[:, :, 0] = 200  # not gray anymore
    assert filters.filter_grays(rgb2).all()
    # green-channel overmask relaxation terminates
    dark = np.zeros((10, 10, 3), dtype=np.uint8)
    out = filters.filter_green_channel(dark)
    assert out.shape == (10, 10)


def test_remove_small_objects():
    m = np.zeros((100, 100), dtype=bool)
    m[10:40, 10:40] = True  # 900 px, kept at min_size 500
    m[80:83, 80:83] = True  # 9 px, removed
    out = filters.filter_remove_small_objects(m, min_size=500, output_type="bool")
    assert out[20, 20] and not out[81, 81]


def test_saturation():
    gray = np.full((10, 10, 3), 128, dtype=np.uint8)
    assert not filters.saturation(gray)
    colorful = np.zeros((10, 10, 3), dtype=np.uint8)
    colorful[:, :, 0] = 255
    assert filters.saturation(colorful)


def test_keep_patch():
    bg = np.array([255, 255, 255])
    tile = np.full((8, 8, 3), 255, dtype=np.uint8)
    assert not keep_patch(tile, 0.35, bg)  # all background
    tile[:4] = 100  # 50% tissue
    assert keep_patch(tile, 0.35, bg)


# ------------------------------------------------------------------ tiling --
def test_tiling_coord_contract(fake_slide, tmp_path, monkeypatch):
    import importlib
    tiling_mod = importlib.import_module('murcl_tpu.preprocess.tiling')

    monkeypatch.setattr(tiling_mod, "open_slide", lambda _: fake_slide)
    coord = tiling_mod.tiling(
        "fake.png", magnification=20, patch_size=64, scale_factor=8,
        tissue_thresh=0.35, method="rgb", coord_dir=tmp_path, filename="fake",
    )
    assert (tmp_path / "fake.json").exists()
    assert coord["magnification_level0"] == 20
    assert coord["patch_size_level0"] == 64
    assert coord["num_patches"] == len(coord["coords"]) > 0
    # every kept patch lies inside the tissue blob's bounding box (plus pen-free)
    for c in coord["coords"]:
        assert 0 <= c["x"] < 2048 and 0 <= c["y"] < 1536
        assert c["x"] == c["col"] * 64 and c["y"] == c["row"] * 64


def test_tiling_magnification_guard(fake_slide, monkeypatch):
    import importlib
    tiling_mod = importlib.import_module('murcl_tpu.preprocess.tiling')

    monkeypatch.setattr(tiling_mod, "open_slide", lambda _: fake_slide)
    out = tiling_mod.tiling("fake.png", magnification=40, patch_size=64,
                            coord_dir=None, filename="fake")
    assert out is None  # mag0 (20) < requested (40)


# ------------------------------------------------------------- extraction --
def test_patch_encoder_shapes():
    from murcl_tpu.preprocess.extract import PatchEncoder

    enc = PatchEncoder("resnet18", batch_size=4, patch_size=32)
    patches = np.random.default_rng(0).integers(0, 255, (6, 32, 32, 3), dtype=np.uint8)
    feats = enc.encode_patches(patches)
    assert feats.shape == (6, 512)
    assert np.isfinite(feats).all()
    # padding chunk does not change real outputs
    feats2 = enc.encode_patches(patches[:4])
    np.testing.assert_allclose(feats[:4], feats2, rtol=1e-5)


def test_patch_encoder_resize_on_device():
    """On-device downscale path: raw level-0 uint8 in, same feature shape
    out; with no downscale needed the two paths are bit-identical."""
    from murcl_tpu.preprocess.extract import PatchEncoder

    rng = np.random.default_rng(1)
    enc_dev = PatchEncoder("resnet18", batch_size=4, patch_size=32,
                           resize_on_device=True)
    # level-0 patches at 2x the target size -> device bilinear downscale
    raw = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    feats = enc_dev.encode_patches(raw)
    assert feats.shape == (4, 512) and np.isfinite(feats).all()

    # equal sizes: resize is a no-op, output matches the host-resize path
    small = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    enc_host = PatchEncoder("resnet18", batch_size=4, patch_size=32)
    enc_host.params = enc_dev.params
    np.testing.assert_array_equal(enc_dev.encode_patches(small),
                                  enc_host.encode_patches(small))


def test_read_patches_raw_mode(monkeypatch):
    """resize_on_host=False returns level-0-sized uint8 patches."""
    from PIL import Image

    from murcl_tpu.preprocess.extract import _read_patches

    class FakeSlide:
        def read_region(self, location, level, size):
            return Image.new("RGB", size, (location[0] % 256, 0, 0))

    coords = [{"x": i * 10, "y": 0} for i in range(3)]
    raw = _read_patches(FakeSlide(), coords, 64, 32, num_workers=1,
                        resize_on_host=False)
    assert raw.shape == (3, 64, 64, 3)
    resized = _read_patches(FakeSlide(), coords, 64, 32, num_workers=1)
    assert resized.shape == (3, 32, 32, 3)


@pytest.mark.slow  # spawn-context workers cost a few seconds of startup
def test_process_decode_pool_matches_threaded(tmp_path):
    """ProcessDecodePool decodes the same pixels as the thread path."""
    from PIL import Image

    from murcl_tpu.preprocess.decode_pool import ProcessDecodePool
    from murcl_tpu.preprocess.extract import _read_patches
    from murcl_tpu.preprocess.slide_io import open_slide

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    slide_path = tmp_path / "slide.png"
    Image.fromarray(img).save(slide_path)

    coords = [{"x": x, "y": y} for y in (0, 64, 128) for x in (0, 64, 192)]
    want = _read_patches(open_slide(slide_path), coords, 64, 32,
                         num_workers=1)
    with ProcessDecodePool(2) as pool:
        got = pool.read_patches(str(slide_path), coords, 64, 32)
        raw = pool.read_patches(str(slide_path), coords, 64, 32,
                                resize_on_host=False)
    np.testing.assert_array_equal(got, want)
    assert raw.shape == (len(coords), 64, 64, 3)
    np.testing.assert_array_equal(raw[0], img[:64, :64])


def _torchvision_resnet18_state_dict(rng):
    """A random state_dict in torchvision resnet18 layout (keys + shapes).

    torchvision itself is absent here; the layout is the documented one
    (``resnet18-f37072fd.pth``), which ``resnet_params_from_torch``
    consumes and the torch oracle below executes.
    """
    import torch

    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.tensor(
            (rng.normal(size=(cout, cin, k, k)) * 0.05).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(
            (0.5 + rng.uniform(size=c)).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(
            (rng.normal(size=c) * 0.1).astype(np.float32))
        sd[name + ".running_mean"] = torch.tensor(
            (rng.normal(size=c) * 0.1).astype(np.float32))
        sd[name + ".running_var"] = torch.tensor(
            (0.5 + rng.uniform(size=c)).astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    cin = 64
    for i, n_blocks in enumerate([2, 2, 2, 2]):
        w = widths[i]
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            conv(t + ".conv1", w, cin if j == 0 else w, 3)
            bn(t + ".bn1", w)
            conv(t + ".conv2", w, w, 3)
            bn(t + ".bn2", w)
            if j == 0 and i > 0:
                conv(t + ".downsample.0", w, cin, 1)
                bn(t + ".downsample.1", w)
            cin = w
    return sd


def _torch_resnet18_forward(sd, x_nchw):
    """Oracle: resnet18 feature forward in raw torch.nn.functional calls.

    Written from the architecture definition (7x7/2 stem, 3x3/2 maxpool,
    BasicBlock stages [2,2,2,2] with stride-2 + 1x1-downsample at each
    stage transition, global avgpool) — independent of both torchvision
    and the flax encoder under test.
    """
    import torch
    import torch.nn.functional as F

    def bn(x, p):
        return F.batch_norm(x, sd[p + ".running_mean"], sd[p + ".running_var"],
                            sd[p + ".weight"], sd[p + ".bias"],
                            training=False, eps=1e-5)

    with torch.no_grad():
        x = F.conv2d(x_nchw, sd["conv1.weight"], stride=2, padding=3)
        x = F.relu(bn(x, "bn1"))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for i, n_blocks in enumerate([2, 2, 2, 2]):
            for j in range(n_blocks):
                t = f"layer{i + 1}.{j}"
                stride = 2 if (i > 0 and j == 0) else 1
                idn = x
                y = F.conv2d(x, sd[t + ".conv1.weight"], stride=stride, padding=1)
                y = F.relu(bn(y, t + ".bn1"))
                y = F.conv2d(y, sd[t + ".conv2.weight"], padding=1)
                y = bn(y, t + ".bn2")
                if t + ".downsample.0.weight" in sd:
                    idn = F.conv2d(x, sd[t + ".downsample.0.weight"], stride=stride)
                    idn = bn(idn, t + ".downsample.1")
                x = F.relu(y + idn)
        return x.mean(dim=(2, 3)).numpy()


def test_resnet18_export_roundtrip_matches_torch(tmp_path):
    """Full ``--weights`` journey: torchvision-layout state_dict -> the
    export script (``--state_dict`` path, subprocess) -> pickle ->
    ``load_params_npz`` -> flax forward == torch oracle forward.

    Pins the OIHW->HWIO transpose, FrozenBatchNorm running-stat mapping,
    padding conventions, and the avgpool — i.e. that a user's real
    torchvision resnet18 checkpoint reproduces torch features through
    ``extract_features.py --weights`` (reference journey:
    ``wsi_processing/extract_features.py:25-29``).
    """
    import subprocess
    import sys
    from pathlib import Path

    import torch

    from murcl_tpu.preprocess.extract import load_params_npz
    from murcl_tpu.preprocess.resnet import create_encoder

    rng = np.random.default_rng(7)
    sd = _torchvision_resnet18_state_dict(rng)
    ckpt = tmp_path / "resnet18_random.pth"
    torch.save(sd, ckpt)

    out = tmp_path / "resnet18_random.pkl"
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "scripts/export_torchvision_weights.py"),
         "--encoder", "resnet18", "--state_dict", str(ckpt), "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr

    params = load_params_npz(out)
    model, feat_dim = create_encoder("resnet18")

    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(model.apply(params, x))
    oracle = _torch_resnet18_forward(sd, torch.tensor(x).permute(0, 3, 1, 2))

    assert ours.shape == (2, feat_dim) == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------- k-means --
def test_kmeans_recovers_blobs():
    from murcl_tpu.preprocess.kmeans import kmeans

    rng = np.random.default_rng(0)
    centers = np.array([[0, 0], [10, 0], [0, 10]], dtype=np.float32)
    x = np.concatenate([c + 0.3 * rng.normal(size=(50, 2)).astype(np.float32)
                        for c in centers])
    labels, learned = kmeans(x, 3, seed=0, n_init=4)
    assert labels.shape == (150,)
    # each true blob maps to exactly one learned cluster
    for i in range(3):
        blk = labels[i * 50 : (i + 1) * 50]
        assert (blk == blk[0]).all()
    assert len(set(labels[::50])) == 3


def test_kmeans_matches_sklearn_quality():
    from sklearn.cluster import KMeans

    from murcl_tpu.preprocess.kmeans import kmeans

    rng = np.random.default_rng(1)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    labels, centers = kmeans(x, 5, seed=985, n_init=10)
    sk = KMeans(n_clusters=5, random_state=985, n_init=10).fit(x)

    def inertia(x, labels, centers):
        return float(((x - centers[labels]) ** 2).sum())

    ours = inertia(x, labels, centers)
    theirs = sk.inertia_
    assert ours <= theirs * 1.05, f"jax kmeans inertia {ours} vs sklearn {theirs}"


# ----------------------------------------------------------------- heatmap --
def test_heatmap_painting(fake_slide, tmp_path, monkeypatch):
    import importlib

    from murcl_tpu.preprocess import heatmaps as hm
    tiling_mod = importlib.import_module('murcl_tpu.preprocess.tiling')

    monkeypatch.setattr(tiling_mod, "open_slide", lambda _: fake_slide)
    monkeypatch.setattr(hm, "open_slide", lambda _: fake_slide)
    coord = tiling_mod.tiling(
        "fake.png", magnification=20, patch_size=64, scale_factor=8,
        coord_dir=tmp_path, filename="fake",
    )
    attention = np.random.default_rng(0).random(coord["num_patches"])
    img = hm.create_heatmap(tmp_path / "fake.json", attention, slide_level=0)
    assert img.shape == (1536, 2048, 3)
    # the blend leaves no pure-white pixel where a rectangle was painted
    c0 = coord["coords"][0]
    assert not (img[c0["y"] + 5, c0["x"] + 5] == 255).all()


def test_attention_scorer_bucketing():
    from murcl_tpu.preprocess.heatmaps import AttentionScorer

    scorer = AttentionScorer(dim_patch=16, num_classes=2, bucket=32)
    rng = np.random.default_rng(0)
    att1 = scorer(rng.normal(size=(40, 16)).astype(np.float32))
    assert att1.shape == (40,)
    att2 = scorer(rng.normal(size=(7, 16)).astype(np.float32))
    assert att2.shape == (7,)
    assert np.isfinite(att1).all() and np.isfinite(att2).all()
