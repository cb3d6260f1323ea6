"""Batched patch-feature extraction: the reference's biggest perf win.

Reference (``wsi_processing/extract_features.py:47-102``): for each coord
json, re-open the slide and run ONE 256x256 patch per forward through the
encoder — a host->device copy and a device->host copy per patch, thousands
of batch-1 forwards per slide. The BASELINE north star (">10x A100
patches/sec") targets exactly this loop.

TPU redesign: a double-buffered producer/consumer. A thread pool decodes
patch regions into pinned host batches (CPU-bound OpenSlide/PIL work) while
the device runs the jitted encoder on the previous batch; features come
back asynchronously. Preprocessing matches the reference bit-for-bit:
resize to ``patch_size`` then ``ToTensor`` scaling to [0,1] — **no
ImageNet normalization** (``extract_features.py:38-44``), reproduced
deliberately for feature parity (flag ``imagenet_norm=True`` opts into the
fix).

Weights: torchvision import when available, else a params npz produced by
:func:`save_params_npz` (zero-egress environments), else random init with
a loud warning.
"""

from __future__ import annotations

import pickle
import queue
import threading
import time
from pathlib import Path
from typing import List, Optional

import numpy as np

from murcl_tpu.data.contract import save_features_npz
from murcl_tpu.preprocess.resnet import create_encoder, load_torchvision_weights
from murcl_tpu.preprocess.slide_io import open_slide
from murcl_tpu.utils.general import load_json

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def save_params_npz(params, path) -> None:
    with open(path, "wb") as fp:
        pickle.dump(params, fp)


def load_params_npz(path):
    with open(path, "rb") as fp:
        return pickle.load(fp)


class PatchEncoder:
    """Jitted batched image encoder with fixed batch shape."""

    def __init__(self, image_encoder: str = "resnet18", batch_size: int = 256,
                 patch_size: int = 256, weights: Optional[str] = None,
                 imagenet_norm: bool = False, dtype: str = "float32",
                 resize_on_device: bool = False):
        import jax
        import jax.numpy as jnp

        self.model, self.feature_dim = create_encoder(image_encoder)
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.imagenet_norm = imagenet_norm
        self.resize_on_device = resize_on_device

        if weights is not None:
            self.params = load_params_npz(weights)
        else:
            try:
                self.params = load_torchvision_weights(image_encoder)
            except Exception as e:
                print(f"WARNING: pretrained {image_encoder} weights unavailable "
                      f"({type(e).__name__}: {e}); using random init. "
                      f"Pass --weights <params.pkl> for ImageNet features.")
                self.params = self.model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, patch_size, patch_size, 3), jnp.float32),
                )

        compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

        @jax.jit
        def encode(params, batch_u8):
            x = batch_u8.astype(compute_dtype)
            if resize_on_device and batch_u8.shape[1] != patch_size:
                # host threads then only DECODE; the downscale runs on the
                # VPU (bilinear, torchvision-Resize semantics) fused with
                # the scaling below. On direct-attached hosts this removes
                # the per-patch PIL resize from the CPU critical path.
                x = jax.image.resize(
                    x, (x.shape[0], patch_size, patch_size, 3), method="bilinear"
                )
            x = x / 255.0  # ToTensor
            if self.imagenet_norm:
                x = (x - IMAGENET_MEAN.astype(compute_dtype)) / IMAGENET_STD.astype(compute_dtype)
            return self.model.apply(params, x).astype(jnp.float32)

        self._encode = encode

    def encode_patches(self, patches_u8: np.ndarray) -> np.ndarray:
        """Encode ``(N, H, W, 3) uint8`` -> ``(N, feature_dim) float32``.

        Pads the final chunk to the static batch size (one compile total).
        """
        n = patches_u8.shape[0]
        out = np.empty((n, self.feature_dim), dtype=np.float32)
        bs = self.batch_size
        # dispatch all chunks before reading any result back: device compute
        # overlaps the host->device copies of later chunks
        pending = []
        for start in range(0, n, bs):
            chunk = patches_u8[start : start + bs]
            if chunk.shape[0] < bs:
                pad = np.zeros((bs - chunk.shape[0],) + chunk.shape[1:], chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            pending.append((start, self._encode(self.params, chunk)))
        for start, feats in pending:
            out[start : start + bs] = np.asarray(feats)[: min(bs, n - start)]
        return out


def _read_patches(slide, coords: List[dict], patch_size_level0: int,
                  patch_size: int, num_workers: int = 8,
                  resize_on_host: bool = True) -> np.ndarray:
    """Decode all patch regions of one slide into a uint8 array, threaded.

    With ``resize_on_host=False`` the raw level-0 patches are returned and
    the encoder's jitted program downscales them on device.
    """
    n = len(coords)
    out_size = patch_size if resize_on_host else patch_size_level0
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)

    def work(i):
        c = coords[i]
        img = slide.read_region(
            location=(c["x"], c["y"]), level=0,
            size=(patch_size_level0, patch_size_level0),
        ).convert("RGB")
        if resize_on_host and patch_size_level0 != patch_size:
            img = img.resize((patch_size, patch_size))
        out[i] = np.asarray(img, dtype=np.uint8)

    if num_workers <= 1 or n < 4:
        for i in range(n):
            work(i)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(num_workers) as pool:
            list(pool.map(work, range(n)))
    return out


def extract_features(
    patch_dir,
    save_dir,
    image_encoder: str = "resnet18",
    batch_size: int = 256,
    num_workers: int = 8,
    weights: Optional[str] = None,
    exist_ok: bool = False,
    imagenet_norm: bool = False,
    resize_on_device: bool = False,
    decode_pool: str = "thread",
) -> None:
    """All coord jsons under ``patch_dir/coord`` -> feature npz per slide.

    Double-buffered: slide i+1's patches decode on host workers while slide
    i encodes on device. Skips existing npz (``extract_features.py:61-63``).
    ``decode_pool='process'`` decodes through
    :class:`murcl_tpu.preprocess.decode_pool.ProcessDecodePool` — true
    multi-core scaling for the GIL-bound PIL decode (the thread default is
    right for small hosts; a chip-saturating deployment needs ~tens of
    decode cores, BASELINE.md).
    """
    patch_dir, save_dir = Path(patch_dir), Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    coord_paths = sorted((patch_dir / "coord").glob("*.json"))
    todo = []
    for cp in coord_paths:
        if (save_dir / f"{cp.stem}.npz").exists() and not exist_ok:
            print(f"{cp.stem} skipped: npz exists")
            continue
        todo.append(cp)
    if not todo:
        return

    encoder = PatchEncoder(image_encoder, batch_size=batch_size, weights=weights,
                           imagenet_norm=imagenet_norm,
                           resize_on_device=resize_on_device)

    q: "queue.Queue" = queue.Queue(maxsize=2)  # double buffer

    pool = None
    if decode_pool == "process":
        from murcl_tpu.preprocess.decode_pool import ProcessDecodePool

        pool = ProcessDecodePool(num_workers)

    def producer():
        for cp in todo:
            coord = load_json(cp)
            if coord["num_patches"] == 0:
                # reference skips empty slides (extract_features.py:69-71)
                print(f"{cp.stem}'s num_patches is 0, skip!")
                continue
            if pool is not None:
                patches = pool.read_patches(
                    coord["slide_filepath"], coord["coords"],
                    coord["patch_size_level0"], coord["patch_size"],
                    resize_on_host=not resize_on_device,
                )
            else:
                slide = open_slide(coord["slide_filepath"])
                patches = _read_patches(
                    slide, coord["coords"], coord["patch_size_level0"],
                    coord["patch_size"], num_workers,
                    resize_on_host=not resize_on_device,
                )
            q.put((cp.stem, coord, patches))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    total_patches, t0 = 0, time.perf_counter()
    while True:
        item = q.get()
        if item is None:
            break
        stem, coord, patches = item
        feats = encoder.encode_patches(patches)
        coords_rc = np.asarray([[c["row"], c["col"]] for c in coord["coords"]],
                               dtype=np.int64)
        save_features_npz(
            save_dir / f"{stem}.npz", filename=stem,
            num_row=coord["num_row"], num_col=coord["num_col"],
            img_features=feats, coords=coords_rc,
        )
        total_patches += patches.shape[0]
        dt = time.perf_counter() - t0
        print(f"{stem}: {patches.shape[0]} patches -> {feats.shape} "
              f"({total_patches / dt:.1f} patches/sec cumulative)")
    t.join()
    if pool is not None:
        pool.close()
