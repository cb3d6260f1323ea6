#!/usr/bin/env python
"""Host-side extraction staging throughput (the non-chip half of the story).

BASELINE.md records the chip-bound encode rate (17,343 patches/sec,
resnet18 bf16 batch 256). This measures the other half the reference's
loop also pays (``wsi_processing/extract_features.py:80-91``): per-patch
``read_region -> RGB convert -> resize -> uint8 staging`` on the host,
over a large synthetic slide fixture.

Environment caveats (recorded with the number): openslide is absent here,
so the fixture path reads through ``ImageSlide`` — the slide is decoded
once into RAM and ``read_region`` is a crop. Real openslide adds per-tile
JPEG decode on top; treat the measured rate as the staging (crop/resize/
copy) component, an upper bound on this host's single-core decode rate.
Additionally this VM has ONE vCPU with heavy steal: identical reps vary
25x (9.8 -> 252 -> 15.6 patches/sec measured back to back), so only the
PEAK across reps approximates the true single-core rate — the script
reports the best of several repetitions.

Prints one json line like bench.py.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SLIDE_PX = 8192
PATCH_L0, PATCH = 512, 256  # 40x -> 20x: decode 512, resize to 256


def main():
    from PIL import Image

    from murcl_tpu.preprocess.extract import _read_patches
    from murcl_tpu.preprocess.slide_io import ImageSlide

    rng = np.random.default_rng(0)
    img = rng.integers(60, 220, (SLIDE_PX, SLIDE_PX, 3), dtype=np.uint8)
    slide = ImageSlide("fixture.png", image=Image.fromarray(img))

    grid = SLIDE_PX // PATCH_L0
    coords = [{"x": c * PATCH_L0, "y": r * PATCH_L0, "row": r, "col": c}
              for r in range(grid) for c in range(grid)]
    n = len(coords)

    # warm pass (pages + allocator), then best-of-3 per config: the vCPU
    # steal on this host makes single runs meaningless (see docstring)
    _read_patches(slide, coords, PATCH_L0, PATCH, num_workers=1,
                  resize_on_host=False)
    results = {}
    for workers in (1, 8):
        for resize_on_host, tag in ((True, "resize_host"), (False, "raw")):
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                out = _read_patches(slide, coords, PATCH_L0, PATCH,
                                    num_workers=workers,
                                    resize_on_host=resize_on_host)
                dt = time.perf_counter() - t0
                assert out.shape[0] == n
                best = max(best, n / dt)
            results[f"{tag}_w{workers}"] = round(best, 1)
            print(f"{tag} workers={workers}: best {best:.1f} patches/sec "
                  f"({n} patches x3 reps)", file=sys.stderr)

    # process pool (decode_pool='process'): the multi-core scaling route.
    # The fixture must exist on disk — workers open it by path.
    from murcl_tpu.preprocess.decode_pool import ProcessDecodePool

    tmp = Path(tempfile.mkdtemp(prefix="bench_decode_"))
    slide_path = str(tmp / "fixture.png")
    Image.fromarray(img).save(slide_path)
    for workers in (1, 2, 4):
        with ProcessDecodePool(workers) as pool:
            pool.read_patches(slide_path, coords[:8], PATCH_L0, PATCH)  # warm
            for resize_on_host, tag in ((True, "resize_host"), (False, "raw")):
                best = 0.0
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = pool.read_patches(slide_path, coords, PATCH_L0,
                                            PATCH,
                                            resize_on_host=resize_on_host)
                    dt = time.perf_counter() - t0
                    assert out.shape[0] == n
                    best = max(best, n / dt)
                results[f"proc_{tag}_w{workers}"] = round(best, 1)
                print(f"process {tag} workers={workers}: best {best:.1f} "
                      f"patches/sec", file=sys.stderr)

    best = max(results, key=results.get)
    print(json.dumps({
        "metric": "host_patch_staging_patches_per_sec",
        "value": results[best],
        "unit": f"patches/sec ({PATCH_L0}->{PATCH}px, ImageSlide fixture, "
                f"best config {best}; this host has 1 core — thread workers "
                "only pay off on real multi-core hosts)",
        "vs_baseline": None,
        "detail": results,
    }))


if __name__ == "__main__":
    main()
