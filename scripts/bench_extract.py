#!/usr/bin/env python
"""Benchmark: patch-feature extraction throughput (patches/sec per chip).

The reference extracts ONE 256x256 patch per encoder forward
(``wsi_processing/extract_features.py:80-91``) — the structurally starved
loop the BASELINE north star targets. This measures our batched jitted
ResNet18 path on synthetic uint8 patches (device compute only; slide IO
overlaps on host threads in the real pipeline) and the reference's
batch-1 torch loop on this host's CPU for the honest local baseline.

Prints one json line like bench.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PATCHES, PATCH, BATCH = 2048, 256, 256


def measure_ours() -> float:
    import jax

    from murcl_tpu.preprocess.extract import PatchEncoder

    enc = PatchEncoder("resnet18", batch_size=BATCH, patch_size=PATCH, dtype="bfloat16")
    rng = np.random.default_rng(0)
    patches = rng.integers(0, 255, (N_PATCHES, PATCH, PATCH, 3), dtype=np.uint8)

    enc.encode_patches(patches[:BATCH])  # compile
    out = enc.encode_patches(patches[:BATCH])  # warm
    assert np.isfinite(out).all()

    t0 = time.perf_counter()
    feats = enc.encode_patches(patches)
    # encode_patches copies results to host per chunk, so it is synchronous
    dt = time.perf_counter() - t0
    assert feats.shape == (N_PATCHES, 512)
    return N_PATCHES / dt


def measure_chip_bound(k: int = 16, encoder: str = "resnet18") -> float:
    """Encoder throughput with the batch already device-resident.

    The pipeline number above includes host->device copies through the
    axon relay (~tunnel-bound); this stages ONE uint8 batch in HBM and
    times K jitted encodes inside a single on-device loop with a data
    dependence — the chip-bound patches/sec a direct-attached host sees.
    """
    import jax
    import jax.numpy as jnp

    from murcl_tpu.preprocess.extract import PatchEncoder

    enc = PatchEncoder(encoder, batch_size=BATCH, patch_size=PATCH,
                       dtype="bfloat16")
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 255, (BATCH, PATCH, PATCH, 3), dtype=np.uint8))
    params = jax.device_put(enc.params)

    @jax.jit
    def loop(params, batch):
        def body(i, carry):
            feats = enc._encode(params, batch + carry)
            return (jnp.max(feats) * 0).astype(jnp.uint8)
        return jax.lax.fori_loop(0, k, body, jnp.uint8(0))

    loop(params, batch)  # compile
    float(loop(params, batch))  # warm + sync
    t0 = time.perf_counter()
    float(loop(params, batch))
    dt = time.perf_counter() - t0
    return k * BATCH / dt


def measure_reference(n: int = 16) -> float:
    """Reference semantics: torchvision-style resnet18, batch size 1."""
    import torch
    import torch.nn as nn

    # torchvision isn't installed here; the reference encoder is resnet18
    # with fc stripped — build the equivalent compute with torch.hub-free
    # layers (same FLOPs/arch) for an honest per-forward timing
    sys.path.insert(0, "/root/reference")
    try:
        torch.set_num_threads(max(1, torch.get_num_threads()))

        def conv_bn(cin, cout, stride=1):
            return nn.Sequential(
                nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            )

        class Block(nn.Module):
            def __init__(self, cin, cout, stride=1):
                super().__init__()
                self.c1 = conv_bn(cin, cout, stride)
                self.c2 = nn.Sequential(
                    nn.Conv2d(cout, cout, 3, 1, 1, bias=False), nn.BatchNorm2d(cout)
                )
                self.down = (
                    nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                  nn.BatchNorm2d(cout))
                    if (stride != 1 or cin != cout) else nn.Identity()
                )

            def forward(self, x):
                return torch.relu(self.c2(self.c1(x)) + self.down(x))

        layers = [nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                  nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1)]
        widths = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for cin, cout, s in widths:
            layers += [Block(cin, cout, s), Block(cout, cout)]
        layers += [nn.AdaptiveAvgPool2d(1), nn.Flatten()]
        model = nn.Sequential(*layers).eval()

        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        with torch.no_grad():
            for _ in range(n):  # batch size 1, like the reference loop
                x = torch.from_numpy(
                    rng.random((1, 3, PATCH, PATCH), dtype=np.float32)
                )
                model(x)
        return n / (time.perf_counter() - t0)
    finally:
        sys.path.remove("/root/reference")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="resnet18",
                    choices=["resnet18", "resnet50", "vgg16"],
                    help="which reference encoder to bench chip-bound "
                         "(extract_features.py:15-33); non-default skips "
                         "the pipeline + torch-reference measurements")
    args = ap.parse_args()
    if args.encoder != "resnet18":
        chip = measure_chip_bound(encoder=args.encoder)
        print(json.dumps({
            "metric": "feature_extraction_patches_per_sec",
            "value": round(chip, 1),
            "unit": f"patches/sec chip-bound ({args.encoder} bf16, "
                    f"256x256, batch={BATCH})",
            "vs_baseline": None,
        }))
        return
    ours = measure_ours()
    chip = measure_chip_bound()
    print(f"pipeline (incl. H2D through tunnel): {ours:.1f} patches/sec; "
          f"chip-bound: {chip:.1f} patches/sec", file=sys.stderr)
    base_file = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    data = json.loads(base_file.read_text()) if base_file.exists() else {}
    if "reference_patches_per_sec" not in data:
        try:
            data["reference_patches_per_sec"] = measure_reference()
            base_file.write_text(json.dumps(data, indent=2))
        except Exception as e:
            print(f"reference extract baseline failed: {e}", file=sys.stderr)
    baseline = data.get("reference_patches_per_sec")
    print(json.dumps({
        "metric": "feature_extraction_patches_per_sec",
        "value": round(chip, 1),
        "unit": "patches/sec chip-bound (resnet18 bf16, 256x256, batch=256; "
                "pipeline-through-tunnel: " + str(round(ours, 1)) + ")",
        "vs_baseline": round(chip / baseline, 2) if baseline else None,
    }))


if __name__ == "__main__":
    main()
