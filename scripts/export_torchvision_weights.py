#!/usr/bin/env python
"""Export ImageNet encoder weights into the ``--weights`` pickle format.

The reference auto-downloads pretrained torchvision backbones at
extraction time (``wsi_processing/extract_features.py:25-29``). This
environment is zero-egress and has no torchvision, so the journey is:
run THIS script on any machine that has torchvision (or just torch plus
an already-downloaded checkpoint), copy the pickle over, and pass it to
the extractor:

    # on a machine with torchvision:
    python scripts/export_torchvision_weights.py \
        --encoder resnet18 --out resnet18_imagenet.pkl

    # OR, with only torch + a downloaded torchvision state_dict
    # (e.g. resnet18-f37072fd.pth from download.pytorch.org):
    python scripts/export_torchvision_weights.py \
        --encoder resnet18 --state_dict resnet18-f37072fd.pth \
        --out resnet18_imagenet.pkl

    # then, on this host:
    python wsi_processing/extract_features.py ... \
        --image_encoder resnet18 --weights resnet18_imagenet.pkl

The numeric mapping (torch OIHW -> flax HWIO, BatchNorm running stats ->
FrozenBatchNorm params) lives in ``murcl_tpu.preprocess.resnet`` and is
pinned against a torch oracle forward by
``tests/test_preprocess.py::test_resnet18_export_roundtrip_matches_torch``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (stage_sizes, bottleneck) per torchvision resnet variant
RESNET_ARCH = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet50": ((3, 4, 6, 3), True),
}


def params_from_state_dict(encoder: str, sd):
    """Map a torchvision-layout state_dict onto the flax encoder tree."""
    from murcl_tpu.preprocess.resnet import (
        resnet_params_from_torch,
        vgg16_params_from_torch,
    )

    if encoder == "vgg16":
        return vgg16_params_from_torch(sd)
    stage_sizes, bottleneck = RESNET_ARCH[encoder]
    return resnet_params_from_torch(sd, stage_sizes, bottleneck)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--encoder", default="resnet18",
                    choices=["resnet18", "resnet50", "vgg16"])
    ap.add_argument("--state_dict", default=None,
                    help="path to a torch state_dict checkpoint (.pth); "
                         "needs only torch, not torchvision")
    ap.add_argument("--out", required=True, help="output pickle path")
    args = ap.parse_args()

    from murcl_tpu.preprocess.extract import save_params_npz

    if args.state_dict:
        import torch

        sd = torch.load(args.state_dict, map_location="cpu",
                        weights_only=True)
        if not isinstance(sd, dict):
            sd = sd.state_dict()
        params = params_from_state_dict(args.encoder, sd)
    else:
        from murcl_tpu.preprocess.resnet import load_torchvision_weights

        params = load_torchvision_weights(args.encoder)

    save_params_npz(params, args.out)
    print(f"wrote {args.encoder} params -> {args.out}")


if __name__ == "__main__":
    main()
