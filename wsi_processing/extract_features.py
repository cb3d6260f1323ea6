#!/usr/bin/env python
"""Patch feature extraction CLI (reference ``wsi_processing/extract_features.py:126-134``).

Same flags plus TPU-era extras (``--batch_size``, ``--num_workers``,
``--weights``, ``--imagenet_norm``); implementation in
:mod:`murcl_tpu.preprocess.extract` — batched/double-buffered instead of
the reference's one-patch-per-forward loop.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
from pathlib import Path

from murcl_tpu.preprocess.extract import extract_features


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--patch_dir', type=str, default='',
                        help="directory containing the `coord` folder")
    parser.add_argument('--save_dir', type=str, default=None)
    parser.add_argument('--image_encoder', type=str, default='resnet18',
                        choices=['resnet18', 'resnet50', 'vgg16'])
    parser.add_argument('--device', default='0',
                        help="kept for recipe compatibility; JAX picks the backend")
    parser.add_argument('--exist_ok', action='store_true', default=False)
    parser.add_argument('--batch_size', type=int, default=256)
    parser.add_argument('--num_workers', type=int, default=8)
    parser.add_argument('--weights', type=str, default=None,
                        help="pickled flax params (for zero-egress environments)")
    parser.add_argument('--imagenet_norm', action='store_true', default=False,
                        help="apply ImageNet normalization (the reference does NOT)")
    parser.add_argument('--resize_on_device', action='store_true', default=False,
                        help="ship raw level-0 uint8 patches and downscale on "
                             "the accelerator (removes PIL resize from the "
                             "host critical path; best on direct-attached TPU)")
    parser.add_argument('--decode_pool', type=str, default='thread',
                        choices=['thread', 'process'],
                        help="patch decode workers: 'process' scales the "
                             "GIL-bound PIL decode across cores (shared-"
                             "memory pool); 'thread' is right for small hosts")
    args = parser.parse_args()

    if args.save_dir is not None:
        save_dir = Path(args.save_dir) / args.image_encoder
    else:
        save_dir = Path(args.patch_dir) / 'features' / args.image_encoder
    extract_features(
        args.patch_dir, save_dir, image_encoder=args.image_encoder,
        batch_size=args.batch_size, num_workers=args.num_workers,
        weights=args.weights, exist_ok=args.exist_ok,
        imagenet_norm=args.imagenet_norm,
        resize_on_device=args.resize_on_device,
        decode_pool=args.decode_pool,
    )


if __name__ == '__main__':
    main()
