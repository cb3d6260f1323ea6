#!/usr/bin/env python
"""Attention heatmap CLI (reference ``scripts/create_heatmaps.py:182-213``)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

from murcl_tpu.preprocess.heatmaps import run_heatmaps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_csv', type=str, default='')
    parser.add_argument('--coord_dir', type=str, default='',
                        help="directory of per-slide coord json files")
    parser.add_argument('--save_dir', type=str, default='')
    parser.add_argument('--checkpoint', type=str, default=None,
                        help="MuRCL/RLMIL checkpoint to pull the CLAM weights from")
    parser.add_argument('--annotation_dir', type=str, default=None,
                        help="optional Camelyon16 annotation XML directory")
    parser.add_argument('--draw_contours', action='store_true', default=False,
                        help="overlay ground-truth ROI contours from annotation XML")
    parser.add_argument('--arch', type=str, default='CLAM_SB', choices=['CLAM_SB'])
    parser.add_argument('--num_classes', type=int, default=2)
    parser.add_argument('--size_arg', type=str, default='small', choices=['small', 'big'])
    parser.add_argument('--k_sample', type=int, default=8)
    parser.add_argument('--preload', action='store_true', default=False)
    parser.add_argument('--slide_level', type=int, default=-1)
    parser.add_argument('--exist_ok', action='store_true', default=False)
    parser.add_argument('--bucket', type=int, default=512,
                        help="pad full bags to multiples of this (compile bucketing)")
    parser.add_argument('--device', default='0',
                        help="kept for recipe compatibility; JAX picks the backend")
    args = parser.parse_args()
    run_heatmaps(args)


if __name__ == '__main__':
    main()
