#!/usr/bin/env python
"""Per-slide k-means CLI (reference ``wsi_processing/features_clustering.py:58-64``).

Same flags plus ``--backend {jax,sklearn}``; writes the ``(N, 1)`` label npz
and inverted-index json contract via :mod:`murcl_tpu.data.contract`.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
from pathlib import Path

import numpy as np

from murcl_tpu.data.contract import save_cluster_npz_json
from murcl_tpu.preprocess.kmeans import kmeans


def run(args):
    save_dir = Path(args.feat_dir) / f'k-means-{args.num_clusters}'
    save_dir.mkdir(parents=True, exist_ok=True)

    feat_paths = sorted(Path(args.feat_dir).glob('*.npz'))
    for i, feat_npz in enumerate(feat_paths):
        case_id = feat_npz.stem
        npz_filepath = save_dir / f'{case_id}.npz'
        json_filepath = save_dir / f'{case_id}.json'
        if npz_filepath.exists() and not args.exist_ok:
            print(f"{npz_filepath} exists!")
            continue
        feats = np.load(str(feat_npz))['img_features']
        if feats.shape[0] < args.num_clusters:
            print(f"{case_id}: fewer features than clusters, skipping.")
            continue
        labels, _ = kmeans(feats, args.num_clusters, seed=args.seed,
                           backend=args.backend)
        save_cluster_npz_json(labels, args.num_clusters,
                              npz_path=npz_filepath, json_path=json_filepath)
        print(f"{i + 1:3}/{len(feat_paths):3} {case_id}: {feats.shape[0]} features -> "
              f"{args.num_clusters} clusters")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--feat_dir', type=str, default='',
                        help="directory containing feature npz files")
    parser.add_argument('--num_clusters', type=int, default=10)
    parser.add_argument('--exist_ok', action='store_true', default=False)
    parser.add_argument('--seed', type=int, default=985)
    parser.add_argument('--backend', type=str, default='jax', choices=['jax', 'sklearn'])
    args = parser.parse_args()
    run(args)


if __name__ == '__main__':
    main()
