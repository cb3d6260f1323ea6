"""Synthetic dataset fixtures exercising the full csv/npz/json contract.

Generates fake slides (random patch features with class-dependent signal,
k-means-style clusters) and writes them through
:mod:`murcl_tpu.data.contract` so loaders, banks, training drivers and
tests run end-to-end without real WSIs. The reference has no test data at
all (SURVEY §4); this module is the fixture layer its test strategy lacked.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from murcl_tpu.data import contract
from murcl_tpu.utils.general import dump_json


def make_synthetic_slide(
    rng: np.random.Generator,
    num_patches: int,
    dim: int,
    num_clusters: int,
    label: int,
    signal: float = 2.0,
):
    """One fake slide: features ``(N, D)`` + cluster labels ``(N,)``.

    Patches are drawn around ``num_clusters`` random centroids; slides with
    ``label == 1`` get a shifted "tumor" cluster so classifiers have signal
    to find. Cluster assignment is by construction (no k-means needed).
    """
    centroids = rng.normal(size=(num_clusters, dim)).astype(np.float32)
    assignment = rng.integers(0, num_clusters, size=num_patches)
    feats = centroids[assignment] + 0.3 * rng.normal(size=(num_patches, dim)).astype(np.float32)
    if label == 1:
        tumor_cluster = int(rng.integers(0, num_clusters))
        tumor_mask = assignment == tumor_cluster
        feats[tumor_mask] += signal / np.sqrt(dim)
    return feats.astype(np.float32), assignment.astype(np.int64)


def generate_synthetic_dataset(
    root,
    num_slides: int = 8,
    dim: int = 64,
    num_clusters: int = 5,
    min_patches: int = 60,
    max_patches: int = 200,
    seed: int = 985,
    splits: Optional[dict] = None,
    signal: float = 2.0,
) -> dict:
    """Write a full synthetic dataset under ``root`` in the reference layout.

    Produces ``features/<case>.npz``, ``k-means-K/<case>.{npz,json}``, a
    manifest ``synthetic_{K}.csv``, and ``data_split.json``. Returns a dict
    with the paths (``data_csv``, ``data_split_json``, ``feat_dir``).
    """
    root = Path(root)
    feat_dir = root / "features"
    cluster_dir = root / f"k-means-{num_clusters}"
    feat_dir.mkdir(parents=True, exist_ok=True)
    cluster_dir.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    rows: List[dict] = []
    case_ids: List[str] = []
    for i in range(num_slides):
        case_id = f"synt_{i:03d}"
        label = i % 2
        num_patches = int(rng.integers(min_patches, max_patches + 1))
        feats, assignment = make_synthetic_slide(rng, num_patches, dim, num_clusters, label, signal=signal)

        side = int(np.ceil(np.sqrt(num_patches)))
        coords = np.stack([np.arange(num_patches) // side, np.arange(num_patches) % side], axis=1)
        feat_path = feat_dir / f"{case_id}.npz"
        contract.save_features_npz(
            feat_path, case_id, num_row=side, num_col=side,
            img_features=feats, coords=coords.astype(np.int64),
        )
        contract.save_cluster_npz_json(
            assignment, num_clusters,
            npz_path=cluster_dir / f"{case_id}.npz",
            json_path=cluster_dir / f"{case_id}.json",
        )
        rows.append(
            {
                "case_id": case_id,
                "features_filepath": str(feat_path),
                "label": label,
                "clusters_filepath": str(cluster_dir / f"{case_id}.npz"),
                "clusters_json_filepath": str(cluster_dir / f"{case_id}.json"),
            }
        )
        case_ids.append(case_id)

    import pandas as pd

    data_csv = root / f"synthetic_{num_clusters}.csv"
    pd.DataFrame(rows, columns=contract.MANIFEST_COLUMNS).to_csv(data_csv, index=False)

    if splits is None:
        n_train = max(2, int(0.5 * num_slides))
        n_valid = max(1, int(0.25 * num_slides))
        splits = {
            "train": case_ids[:n_train],
            "valid": case_ids[n_train : n_train + n_valid],
            "test": case_ids[n_train + n_valid :] or case_ids[-2:],
        }
    split_path = root / "data_split.json"
    dump_json(splits, split_path)

    return {
        "data_csv": str(data_csv),
        "data_split_json": str(split_path),
        "feat_dir": str(feat_dir),
        "cluster_dir": str(cluster_dir),
        "case_ids": case_ids,
        "num_clusters": num_clusters,
        "dim": dim,
    }
