"""On-disk data contract, preserved bit-for-bit from the reference.

The contract (reference README.md:104-136 and SURVEY §1):

- CSV manifest with columns ``case_id, features_filepath, label,
  clusters_filepath, clusters_json_filepath``; indexed by ``case_id``; the
  number of clusters is parsed from the CSV filename stem's last
  ``_``-separated token (``utils/datasets.py:138-140``).
- Features ``.npz`` with keys ``filename, num_patches, num_row, num_col,
  img_features (N, D) float, coords (N, 2) int``
  (``wsi_processing/extract_features.py:96-102``).
- Cluster ``.npz`` with key ``features_cluster_indices`` of shape ``(N, 1)``
  and a cluster ``.json`` holding a list of K lists of patch indices
  (``wsi_processing/features_clustering.py:12-25``).
- Split ``.json``: dict of case-id lists keyed ``train / valid / test``
  (optionally ``train_sub_per10``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import numpy as np
import pandas as pd

from murcl_tpu.utils.general import dump_json, load_json

MANIFEST_COLUMNS = [
    "case_id",
    "features_filepath",
    "label",
    "clusters_filepath",
    "clusters_json_filepath",
]


def num_clusters_from_csv(data_csv) -> int:
    """Parse K from the manifest filename, e.g. ``camelyon16_10.csv`` -> 10."""
    return int(Path(data_csv).stem.split("_")[-1])


def load_manifest(data_csv, indices=None) -> pd.DataFrame:
    """Load the CSV manifest indexed by ``case_id``, optionally row-selected."""
    df = pd.read_csv(data_csv)
    df.set_index(keys="case_id", inplace=True)
    if indices is not None:
        df = df.loc[list(indices)]
    return df


def load_features_npz(path) -> np.ndarray:
    """Load ``img_features`` from a feature npz: float32 array ``(N, D)``."""
    return np.asarray(np.load(path)["img_features"], dtype=np.float32)


def load_features_meta(path) -> dict:
    """Load the full feature npz (features + tiling metadata)."""
    with np.load(path, allow_pickle=True) as z:
        return {k: z[k] for k in z.files}


def save_features_npz(path, filename: str, num_row: int, num_col: int,
                      img_features: np.ndarray, coords: np.ndarray) -> None:
    """Write a feature npz with the exact reference key set."""
    np.savez(
        file=path,
        filename=filename,
        num_patches=img_features.shape[0],
        num_row=num_row,
        num_col=num_col,
        img_features=img_features,
        coords=coords,
    )


def load_cluster_json(path) -> List[List[int]]:
    """Load the inverted cluster index: a list of K lists of patch indices."""
    return load_json(path)


def save_cluster_npz_json(labels: np.ndarray, num_clusters: int,
                          npz_path=None, json_path=None) -> List[List[int]]:
    """Write the ``(N, 1)`` label npz and the inverted-index json."""
    labels = np.asarray(labels).reshape(-1)
    if npz_path is not None:
        np.savez(file=npz_path, features_cluster_indices=labels[:, None])
    inverted: List[List[int]] = [[] for _ in range(num_clusters)]
    for patch_idx, cluster_idx in enumerate(labels):
        inverted[int(cluster_idx)].append(patch_idx)
    if json_path is not None:
        dump_json(inverted, json_path)
    return inverted


def load_split(path) -> Dict[str, List[str]]:
    """Load the split json (keys ``train/valid/test``, optionally more)."""
    return load_json(path)


def save_coord_json(path, slide_filepath: str, magnification: int,
                    magnification_level0: int, num_row: int, num_col: int,
                    patch_size: int, patch_size_level0: int,
                    coords: List[dict]) -> None:
    """Write a per-slide coord json (``wsi_processing/create_patches.py:108-121``)."""
    dump_json(
        {
            "slide_filepath": str(slide_filepath),
            "magnification": magnification,
            "magnification_level0": magnification_level0,
            "num_row": num_row,
            "num_col": num_col,
            "patch_size": patch_size,
            "patch_size_level0": patch_size_level0,
            "num_patches": len(coords),
            "coords": coords,
        },
        path,
    )
