"""Data-contract round trips: csv/npz/json layouts and dataset views."""

import json

import numpy as np

from murcl_tpu.data import contract
from murcl_tpu.data.bank import build_bank
from murcl_tpu.data.datasets import WSIDataset, WSIWithCluster


def test_manifest_and_num_clusters(synthetic_dataset):
    csv = synthetic_dataset["data_csv"]
    assert contract.num_clusters_from_csv(csv) == synthetic_dataset["num_clusters"]
    df = contract.load_manifest(csv)
    assert list(df.columns) == contract.MANIFEST_COLUMNS[1:]
    assert df.index.name == "case_id"


def test_features_npz_keys(synthetic_dataset):
    df = contract.load_manifest(synthetic_dataset["data_csv"])
    path = df.iloc[0]["features_filepath"]
    with np.load(path, allow_pickle=True) as z:
        assert set(z.files) == {"filename", "num_patches", "num_row", "num_col", "img_features", "coords"}
        assert z["img_features"].shape[0] == int(z["num_patches"])
        assert z["coords"].shape == (int(z["num_patches"]), 2)


def test_cluster_json_inverted_index(synthetic_dataset):
    df = contract.load_manifest(synthetic_dataset["data_csv"])
    row = df.iloc[0]
    with np.load(row["clusters_filepath"]) as z:
        labels = z["features_cluster_indices"]
    assert labels.ndim == 2 and labels.shape[1] == 1
    clusters = contract.load_cluster_json(row["clusters_json_filepath"])
    assert len(clusters) == synthetic_dataset["num_clusters"]
    # inverted index is a partition of patch indices matching the npz labels
    all_indices = sorted(i for c in clusters for i in c)
    assert all_indices == list(range(labels.shape[0]))
    for k, members in enumerate(clusters):
        assert all(labels[i, 0] == k for i in members)


def test_split_json(synthetic_dataset):
    split = contract.load_split(synthetic_dataset["data_split_json"])
    assert {"train", "valid", "test"} <= set(split)


def test_wsi_dataset_item(synthetic_dataset):
    ds = WSIDataset(synthetic_dataset["data_csv"], preload=True)
    feat, label, case_id = ds[0]
    assert feat.ndim == 2 and feat.dtype == np.float32
    assert label in (0, 1)
    assert case_id.startswith("synt_")


def test_wsi_dataset_sampling_fixed_size(synthetic_dataset):
    ds = WSIDataset(synthetic_dataset["data_csv"], num_sample_patches=16, fixed_size=True, preload=False)
    feat, _, _ = ds[0]
    assert feat.shape[0] == 16


def test_wsi_with_cluster_item(synthetic_dataset):
    ds = WSIWithCluster(synthetic_dataset["data_csv"], preload=True)
    feat, clusters, label, case_id = ds[0]
    assert len(clusters) == ds.num_clusters
    assert sorted(i for c in clusters for i in c) == list(range(feat.shape[0]))


def test_build_bank(synthetic_dataset):
    bank = build_bank(synthetic_dataset["data_csv"])
    assert bank.num_slides == 8
    # feats 8-aligns every slide offset and over-allocates max_patches
    # zero rows past the last slide (the compaction kernel's DMA window;
    # ops/compact_pallas.py)
    aligned = int(sum(-(-int(n) // 8) * 8 for n in bank.num_patches))
    assert bank.feats.shape[0] == aligned + bank.max_patches
    assert (bank.offsets % 8 == 0).all()
    assert bank.cluster_sizes.sum() == int(bank.num_patches.sum())
    # cluster tables hold valid local indices
    for i in range(bank.num_slides):
        n = bank.num_patches[i]
        for k in range(bank.num_clusters):
            size = bank.cluster_sizes[i, k]
            assert (bank.cluster_tables[i, k, :size] < n).all()
    assert bank.max_patches >= int(bank.num_patches.max())


def test_bank_split_shapes_shareable(synthetic_dataset):
    # dataset-wide maxima come from the full bank; per-split banks padded to
    # them share one static shape so jitted programs compile once.
    split = contract.load_split(synthetic_dataset["data_split_json"])
    full = build_bank(synthetic_dataset["data_csv"])
    banks = [
        build_bank(
            synthetic_dataset["data_csv"],
            indices=split[name],
            global_max_patches=full.max_patches,
            global_max_cluster=full.cluster_tables.shape[-1],
        )
        for name in ("train", "valid", "test")
    ]
    for b in banks:
        assert b.max_patches == full.max_patches
        assert b.cluster_tables.shape[-1] == full.cluster_tables.shape[-1]
