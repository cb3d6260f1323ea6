from murcl_tpu.data.contract import (
    load_cluster_json,
    load_features_npz,
    load_manifest,
    load_split,
    num_clusters_from_csv,
    save_cluster_npz_json,
    save_features_npz,
)
from murcl_tpu.data.bank import FeatureBank, SlideRecord, build_bank
from murcl_tpu.data.datasets import WSIDataset, WSIWithCluster

__all__ = [
    "FeatureBank",
    "SlideRecord",
    "WSIDataset",
    "WSIWithCluster",
    "build_bank",
    "load_cluster_json",
    "load_features_npz",
    "load_manifest",
    "load_split",
    "num_clusters_from_csv",
    "save_cluster_npz_json",
    "save_features_npz",
]
