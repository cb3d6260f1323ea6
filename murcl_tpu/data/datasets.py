"""Host-side dataset views over the csv/npz/json contract.

API parity with the reference ``utils/datasets.py`` (``WSIDataset`` ``:12``,
``WSIWithCluster`` ``:115``, ``ClusterFeatures`` ``:168``, ``WSIPhenotype``
``:210``): same constructor arguments, same per-item tuples (numpy arrays
instead of torch tensors). Training does not iterate these classes item by
item — it goes through :class:`murcl_tpu.data.bank.FeatureBank` — but they
serve heatmap generation, ad-hoc analysis, and users porting reference
code.
"""

from __future__ import annotations

import random

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from murcl_tpu.data import contract


class WSIDataset:
    """Bag-of-patch-features dataset over the CSV manifest.

    Per item returns ``(features (N, D) float32, label int64, case_id)``,
    with optional uniform random subsampling to ``num_sample_patches``
    (indices re-sorted ascending, ``utils/datasets.py:93-102``) and optional
    zero-pad/truncate to a fixed size (``:104-112``).
    """

    def __init__(
        self,
        data_csv,
        indices: Optional[Iterable[str]] = None,
        num_sample_patches: Optional[int] = None,
        fixed_size: bool = False,
        shuffle: bool = False,
        patch_random: bool = False,
        preload: bool = True,
    ) -> None:
        self.data_csv = data_csv
        self.num_sample_patches = num_sample_patches
        self.fixed_size = fixed_size
        self.patch_random = patch_random
        self.preload = preload

        self.samples = contract.load_manifest(data_csv, indices)
        self.indices: List[str] = list(indices) if indices is not None else list(self.samples.index.values)
        if shuffle:
            self.shuffle()

        self.patch_dim = int(
            contract.load_features_npz(self.samples.iat[0, 0]).shape[-1]
        )
        if self.preload:
            self.patch_features = self._load_patch_features()

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.int64, str]:
        case_id = self.indices[index]
        feat = self._features_of(case_id)
        feat = self.sample_feat(feat)
        if self.fixed_size:
            feat = self.fix_size(feat)
        label = np.int64(self.samples.at[case_id, "label"])
        return feat.astype(np.float32), label, case_id

    def shuffle(self) -> None:
        random.shuffle(self.indices)

    def _features_of(self, case_id: str) -> np.ndarray:
        if self.preload:
            return self.patch_features[case_id]
        return contract.load_features_npz(self.samples.at[case_id, "features_filepath"])

    def _load_patch_features(self) -> Dict[str, np.ndarray]:
        return {
            case_id: contract.load_features_npz(self.samples.at[case_id, "features_filepath"])
            for case_id in self.indices
        }

    def sample_feat(self, feat: np.ndarray) -> np.ndarray:
        num_patches = feat.shape[0]
        if self.num_sample_patches is not None and num_patches > self.num_sample_patches:
            sample = np.random.choice(num_patches, size=self.num_sample_patches, replace=False)
            feat = feat[sorted(sample)]
        if self.patch_random:
            np.random.shuffle(feat)
        return feat

    def fix_size(self, feat: np.ndarray) -> np.ndarray:
        if feat.shape[0] < self.num_sample_patches:
            pad = np.zeros((self.num_sample_patches - feat.shape[0], self.patch_dim))
            feat = np.concatenate((feat, pad))
        else:
            feat = feat[: self.num_sample_patches]
        return feat


class WSIWithCluster(WSIDataset):
    """Adds the per-slide cluster inverted index; K parsed from the CSV name."""

    def __init__(
        self,
        data_csv,
        indices: Optional[Iterable[str]] = None,
        num_sample_patches: Optional[int] = None,
        fixed_size: bool = False,
        shuffle: bool = False,
        patch_random: bool = False,
        preload: bool = True,
    ) -> None:
        super().__init__(
            data_csv, indices, num_sample_patches, fixed_size, shuffle, patch_random, preload
        )
        self.num_clusters = contract.num_clusters_from_csv(data_csv)
        if self.preload:
            self.cluster_indices = self._load_cluster_indices()

    def __getitem__(self, index: int):
        case_id = self.indices[index]
        feat = self._features_of(case_id)
        clusters = self._clusters_of(case_id)
        label = np.int64(self.samples.at[case_id, "label"])
        return feat.astype(np.float32), clusters, label, case_id

    def _clusters_of(self, case_id: str) -> List[List[int]]:
        if self.preload:
            return self.cluster_indices[case_id]
        return contract.load_cluster_json(self.samples.at[case_id, "clusters_json_filepath"])

    def _load_cluster_indices(self) -> Dict[str, List[List[int]]]:
        return {
            case_id: contract.load_cluster_json(
                self.samples.at[case_id, "clusters_json_filepath"]
            )
            for case_id in self.indices
        }


class ClusterFeatures(WSIWithCluster):
    """Cluster-stratified random sampling (``utils/datasets.py:168-207``)."""

    def __getitem__(self, index: int):
        case_id = self.indices[index]
        feat = self._features_of(case_id)
        clusters = self._clusters_of(case_id)
        feat = self.sample_by_cluster(feat, clusters)
        if self.fixed_size:
            feat = self.fix_size(feat)
        label = np.int64(self.samples.at[case_id, "label"])
        return feat.astype(np.float32), label, case_id

    def sample_by_cluster(self, feat: np.ndarray, clusters: List[List[int]]) -> np.ndarray:
        ratio = 1.0 if self.num_sample_patches is None else self.num_sample_patches / feat.shape[0]
        if ratio < 1:
            sample_indices: List[int] = []
            for c in range(self.num_clusters):
                n_c = len(clusters[c])
                size = int(np.rint(n_c * ratio))
                sample = np.random.choice(n_c, size=size, replace=False)
                sample_indices.extend(clusters[c][s] for s in sample)
            feat = feat[sorted(sample_indices)]
        if self.patch_random:
            np.random.shuffle(feat)
        return feat


class WSIPhenotype(ClusterFeatures):
    """Group features by cluster into ``(D, 1, n_c)`` arrays plus a nonempty mask."""

    def __getitem__(self, index: int):
        case_id = self.indices[index]
        feat = self._features_of(case_id)
        clusters = self._clusters_of(case_id)
        phenotype, mask = self.create_phenotype(feat, clusters)
        label = np.int64(self.samples.at[case_id, "label"])
        return phenotype, mask, label, case_id

    def create_phenotype(self, feat: np.ndarray, clusters: List[List[int]]):
        ratio = 1.0 if self.num_sample_patches is None else self.num_sample_patches / feat.shape[0]
        phenotype: List[np.ndarray] = []
        mask = np.ones(self.num_clusters, dtype=np.float32)
        for k in range(self.num_clusters):
            if len(clusters[k]) == 0:
                cluster_feat = np.zeros((1, self.patch_dim), dtype=np.float32)
                mask[k] = 0
            else:
                if ratio < 1:
                    size = int(np.rint(len(clusters[k]) * ratio))
                    sample = sorted(np.random.choice(len(clusters[k]), size=size, replace=False))
                    idx = [clusters[k][i] for i in sample]
                else:
                    idx = list(clusters[k])
                if self.patch_random:
                    np.random.shuffle(idx)
                cluster_feat = feat[idx]
            cluster_feat = np.expand_dims(np.swapaxes(cluster_feat, 1, 0), 1)
            phenotype.append(cluster_feat)
        return phenotype, mask
