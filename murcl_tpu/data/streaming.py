"""Streaming feature feed for corpora that exceed device memory.

The resident :class:`~murcl_tpu.data.bank.FeatureBank` keeps a whole
split's patch features in HBM — ideal at Camelyon16 scale (~2 GB) but
impossible for TCGA-scale corpora (10k+ slides, tens of GB). This module
keeps the bank in host RAM and stages only each batch's slides as a
"mini-bank": their features concatenated (row-padded to a power-of-two
bucket so jitted programs compile once per bucket), plus the per-slide
metadata the on-device selection op needs. Slide ids inside a staged batch
are simply ``0..B-1``.

A one-deep prefetch thread assembles the next batch's host arrays while
the device computes on the current one, and ``jax.device_put`` overlaps
the transfer with compute — the TPU-native replacement for the
reference's per-item ``.to(device)`` copies (``train_MuRCL.py:227``).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from murcl_tpu.data import contract


def _next_bucket(n: int, minimum: int = 4096) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class StreamingBank:
    """Host-resident split with per-batch mini-bank staging.

    Same constructor surface as :func:`murcl_tpu.data.bank.build_bank`;
    exposes ``stage(ids)`` returning ``(BankArrays, slide_ids, labels)``
    with everything already on device, and ``iter_epoch`` with prefetch.
    """

    def __init__(
        self,
        data_csv,
        indices: Optional[Sequence[str]] = None,
        num_clusters: Optional[int] = None,
        cluster_pad: int = 8,
        row_bucket: int = 4096,
    ):
        if num_clusters is None:
            num_clusters = contract.num_clusters_from_csv(data_csv)
        df = contract.load_manifest(data_csv, indices)
        self.num_clusters = num_clusters
        self.case_ids: List[str] = [str(c) for c in df.index.values]
        self.labels = np.asarray([int(v) for v in df["label"].values], dtype=np.int32)
        self._feat_paths = [str(p) for p in df["features_filepath"].values]
        self._cluster_paths = [str(p) for p in df["clusters_json_filepath"].values]
        self._row_bucket = row_bucket

        # metadata pass: patch counts + cluster tables stay in host RAM
        # (small); features are memory-mapped lazily per batch
        self._feats: List[Optional[np.ndarray]] = [None] * len(self.case_ids)
        sizes, tables, counts = [], [], []
        c_max = 1
        for path in self._cluster_paths:
            clusters = contract.load_cluster_json(path)
            counts.append(sum(len(c) for c in clusters))
            c_max = max(c_max, max((len(c) for c in clusters), default=1))
            tables.append(clusters)
        c_max = ((c_max + cluster_pad - 1) // cluster_pad) * cluster_pad
        s = len(self.case_ids)
        self.cluster_tables = np.zeros((s, num_clusters, c_max), dtype=np.int32)
        self.cluster_sizes = np.zeros((s, num_clusters), dtype=np.int32)
        for i, clusters in enumerate(tables):
            for k, cluster in enumerate(clusters):
                self.cluster_sizes[i, k] = len(cluster)
                if cluster:
                    self.cluster_tables[i, k, : len(cluster)] = np.asarray(
                        cluster, dtype=np.int32
                    )
        self.num_patches = np.asarray(counts, dtype=np.int32)
        self.max_patches = int(
            ((self.num_patches.max() + 127) // 128) * 128
        )
        # per-patch (cluster, pos) inverse tables for the scatter-free
        # selection path (see murcl_tpu.data.bank._patch_cluster_pos)
        from murcl_tpu.data.bank import _patch_cluster_pos

        self.patch_cluster = np.zeros((s, self.max_patches), dtype=np.int32)
        self.patch_pos = np.full((s, self.max_patches), -1, dtype=np.int32)
        for i, clusters in enumerate(tables):
            self.patch_cluster[i], self.patch_pos[i] = _patch_cluster_pos(
                clusters, self.max_patches
            )
        self.patch_dim = contract.load_features_npz(self._feat_paths[0]).shape[-1]

    @property
    def num_slides(self) -> int:
        return len(self.case_ids)

    def _slide_feats(self, i: int) -> np.ndarray:
        f = self._feats[i]
        if f is None:
            f = contract.load_features_npz(self._feat_paths[i])
            # do NOT cache: the point of streaming is bounded host memory;
            # the OS page cache handles re-reads
        return f

    def _host_batch(self, ids: np.ndarray):
        feats = [self._slide_feats(int(i)) for i in ids]
        # 8-aligned slide offsets + a trailing max_patches window: the
        # compaction kernel DMAs a fixed-size window from a provably
        # sublane-aligned start (ops/compact_pallas.py)
        total = sum(-(-f.shape[0] // 8) * 8 for f in feats)
        bucket = _next_bucket(total + self.max_patches, self._row_bucket)
        rows = np.zeros((bucket, self.patch_dim), dtype=np.float32)
        offsets = np.zeros((len(ids),), dtype=np.int32)
        off = 0
        for j, f in enumerate(feats):
            offsets[j] = off
            rows[off : off + f.shape[0]] = f
            off += -(-f.shape[0] // 8) * 8
        return {
            "feats": rows,
            "offsets": offsets,
            "num_patches": self.num_patches[ids],
            "cluster_tables": self.cluster_tables[ids],
            "cluster_sizes": self.cluster_sizes[ids],
            "labels": self.labels[ids],
            "patch_cluster": self.patch_cluster[ids],
            "patch_pos": self.patch_pos[ids],
        }

    def stage(self, ids: np.ndarray):
        """Assemble + device_put one batch. Returns ``(BankArrays, slide_ids,
        labels)`` where slide_ids index the mini-bank (0..B-1)."""
        import jax
        import jax.numpy as jnp

        from murcl_tpu.engine.supervised import BankArrays

        h = self._host_batch(np.asarray(ids))
        bank = BankArrays(
            feats=jax.device_put(h["feats"]),
            offsets=jax.device_put(h["offsets"]),
            num_patches=jax.device_put(h["num_patches"]),
            cluster_tables=jax.device_put(h["cluster_tables"]),
            cluster_sizes=jax.device_put(h["cluster_sizes"]),
            patch_cluster=jax.device_put(h["patch_cluster"]),
            patch_pos=jax.device_put(h["patch_pos"]),
        )
        slide_ids = jnp.arange(len(ids), dtype=jnp.int32)
        return bank, slide_ids, jnp.asarray(h["labels"])

    def iter_epoch(
        self, batches: Sequence[np.ndarray], prefetch: int = 1
    ) -> Iterator[Tuple]:
        """Iterate staged batches with a background prefetch thread."""
        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))

        def producer():
            for ids in batches:
                q.put(self.stage(np.asarray(ids)))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()
