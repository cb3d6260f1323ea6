"""Device-resident feature bank: the TPU-native data layer.

The reference keeps full bags as a Python list of per-slide GPU tensors and
re-gathers sub-bags on the host every rollout step
(``utils/datasets.py:274-308``, a device sync per cluster per bag). Here the
*entire split's* patch features live in HBM once as a single ``(P, D)``
array; per-slide metadata (offset, patch count, padded cluster index
tables) are stacked device arrays, so cluster-window selection is a pure
on-device gather inside ``jit`` (see :mod:`murcl_tpu.ops.select`) and the
only host->device traffic per train step is a ``(B,)`` vector of slide ids.

Memory: Camelyon16-scale (~1M patches x 512 f32) is ~2 GB — comfortable in
16 GB of v5e HBM. For corpora that exceed ``max_device_bytes`` the bank
stays in host RAM and batches are staged per step (streaming mode).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence

import numpy as np

from murcl_tpu.data import contract


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _patch_cluster_pos(
    cluster_lists: List[List[int]], n_max: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Per-patch inverse of the cluster tables: ``(cluster_id, pos)``.

    ``pos`` is the patch's position within its cluster's (k-means-order)
    index list; padding rows carry ``pos = -1`` (never selected). These
    arrays let sub-bag selection test window membership per patch directly
    — a gather — instead of scattering cluster windows into a flag array
    (XLA lowers TPU scatters via sort + sequential segment ops, which
    dominated the train step; see ops/select.py).
    """
    cid = np.zeros((n_max,), np.int32)
    pos = np.full((n_max,), -1, np.int32)
    for k, cluster in enumerate(cluster_lists):
        if cluster:
            idxs = np.asarray(cluster, dtype=np.int64)
            if np.unique(idxs).size != idxs.size:
                # same failure mode as the cross-cluster overlap below, but
                # invisible to it (pos[idxs] is still -1 when the duplicate
                # is inside ONE list): the last write wins and the cluster
                # under-counts vs the scatter-max oracle
                raise ValueError(
                    f"cluster {k} lists the same patch more than once; "
                    "sub-bag selection requires disjoint, duplicate-free "
                    "clusters"
                )
            if np.any(pos[idxs] >= 0):
                # the inverse table stores ONE (cluster, pos) per patch; a
                # patch in two clusters would silently under-select vs the
                # scatter-max oracle. K-means output is disjoint by
                # construction (features_clustering.py:10-16) — enforce it.
                raise ValueError(
                    f"cluster lists overlap (patch appears in cluster {k} "
                    "and an earlier one); sub-bag selection requires "
                    "disjoint clusters"
                )
            cid[idxs] = k
            pos[idxs] = np.arange(len(cluster), dtype=np.int32)
    return cid, pos


@dataclass
class SlideRecord:
    """Host-side metadata for one slide (one row of the manifest)."""

    case_id: str
    label: int
    num_patches: int
    offset: int  # row offset of this slide's patches in the bank
    cluster_lists: Optional[List[List[int]]] = None  # ragged, local indices


@dataclass
class FeatureBank:
    """All patch features of a split plus fixed-shape per-slide metadata.

    Arrays are numpy on the host; ``device()`` returns a copy with jax
    arrays committed to the default device. All shapes are static:

    - ``feats``:          ``(P, D)`` float32/bfloat16 patch features
    - ``offsets``:        ``(S,)``   int32, row offset per slide
    - ``num_patches``:    ``(S,)``   int32
    - ``cluster_tables``: ``(S, K, Cmax)`` int32, local patch indices,
      positions ``>= cluster_sizes`` are padding (value 0, masked by size)
    - ``cluster_sizes``:  ``(S, K)`` int32
    - ``labels``:         ``(S,)``   int32
    """

    feats: np.ndarray
    offsets: np.ndarray
    num_patches: np.ndarray
    cluster_tables: np.ndarray
    cluster_sizes: np.ndarray
    labels: np.ndarray
    case_ids: List[str] = field(default_factory=list)
    num_clusters: int = 0
    max_patches: int = 0  # static Nmax used for selection scratch shapes
    # per-patch (cluster_id, pos-in-cluster) — the scatter-free selection
    # path's inputs (see _patch_cluster_pos); ``(S, Nmax)`` int32 each
    patch_cluster: Optional[np.ndarray] = None
    patch_pos: Optional[np.ndarray] = None

    @property
    def num_slides(self) -> int:
        return len(self.case_ids)

    @property
    def patch_dim(self) -> int:
        return int(self.feats.shape[-1])

    def device(self, dtype=None) -> "FeatureBank":
        """Commit the arrays to the default JAX device (optionally casting feats)."""
        import jax
        import jax.numpy as jnp

        feats = self.feats if dtype is None else self.feats.astype(dtype)
        return replace(
            self,
            feats=jax.device_put(jnp.asarray(feats)),
            offsets=jax.device_put(jnp.asarray(self.offsets)),
            num_patches=jax.device_put(jnp.asarray(self.num_patches)),
            cluster_tables=jax.device_put(jnp.asarray(self.cluster_tables)),
            cluster_sizes=jax.device_put(jnp.asarray(self.cluster_sizes)),
            labels=jax.device_put(jnp.asarray(self.labels)),
            patch_cluster=(None if self.patch_cluster is None
                           else jax.device_put(jnp.asarray(self.patch_cluster))),
            patch_pos=(None if self.patch_pos is None
                       else jax.device_put(jnp.asarray(self.patch_pos))),
        )

    def nbytes(self) -> int:
        extra = sum(a.nbytes for a in (self.patch_cluster, self.patch_pos)
                    if a is not None)
        return int(
            self.feats.nbytes
            + self.cluster_tables.nbytes
            + self.cluster_sizes.nbytes
            + self.offsets.nbytes
            + self.num_patches.nbytes
            + self.labels.nbytes
            + extra
        )


def build_bank(
    data_csv,
    indices: Optional[Sequence[str]] = None,
    num_clusters: Optional[int] = None,
    max_patches_pad: int = 256,
    cluster_pad: int = 8,
    global_max_patches: Optional[int] = None,
    global_max_cluster: Optional[int] = None,
) -> FeatureBank:
    """Build a :class:`FeatureBank` from a reference-contract CSV manifest.

    ``indices`` selects case ids (a split); ``num_clusters`` defaults to the
    count parsed from the CSV filename (``utils/datasets.py:138-140``).
    ``global_max_patches`` / ``global_max_cluster`` let multiple split banks
    share one static shape so jitted programs compile once.
    """
    if num_clusters is None:
        num_clusters = contract.num_clusters_from_csv(data_csv)
    df = contract.load_manifest(data_csv, indices)

    case_ids: List[str] = []
    feats_list: List[np.ndarray] = []
    records: List[SlideRecord] = []
    offset = 0
    for case_id, row in df.iterrows():
        f = contract.load_features_npz(row["features_filepath"])
        clusters = contract.load_cluster_json(row["clusters_json_filepath"])
        if len(clusters) != num_clusters:
            raise ValueError(
                f"{case_id}: cluster json has {len(clusters)} clusters, expected {num_clusters}"
            )
        records.append(
            SlideRecord(
                case_id=str(case_id),
                label=int(row["label"]),
                num_patches=f.shape[0],
                offset=offset,
                cluster_lists=clusters,
            )
        )
        case_ids.append(str(case_id))
        # sublane-align every slide's row offset (multiple of 8): the
        # compaction kernel's HBM DMA slice start must be provably
        # 8-aligned (ops/compact_pallas.py). <=7 zero rows per slide.
        aligned = _round_up(f.shape[0], 8)
        if aligned > f.shape[0]:
            f = np.concatenate(
                [f, np.zeros((aligned - f.shape[0], f.shape[1]), f.dtype)]
            )
        feats_list.append(f)
        offset += aligned

    if not records:
        raise ValueError(f"empty manifest selection for {data_csv}")

    n_max = max(r.num_patches for r in records)
    c_max = max((max((len(c) for c in r.cluster_lists), default=1)) for r in records)
    n_max = _round_up(max(n_max, global_max_patches or 0), max_patches_pad)
    c_max = _round_up(max(c_max, global_max_cluster or 0, 1), cluster_pad)
    # over-allocate n_max zero rows past the last slide: the compaction
    # kernel (ops/compact_pallas.py) DMAs a fixed (n_max, D) window per bag
    feats = np.concatenate(
        feats_list + [np.zeros((n_max, feats_list[0].shape[1]), np.float32)],
        axis=0,
    ).astype(np.float32)

    s = len(records)
    tables = np.zeros((s, num_clusters, c_max), dtype=np.int32)
    sizes = np.zeros((s, num_clusters), dtype=np.int32)
    pcid = np.zeros((s, n_max), dtype=np.int32)
    ppos = np.full((s, n_max), -1, dtype=np.int32)
    for i, r in enumerate(records):
        for k, cluster in enumerate(r.cluster_lists):
            sizes[i, k] = len(cluster)
            if cluster:
                tables[i, k, : len(cluster)] = np.asarray(cluster, dtype=np.int32)
        pcid[i], ppos[i] = _patch_cluster_pos(r.cluster_lists, n_max)

    return FeatureBank(
        feats=feats,
        offsets=np.asarray([r.offset for r in records], dtype=np.int32),
        num_patches=np.asarray([r.num_patches for r in records], dtype=np.int32),
        cluster_tables=tables,
        cluster_sizes=sizes,
        labels=np.asarray([r.label for r in records], dtype=np.int32),
        case_ids=case_ids,
        num_clusters=num_clusters,
        max_patches=n_max,
        patch_cluster=pcid,
        patch_pos=ppos,
    )


def bank_from_arrays(
    feats_per_slide: Sequence[np.ndarray],
    cluster_lists_per_slide: Sequence[List[List[int]]],
    labels: Sequence[int],
    case_ids: Optional[Sequence[str]] = None,
    max_patches_pad: int = 256,
    cluster_pad: int = 8,
) -> FeatureBank:
    """Build a bank directly from in-memory arrays (tests / synthetic data)."""
    num_clusters = len(cluster_lists_per_slide[0])
    case_ids = list(case_ids) if case_ids is not None else [f"case_{i}" for i in range(len(labels))]

    dim = feats_per_slide[0].shape[1]
    offsets, offset = [], 0
    padded_list = []
    for f in feats_per_slide:
        offsets.append(offset)
        aligned = _round_up(f.shape[0], 8)  # see build_bank
        if aligned > f.shape[0]:
            f = np.concatenate(
                [f, np.zeros((aligned - f.shape[0], dim), f.dtype)]
            )
        padded_list.append(f)
        offset += aligned

    n_max = _round_up(max(f.shape[0] for f in feats_per_slide), max_patches_pad)
    # over-allocate n_max zero rows (see build_bank / ops/compact_pallas.py)
    feats = np.concatenate(
        padded_list + [np.zeros((n_max, dim), np.float32)], axis=0
    ).astype(np.float32)
    c_max = _round_up(
        max(max((len(c) for c in cl), default=1) for cl in cluster_lists_per_slide), cluster_pad
    )
    s = len(labels)
    tables = np.zeros((s, num_clusters, c_max), dtype=np.int32)
    sizes = np.zeros((s, num_clusters), dtype=np.int32)
    pcid = np.zeros((s, n_max), dtype=np.int32)
    ppos = np.full((s, n_max), -1, dtype=np.int32)
    for i, clusters in enumerate(cluster_lists_per_slide):
        for k, cluster in enumerate(clusters):
            sizes[i, k] = len(cluster)
            if cluster:
                tables[i, k, : len(cluster)] = np.asarray(cluster, dtype=np.int32)
        pcid[i], ppos[i] = _patch_cluster_pos(clusters, n_max)

    return FeatureBank(
        feats=feats,
        offsets=np.asarray(offsets, dtype=np.int32),
        num_patches=np.asarray([f.shape[0] for f in feats_per_slide], dtype=np.int32),
        cluster_tables=tables,
        cluster_sizes=sizes,
        labels=np.asarray(labels, dtype=np.int32),
        case_ids=case_ids,
        num_clusters=num_clusters,
        max_patches=n_max,
        patch_cluster=pcid,
        patch_pos=ppos,
    )


def harmonize_banks(banks: dict) -> dict:
    """Re-pad a dict of banks to shared static shapes.

    All splits then share one ``(K, Cmax)`` cluster-table width and one
    ``max_patches``, so every jitted program that takes bank arrays compiles
    once per batch shape instead of once per split.
    """
    n_max = max(b.max_patches for b in banks.values())
    c_max = max(b.cluster_tables.shape[-1] for b in banks.values())
    out = {}
    for name, b in banks.items():
        tables = b.cluster_tables
        if tables.shape[-1] < c_max:
            pad = np.zeros(tables.shape[:-1] + (c_max - tables.shape[-1],), dtype=tables.dtype)
            tables = np.concatenate([tables, pad], axis=-1)
        pcid, ppos = b.patch_cluster, b.patch_pos
        feats = b.feats
        if pcid is not None and pcid.shape[-1] < n_max:
            grow = n_max - pcid.shape[-1]
            pcid = np.concatenate(
                [pcid, np.zeros(pcid.shape[:-1] + (grow,), pcid.dtype)], axis=-1)
            ppos = np.concatenate(
                [ppos, np.full(ppos.shape[:-1] + (grow,), -1, ppos.dtype)], axis=-1)
        if n_max > b.max_patches:
            # keep the compaction kernel's over-allocation invariant:
            # last offset + n_max rows must stay in bounds
            grow_rows = n_max - b.max_patches
            feats = np.concatenate(
                [feats, np.zeros((grow_rows, feats.shape[1]), feats.dtype)]
            )
        out[name] = replace(b, feats=feats, cluster_tables=tables,
                            max_patches=n_max, patch_cluster=pcid,
                            patch_pos=ppos)
    return out
