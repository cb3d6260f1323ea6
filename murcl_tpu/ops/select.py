"""Cluster-window sub-bag selection ("WSI-Fset") as a pure on-device gather.

Reference semantics (``utils/datasets.py:274-308``), per bag with ``N``
patches, ``K`` clusters, action ``a in [0,1]^K`` and target size ``F``:

- ``ratio = F / N``
- per cluster ``c`` with ``n_c`` members: window size
  ``s_c = round(n_c * ratio)`` (round-half-to-even, like ``torch.round``),
  window start ``l_c = floor(a_c * (n_c - s_c))``
- take the *contiguous slice* ``cluster_c[l_c : l_c + s_c]`` of the
  (k-means order) index list — Python slice semantics, including negative
  starts when ``N < F`` makes ``s_c > n_c``
- union the slices, sort ascending, gather rows, zero-pad or truncate to
  exactly ``F`` (``:296-306``).

The reference runs this on the host with two ``.item()`` device syncs per
cluster per bag. Here it is fully vectorized: window arithmetic on the
``(K,)`` vectors, membership test on a ``(K, Cmax)`` position grid, a
scatter-max into an ``(Nmax,)`` flag array, and a stable argsort whose
first ``F`` entries are exactly the ascending sorted union — all inside
``jit``/``vmap``, no host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def _python_slice_bounds(l, r, n):
    """Effective [start, end) of python list slicing ``lst[l:r]`` for length n."""
    start = jnp.where(l < 0, jnp.maximum(n + l, 0), jnp.minimum(l, n))
    end = jnp.where(r < 0, jnp.maximum(n + r, 0), jnp.minimum(r, n))
    return start, end


def _select_one(
    num_patches,        # ()   int32 — actual N of this bag
    cluster_table,      # (K, Cmax) int32 — local patch indices, padded
    cluster_sizes,      # (K,) int32
    action,             # (K,) float32 in [0, 1]
    feat_size: int,
    max_patches: int,
):
    """Selection indices for one bag: ``(feat_size,)`` local indices + valid mask."""
    n_c = cluster_sizes.astype(jnp.float32)
    ratio = feat_size / num_patches.astype(jnp.float32)
    s_c = jnp.round(n_c * ratio).astype(jnp.int32)
    l_c = jnp.floor(action * (n_c - s_c.astype(jnp.float32))).astype(jnp.int32)
    r_c = l_c + s_c

    start, end = _python_slice_bounds(l_c, r_c, cluster_sizes)

    k, c_max = cluster_table.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, c_max), 1)
    picked = (pos >= start[:, None]) & (pos < end[:, None]) & (pos < cluster_sizes[:, None])

    # Scatter the picked cluster entries into a per-patch flag. Padded table
    # entries carry picked=False, so max-scatter leaves their target untouched.
    flag = jnp.zeros((max_patches,), dtype=jnp.bool_)
    flag = flag.at[cluster_table.reshape(-1)].max(picked.reshape(-1))

    # Ascending sorted union without a sort: the rank of each selected patch
    # is its exclusive prefix count, so one cumsum + one scatter produce the
    # first-feat_size slice of the sorted union (ranks >= feat_size and
    # unselected entries scatter out of bounds and are dropped). An argsort
    # here (bitonic, O(N log^2 N) lane shuffles) dominated the train step.
    rank = jnp.cumsum(flag) - 1  # (Nmax,), exclusive prefix count
    target = jnp.where(flag, rank, max_patches + feat_size)  # OOB when unselected
    patch_ids = jax.lax.broadcasted_iota(jnp.int32, (max_patches, 1), 0)[:, 0]
    idx = jnp.zeros((feat_size,), jnp.int32).at[target].set(
        patch_ids, mode="drop"
    )
    count = jnp.minimum(flag.sum(), feat_size)
    valid = jax.lax.broadcasted_iota(jnp.int32, (feat_size, 1), 0)[:, 0] < count
    return idx, valid


def _select_one_gather(
    num_patches,        # ()   int32
    cluster_sizes,      # (K,) int32
    action,             # (K,) float32
    patch_cluster,      # (Nmax,) int32 — cluster id per patch
    patch_pos,          # (Nmax,) int32 — position in that cluster's list; -1 pad
    feat_size: int,
    max_patches: int,
):
    """Scatter-free variant of :func:`_select_one` (same semantics).

    XLA lowers TPU scatters via a sort plus sequential segment passes — on
    the canonical pretrain shape the two scatters above cost ~53 ms/step,
    a third of the whole program (profiled; scripts/profile_step.py). With
    the per-patch ``(cluster, pos)`` inverse tables the membership flag is
    a pure compare; only the rank->index inversion remains a (unique-index,
    hence sort-free) scatter.
    """
    rank, count = _ranks_one(
        num_patches, cluster_sizes, action, patch_cluster, patch_pos,
        feat_size,
    )

    # rank -> index inversion as a UNIQUE-index scatter: in-sub-bag rows
    # target their rank, every other row targets a distinct out-of-bounds
    # slot (feat_size + p), so XLA's scatter expander never has to combine
    # duplicate updates — that duplicate handling is what lowers TPU
    # scatters through a sort + sequential segment pass (was ~53 ms/step at
    # the canonical shape; a gather-based binary search is even worse:
    # per-element row gathers serialize at ~16 ms per round)
    patch_ids = jax.lax.broadcasted_iota(jnp.int32, (max_patches, 1), 0)[:, 0]
    target = jnp.where(rank >= 0, rank, feat_size + patch_ids)
    idx = jnp.zeros((feat_size,), jnp.int32).at[target].set(
        patch_ids, mode="drop", unique_indices=True
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (feat_size, 1), 0)[:, 0]
    valid = slot < jnp.minimum(count, feat_size)
    return idx, valid


def _ranks_one(num_patches, cluster_sizes, action, patch_cluster, patch_pos,
               feat_size: int):
    """Per-patch sub-bag slot, or -1: ``(rank (Nmax,), count ())``.

    ``rank[p] = r`` means patch ``p`` is the ``r``-th row (ascending patch
    order) of the selected sub-bag; ``-1`` marks unselected patches and
    selected ones truncated past ``feat_size`` (reference truncation,
    ``utils/datasets.py:304-306``).
    """
    n_c = cluster_sizes.astype(jnp.float32)
    ratio = feat_size / num_patches.astype(jnp.float32)
    s_c = jnp.round(n_c * ratio).astype(jnp.int32)
    l_c = jnp.floor(action * (n_c - s_c.astype(jnp.float32))).astype(jnp.int32)
    start, end = _python_slice_bounds(l_c, l_c + s_c, cluster_sizes)

    # membership flag via a one-hot comparison over the K clusters — NOT
    # ``start[patch_cluster]``: even a 10-entry table gather serializes
    # per-element on TPU (~26 ms at the canonical shape, profiled). The
    # (Nmax, K) broadcast compare is a few VPU passes. pos=-1 padding rows
    # can never fall inside a window (start >= 0).
    k = cluster_sizes.shape[0]
    onehot = patch_cluster[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, k), 1
    )  # (Nmax, K)
    inside = (patch_pos[:, None] >= start[None, :]) & (
        patch_pos[:, None] < end[None, :]
    )
    flag = jnp.any(onehot & inside, axis=1)

    cum = jnp.cumsum(flag.astype(jnp.int32))  # (Nmax,), nondecreasing
    count = cum[-1]
    rank = cum - 1  # this patch's slot in the ascending union, if flagged
    rank = jnp.where(flag & (rank < feat_size), rank, -1)
    return rank, count


@partial(jax.jit, static_argnames=("feat_size",))
def select_ranks(
    slide_ids,          # (B,) int32
    offsets,            # (S,) int32
    num_patches,        # (S,) int32
    cluster_sizes,      # (S, K) int32
    actions,            # (B, K) float32
    patch_cluster,      # (S, Nmax) int32
    patch_pos,          # (S, Nmax) int32
    feat_size: int,
):
    """Batched per-patch sub-bag slots for the compaction-matmul kernel.

    Returns ``(ranks (B, Nmax) int32 with -1 for out, row_offsets (B,),
    valid (B, feat_size))``. ``ranks[i, p] == f`` identifies bank row
    ``row_offsets[i] + p`` as sub-bag row ``f`` of bag ``i``.
    """
    ranks, counts = jax.vmap(_ranks_one, in_axes=(0, 0, 0, 0, 0, None))(
        num_patches[slide_ids],
        cluster_sizes[slide_ids],
        actions,
        patch_cluster[slide_ids],
        patch_pos[slide_ids],
        feat_size,
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, feat_size), 1)
    valid = slot < jnp.minimum(counts, feat_size)[:, None]
    return ranks, offsets[slide_ids], valid


@partial(jax.jit, static_argnames=("feat_size", "max_patches"))
def select_indices(
    slide_ids,          # (B,) int32 — rows into the bank metadata
    offsets,            # (S,) int32
    num_patches,        # (S,) int32
    cluster_tables,     # (S, K, Cmax) int32
    cluster_sizes,      # (S, K) int32
    actions,            # (B, K) float32
    feat_size: int,
    max_patches: int,
    patch_cluster=None,  # (S, Nmax) int32 — enables the scatter-free path
    patch_pos=None,      # (S, Nmax) int32
):
    """Global bank row indices ``(B, feat_size)`` + valid mask ``(B, feat_size)``."""
    if patch_cluster is not None and patch_pos is not None:
        local_idx, valid = jax.vmap(
            _select_one_gather, in_axes=(0, 0, 0, 0, 0, None, None)
        )(
            num_patches[slide_ids],
            cluster_sizes[slide_ids],
            actions,
            patch_cluster[slide_ids],
            patch_pos[slide_ids],
            feat_size,
            max_patches,
        )
    else:
        local_idx, valid = jax.vmap(
            _select_one, in_axes=(0, 0, 0, 0, None, None)
        )(
            num_patches[slide_ids],
            cluster_tables[slide_ids],
            cluster_sizes[slide_ids],
            actions,
            feat_size,
            max_patches,
        )
    global_idx = offsets[slide_ids][:, None] + local_idx
    return global_idx, valid


@partial(jax.jit, static_argnames=("feat_size", "max_patches"))
def select_feats(
    bank_feats,         # (P, D)
    slide_ids,
    offsets,
    num_patches,
    cluster_tables,
    cluster_sizes,
    actions,
    feat_size: int,
    max_patches: int,
    patch_cluster=None,
    patch_pos=None,
):
    """The full ``get_feats`` equivalent: ``(B, feat_size, D)`` sub-bags.

    Rows past the union length are exact zeros (reference zero-padding,
    ``utils/datasets.py:299-303``). Passing ``patch_cluster``/``patch_pos``
    (the bank's per-patch inverse tables) selects the scatter-free path.
    """
    idx, valid = select_indices(
        slide_ids, offsets, num_patches, cluster_tables, cluster_sizes,
        actions, feat_size, max_patches,
        patch_cluster=patch_cluster, patch_pos=patch_pos,
    )
    # Padding rows can index past this slide's patches (or past the bank for
    # the last slide, where jnp.take's fill mode would yield NaN) — point them
    # at row 0; the valid mask zeroes them below.
    idx = jnp.where(valid, idx, 0)
    feats = jnp.take(bank_feats, idx.reshape(-1), axis=0)
    feats = feats.reshape(idx.shape[0], feat_size, -1)
    return feats * valid[:, :, None].astype(feats.dtype)


def select_feats_oracle(
    feat_list: List[np.ndarray],
    clusters_list: List[List[List[int]]],
    action_sequence: np.ndarray,
    feat_size: int = 1024,
) -> np.ndarray:
    """Numpy transcription of the reference ``get_feats`` semantics.

    Used as the golden model in property tests; mirrors
    ``utils/datasets.py:274-308`` including python-slice edge cases,
    round-half-to-even, and zero padding/truncation.
    """
    batch = []
    for i, feat in enumerate(feat_list):
        num_patch = feat.shape[0]
        ratio = feat_size / num_patch
        n = np.array([len(c) for c in clusters_list[i]], dtype=np.float32)
        s = np.round(n * ratio).astype(np.int64)  # numpy round == banker's
        l = np.floor(action_sequence[i] * (n - s)).astype(np.int64)
        r = l + s
        indices: List[int] = []
        for j, c in enumerate(clusters_list[i]):
            indices.extend(c[int(l[j]) : int(r[j])])
        indices = sorted(indices)
        per = feat[indices]
        if per.shape[0] < feat_size:
            pad = np.zeros((feat_size - per.shape[0], feat.shape[1]), dtype=per.dtype)
            per = np.concatenate([per, pad], axis=0)
        else:
            per = per[:feat_size]
        batch.append(per)
    return np.stack(batch, axis=0)
