"""Streaming bank: staged mini-banks must match the resident bank exactly."""

import numpy as np
import pytest

from murcl_tpu.data.bank import build_bank
from murcl_tpu.data.streaming import StreamingBank, _next_bucket
from murcl_tpu.ops.select import select_feats


def test_next_bucket():
    assert _next_bucket(1, 4096) == 4096
    assert _next_bucket(4096, 4096) == 4096
    assert _next_bucket(4097, 4096) == 8192


def test_streaming_matches_resident(synthetic_dataset):
    import jax.numpy as jnp

    ds = synthetic_dataset
    resident = build_bank(ds["data_csv"])
    stream = StreamingBank(ds["data_csv"], row_bucket=128)
    assert stream.num_slides == resident.num_slides
    assert stream.patch_dim == resident.patch_dim
    np.testing.assert_array_equal(stream.labels, resident.labels)

    ids = np.array([1, 3, 0], dtype=np.int32)
    bank, slide_ids, labels = stream.stage(ids)
    np.testing.assert_array_equal(np.asarray(labels), resident.labels[ids])

    actions = np.random.default_rng(0).random((3, stream.num_clusters)).astype(np.float32)
    got = select_feats(
        bank.feats, slide_ids, bank.offsets, bank.num_patches,
        bank.cluster_tables, bank.cluster_sizes, jnp.asarray(actions),
        feat_size=32, max_patches=stream.max_patches,
    )
    want = select_feats(
        jnp.asarray(resident.feats), jnp.asarray(ids),
        jnp.asarray(resident.offsets), jnp.asarray(resident.num_patches),
        jnp.asarray(resident.cluster_tables), jnp.asarray(resident.cluster_sizes),
        jnp.asarray(actions), feat_size=32, max_patches=resident.max_patches,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_streaming_iter_epoch_prefetch(synthetic_dataset):
    stream = StreamingBank(synthetic_dataset["data_csv"], row_bucket=128)
    batches = [np.array([0, 1]), np.array([2, 3]), np.array([4, 5])]
    seen = 0
    for bank, slide_ids, labels in stream.iter_epoch(batches, prefetch=2):
        assert bank.feats.ndim == 2
        assert labels.shape == (2,)
        seen += 1
    assert seen == 3
