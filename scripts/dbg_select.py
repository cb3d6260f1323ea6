#!/usr/bin/env python
"""Break down selection cost: index computation vs row gather vs mixup."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

BATCH, FEAT_SIZE, DIM, K, T = 256, 1024, 512, 10, 12  # 2B views x T=6 pairs
NUM_SLIDES, PATCHES = 64, 2048


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from murcl_tpu.data.bank import bank_from_arrays
    from murcl_tpu.engine import BankArrays
    from murcl_tpu.ops.mixup import mixup
    from murcl_tpu.ops.select import select_feats, select_indices

    rng_np = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(NUM_SLIDES):
        f = rng_np.normal(size=(PATCHES, DIM)).astype(np.float32)
        a = rng_np.integers(0, K, size=PATCHES)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(0)
    bank = bank_from_arrays(feats, clusters, labels).device(dtype=jnp.bfloat16)
    ba = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32) % NUM_SLIDES

    def timed(fn, *args, k=6):
        fn(*args)
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / k * 1000

    def make_indices_only(scatter_free: bool):
        kw = {}
        if scatter_free:
            kw = dict(patch_cluster=ba.patch_cluster, patch_pos=ba.patch_pos)

        @jax.jit
        def indices_only(ids, r):
            acc = jnp.int32(0)
            for t in range(T):
                a = jax.random.uniform(jax.random.fold_in(r, t), (BATCH, K))
                idx, valid = select_indices(ids, ba.offsets, ba.num_patches,
                                            ba.cluster_tables, ba.cluster_sizes, a,
                                            feat_size=FEAT_SIZE,
                                            max_patches=bank.max_patches, **kw)
                acc = acc + idx[0, 0] + jnp.sum(valid[0].astype(jnp.int32))
            return acc

        return indices_only

    # fixed indices, gather only
    a0 = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, K))
    idx0, valid0 = select_indices(ids, ba.offsets, ba.num_patches,
                                  ba.cluster_tables, ba.cluster_sizes, a0,
                                  feat_size=FEAT_SIZE, max_patches=bank.max_patches)
    idx0 = jnp.where(valid0, idx0, 0)

    @jax.jit
    def gather_only(idx):
        acc = jnp.float32(0.0)
        for t in range(T):
            x = jnp.take(ba.feats, (idx + t).reshape(-1) % ba.feats.shape[0], axis=0)
            acc = acc + jnp.sum(x[0].astype(jnp.float32))
        return acc

    @jax.jit
    def mixup_only(r):
        x = jnp.take(ba.feats, idx0.reshape(-1), axis=0).reshape(BATCH, FEAT_SIZE, DIM)
        acc = jnp.float32(0.0)
        for t in range(T):
            xm, _, _ = mixup(jax.random.fold_in(r, t), x, 0.9)
            acc = acc + jnp.sum(xm[0, 0].astype(jnp.float32))
        return acc

    @jax.jit
    def full_select(ids, r):
        acc = jnp.float32(0.0)
        for t in range(T):
            a = jax.random.uniform(jax.random.fold_in(r, t), (BATCH, K))
            x = select_feats(ba.feats, ids, ba.offsets, ba.num_patches,
                             ba.cluster_tables, ba.cluster_sizes, a,
                             feat_size=FEAT_SIZE, max_patches=bank.max_patches)
            acc = acc + jnp.sum(x[0, 0].astype(jnp.float32))
        return acc

    print(f"{T}x index comp (scatter-free): {timed(make_indices_only(True), ids, jax.random.PRNGKey(1)):7.1f} ms")
    print(f"{T}x index comp (legacy scatter): {timed(make_indices_only(False), ids, jax.random.PRNGKey(1)):7.1f} ms")
    print(f"{T}x row gather only:        {timed(gather_only, idx0):7.1f} ms")
    print(f"{T}x mixup only:             {timed(mixup_only, jax.random.PRNGKey(2)):7.1f} ms")
    print(f"{T}x full select_feats:      {timed(full_select, ids, jax.random.PRNGKey(3)):7.1f} ms")


if __name__ == "__main__":
    main()
