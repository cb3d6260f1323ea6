#!/usr/bin/env python
"""Attribute the pretrain step's time: full step vs forward-only vs pieces.

All timings are jitted on-device loops at the canonical bench shape
(batch 128, bag 1024, dim 512, T=6, CLAM_SB bf16, remat=none).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

BATCH, FEAT_SIZE, DIM, K, T = 128, 1024, 512, 10, 6
NUM_SLIDES, PATCHES = 64, 2048


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from murcl_tpu.data.bank import bank_from_arrays
    from murcl_tpu.engine import BankArrays, ContrastiveEngine, PretrainConfig
    from murcl_tpu.models import FullLayer, build_aggregator
    from murcl_tpu.ops.select import select_feats

    rng_np = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(NUM_SLIDES):
        f = rng_np.normal(size=(PATCHES, DIM)).astype(np.float32)
        a = rng_np.integers(0, K, size=PATCHES)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(i % 2)
    bank = bank_from_arrays(feats, clusters, labels).device(dtype=jnp.bfloat16)
    bank_arrays = BankArrays.from_bank(bank)

    model, feature_num = build_aggregator(
        "CLAM_SB", dim_in=DIM, num_classes=128,
        arch_setting={"gate": True, "dropout": 0.25, "k_sample": 8, "subtyping": True})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=1024, class_num=128)
    cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                         max_patches=bank.max_patches, train_stage=1,
                         batch_size=BATCH, compute_dtype="bfloat16", remat="none")
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-4))
    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32))
    agg = engine.init_state(params)
    ids = jnp.arange(BATCH, dtype=jnp.int32) % NUM_SLIDES

    def timed(fn, *args, k=8):
        fn(*args)  # compile
        out = fn(*args)
        jax.block_until_ready(out)
        # force scalar read (tunnel)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / k * 1000

    # (a) full train step
    @jax.jit
    def full_step(agg, ids, r):
        a2, stats, _ = engine._train_impl(agg, None, bank_arrays, ids, r)
        return stats.loss, a2

    dt_full = timed(full_step, agg, ids, jax.random.PRNGKey(1))

    # (b) forward-only (loss, no grad)
    @jax.jit
    def fwd_only(params, ids, r):
        total, _ = engine._rollout(params, None, bank_arrays, ids, r, True)
        return total

    dt_fwd = timed(fwd_only, agg.params, ids, jax.random.PRNGKey(1))

    # (c) selection + mixup only, 12 pair-views
    from murcl_tpu.ops.mixup import mixup

    @jax.jit
    def select_only(ids, r):
        both = jnp.concatenate([ids, ids])
        acc = jnp.float32(0.0)
        for t in range(T):
            rt = jax.random.fold_in(r, t)
            a = jax.random.uniform(rt, (2 * BATCH, K))
            x2 = select_feats(bank_arrays.feats, both, bank_arrays.offsets,
                              bank_arrays.num_patches, bank_arrays.cluster_tables,
                              bank_arrays.cluster_sizes, a,
                              feat_size=FEAT_SIZE, max_patches=bank.max_patches)
            xa, _, _ = mixup(jax.random.fold_in(rt, 1), x2[:BATCH], 0.9)
            xb, _, _ = mixup(jax.random.fold_in(rt, 2), x2[BATCH:], 0.9)
            acc = acc + jnp.sum(xa[0, 0].astype(jnp.float32)) + jnp.sum(xb[0, 0].astype(jnp.float32))
        return acc

    dt_sel = timed(select_only, ids, jax.random.PRNGKey(2))

    # (d) fused kernel fwd only, 12 invocations at (2B, N, 512) bf16
    from murcl_tpu.ops.attention_pallas import fused_trunk_attention_pool

    mp = agg.params["model"]["params"]
    wf, bf = mp["fc"]["kernel"], mp["fc"]["bias"]
    at = mp["attn"]
    x_big = jnp.asarray(rng_np.normal(size=(2 * BATCH, FEAT_SIZE, DIM)), jnp.bfloat16)

    @jax.jit
    def kernels_only(x, seed):
        acc = jnp.float32(0.0)
        for t in range(T):
            m, p, s = fused_trunk_attention_pool(
                x, wf, bf, at["wa"], at["ba"], at["wb"], at["bb"],
                at["wc"][:, 0], at["bc"][0], impl="pallas", gated=True,
                dropout=0.25, seed=seed + t)
            acc = acc + jnp.sum(m[0])
        return acc

    dt_ker = timed(kernels_only, x_big, jnp.int32(3))

    print(f"full train step:        {dt_full:8.1f} ms")
    print(f"forward-only rollout:   {dt_fwd:8.1f} ms  (backward ~ {dt_full-dt_fwd:.1f})")
    print(f"12x selection+mixup:    {dt_sel:8.1f} ms")
    print(f"6x fused fwd kernel 2B: {dt_ker:8.1f} ms")


if __name__ == "__main__":
    main()
