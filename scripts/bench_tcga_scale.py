#!/usr/bin/env python
"""TCGA-scale pretrain step: big slides (Nmax ~10k patches) through the
tiled compaction variant.

bench.py's canonical shape (Camelyon16-like, 2048 patches/slide) routes
selection through the VMEM-resident compaction kernel. Real TCGA slides
run 10k+ patches, where the double-buffered window exceeds the VMEM
budget and `gather_compact` switches to the tiled variant (per-tile DMA +
accumulator revisiting + dead-tile skipping, `ops/compact_pallas.py`).
This benches the full stage-1 CLAM train step at that regime — slides
vary 3k..10240 patches so the dead-tile skip actually fires — and prints
one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

BATCH, FEAT_SIZE, DIM, K, T = 128, 1024, 512, 10, 6
NUM_SLIDES, MAX_PATCHES = 24, 10240


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from murcl_tpu.data.bank import bank_from_arrays
    from murcl_tpu.engine import BankArrays, ContrastiveEngine, PretrainConfig
    from murcl_tpu.models import FullLayer, build_aggregator

    assert jax.default_backend() == "tpu"
    rng_np = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(NUM_SLIDES):
        n = int(rng_np.integers(3000, MAX_PATCHES + 1))
        f = rng_np.normal(size=(n, DIM)).astype(np.float32)
        a = rng_np.integers(0, K, size=n)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(i % 2)
    pad = int(os.environ.get("MURCL_BANK_PAD", "256"))
    bank = bank_from_arrays(feats, clusters, labels,
                            max_patches_pad=pad).device(dtype=jnp.bfloat16)
    n_max = bank.max_patches
    window_mb = 2 * n_max * DIM * 2 / 2**20
    assert window_mb > 5, f"window {window_mb:.1f} MB should exceed the resident budget"

    model, feature_num = build_aggregator(
        "CLAM_SB", dim_in=DIM, num_classes=128,
        arch_setting={"gate": True, "dropout": 0.25, "k_sample": 8,
                      "subtyping": True},
    )
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=1024, class_num=128)
    cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=FEAT_SIZE,
                         num_clusters=K, max_patches=n_max, train_stage=1,
                         temperature=0.5, alpha=0.9, batch_size=BATCH,
                         compute_dtype="bfloat16", remat="none",
                         stage1_layout="batched")
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-4))

    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32))
    agg = engine.init_state(params)
    bank_arrays = BankArrays.from_bank(bank)
    rng_ids = np.random.default_rng(1)

    def one_step(agg, seed):
        ids = jnp.asarray(rng_ids.integers(0, NUM_SLIDES, size=BATCH), jnp.int32)
        agg, _, stats = engine.train_step(agg, None, bank_arrays, ids,
                                          jax.random.PRNGKey(seed))
        return agg, stats

    for i in range(2):
        agg, stats = one_step(agg, i)
    print(f"warmup loss: {float(stats.loss):.4f}", file=sys.stderr)

    steps = int(os.environ.get("MURCL_BENCH_STEPS", "50"))
    t0 = time.perf_counter()
    for i in range(steps):
        agg, stats = one_step(agg, 100 + i)
    final = float(stats.loss)
    jax.block_until_ready(agg.params)
    dt = time.perf_counter() - t0
    print(f"final loss after {steps} steps: {final:.4f}", file=sys.stderr)
    print(json.dumps({
        "metric": "murcl_pretrain_steps_per_sec_tcga_scale",
        "value": round(steps / dt, 4),
        "unit": f"steps/sec (batch={BATCH}, bag={FEAT_SIZE}, dim={DIM}, "
                f"T={T}, Nmax={n_max} tiled compaction, CLAM_SB, bfloat16)",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
