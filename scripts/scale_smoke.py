#!/usr/bin/env python
"""TCGA-scale smoke (BASELINE config #5): variable 1k-10k-patch bags.

Generates slides with bag sizes spanning 1k-10k patches, runs a few
streaming-mode supervised train steps + whole-split eval + a full-bag
heatmap attention pass, and prints throughput. Exercises: streaming
mini-bank staging at large Nmax, selection over big ragged clusters,
bucketed full-bag attention.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from murcl_tpu.data.sources import build_sources
    from murcl_tpu.data.synthetic import generate_synthetic_dataset
    from murcl_tpu.engine import RolloutConfig, SupervisedEngine
    from murcl_tpu.models import FullLayer, PPO, build_aggregator
    from murcl_tpu.preprocess.heatmaps import AttentionScorer

    root = tempfile.mkdtemp(prefix="scale_")
    ds = generate_synthetic_dataset(
        root, num_slides=24, dim=512, num_clusters=10, seed=985,
        min_patches=1000, max_patches=10000, signal=6.0,
    )
    split = {"train": ds["case_ids"][:16], "valid": ds["case_ids"][16:20],
             "test": ds["case_ids"][20:]}
    t0 = time.perf_counter()
    sources = build_sources(ds["data_csv"], split, streaming=True)
    src = sources["train"]
    print(f"streaming sources built in {time.perf_counter()-t0:.1f}s; "
          f"Nmax={src.max_patches}, dim={src.patch_dim}")

    model, feature_num = build_aggregator("CLAM_SB", dim_in=512, num_classes=2,
                                          arch_setting={"dropout": 0.25, "subtyping": True})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=1024, class_num=2)
    ppo = PPO(state_dim=feature_num, hidden_state_dim=512, action_size=10,
              gamma=0.1, K_epochs=3, action_std=0.5)
    cfg = RolloutConfig(arch="CLAM_SB", T=6, feat_size=1024, num_clusters=10,
                        max_patches=src.max_patches, train_stage=3,
                        compute_dtype="bfloat16")
    engine = SupervisedEngine(cfg, model, fc, ppo=ppo, tx=optax.adam(1e-4))

    rng = jax.random.PRNGKey(0)
    B = 8
    params = engine.init_params(rng, jnp.zeros((B, 1024, 512)), jnp.zeros((B,), jnp.int32))
    agg = engine.init_state(params)
    ppo_state = ppo.init(rng, jnp.zeros((B, feature_num)))

    np_rng = np.random.default_rng(0)
    steps, t0 = 6, None
    for i in range(steps):
        ids = np_rng.choice(src.num_slides, B, replace=False)
        bank, slide_ids, labels = src.batch(ids)
        agg, ppo_state, stats = engine.train_step(
            agg, ppo_state, bank, slide_ids, labels, jax.random.PRNGKey(i))
        loss = float(stats.loss)
        if i == 0:
            print(f"first step (compile) done, loss {loss:.4f}")
            t0 = time.perf_counter()
    dt = time.perf_counter() - t0
    print(f"stage-3 streaming train: {(steps-1)/dt:.2f} steps/s at B={B}, "
          f"bags 1k-10k, last loss {loss:.4f}")

    # full-bag heatmap attention over the largest slide
    scorer = AttentionScorer(dim_patch=512, num_classes=2, bucket=2048)
    from murcl_tpu.data.contract import load_features_npz
    import pandas as pd

    df = pd.read_csv(ds["data_csv"]).set_index("case_id")
    big = max(ds["case_ids"], key=lambda c: load_features_npz(df.at[c, "features_filepath"]).shape[0])
    feats = load_features_npz(df.at[big, "features_filepath"])
    t0 = time.perf_counter()
    att = scorer(feats)
    print(f"full-bag attention over {feats.shape[0]} patches: "
          f"{time.perf_counter()-t0:.2f}s, finite={np.isfinite(att).all()}")
    print("SCALE SMOKE OK")


if __name__ == "__main__":
    main()
