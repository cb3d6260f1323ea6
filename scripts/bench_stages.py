#!/usr/bin/env python
"""Secondary benchmarks: stage-2/3 step times (the PPO-driven sequential
rollouts), complementing bench.py's stage-1 headline.

Canonical shapes: contrastive stages on batch 128 (pretrain.sh), the
supervised stage-3 on batch 64 (the reference finetunes at batch 1, which
under-utilizes any accelerator; our engine batches — reference semantics
per bag are unchanged, train_RLMIL.py:290-407).
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
    from murcl_tpu.engine import (
        BankArrays,
        ContrastiveEngine,
        PretrainConfig,
        RolloutConfig,
        SupervisedEngine,
    )
    from murcl_tpu.models import FullLayer, PPO, build_aggregator

    rng_np = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(NUM_SLIDES):
        f = rng_np.normal(size=(PATCHES, DIM)).astype(np.float32)
        a = rng_np.integers(0, K, size=PATCHES)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(i % 2)
    bank = bank_from_arrays(feats, clusters, labels).device(dtype=jnp.bfloat16)
    ba = BankArrays.from_bank(bank)

    def timed_steps(step, state, steps=8, warmup=2):
        for i in range(warmup):
            state, loss = step(state, i)
        float(loss)
        t0 = time.perf_counter()
        for i in range(steps):
            state, loss = step(state, 100 + i)
        float(loss)
        return steps / (time.perf_counter() - t0)

    results = {}

    # ---- contrastive stage 2 (frozen encoder, PPO update per view) --------
    # ---- and stage 3 (policy-driven, encoder trains) ----------------------
    for stage in (2, 3):
        model, feature_num = build_aggregator(
            "CLAM_SB", dim_in=DIM, num_classes=128,
            arch_setting={"gate": True, "dropout": 0.25, "k_sample": 8,
                          "subtyping": True})
        fc = FullLayer(feature_num=feature_num, hidden_state_dim=1024,
                       class_num=128)
        ppo = PPO(state_dim=feature_num, hidden_state_dim=1024,
                  action_size=K, lr=1e-5, gamma=0.1, K_epochs=3)
        cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=FEAT_SIZE,
                             num_clusters=K, max_patches=bank.max_patches,
                             train_stage=stage, batch_size=BATCH,
                             compute_dtype="bfloat16", remat="none")
        engine = ContrastiveEngine(
            cfg, model, fc, ppo=ppo,
            tx=optax.adam(1e-4) if stage != 2 else None)
        params = engine.init_params(
            jax.random.PRNGKey(0), jnp.zeros((BATCH, FEAT_SIZE, DIM)))
        agg = engine.init_state(params)
        ppo_state = ppo.init(jax.random.PRNGKey(1),
                             jnp.zeros((BATCH, feature_num)))
        ids = jnp.arange(BATCH, dtype=jnp.int32) % NUM_SLIDES

        def step(state, seed, engine=engine, ids=ids):
            agg, ppo_state = state
            agg, ppo_state, stats = engine.train_step(
                agg, ppo_state, ba, ids, jax.random.PRNGKey(seed))
            return (agg, ppo_state), stats.loss

        results[f"contrastive_stage{stage}"] = timed_steps(step, (agg, ppo_state))

    # ---- supervised stage 3 (CLAM finetune, batch 64) ---------------------
    b_sup = 64
    model, feature_num = build_aggregator(
        "CLAM_SB", dim_in=DIM, num_classes=2,
        arch_setting={"gate": True, "dropout": 0.25, "k_sample": 8,
                      "subtyping": True})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=1024, class_num=2)
    ppo = PPO(state_dim=feature_num, hidden_state_dim=1024, action_size=K,
              lr=1e-5, gamma=0.1, K_epochs=3)
    cfg = RolloutConfig(arch="CLAM_SB", T=T, feat_size=FEAT_SIZE,
                        num_clusters=K, max_patches=bank.max_patches,
                        train_stage=3, num_classes=2,
                        compute_dtype="bfloat16", remat="none")
    engine = SupervisedEngine(cfg, model, fc, ppo=ppo, tx=optax.adam(1e-4))
    labels_d = jnp.asarray(np.asarray(labels), jnp.int32)
    ids = jnp.arange(b_sup, dtype=jnp.int32) % NUM_SLIDES
    params = engine.init_params(
        jax.random.PRNGKey(0), jnp.zeros((b_sup, FEAT_SIZE, DIM)),
        jnp.zeros((b_sup,), jnp.int32))
    agg = engine.init_state(params)
    ppo_state = ppo.init(jax.random.PRNGKey(1), jnp.zeros((b_sup, feature_num)))

    def sup_step(state, seed):
        agg, ppo_state = state
        agg, ppo_state, stats = engine.train_step(
            agg, ppo_state, ba, ids, labels_d[ids], jax.random.PRNGKey(seed))
        return (agg, ppo_state), stats.loss

    results["supervised_stage3_b64"] = timed_steps(sup_step, (agg, ppo_state))

    for k, v in results.items():
        print(f"{k}: {v:.2f} steps/sec")


if __name__ == "__main__":
    main()
