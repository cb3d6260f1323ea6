#!/usr/bin/env python
"""PPO learning sanity: can stage 2 learn where the signal lives?

Builds a synthetic bank where the action matters: inside every cluster the
patches are ordered so the FIRST half carries the class signal and the
second half is noise. The cluster-window selection (`get_feats` semantics)
turns action a_k≈0 into "take the informative half"; a_k≈1 takes noise.
After stage-1 warmup of the aggregator, stage-2 PPO training should push
the mean rollout reward (confidence improvement across the T steps) up and
the policy's actions down.

Prints a JSON line with first/last-epoch reward and mean action.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from murcl_tpu.data.bank import bank_from_arrays
from murcl_tpu.engine import BankArrays, RolloutConfig, SupervisedEngine
from murcl_tpu.models import FullLayer, PPO, build_aggregator

SLIDES, N, DIM, K, FEAT, T, B = 32, 240, 32, 4, 24, 4, 8


def build_positional_bank():
    rng = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(SLIDES):
        label = i % 2
        f = rng.normal(size=(N, DIM)).astype(np.float32)
        # contiguous clusters; ONLY the first few patches of cluster 0
        # carry the signal — a random window hits them ~11% of the time,
        # so the task is unsolvable without learned window positions
        per = N // K
        cl = [list(range(k * per, (k + 1) * per)) for k in range(K)]
        if label == 1:
            # signal zone = first 30% of cluster 0: a random window hits it
            # ~1/3 of the time (stage 1 partially learns), a tuned window
            # (a_0 -> 0) hits it always
            f[cl[0][: (3 * per) // 10]] += 6.0 / np.sqrt(DIM)
        feats.append(f)
        clusters.append(cl)
        labels.append(label)
    return bank_from_arrays(feats, clusters, labels)


def main():
    bank = build_positional_bank()
    ba = BankArrays.from_bank(bank)
    labels_all = np.asarray(bank.labels)
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=2)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, FEAT, DIM))
    example_labels = jnp.zeros((B,), jnp.int32)

    # ---- stage 1: warm the aggregator with random windows ------------------
    cfg1 = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT, num_clusters=K,
                         max_patches=bank.max_patches, train_stage=1)
    eng1 = SupervisedEngine(cfg1, model, fc, tx=optax.adam(3e-3))
    agg = eng1.init_state(eng1.init_params(rng, example, example_labels))
    np_rng = np.random.default_rng(1)
    for step in range(150):
        ids = np_rng.choice(SLIDES, B, replace=False)
        agg, _, stats = eng1.train_step(
            agg, None, ba, jnp.asarray(ids, jnp.int32),
            jnp.asarray(labels_all[ids]), jax.random.PRNGKey(step))
    warm_loss = float(stats.loss)

    # ---- stage 2: PPO learns the windows ------------------------------------
    ppo = PPO(state_dim=feature_num, hidden_state_dim=32, action_size=K,
              action_std=0.3, lr=3e-4, gamma=0.1, K_epochs=3)
    cfg2 = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT, num_clusters=K,
                         max_patches=bank.max_patches, train_stage=2)
    eng2 = SupervisedEngine(cfg2, model, fc, ppo=ppo)
    ppo_state = ppo.init(jax.random.PRNGKey(2), jnp.zeros((B, feature_num)))

    def mean_confidence(engine, ppo_state):
        """Mean true-class softmax prob over all slides under this engine's
        action source (random for stage-1 cfg, policy for stage-2 cfg)."""
        ids = np.arange(SLIDES, dtype=np.int32)
        st = engine.eval_step(agg, ppo_state, ba, jnp.asarray(ids),
                              jnp.asarray(labels_all), jax.random.PRNGKey(99))
        logits = np.asarray(st.logits)
        probs = np.exp(logits - logits.max(1, keepdims=True))
        probs /= probs.sum(1, keepdims=True)
        return float(probs[np.arange(SLIDES), labels_all].mean())

    conf_random = mean_confidence(eng1, None)

    rewards_per_epoch, actions_per_epoch = [], []
    for epoch in range(15):
        ep_rewards = []
        for step in range(8):
            ids = np_rng.choice(SLIDES, B, replace=False)
            agg, ppo_state, stats = eng2.train_step(
                agg, ppo_state, ba, jnp.asarray(ids, jnp.int32),
                jnp.asarray(labels_all[ids]),
                jax.random.PRNGKey(1000 + epoch * 8 + step))
            ep_rewards.append(float(stats.rewards.sum()))
        rewards_per_epoch.append(float(np.mean(ep_rewards)))
        # deterministic policy action on a probe state
        mean, _, _ = ppo.model.apply(
            ppo_state.params, jnp.zeros((1, feature_num)), ppo.zero_carry(1))
        actions_per_epoch.append(float(jnp.mean(mean)))

    conf_policy = mean_confidence(eng2, ppo_state)

    report = {
        "signal": "first 30% of cluster 0",
        "confidence_random_windows": round(conf_random, 4),
        "confidence_policy_windows": round(conf_policy, 4),
        "stage1_final_loss": warm_loss,
        "stage2_reward_first_epoch": rewards_per_epoch[0],
        "stage2_reward_last_epoch": rewards_per_epoch[-1],
        "rewards_per_epoch": [round(r, 4) for r in rewards_per_epoch],
        "mean_action_first": round(actions_per_epoch[0], 3),
        "mean_action_last": round(actions_per_epoch[-1], 3),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
