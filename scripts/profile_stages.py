#!/usr/bin/env python
"""Per-op profile of the SEQUENTIAL stage-2/3 contrastive steps.

The stage-1 batched layout has a published per-op profile
(``scripts/profile_step.py``; BASELINE.md); the sequential PPO-driven
stages (2: frozen encoder + PPO updates, 3: policy-driven + full backward)
only had whole-step rates (``scripts/bench_stages.py``). This attributes
their step time op-by-op the same way — the T-step ``lax.scan`` rollout
(reference ``train_MuRCL.py:254-298``) plus, for stage 2, the two PPO
update programs — so the stage-1-vs-stage-3 gap (17.77 vs 14.69 steps/s
at round 4) is explained by measurement rather than asserted (VERDICT r4
item 4).

Usage: python scripts/profile_stages.py [--stage 2|3] [--steps 3]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

BATCH, FEAT_SIZE, DIM, K, T = 128, 1024, 512, 10, 6
NUM_SLIDES, PATCHES = 64, 2048


def build_step(stage: int):
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from murcl_tpu.data.bank import bank_from_arrays
    from murcl_tpu.engine import BankArrays, ContrastiveEngine, PretrainConfig
    from murcl_tpu.models import FullLayer, PPO, build_aggregator

    rng_np = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(NUM_SLIDES):
        f = rng_np.normal(size=(PATCHES, DIM)).astype(np.float32)
        a = rng_np.integers(0, K, size=PATCHES)
        clusters.append([[int(j) for j in np.where(a == c)[0]]
                         for c in range(K)])
        feats.append(f)
        labels.append(i % 2)
    bank = bank_from_arrays(feats, clusters, labels).device(dtype=jnp.bfloat16)
    bank_arrays = BankArrays.from_bank(bank)

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
        tx=None if stage == 2 else optax.adam(1e-4))
    rng = jax.random.PRNGKey(0)
    params = engine.init_params(
        rng, jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32))
    agg = engine.init_state(params)
    ppo_state = ppo.init(rng, jnp.zeros((BATCH, feature_num)))
    ids = jnp.arange(BATCH, dtype=jnp.int32) % NUM_SLIDES
    return engine, agg, ppo_state, bank_arrays, ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=3, choices=[2, 3])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/murcl_profile_stage{args.stage}"

    import jax

    engine, agg, ppo_state, bank_arrays, ids = build_step(args.stage)

    def step(agg, ppo_state, seed):
        return engine.train_step(agg, ppo_state, bank_arrays, ids,
                                 jax.random.PRNGKey(seed))

    agg, ppo_state, stats = step(agg, ppo_state, 0)
    print(f"warmup loss {float(stats.loss):.4f}", file=sys.stderr)

    with jax.profiler.trace(out):
        for i in range(args.steps):
            agg, ppo_state, stats = step(agg, ppo_state, i + 1)
        _ = float(stats.loss)
    print(f"traced {args.steps} stage-{args.stage} steps, "
          f"loss {float(stats.loss):.4f}", file=sys.stderr)

    traces = sorted(glob.glob(
        os.path.join(out, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        print("NO TRACE FILES FOUND — profiler unsupported on this backend?")
        return
    path = traces[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}

    totals = defaultdict(float)
    counts = defaultdict(int)
    grand = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1000.0
        name = ev.get("name", "?")
        totals[name] += dur
        counts[name] += 1
        grand += dur
    print(f"trace: {path}")
    print(f"total device event time over {args.steps} steps: {grand:.1f} ms "
          f"({grand/args.steps:.1f} ms/step)\n")
    print(f"{'ms/step':>9}  {'calls':>6}  op")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{ms/args.steps:9.2f}  {counts[name]//args.steps:6d}  "
              f"{name[:100]}")


if __name__ == "__main__":
    main()
