#!/usr/bin/env python
"""Profile the canonical pretrain step and print the top ops by device time.

Runs the bench-shaped train step (CLAM_SB, batch 128, bag 1024, T=6,
stage 1, bf16, remat=none, batched layout) under ``jax.profiler.trace``
and parses the chrome-trace json that the profiler writes, aggregating
device-lane event durations by op name. No TensorBoard needed.

Usage: python scripts/profile_step.py [--layout batched|sequential]
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


def build_step(layout: str):
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from murcl_tpu.data.bank import bank_from_arrays
    from murcl_tpu.engine import BankArrays, ContrastiveEngine, PretrainConfig
    from murcl_tpu.models import FullLayer, build_aggregator

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
        arch_setting={"gate": True, "dropout": 0.25, "k_sample": 8,
                      "subtyping": True})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=1024, class_num=128)
    cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=FEAT_SIZE,
                         num_clusters=K, max_patches=bank.max_patches,
                         train_stage=1, batch_size=BATCH,
                         compute_dtype="bfloat16", remat="none",
                         stage1_layout=layout)
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-4))
    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32))
    agg = engine.init_state(params)
    ids = jnp.arange(BATCH, dtype=jnp.int32) % NUM_SLIDES
    return engine, agg, bank_arrays, ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="batched")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/murcl_profile")
    args = ap.parse_args()

    import jax

    engine, agg, bank_arrays, ids = build_step(args.layout)

    def step(agg, seed):
        return engine.train_step(agg, None, bank_arrays, ids,
                                 jax.random.PRNGKey(seed))

    # compile + settle
    agg, _, stats = step(agg, 0)
    print(f"warmup loss {float(stats.loss):.4f}", file=sys.stderr)

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            agg, _, stats = step(agg, i + 1)
        _ = float(stats.loss)  # force completion inside the trace window
    print(f"traced {args.steps} steps, loss {float(stats.loss):.4f}",
          file=sys.stderr)

    traces = sorted(glob.glob(
        os.path.join(args.out, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        print("NO TRACE FILES FOUND — profiler unsupported on this backend?")
        return
    path = traces[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # chrome trace: events on TPU device lanes carry XLA op names; aggregate
    # complete events ("ph" == "X") by name on device-ish pids
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
        dur = ev.get("dur", 0) / 1000.0  # us -> ms
        name = ev.get("name", "?")
        totals[name] += dur
        counts[name] += 1
        grand += dur
    print(f"trace: {path}")
    print(f"process lanes: { {pid_names.get(p, p) for p in (device_pids or pid_names)} }")
    print(f"total device event time over {args.steps} steps: {grand:.1f} ms "
          f"({grand/args.steps:.1f} ms/step)\n")
    print(f"{'ms/step':>9}  {'calls':>6}  op")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{ms/args.steps:9.2f}  {counts[name]//args.steps:6d}  {name[:100]}")


if __name__ == "__main__":
    main()
