#!/usr/bin/env python
"""Data-mesh scaling validation on a virtual CPU topology (SURVEY §5.8).

Runs the full supervised stage-3 and contrastive stage-1 train steps over
1/2/4/8-device ``('data',)`` meshes and verifies (a) the programs compile
and execute with the placed shardings — XLA inserts the gradient psum /
NT-Xent all_gather, no resharding — and (b) the loss is identical at every
mesh size (global-batch semantics, PARITY.md "NT-Xent under dp").

Steps/sec on virtual CPU devices is NOT a performance number (all devices
share the host); it is printed only to show the programs run. Run:
``python scripts/scale_mesh.py``.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize beats env

import jax.numpy as jnp
import numpy as np
import optax


def main():
    from murcl_tpu.data.bank import bank_from_arrays
    from murcl_tpu.engine import (
        BankArrays, ContrastiveEngine, PretrainConfig, RolloutConfig,
        SupervisedEngine,
    )
    from murcl_tpu.models import FullLayer, PPO, build_aggregator
    from murcl_tpu.parallel import data_mesh, shard_engine_inputs

    assert len(jax.devices()) >= 8, jax.devices()
    B, FEAT, DIM, K, T = 16, 16, 32, 4, 3
    rng_np = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(B):
        n = int(rng_np.integers(24, 60))
        f = rng_np.normal(size=(n, DIM)).astype(np.float32)
        a = rng_np.integers(0, K, size=n)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(i % 2)
    bank = bank_from_arrays(feats, clusters, labels)
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(B, dtype=jnp.int32)
    lab = jnp.asarray(labels, jnp.int32)

    # supervised stage 3 (policy + aggregator grads)
    model, fn = build_aggregator("ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=fn, hidden_state_dim=32, class_num=2)
    ppo = PPO(state_dim=fn, hidden_state_dim=32, action_size=K, K_epochs=1)
    cfg = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT, num_clusters=K,
                        max_patches=bank.max_patches, train_stage=3)
    eng = SupervisedEngine(cfg, model, fc, ppo=ppo, tx=optax.adam(1e-3))
    params = eng.init_params(jax.random.PRNGKey(0),
                             jnp.zeros((B, FEAT, DIM)), jnp.zeros((B,), jnp.int32))
    ppo0 = ppo.init(jax.random.PRNGKey(1), jnp.zeros((B, fn)))

    # contrastive stage 1 (NT-Xent over the global batch)
    cmodel, cfn = build_aggregator("ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
    cfc = FullLayer(feature_num=cfn, hidden_state_dim=32, class_num=16)
    ccfg = PretrainConfig(arch="ABMIL", T=T, feat_size=FEAT, num_clusters=K,
                          max_patches=bank.max_patches, train_stage=1,
                          batch_size=B)
    ceng = ContrastiveEngine(ccfg, cmodel, cfc, tx=optax.adam(1e-3))
    cparams = ceng.init_params(jax.random.PRNGKey(2), jnp.zeros((B, FEAT, DIM)))

    sup_losses, con_losses = {}, {}
    for n_dev in (1, 2, 4, 8):
        mesh = data_mesh(n_dev)
        with mesh:
            agg, pst, bnk, ids_s, lab_s = shard_engine_inputs(
                mesh, eng.init_state(params), ppo0, bank_arrays, ids, labels=lab)
            t0 = time.perf_counter()
            agg, pst, stats = eng.train_step(agg, pst, bnk, ids_s, lab_s,
                                             jax.random.PRNGKey(3))
            sup_losses[n_dev] = float(stats.loss)
            dt_sup = time.perf_counter() - t0

            cagg, _, bnk2, ids2 = shard_engine_inputs(
                mesh, ceng.init_state(cparams), None, bank_arrays, ids)
            t0 = time.perf_counter()
            cagg, _, cstats = ceng.train_step(cagg, None, bnk2, ids2,
                                              jax.random.PRNGKey(4))
            con_losses[n_dev] = float(cstats.loss)
            dt_con = time.perf_counter() - t0
        print(f"n_devices={n_dev}: supervised loss {sup_losses[n_dev]:.6f} "
              f"({dt_sup:.2f}s incl. compile), contrastive loss "
              f"{con_losses[n_dev]:.6f} ({dt_con:.2f}s)")

    for d in (2, 4, 8):
        np.testing.assert_allclose(sup_losses[d], sup_losses[1], rtol=1e-5)
        np.testing.assert_allclose(con_losses[d], con_losses[1], rtol=1e-5)
    print("SCALE MESH OK: identical losses at every mesh size "
          "(global-batch semantics hold; programs run without resharding)")

    # ---- SPMD shard_map engine mode at every mesh size -------------------
    # The per-shard program (the Pallas-scaling route). Losses are NOT
    # expected identical across mesh sizes here — the step rng folds in
    # the shard index and mixup pairs shard-locally (PARITY.md §spmd); the
    # exact-equivalence proof against a global-view oracle lives in
    # tests/test_parallel.py section (e). This phase demonstrates the
    # shard_map programs compile and train at every mesh size.
    for n_dev in (1, 2, 4, 8):
        mesh = data_mesh(n_dev)
        eng_sp = SupervisedEngine(cfg, model, fc, ppo=ppo,
                                  tx=optax.adam(1e-3), mesh=mesh)
        ceng_sp = ContrastiveEngine(ccfg, cmodel, cfc, tx=optax.adam(1e-3),
                                    mesh=mesh)
        with mesh:
            agg, pst, bnk, ids_s, lab_s = shard_engine_inputs(
                mesh, eng_sp.init_state(params), ppo0, bank_arrays, ids,
                labels=lab)
            agg, pst, stats = eng_sp.train_step(agg, pst, bnk, ids_s, lab_s,
                                                jax.random.PRNGKey(3))
            sl = float(stats.loss)
            cagg, _, bnk2, ids2 = shard_engine_inputs(
                mesh, ceng_sp.init_state(cparams), None, bank_arrays, ids)
            cagg, _, cstats = ceng_sp.train_step(cagg, None, bnk2, ids2,
                                                 jax.random.PRNGKey(4))
            cl = float(cstats.loss)
        assert np.isfinite(sl) and np.isfinite(cl), (sl, cl)
        print(f"spmd n_devices={n_dev}: supervised loss {sl:.6f}, "
              f"contrastive loss {cl:.6f}")
    print("SPMD SCALE OK: per-shard shard_map programs trained at every "
          "mesh size (1/2/4/8)")


if __name__ == "__main__":
    main()
