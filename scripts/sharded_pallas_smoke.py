#!/usr/bin/env python
"""Run the Pallas path under a sharded mesh on the real chip.

Round-2 VERDICT gap: multi-chip validation ran on the virtual CPU mesh,
where ``attn_impl/select_impl='auto'`` fall back to XLA — the custom calls
had never compiled or executed under XLA's SPMD partitioner. This smoke
jits the CANONICAL pretrain step (CLAM_SB, batch 128, bag 1024, T=6,
bf16 — the exact bench.py program, with all four hot Pallas kernels:
fused trunk+attention fwd/bwd, compaction-matmul selection, block-gather
mixup, NT-Xent) with the batch sharded over a ``Mesh((n,), ('data',))``
via NamedSharding and params/bank replicated — the DataParallel
replacement (reference ``train_MuRCL.py:145``). On the single-chip tunnel
n=1: trivial sharding, but the program still routes through the SPMD
partitioner, which is exactly what was unvalidated.

Prints per-step losses and steps/sec; exits nonzero on failure. The CPU
counterpart (per-shard kernels via shard_map on the 8-device virtual
mesh) lives in tests/test_parallel.py.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

BATCH, FEAT_SIZE, DIM, K, T = 128, 1024, 512, 10, 6
NUM_SLIDES, PATCHES_PER_SLIDE = 64, 2048


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from murcl_tpu.data.bank import bank_from_arrays
    from murcl_tpu.engine import BankArrays, ContrastiveEngine, PretrainConfig
    from murcl_tpu.models import FullLayer, build_aggregator
    from murcl_tpu.parallel import data_mesh, place_batch, place_replicated

    assert jax.default_backend() == "tpu", "this smoke validates the TPU Pallas path"
    n_dev = len(jax.devices())
    assert BATCH % n_dev == 0

    rng_np = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(NUM_SLIDES):
        f = rng_np.normal(size=(PATCHES_PER_SLIDE, DIM)).astype(np.float32)
        a = rng_np.integers(0, K, size=PATCHES_PER_SLIDE)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(i % 2)
    bank = bank_from_arrays(feats, clusters, labels).device(dtype=jnp.bfloat16)

    model, feature_num = build_aggregator(
        "CLAM_SB", dim_in=DIM, num_classes=128,
        arch_setting={"gate": True, "dropout": 0.25, "k_sample": 8,
                      "subtyping": True},
    )
    model = model.clone(attn_impl="pallas")  # forced, not backend-auto
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=1024, class_num=128)
    cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=FEAT_SIZE,
                         num_clusters=K, max_patches=bank.max_patches,
                         train_stage=1, temperature=0.5, alpha=0.9,
                         batch_size=BATCH, compute_dtype="bfloat16",
                         remat="none", stage1_layout="batched",
                         select_impl="auto")  # auto == Pallas compaction on TPU
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-4))

    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32))

    mesh = data_mesh(n_dev)
    with mesh:
        agg = place_replicated(mesh, engine.init_state(params))
        bank_arrays = place_replicated(mesh, BankArrays.from_bank(bank))

        losses = []
        t0 = None
        steps = 6
        for i in range(steps + 2):
            ids = place_batch(mesh, jnp.asarray(
                rng_np.integers(0, NUM_SLIDES, size=BATCH), jnp.int32))
            agg, _, stats = engine.train_step(
                agg, None, bank_arrays, ids, jax.random.PRNGKey(i))
            loss = float(stats.loss)  # forced scalar read (tunnel sync)
            assert np.isfinite(loss), f"non-finite loss at step {i}: {loss}"
            losses.append(loss)
            if i == 1:
                t0 = time.perf_counter()
        dt = time.perf_counter() - t0
        # batch stays sharded through the whole step
        for leaf in jax.tree_util.tree_leaves(agg.params):
            assert leaf.sharding.is_fully_replicated

    print(f"sharded Pallas smoke OK: mesh=({n_dev},) 'data', "
          f"{steps / dt:.2f} steps/sec, losses {['%.4f' % l for l in losses]}")

    # ---- phase 2: the SPMD engine mode (round 3) -------------------------
    # The same canonical step as a per-shard shard_map program — the
    # production dp-SCALING route for the Pallas kernels. On the 1-chip
    # tunnel the mesh is (1,), but this is the only place the Mosaic
    # kernels (not interpret mode) compile and execute INSIDE shard_map on
    # real hardware; the CPU-mesh counterpart (8-way, interpret) lives in
    # tests/test_parallel.py section (e).
    engine_sp = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-4),
                                  mesh=mesh)
    with mesh:
        agg = place_replicated(mesh, engine_sp.init_state(params))
        sp_losses = []
        t0 = None
        for i in range(steps + 2):
            ids = place_batch(mesh, jnp.asarray(
                rng_np.integers(0, NUM_SLIDES, size=BATCH), jnp.int32))
            agg, _, stats = engine_sp.train_step(
                agg, None, bank_arrays, ids, jax.random.PRNGKey(i))
            loss = float(stats.loss)
            assert np.isfinite(loss), f"non-finite spmd loss at step {i}: {loss}"
            sp_losses.append(loss)
            if i == 1:
                t0 = time.perf_counter()
        dt = time.perf_counter() - t0
        for leaf in jax.tree_util.tree_leaves(agg.params):
            assert leaf.sharding.is_fully_replicated

    print(f"spmd shard_map engine smoke OK: mesh=({n_dev},) 'data', "
          f"{steps / dt:.2f} steps/sec, losses {['%.4f' % l for l in sp_losses]}")


if __name__ == "__main__":
    main()
