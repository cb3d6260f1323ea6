"""Engine tests: full jitted rollout programs on a synthetic bank."""

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
from murcl_tpu.models import FullLayer, PPO, build_aggregator

DIM, K, B, T, F = 24, 4, 4, 3, 16


@pytest.fixture(scope="module")
def small_bank():
    rng = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for i in range(8):
        n = int(rng.integers(30, 80))
        f = rng.normal(size=(n, DIM)).astype(np.float32)
        a = rng.integers(0, K, size=n)
        if i % 2 == 1:
            f[a == 0] += 0.8  # class signal
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(i % 2)
    bank = bank_from_arrays(feats, clusters, labels)
    return bank


def _make_engine(arch, stage, small_bank, fc_hidden=16, lr=1e-3):
    model, feat_dim = build_aggregator(arch, dim_in=DIM, arch_setting={"L": 32, "D": 8, "k_sample": 3})
    fc = FullLayer(feature_num=feat_dim, hidden_state_dim=fc_hidden, class_num=2)
    cfg = RolloutConfig(
        arch=arch, T=T, feat_size=F, num_clusters=K,
        max_patches=small_bank.max_patches, train_stage=stage,
    )
    ppo = None
    if stage != 1:
        ppo = PPO(state_dim=feat_dim, hidden_state_dim=16, action_size=K,
                  lr=1e-4, gamma=0.1, K_epochs=2)
    tx = optax.adam(lr) if stage != 2 else None
    return SupervisedEngine(cfg, model, fc, ppo=ppo, tx=tx), ppo, feat_dim


def _init_states(engine, ppo, feat_dim, small_bank):
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, F, DIM))
    labels = jnp.zeros((B,), jnp.int32)
    params = engine.init_params(rng, example, labels)
    agg = engine.init_state(params)
    ppo_state = None
    if ppo is not None:
        ppo_state = ppo.init(jax.random.PRNGKey(1), jnp.zeros((B, feat_dim)))
    return agg, ppo_state


@pytest.mark.parametrize("arch", ["ABMIL", "CLAM_SB", "DSMIL"])
def test_stage1_train_step_decreases_loss(arch, small_bank):
    engine, ppo, feat_dim = _make_engine(arch, 1, small_bank)
    agg, ppo_state = _init_states(engine, ppo, feat_dim, small_bank)
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    labels = jnp.asarray(small_bank.labels)[ids]

    losses = []
    for step in range(8):
        agg, ppo_state, stats = engine.train_step(
            agg, ppo_state, bank, ids, labels, jax.random.PRNGKey(step)
        )
        assert np.isfinite(float(stats.loss))
        assert stats.step_losses.shape == (T,)
        assert stats.logits.shape == (B, 2)
        losses.append(float(stats.loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_stage2_updates_policy_not_model(small_bank):
    engine, ppo, feat_dim = _make_engine("ABMIL", 2, small_bank)
    agg, ppo_state = _init_states(engine, ppo, feat_dim, small_bank)
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    labels = jnp.asarray(small_bank.labels)[ids]

    agg2, ppo_state2, stats = engine.train_step(
        agg, ppo_state, bank, ids, labels, jax.random.PRNGKey(0)
    )
    leaf = lambda p: np.asarray(jax.tree_util.tree_leaves(p)[0])
    np.testing.assert_array_equal(leaf(agg2.params), leaf(agg.params))
    assert not np.allclose(leaf(ppo_state2.params), leaf(ppo_state.params))


def test_stage3_policy_fixed_model_trains(small_bank):
    engine, ppo, feat_dim = _make_engine("ABMIL", 3, small_bank)
    agg, ppo_state = _init_states(engine, ppo, feat_dim, small_bank)
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    labels = jnp.asarray(small_bank.labels)[ids]

    agg2, ppo_state2, _ = engine.train_step(
        agg, ppo_state, bank, ids, labels, jax.random.PRNGKey(0)
    )
    leaf = lambda p: np.asarray(jax.tree_util.tree_leaves(p)[0])
    assert not np.allclose(leaf(agg2.params), leaf(agg.params))
    np.testing.assert_array_equal(leaf(ppo_state2.params), leaf(ppo_state.params))


def test_eval_step_shapes_and_determinism_of_params(small_bank):
    engine, ppo, feat_dim = _make_engine("ABMIL", 1, small_bank)
    agg, ppo_state = _init_states(engine, ppo, feat_dim, small_bank)
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([4, 5, 6, 7], jnp.int32)
    labels = jnp.asarray(small_bank.labels)[ids]

    s1 = engine.eval_step(agg, ppo_state, bank, ids, labels, jax.random.PRNGKey(7))
    s2 = engine.eval_step(agg, ppo_state, bank, ids, labels, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(s1.logits), np.asarray(s2.logits))
    # different rollout rng -> different sampled sub-bags -> different logits
    s3 = engine.eval_step(agg, ppo_state, bank, ids, labels, jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(s1.logits), np.asarray(s3.logits))


def test_partial_batch_valid_mask(small_bank):
    engine, ppo, feat_dim = _make_engine("ABMIL", 1, small_bank)
    agg, ppo_state = _init_states(engine, ppo, feat_dim, small_bank)
    bank = BankArrays.from_bank(small_bank)
    # pad a 3-sample batch to 4 by repeating the last id
    ids = jnp.asarray([0, 1, 2, 2], jnp.int32)
    labels = jnp.asarray(small_bank.labels)[ids]
    valid = jnp.asarray([True, True, True, False])
    _, _, stats = engine.train_step(
        agg, ppo_state, bank, ids, labels, jax.random.PRNGKey(0), valid=valid
    )
    assert np.isfinite(float(stats.loss))


# ------------------------------------------------------------ contrastive --
@pytest.mark.parametrize("stage", [1, 2, 3])
def test_pretrain_step_all_stages(stage, small_bank):
    model, feat_dim = build_aggregator("ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=8)  # proj dim 8
    cfg = PretrainConfig(
        arch="ABMIL", T=T, feat_size=F, num_clusters=K,
        max_patches=small_bank.max_patches, train_stage=stage,
        alpha=0.9, temperature=0.5, batch_size=B,
    )
    ppo = None
    if stage != 1:
        ppo = PPO(state_dim=feat_dim, hidden_state_dim=16, action_size=K,
                  lr=1e-4, gamma=0.1, K_epochs=1)
    tx = optax.adam(1e-3) if stage != 2 else None
    engine = ContrastiveEngine(cfg, model, fc, ppo=ppo, tx=tx)

    params = engine.init_params(jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)))
    agg = engine.init_state(params)
    ppo_state = ppo.init(jax.random.PRNGKey(1), jnp.zeros((B, feat_dim))) if ppo else None

    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)

    agg2, ppo_state2, stats = engine.train_step(agg, ppo_state, bank, ids, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats.loss))
    assert stats.step_losses.shape == (T,)
    leaf = lambda p: np.asarray(jax.tree_util.tree_leaves(p)[0])
    if stage == 2:
        np.testing.assert_array_equal(leaf(agg2.params), leaf(agg.params))
        assert not np.allclose(leaf(ppo_state2.params), leaf(ppo_state.params))
    else:
        assert not np.allclose(leaf(agg2.params), leaf(agg.params))


def test_pretrain_loss_decreases_stage1(small_bank):
    model, feat_dim = build_aggregator("ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=8)
    cfg = PretrainConfig(arch="ABMIL", T=T, feat_size=F, num_clusters=K,
                         max_patches=small_bank.max_patches, train_stage=1)
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(3e-3))
    params = engine.init_params(jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)))
    agg = engine.init_state(params)
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    losses = []
    for step in range(10):
        agg, _, stats = engine.train_step(agg, None, bank, ids, jax.random.PRNGKey(step))
        losses.append(float(stats.loss))
    assert losses[-1] < losses[0], losses


def test_remat_none_matches_save_subbag(small_bank):
    """remat='none' is a pure memory/speed knob: identical losses and
    updated params to the default save-subbag rematerialization, for both
    engines (the backward recomputes the same math either way)."""
    bank_arrays = BankArrays.from_bank(small_bank)
    ids = jnp.arange(B, dtype=jnp.int32)
    lab = jnp.asarray([0, 1, 0, 1], jnp.int32)

    def run_supervised(remat):
        model, feat_dim = build_aggregator(
            "CLAM_SB", dim_in=DIM, arch_setting={"k_sample": 3})
        fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=2)
        cfg = RolloutConfig(arch="CLAM_SB", T=T, feat_size=F, num_clusters=K,
                            max_patches=small_bank.max_patches, train_stage=1,
                            remat=remat)
        eng = SupervisedEngine(cfg, model, fc, tx=optax.adam(1e-3))
        params = eng.init_params(jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)),
                                 jnp.zeros((B,), jnp.int32))
        agg = eng.init_state(params)
        agg, _, stats = eng.train_step(agg, None, bank_arrays, ids, lab,
                                       jax.random.PRNGKey(5))
        return float(stats.loss), agg.params

    def run_contrastive(remat):
        model, feat_dim = build_aggregator(
            "ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
        fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=8)
        cfg = PretrainConfig(arch="ABMIL", T=T, feat_size=F, num_clusters=K,
                             max_patches=small_bank.max_patches, train_stage=1,
                             batch_size=B, remat=remat)
        eng = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-3))
        params = eng.init_params(jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)))
        agg = eng.init_state(params)
        agg, _, stats = eng.train_step(agg, None, bank_arrays, ids,
                                       jax.random.PRNGKey(6))
        return float(stats.loss), agg.params

    for runner in (run_supervised, run_contrastive):
        loss_a, params_a = runner("save_subbag")
        loss_b, params_b = runner("none")
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
        # the two programs fuse differently, so reduction order shifts by
        # ulps; Adam's sqrt(v)+eps denominator amplifies that on a handful
        # of elements. The attention score bias (the only 1-element leaf)
        # has an analytically ZERO gradient (softmax shift invariance): its
        # gradient is pure cancellation noise, and Adam turns noise-order
        # differences into updates of up to ~lr — tolerate that scale there
        for xa, xb in zip(jax.tree_util.tree_leaves(params_a),
                          jax.tree_util.tree_leaves(params_b)):
            a = np.asarray(xa)
            atol = 2.5e-3 if a.size == 1 else 5e-5
            np.testing.assert_allclose(a, np.asarray(xb),
                                       rtol=1e-4, atol=atol)


def test_stage1_batched_rollout_matches_sequential_math(small_bank):
    """The batched stage-1 layout is the same math as a manual per-step
    loop: identical per-step NT-Xent losses, rewards, and rollout arrays
    when actions are fixed and mixup/dropout are identity (alpha=1,
    train=False)."""
    from murcl_tpu.ops.ntxent import nt_xent as nt_xent_plain
    from murcl_tpu.ops.select import select_feats

    model, feat_dim = build_aggregator(
        "ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=8)
    cfg = PretrainConfig(
        arch="ABMIL", T=T, feat_size=F, num_clusters=K,
        max_patches=small_bank.max_patches, train_stage=1, alpha=1.0,
        temperature=0.5, batch_size=B, stage1_layout="batched",
    )
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-3))
    params = engine.init_params(jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)))
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    actions = jax.random.uniform(jax.random.PRNGKey(7), (T, 2, B, K))

    total, (stats, rollouts) = engine._rollout_batched(
        params, bank, ids, jax.random.PRNGKey(3), train=False, actions=actions
    )

    # manual loop mirroring the engine's sequential order
    def cos(a, b):
        na = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        nb = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        return jnp.sum(na * nb, axis=-1)

    mp, fcp = params["model"], params["fc"]
    fc_carry = None
    losses, sims, states_seq = [], [], []
    for t in range(T):
        x2 = select_feats(
            bank.feats, jnp.concatenate([ids, ids]), bank.offsets,
            bank.num_patches, bank.cluster_tables, bank.cluster_sizes,
            jnp.concatenate([actions[t, 0], actions[t, 1]]),
            feat_size=F, max_patches=small_bank.max_patches,
        )
        emb, state = engine._encode(mp, x2, False, jax.random.PRNGKey(0))
        emb_a, emb_b = emb[:B], emb[B:]
        states_seq.append((state[:B], state[B:]))
        if t == 0:
            proj_a, _ = fc.apply(fcp, emb_a, None)
            proj_b, fc_carry = fc.apply(fcp, emb_b, None)
        else:
            proj_a, c_mid = fc.apply(fcp, emb_a, fc_carry)
            proj_b, fc_carry = fc.apply(fcp, emb_b, c_mid)
        losses.append(float(nt_xent_plain(proj_a, proj_b, 0.5)))
        sims.append(np.asarray(cos(proj_a, proj_b)))

    np.testing.assert_allclose(np.asarray(stats.step_losses), losses, rtol=1e-5)
    np.testing.assert_allclose(float(total), np.mean(losses), rtol=1e-5)
    manual_rewards = np.stack([sims[t - 1] - sims[t] for t in range(1, T)])
    for v in (0, 1):
        np.testing.assert_allclose(
            np.asarray(rollouts[v].rewards), manual_rewards, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rollouts[v].states),
            np.stack([np.asarray(states_seq[t][v]) for t in range(T - 1)]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(rollouts[v].actions), np.asarray(actions[1:, v]),
            rtol=1e-6,
        )


def test_stage1_layouts_both_train(small_bank):
    """Both stage-1 layouts run end-to-end through train_step and learn."""
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    for layout in ("batched", "sequential"):
        model, feat_dim = build_aggregator(
            "ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
        fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=8)
        cfg = PretrainConfig(
            arch="ABMIL", T=T, feat_size=F, num_clusters=K,
            max_patches=small_bank.max_patches, train_stage=1,
            batch_size=B, stage1_layout=layout,
        )
        engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(3e-3))
        params = engine.init_params(jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)))
        agg = engine.init_state(params)
        losses = []
        for step in range(8):
            agg, _, stats = engine.train_step(
                agg, None, bank, ids, jax.random.PRNGKey(step))
            losses.append(float(stats.loss))
        assert np.all(np.isfinite(losses)), (layout, losses)
        assert losses[-1] < losses[0], (layout, losses)


@pytest.mark.parametrize("arch", ["ABMIL", "CLAM_SB", "DSMIL"])
def test_supervised_batched_rollout_matches_manual(arch, small_bank):
    """The supervised batched stage-1 layout reproduces the sequential
    math exactly (fixed actions, train=False): per-step losses, rewards,
    final logits, and rollout arrays."""
    from murcl_tpu.engine.losses import cross_entropy, label_confidence
    from murcl_tpu.ops.select import select_feats

    engine, _, feat_dim = _make_engine(arch, 1, small_bank)
    params = engine.init_params(
        jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)), jnp.zeros((B,), jnp.int32))
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    labels = jnp.asarray([0, 1, 0, 1], jnp.int32)
    valid = jnp.ones((B,), bool)
    actions = jax.random.uniform(jax.random.PRNGKey(9), (T, B, K))

    total, (stats, rollout) = engine._rollout_batched(
        params, bank, ids, labels, valid, jax.random.PRNGKey(3), train=False,
        actions=actions)

    mp, fcp = params["model"], params["fc"]
    fc_carry, losses, confs, states_seq = None, [], [], []
    for t in range(T):
        x = select_feats(
            bank.feats, ids, bank.offsets, bank.num_patches,
            bank.cluster_tables, bank.cluster_sizes, actions[t],
            feat_size=F, max_patches=small_bank.max_patches)
        fc_in, extra = engine._arch_forward(
            mp, x, labels, valid, False, jax.random.PRNGKey(0))
        states_seq.append(np.asarray(fc_in))
        logits, fc_carry = engine.fc.apply(fcp, fc_in, fc_carry)
        losses.append(float(
            engine._ce_weight * cross_entropy(logits, labels, valid) + extra))
        confs.append(np.asarray(label_confidence(logits, labels)))

    np.testing.assert_allclose(np.asarray(stats.step_losses), losses, rtol=2e-5)
    np.testing.assert_allclose(float(total), np.mean(losses), rtol=2e-5)
    manual_rewards = np.stack([confs[t] - confs[t - 1] for t in range(1, T)])
    np.testing.assert_allclose(np.asarray(rollout.rewards), manual_rewards,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rollout.states), np.stack(states_seq[:-1]), rtol=2e-5)


def test_supervised_batched_prime_gate_stops_t0_grads(small_bank):
    """With ``train_model_prime=False`` (ABMIL, train_RLMIL.py:719-725) the
    batched layout's t=0 forward contributes zero gradient: grads must
    equal a manual loop that omits the t=0 loss term and carries a
    stop-gradient hidden state."""
    from murcl_tpu.engine.losses import cross_entropy
    from murcl_tpu.ops.select import select_feats

    model, feat_dim = build_aggregator(
        "ABMIL", dim_in=DIM, arch_setting={"L": 32, "D": 8})
    fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=2)
    cfg = RolloutConfig(
        arch="ABMIL", T=T, feat_size=F, num_clusters=K,
        max_patches=small_bank.max_patches, train_stage=1,
        train_model_prime=False)
    engine = SupervisedEngine(cfg, model, fc, tx=optax.adam(1e-3))
    params = engine.init_params(
        jax.random.PRNGKey(0), jnp.zeros((B, F, DIM)), jnp.zeros((B,), jnp.int32))
    bank = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    labels = jnp.asarray([0, 1, 0, 1], jnp.int32)
    valid = jnp.ones((B,), bool)
    actions = jax.random.uniform(jax.random.PRNGKey(11), (T, B, K))

    def batched_loss(p):
        total, _ = engine._rollout_batched(
            p, bank, ids, labels, valid, jax.random.PRNGKey(3), train=False,
            actions=actions)
        return total

    def manual_loss(p):
        mp, fcp = p["model"], p["fc"]
        fc_carry, losses = None, []
        for t in range(T):
            x = select_feats(
                bank.feats, ids, bank.offsets, bank.num_patches,
                bank.cluster_tables, bank.cluster_sizes, actions[t],
                feat_size=F, max_patches=small_bank.max_patches)
            fc_in, _ = engine._arch_forward(
                mp, x, labels, valid, False, jax.random.PRNGKey(0))
            logits, fc_carry = engine.fc.apply(fcp, fc_in, fc_carry)
            step = cross_entropy(logits, labels, valid)
            if t == 0:
                step = jax.lax.stop_gradient(step)
                logits = jax.lax.stop_gradient(logits)
                fc_carry = jax.lax.stop_gradient(fc_carry)
            losses.append(step)
        return sum(losses) / T

    va, ga = jax.value_and_grad(batched_loss)(params)
    vb, gb = jax.value_and_grad(manual_loss)(params)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_kernel_mix_route_matches_mixup_rows_route(small_bank, monkeypatch):
    """CLAM batched stage-1 with mixup fused into the attention kernel ==
    the standalone mixup_rows route, bitwise (same draws, same mix
    formula). Forces the TPU compact path on CPU via interpret-mode
    kernels; dropout 0 (the in-kernel PRNG has no CPU interpret rule)."""
    from jax.experimental import pallas as pl

    import murcl_tpu.engine.contrastive as ce
    import murcl_tpu.engine.supervised as se
    import murcl_tpu.ops.attention_pallas as gap
    import murcl_tpu.ops.compact_pallas as cp

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    for mod in (gap, cp):
        monkeypatch.setattr(mod.pl, "pallas_call", interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    model, feat_dim = build_aggregator(
        "CLAM_SB", dim_in=DIM,
        arch_setting={"k_sample": 3, "dropout": 0.0})
    model = model.clone(attn_impl="pallas")
    fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=8)
    cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=F, num_clusters=K,
                         max_patches=small_bank.max_patches, train_stage=1,
                         batch_size=4)
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-3))
    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((4, F, DIM), jnp.float32))
    bank_arrays = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([0, 3, 5, 6], jnp.int32)

    assert engine._fused_trunk_mix(jnp.zeros((1, F, DIM), jnp.float32))
    (_, (stats_fused, _)) = engine._rollout_batched(
        params, bank_arrays, ids, jax.random.PRNGKey(7), train=True)

    # same engine, kernel-mix disabled -> standalone mixup_rows kernel
    monkeypatch.setattr(ContrastiveEngine, "_fused_trunk_mix",
                        lambda self, x: False)
    (_, (stats_rows, _)) = engine._rollout_batched(
        params, bank_arrays, ids, jax.random.PRNGKey(7), train=True)

    np.testing.assert_array_equal(np.asarray(stats_fused.loss),
                                  np.asarray(stats_rows.loss))
    np.testing.assert_array_equal(np.asarray(stats_fused.step_losses),
                                  np.asarray(stats_rows.step_losses))


def test_kernel_mix_sequential_route_matches(small_bank, monkeypatch):
    """Sequential-layout rollout (the stage-2/3 shape) with kernel-fused
    mixup == the XLA mixup route to 1 f32 ulp (identical draws; the mix formulas
    coincide in f32 up to XLA's FMA contraction freedom)."""
    from jax.experimental import pallas as pl

    import murcl_tpu.ops.attention_pallas as gap
    import murcl_tpu.ops.compact_pallas as cp

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    for mod in (gap, cp):
        monkeypatch.setattr(mod.pl, "pallas_call", interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    model, feat_dim = build_aggregator(
        "CLAM_SB", dim_in=DIM,
        arch_setting={"k_sample": 3, "dropout": 0.0})
    model = model.clone(attn_impl="pallas")
    fc = FullLayer(feature_num=feat_dim, hidden_state_dim=16, class_num=8)
    cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=F, num_clusters=K,
                         max_patches=small_bank.max_patches, train_stage=1,
                         batch_size=4, stage1_layout="sequential")
    engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-3))
    rng = jax.random.PRNGKey(0)
    params = engine.init_params(rng, jnp.zeros((4, F, DIM), jnp.float32))
    bank_arrays = BankArrays.from_bank(small_bank)
    ids = jnp.asarray([1, 2, 4, 7], jnp.int32)

    (_, (stats_fused, _)) = engine._rollout_sequential(
        params, None, bank_arrays, ids, jax.random.PRNGKey(3), train=True)
    monkeypatch.setattr(ContrastiveEngine, "_fused_trunk_mix",
                        lambda self, x: False)
    (_, (stats_xla, _)) = engine._rollout_sequential(
        params, None, bank_arrays, ids, jax.random.PRNGKey(3), train=True)

    # XLA may contract the mix's mul-add into an FMA; 1-ulp f32 slack
    np.testing.assert_allclose(np.asarray(stats_fused.loss),
                               np.asarray(stats_xla.loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stats_fused.step_losses),
                               np.asarray(stats_xla.step_losses), rtol=1e-6)
