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
        # of elements, and the attention score bias has a ~0 gradient
        # (softmax shift invariance) that is pure noise in relative terms
        for xa, xb in zip(jax.tree_util.tree_leaves(params_a),
                          jax.tree_util.tree_leaves(params_b)):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=1e-4, atol=5e-5)
