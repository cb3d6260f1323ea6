"""Model zoo tests: shapes, invariants, and torch-math parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from murcl_tpu.models import (
    ABMIL,
    CL,
    CLAM_SB,
    FullLayer,
    MILNet,
    PPO,
    Rollout,
    TorchGRUCell,
    build_aggregator,
)
from murcl_tpu.models.rlmil import act, evaluate

B, N, DIN = 3, 16, 32


@pytest.fixture()
def bags(rng):
    return jnp.asarray(rng.normal(size=(B, N, DIN)).astype(np.float32))


# ------------------------------------------------------------------ ABMIL --
def test_abmil_shapes_and_attention(bags):
    model = ABMIL(dim_in=DIN, L=64, D=16, dim_out=2)
    params = model.init(jax.random.PRNGKey(0), bags)
    out, aux = model.apply(params, bags)
    assert out.shape == (B, 64)
    assert aux["logits"].shape == (B, 2)
    # attention weights: softmax over N scaled by 1/sqrt(N)
    w = np.asarray(aux["attention"])
    np.testing.assert_allclose(w.sum(axis=1), 1.0 / np.sqrt(N), rtol=1e-5)


def test_abmil_mask_excludes_padding(bags):
    model = ABMIL(dim_in=DIN, L=64, D=16)
    params = model.init(jax.random.PRNGKey(0), bags)
    mask = jnp.asarray(np.arange(N)[None, :] < np.array([16, 8, 4])[:, None])
    _, aux = model.apply(params, bags, mask=mask)
    w = np.asarray(aux["attention"])
    assert (w[1, 8:] == 0).all() and (w[2, 4:] == 0).all()


# ------------------------------------------------------------------- CLAM --
def test_clam_shapes_and_instance_loss(bags):
    model = CLAM_SB(in_dim=DIN, k_sample=4, n_classes=2)
    labels = jnp.asarray([0, 1, 1])
    params = model.init(jax.random.PRNGKey(0), bags, labels, True)
    m, aux = model.apply(params, bags, labels, True)
    assert m.shape == (B, 512)
    assert aux["attention"].shape == (B, N)
    assert aux["instance_loss"].shape == (B,)
    assert np.isfinite(np.asarray(aux["instance_loss"])).all()
    assert aux["inst_preds"].shape == (B, 8)  # 2*k_sample


def test_clam_attention_only_matches_full(bags):
    """Raw attention from aux equals what a fresh forward would produce."""
    model = CLAM_SB(in_dim=DIN)
    params = model.init(jax.random.PRNGKey(1), bags)
    _, aux1 = model.apply(params, bags)
    _, aux2 = model.apply(params, bags)
    np.testing.assert_array_equal(np.asarray(aux1["attention"]), np.asarray(aux2["attention"]))


def test_clam_subtyping_divides(bags):
    m1 = CLAM_SB(in_dim=DIN, subtyping=False)
    m2 = CLAM_SB(in_dim=DIN, subtyping=True)
    labels = jnp.asarray([1, 0, 1])
    p = m1.init(jax.random.PRNGKey(0), bags, labels, True)
    _, aux1 = m1.apply(p, bags, labels, True)
    _, aux2 = m2.apply(p, bags, labels, True)
    assert np.isfinite(np.asarray(aux2["instance_loss"])).all()
    assert not np.allclose(np.asarray(aux1["instance_loss"]), np.asarray(aux2["instance_loss"]))


# ------------------------------------------------------------------ DSMIL --
def test_dsmil_shapes(bags):
    model = MILNet(dim_feat=DIN, num_classes=2)
    params = model.init(jax.random.PRNGKey(0), bags)
    inst, bag, aux = model.apply(params, bags)
    assert inst.shape == (B, N, 2)
    assert bag.shape == (B, 2, DIN)
    # per-class attention normalizes over instances
    np.testing.assert_allclose(np.asarray(aux["attention"]).sum(axis=1), 1.0, rtol=1e-5)


def test_dsmil_critical_instance_attention_peak(bags):
    """The critical instance should attend maximally to itself per class."""
    model = MILNet(dim_feat=DIN, num_classes=2)
    params = model.init(jax.random.PRNGKey(0), bags)
    inst, _, aux = model.apply(params, bags)
    crit = np.asarray(jnp.argmax(inst, axis=1))  # (B, C)
    att = np.asarray(aux["attention"])  # (B, N, C)
    for b in range(B):
        for c in range(2):
            assert att[b, crit[b, c], c] == att[b, :, c].max()


# ------------------------------------------------------------------- CL ----
def test_cl_wrapper_two_views(bags):
    encoder = ABMIL(dim_in=DIN, L=64, D=16)
    model = CL(encoder=encoder)
    params = model.init(jax.random.PRNGKey(0), [bags, bags])
    outs = model.apply(params, [bags, bags + 1.0])
    assert len(outs) == 2
    assert outs[0][0].shape == (B, 64)
    # encoder params are nested under 'encoder' for weight-surgery parity
    assert "encoder" in params["params"]


# ---------------------------------------------------------- TorchGRUCell --
def test_gru_cell_matches_torch():
    import torch

    hidden, din, b = 8, 5, 4
    cell = TorchGRUCell(hidden_features=hidden)
    x = np.random.default_rng(0).normal(size=(b, din)).astype(np.float32)
    h0 = np.random.default_rng(1).normal(size=(b, hidden)).astype(np.float32)
    params = cell.init(jax.random.PRNGKey(0), jnp.asarray(h0), jnp.asarray(x))

    tgru = torch.nn.GRU(din, hidden)
    with torch.no_grad():
        tgru.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["params"]["w_ih"]).T))
        tgru.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["params"]["w_hh"]).T))
        tgru.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["params"]["b_ih"])))
        tgru.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["params"]["b_hh"])))
        want, _ = tgru(torch.from_numpy(x).unsqueeze(0), torch.from_numpy(h0).unsqueeze(0))

    got, _ = cell.apply(params, jnp.asarray(h0), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.squeeze(0).numpy(), atol=1e-5)


# -------------------------------------------------------------- FullLayer --
def test_full_layer_carry_semantics():
    fl = FullLayer(feature_num=16, hidden_state_dim=32, class_num=4)
    x = jnp.ones((B, 16))
    params = fl.init(jax.random.PRNGKey(0), x, None)
    logits0, h1 = fl.apply(params, x, None)  # restart
    logits1, h2 = fl.apply(params, x, h1)
    assert logits0.shape == (B, 4)
    assert not np.allclose(np.asarray(logits0), np.asarray(logits1))
    # restart is equivalent to a zero carry
    logits0b, _ = fl.apply(params, x, jnp.zeros_like(h1))
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits0b), rtol=1e-6)


def test_full_layer_cascaded_mode():
    fl = FullLayer(feature_num=8, hidden_state_dim=32, class_num=3, fc_rnn=False)
    x = jnp.ones((B, 8))
    params = fl.init(jax.random.PRNGKey(0), x, None)
    logits, acc = fl.apply(params, x, None)
    assert logits is None and acc.shape == (B, 8)
    logits2, acc2 = fl.apply(params, x, acc)
    assert logits2.shape == (B, 3) and acc2.shape == (B, 16)
    for t in range(2, 6):
        assert f"fc_{t}" in params["params"]


# ------------------------------------------------------------------- PPO ---
def test_ppo_act_evaluate_and_update():
    state_dim, K, T1 = 12, 5, 4
    ppo = PPO(state_dim=state_dim, hidden_state_dim=16, action_size=K,
              action_std=0.1, lr=1e-3, gamma=0.5, K_epochs=2)
    rng = jax.random.PRNGKey(0)
    state = jnp.asarray(np.random.default_rng(0).normal(size=(B, state_dim)).astype(np.float32))
    ts = ppo.init(rng, state)

    carry = ppo.zero_carry(B)
    steps = []
    for t in range(T1):
        action, carry, step = ppo.select_action(ts, state + t, carry, jax.random.fold_in(rng, t))
        assert action.shape == (B, K)
        assert (np.asarray(action) >= 0).all() and (np.asarray(action) <= 1).all()
        steps.append(step)

    rollout = Rollout(
        states=jnp.stack([s.state for s in steps]),
        actions=jnp.stack([s.action for s in steps]),
        logprobs=jnp.stack([s.logprob for s in steps]),
        rewards=jnp.asarray(np.random.default_rng(1).normal(size=(T1, B)).astype(np.float32)),
    )
    new_ts, loss = ppo.update(ts, rollout)
    assert np.isfinite(float(loss))
    # params must move and old_params must sync to the new params
    leaf = lambda p: np.asarray(jax.tree_util.tree_leaves(p)[0])
    assert not np.allclose(leaf(new_ts.params), leaf(ts.params))
    np.testing.assert_array_equal(leaf(new_ts.params), leaf(new_ts.old_params))


def test_ppo_discounted_returns_oracle():
    ppo = PPO(state_dim=4, action_size=2, gamma=0.9)
    rewards = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float32)
    got = np.asarray(ppo.discounted_returns(jnp.asarray(rewards)))
    # manual reverse scan
    ret = np.zeros_like(rewards)
    g = np.zeros(2)
    for t in reversed(range(3)):
        g = rewards[t] + 0.9 * g
        ret[t] = g
    want = (ret - ret.mean()) / (ret.std(ddof=1) + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_evaluate_zero_hidden_semantics():
    """evaluate() must re-run from zero hidden, not the rollout carry."""
    ppo = PPO(state_dim=6, hidden_state_dim=8, action_size=2)
    rng = jax.random.PRNGKey(0)
    states = jnp.asarray(np.random.default_rng(0).normal(size=(3, B, 6)).astype(np.float32))
    ts = ppo.init(rng, states[0])
    actions = jnp.clip(jnp.asarray(np.random.default_rng(1).random((3, B, 2)).astype(np.float32)), 0, 1)
    lp, v, ent = evaluate(ppo.model, ts.params, states, actions)
    assert lp.shape == (3, B) and v.shape == (3, B) and ent.shape == (3, B)
    # first-step logprob equals a fresh act() from zero carry with the same action
    mean0, _, _ = ppo.model.apply(ts.params, states[0], ppo.zero_carry(B))
    from murcl_tpu.models.rlmil import _diag_gaussian_logprob

    want = _diag_gaussian_logprob(actions[0], mean0, ppo.model.action_std)
    np.testing.assert_allclose(np.asarray(lp[0]), np.asarray(want), rtol=1e-5)


# ---------------------------------------------------------------- factory --
@pytest.mark.parametrize("arch,feat", [("ABMIL", 512), ("CLAM_SB", 512), ("DSMIL", DIN)])
def test_build_aggregator(arch, feat, bags):
    model, dim = build_aggregator(arch, dim_in=DIN)
    assert dim == feat
    params = model.init(jax.random.PRNGKey(0), bags)
    out = model.apply(params, bags)
    assert out is not None


def test_actor_critic_conv_variant():
    """policy_conv capability (rlmil.py:31-37): conv feature-map states."""
    from murcl_tpu.models import ActorCritic

    c, h, w = 8, 4, 4
    model = ActorCritic(state_dim=c * h * w, hidden_state_dim=16,
                        action_size=3, policy_conv=True, feature_dim=c)
    state = jnp.ones((B, c, h, w))
    carry = model.zero_carry(B)
    params = model.init(jax.random.PRNGKey(0), state, carry)
    mean, value, new_carry = model.apply(params, state, carry)
    assert mean.shape == (B, 3) and value.shape == (B,)
    assert (np.asarray(mean) >= 0).all() and (np.asarray(mean) <= 1).all()
