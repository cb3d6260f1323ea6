"""Optimizer parity: our optax chains vs torch Adam/SGD semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from murcl_tpu.engine.optim import (
    linear_eval_frozen_paths,
    lr_schedule_factory,
    make_optimizer,
    set_learning_rates,
)


def _setup(optimizer, wdecay, steps=5, backbone_lr=1e-2, fc_lr=5e-3):
    rng = np.random.default_rng(0)
    w_model = rng.normal(size=(4, 3)).astype(np.float32)
    w_fc = rng.normal(size=(3,)).astype(np.float32)
    x = rng.normal(size=(8, 4)).astype(np.float32)
    y = rng.normal(size=(8,)).astype(np.float32)

    # ---- torch ----
    tm = torch.nn.Parameter(torch.from_numpy(w_model.copy()))
    tf = torch.nn.Parameter(torch.from_numpy(w_fc.copy()))
    groups = [{"params": [tm], "lr": backbone_lr}, {"params": [tf], "lr": fc_lr}]
    if optimizer == "Adam":
        topt = torch.optim.Adam(groups, betas=(0.9, 0.999), weight_decay=wdecay)
    else:
        topt = torch.optim.SGD(groups, lr=0, momentum=0.9, nesterov=True,
                               weight_decay=wdecay)
    tx_, ty = torch.from_numpy(x), torch.from_numpy(y)
    for _ in range(steps):
        topt.zero_grad()
        loss = (((tx_ @ tm) * tf).sum(dim=1) - ty).pow(2).mean()
        loss.backward()
        topt.step()

    # ---- ours ----
    params = {"model": {"w": jnp.asarray(w_model)}, "fc": {"w": jnp.asarray(w_fc)}}
    tx = make_optimizer(optimizer=optimizer, backbone_lr=backbone_lr,
                        fc_lr=fc_lr, wdecay=wdecay)
    opt_state = tx.init(params)

    def loss_fn(p):
        pred = jnp.sum((jnp.asarray(x) @ p["model"]["w"]) * p["fc"]["w"], axis=1)
        return jnp.mean((pred - jnp.asarray(y)) ** 2)

    import optax

    for _ in range(steps):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    return (tm.detach().numpy(), tf.detach().numpy(),
            np.asarray(params["model"]["w"]), np.asarray(params["fc"]["w"]))


@pytest.mark.parametrize("optimizer", ["Adam", "SGD"])
@pytest.mark.parametrize("wdecay", [0.0, 1e-2])
def test_two_group_optimizer_matches_torch(optimizer, wdecay):
    tm, tf, om, of = _setup(optimizer, wdecay)
    np.testing.assert_allclose(om, tm, atol=1e-5)
    np.testing.assert_allclose(of, tf, atol=1e-5)


def test_lr_schedules_match_torch():
    # StepLR(7, 0.1)
    f = lr_schedule_factory("StepLR", 1e-3, epochs=30, warmup=0)
    lrs = [f(e) for e in range(30)]
    t = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
    sched = torch.optim.lr_scheduler.StepLR(t, step_size=7, gamma=0.1)
    want = []
    for e in range(30):
        want.append(t.param_groups[0]["lr"])
        sched.step()
    np.testing.assert_allclose(lrs, want, rtol=1e-8)

    # CosineAnnealingLR(T_max=epochs-warmup, eta_min=1e-6), stepping from warmup
    warmup = 3
    f = lr_schedule_factory("CosineAnnealingLR", 1e-3, epochs=20, warmup=warmup)
    t = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(t, T_max=20 - warmup, eta_min=1e-6)
    want = []
    for e in range(20):
        want.append(t.param_groups[0]["lr"])
        if e >= warmup:  # reference steps only after warmup (train_RLMIL.py:797)
            sched.step()
    got = [f(e) for e in range(20)]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_set_learning_rates_updates_groups():
    params = {"model": {"w": jnp.ones((2, 2))}, "fc": {"w": jnp.ones((2,))}}
    tx = make_optimizer(backbone_lr=1e-3, fc_lr=1e-4)
    st = tx.init(params)
    st2 = set_learning_rates(st, 5e-4, 5e-5)
    np.testing.assert_allclose(
        float(st2.inner_states["model"].inner_state.hyperparams["lr"]), 5e-4, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(st2.inner_states["fc"].inner_state.hyperparams["lr"]), 5e-5, rtol=1e-6
    )


def test_linear_eval_freezing_zeroes_updates():
    import optax

    params = {
        "model": {"encoder": {"w": jnp.ones((2, 2))}, "fc": {"w": jnp.ones((2,))}},
        "fc": {"w": jnp.ones((2,))},
    }
    tx = make_optimizer(frozen_model_paths=linear_eval_frozen_paths("ABMIL"))
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    assert (np.asarray(updates["model"]["encoder"]["w"]) == 0).all()
    assert (np.asarray(updates["model"]["fc"]["w"]) != 0).all()
    assert (np.asarray(updates["fc"]["w"]) != 0).all()
