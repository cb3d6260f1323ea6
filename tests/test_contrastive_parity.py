"""Exact-step MuRCL pretraining parity vs the reference's own modules.

Same weights (through the torch bridge), same fixed action sequences, and
identity mixup (alpha=1) — the per-step NT-Xent losses of our rollout math
must match the reference train loop (``train_MuRCL.py:233-288``) run with
its own modules (CL + ABMIL + Full_layer + NT_Xent + get_feats), including
the cross-view GRU-hidden interleave quirk.

Our side mirrors the engine's ``pair_forward`` order exactly (select ->
encode both views -> fc view0 then view1 on a shared carry).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from murcl_tpu.data.bank import bank_from_arrays
from murcl_tpu.engine.torch_import import export_model_state, flax_to_torch
from murcl_tpu.engine.torch_import import FULL_LAYER_MAP
from murcl_tpu.models import ABMIL, FullLayer
from murcl_tpu.ops.ntxent import nt_xent
from murcl_tpu.ops.select import select_feats

B, DIM, K, FEAT, T = 4, 16, 3, 12, 3


def test_exact_step_losses_match_reference():
    rng = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for _ in range(B):
        n = int(rng.integers(40, 90))
        f = rng.normal(size=(n, DIM)).astype(np.float32)
        a = rng.integers(0, K, size=n)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(0)
    bank = bank_from_arrays(feats, clusters, labels)
    actions = rng.random((T, 2, B, K)).astype(np.float32)
    temperature = 0.5

    # ---- our side: engine math with fixed actions -------------------------
    model = ABMIL(dim_in=DIM, L=16, D=4, dim_out=8)
    fc = FullLayer(feature_num=16, hidden_state_dim=16, class_num=8)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, FEAT, DIM)))
    fcp = fc.init(jax.random.PRNGKey(1), jnp.zeros((B, 16)), None)

    ids = jnp.arange(B, dtype=jnp.int32)

    def select(a):
        return select_feats(
            bank.feats, ids, jnp.asarray(bank.offsets),
            jnp.asarray(bank.num_patches), jnp.asarray(bank.cluster_tables),
            jnp.asarray(bank.cluster_sizes), jnp.asarray(a),
            feat_size=FEAT, max_patches=bank.max_patches,
        )

    our_losses = []
    fc_carry = None
    for t in range(T):
        emb_a, _ = model.apply(mp, select(actions[t, 0]))
        emb_b, _ = model.apply(mp, select(actions[t, 1]))
        if t == 0:
            proj_a, _ = fc.apply(fcp, emb_a, None)
            proj_b, fc_carry = fc.apply(fcp, emb_b, None)
        else:
            proj_a, fc_carry = fc.apply(fcp, emb_a, fc_carry)
            proj_b, fc_carry = fc.apply(fcp, emb_b, fc_carry)
        our_losses.append(float(nt_xent(proj_a, proj_b, temperature)))

    # ---- reference side: its own modules, same weights + actions ----------
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    try:
        from models.abmil import ABMIL as RefABMIL
        from models.cl import CL as RefCL
        from models.rlmil import Full_layer as RefFullLayer
        from utils.datasets import get_feats as ref_get_feats
        from utils.datasets import mixup as ref_mixup
        from utils.losses import NT_Xent as RefNTXent

        rmodel = RefABMIL(dim_in=DIM, L=16, D=4, dim_out=8)
        rmodel.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_model_state(mp, "ABMIL").items()}
        )
        rcl = RefCL(rmodel, projection_dim=8, n_features=16).eval()
        rfc = RefFullLayer(16, 16, True, 8).eval()
        rfc.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in flax_to_torch(fcp, FULL_LAYER_MAP).items()}
        )
        criterion = RefNTXent(B, temperature)

        feat_list = [torch.from_numpy(f).unsqueeze(0) for f in feats]
        ref_losses = []
        with torch.no_grad():
            for t in range(T):
                x_views = [
                    ref_get_feats(feat_list, clusters,
                                  torch.from_numpy(actions[t, v]), FEAT)
                    for v in range(2)
                ]
                # alpha=1 -> identity mixup (train_MuRCL.py:239)
                x_views = [ref_mixup(x, 1.0)[0] for x in x_views]
                outputs, _ = rcl(x_views)
                outputs = [rfc(o, restart=(t == 0)) for o in outputs]
                ref_losses.append(float(criterion(outputs[0], outputs[1])))
    finally:
        sys.path.remove("/root/reference")

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4)


def test_stage2_rollout_rewards_and_ppo_update_match_reference():
    """Stage-2 exact-step parity (``train_MuRCL.py:254-298``): with shared
    weights and FIXED actions (alpha=1 mixup), both sides must produce the
    same per-step losses, cosine-similarity reward stream, policy means
    and logprobs (per-view GRU threading with the t=1 restart), and —
    after one ``ppo.update`` per view in view order — the same updated
    policy parameters."""
    rng = np.random.default_rng(7)
    feats, clusters = [], []
    for _ in range(B):
        n = int(rng.integers(40, 90))
        f = rng.normal(size=(n, DIM)).astype(np.float32)
        a = rng.integers(0, K, size=n)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
    bank = bank_from_arrays(feats, clusters, [0] * B)
    actions0 = rng.random((2, B, K)).astype(np.float32)
    actions_t = rng.random((T - 1, 2, B, K)).astype(np.float32)
    temperature = 0.5
    STD, H, LR, GAMMA, KEP = 0.5, 8, 1e-3, 0.1, 2

    from murcl_tpu.models import PPO
    from murcl_tpu.models.rlmil import Rollout, _diag_gaussian_logprob

    model = ABMIL(dim_in=DIM, L=16, D=4, dim_out=8)
    fc = FullLayer(feature_num=16, hidden_state_dim=16, class_num=8)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, FEAT, DIM)))
    fcp = fc.init(jax.random.PRNGKey(1), jnp.zeros((B, 16)), None)
    ppo = PPO(state_dim=16, hidden_state_dim=H, action_size=K, action_std=STD,
              lr=LR, gamma=GAMMA, K_epochs=KEP)
    ppo_state = ppo.init(jax.random.PRNGKey(2), jnp.zeros((B, 16)))
    initial_policy_params = ppo_state.params

    ids = jnp.arange(B, dtype=jnp.int32)

    def select(a):
        return select_feats(
            bank.feats, ids, jnp.asarray(bank.offsets),
            jnp.asarray(bank.num_patches), jnp.asarray(bank.cluster_tables),
            jnp.asarray(bank.cluster_sizes), jnp.asarray(a),
            feat_size=FEAT, max_patches=bank.max_patches,
        )

    def cos(a, b):
        na = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        nb = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        return jnp.sum(na * nb, axis=-1)

    # ---- our side: engine-order rollout with fixed actions ----------------
    our = {"loss": [], "reward": [], "mean": [], "logprob": []}
    rollouts = {0: {"s": [], "a": [], "lp": []}, 1: {"s": [], "a": [], "lp": []}}
    fc_carry = None
    pol_carry = {0: ppo.zero_carry(B), 1: ppo.zero_carry(B)}
    states = {}
    for t in range(T):
        if t == 0:
            acts = actions0
        else:
            acts = []
            for v in range(2):
                mean, _, pol_carry[v] = ppo.model.apply(
                    ppo_state.old_params, states[v], pol_carry[v]
                )
                action = jnp.asarray(actions_t[t - 1, v])
                lp = _diag_gaussian_logprob(action, mean, STD)
                rollouts[v]["s"].append(states[v])
                rollouts[v]["a"].append(action)
                rollouts[v]["lp"].append(lp)
                our["mean"].append(np.asarray(mean))
                our["logprob"].append(np.asarray(lp))
                acts.append(action)
        emb_a, _ = model.apply(mp, select(acts[0]))
        emb_b, _ = model.apply(mp, select(acts[1]))
        states = {0: jax.lax.stop_gradient(emb_a), 1: jax.lax.stop_gradient(emb_b)}
        if t == 0:
            proj_a, _ = fc.apply(fcp, emb_a, None)
            proj_b, fc_carry = fc.apply(fcp, emb_b, None)
        else:
            proj_a, fc_carry = fc.apply(fcp, emb_a, fc_carry)
            proj_b, fc_carry = fc.apply(fcp, emb_b, fc_carry)
        our["loss"].append(float(nt_xent(proj_a, proj_b, temperature)))
        sim = cos(proj_a, proj_b)
        if t > 0:
            our["reward"].append(np.asarray(sim_last - sim))
        sim_last = sim
    rewards = jnp.asarray(np.stack(our["reward"]))  # (T-1, B)
    for v in (0, 1):
        ro = Rollout(states=jnp.stack(rollouts[v]["s"]),
                     actions=jnp.stack(rollouts[v]["a"]),
                     logprobs=jnp.stack(rollouts[v]["lp"]),
                     rewards=rewards)
        ppo_state, _ = ppo.update(ppo_state, ro)

    # ---- reference side ----------------------------------------------------
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    try:
        from models.abmil import ABMIL as RefABMIL
        from models.cl import CL as RefCL
        from models.rlmil import Full_layer as RefFullLayer
        from models.rlmil import Memory as RefMemory
        from models.rlmil import PPO as RefPPO
        from utils.datasets import get_feats as ref_get_feats
        from utils.datasets import mixup as ref_mixup
        from utils.losses import NT_Xent as RefNTXent

        from murcl_tpu.engine.torch_import import ACTOR_CRITIC_MAP

        rmodel = RefABMIL(dim_in=DIM, L=16, D=4, dim_out=8)
        rmodel.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_model_state(mp, "ABMIL").items()}
        )
        rcl = RefCL(rmodel, projection_dim=8, n_features=16).eval()
        rfc = RefFullLayer(16, 16, True, 8).eval()
        rfc.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in flax_to_torch(fcp, FULL_LAYER_MAP).items()}
        )
        rppo = RefPPO(feature_dim=DIM, state_dim=16, hidden_state_dim=H,
                      policy_conv=False, action_std=STD, lr=LR, gamma=GAMMA,
                      K_epochs=KEP, action_size=K)
        pol_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in flax_to_torch(initial_policy_params,
                                            ACTOR_CRITIC_MAP).items()}
        rppo.policy.load_state_dict(pol_sd, strict=False)
        rppo.policy_old.load_state_dict(pol_sd, strict=False)
        criterion = RefNTXent(B, temperature)

        def ref_policy_step(memory, state_ini, action, restart):
            """Reference ``act`` with an injected (fixed) action."""
            pol = rppo.policy_old
            if restart:
                del memory.hidden[:]
                memory.hidden.append(
                    torch.zeros(1, state_ini.size(0), pol.hidden_state_dim))
            s = pol.state_encoder(state_ini.flatten(1))
            out, hidden = pol.gru(s.view(1, s.size(0), s.size(1)),
                                  memory.hidden[-1])
            memory.hidden.append(hidden)
            mean = pol.actor(out[0])
            dist = torch.distributions.multivariate_normal.MultivariateNormal(
                mean, scale_tril=torch.diag(pol.action_var))
            lp = dist.log_prob(action)
            memory.states.append(state_ini)
            memory.actions.append(action)
            memory.logprobs.append(lp)
            return mean.detach(), lp.detach()

        feat_list = [torch.from_numpy(f).unsqueeze(0) for f in feats]
        memories = [RefMemory(), RefMemory()]
        ref = {"loss": [], "reward": [], "mean": [], "logprob": []}
        with torch.no_grad():
            pass
        for t in range(T):
            if t == 0:
                acts = [torch.from_numpy(actions0[v]) for v in range(2)]
            else:
                acts = []
                for v in range(2):
                    mean, lp = ref_policy_step(
                        memories[v], rstates[v],
                        torch.from_numpy(actions_t[t - 1, v]), restart=(t == 1))
                    ref["mean"].append(mean.numpy())
                    ref["logprob"].append(lp.numpy())
                    acts.append(torch.from_numpy(actions_t[t - 1, v]))
            with torch.no_grad():
                x_views = [ref_get_feats(feat_list, clusters, a, FEAT)
                           for a in acts]
                x_views = [ref_mixup(x, 1.0)[0] for x in x_views]
                outputs, rstates = rcl(x_views)
                outputs = [rfc(o, restart=(t == 0)) for o in outputs]
                ref["loss"].append(float(criterion(outputs[0], outputs[1])))
                sim = torch.cosine_similarity(outputs[0], outputs[1])
                if t > 0:
                    reward = (sim_last_t - sim).view(1, -1)
                    ref["reward"].append(reward.numpy()[0])
                    for m in memories:
                        m.rewards.append(reward)
                sim_last_t = sim
        for m in memories:
            rppo.update(m)
    finally:
        sys.path.remove("/root/reference")

    np.testing.assert_allclose(our["loss"], ref["loss"], rtol=2e-4)
    np.testing.assert_allclose(np.stack(our["reward"]), np.stack(ref["reward"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.stack(our["mean"]), np.stack(ref["mean"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.stack(our["logprob"]), np.stack(ref["logprob"]),
                               atol=1e-4)
    # updated policy params after the two per-view PPO updates
    ours_sd = flax_to_torch(ppo_state.params, ACTOR_CRITIC_MAP)
    ref_sd = rppo.policy.state_dict()
    for k, v in ours_sd.items():
        np.testing.assert_allclose(
            v, ref_sd[k].detach().numpy(), atol=5e-5,
            err_msg=f"policy param {k} diverged after PPO updates")
