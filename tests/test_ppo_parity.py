"""PPO core parity vs the reference's ActorCritic with bridged weights.

``evaluate`` is deterministic given (states, actions), so with identical
weights the logprobs / values / entropy must match the reference exactly
(incl. the zero-hidden GRU re-run and the MVN-with-scale_tril=diag(std)
log-density). The discounted-return path has its own oracle test; together
these pin the whole PPO update's inputs.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from murcl_tpu.engine.torch_import import ACTOR_CRITIC_MAP, flax_to_torch
from murcl_tpu.models import ActorCritic
from murcl_tpu.models.rlmil import evaluate

T1, B, S, H, K = 4, 3, 12, 16, 5


def test_evaluate_matches_reference():
    model = ActorCritic(state_dim=S, hidden_state_dim=H, action_size=K,
                        action_std=0.1)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, S)),
                        jnp.zeros((B, H)))
    states = jnp.asarray(rng.normal(size=(T1, B, S)).astype(np.float32))
    actions = jnp.asarray(rng.random((T1, B, K)).astype(np.float32))

    lp, v, ent = evaluate(model, params, states, actions)

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    try:
        from models.rlmil import ActorCritic as RefAC

        # the reference's constructor creates action_var via .cuda() (no-op
        # after the patch above)
        rm = RefAC(feature_dim=S, state_dim=S, hidden_state_dim=H,
                   policy_conv=False, action_std=0.1, action_size=K).eval()
        rm.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v_))
             for k, v_ in flax_to_torch(params, ACTOR_CRITIC_MAP).items()}
        )
        with torch.no_grad():
            want_lp, want_v, want_ent = rm.evaluate(
                torch.from_numpy(np.asarray(states)),
                torch.from_numpy(np.asarray(actions)),
            )
    finally:
        sys.path.remove("/root/reference")

    np.testing.assert_allclose(np.asarray(lp), want_lp.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v), want_v.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ent), want_ent.numpy(), atol=2e-5)
