"""Recurrent slide head + PPO policy, fully functional.

Reference (``models/rlmil.py``):

- ``Full_layer`` (``:187-239``) — a GRU over the T rollout steps whose
  hidden state persists as *module state* (``self.hidden``), plus a linear
  classifier; alternative cascaded-FC mode concatenates step features.
- ``ActorCritic`` (``:25-127``) — state-encoder MLP ``state_dim -> 2048 ->
  hidden``, a GRU carrying the policy's recurrent state inside the rollout
  ``Memory``, sigmoid actor head, scalar critic. Actions are sampled from
  ``MultivariateNormal(mean, scale_tril=diag(action_std))`` — i.e.
  independent Gaussians with std ``action_std`` — then clamped to [0, 1];
  the recorded logprob is of the *clamped* action (``:84-93``). Every call
  site samples (``training=True``), even at test time.
- ``PPO`` (``:130-184``) — clipped surrogate with value-MSE and entropy
  bonus; returns are a reverse discounted scan normalized by the unbiased
  std; ``evaluate`` re-runs the GRU from a **zero** hidden state (not the
  rollout hidden) — reproduced here.

TPU redesign: no module-held state. GRU carries are explicit scan carries;
the rollout buffer is a stacked-array :class:`Rollout` produced by
``lax.scan`` instead of Python lists; ``policy_old`` is just a second
parameter tree in :class:`PPOTrainState`; the K-epoch update is one jitted
function.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from murcl_tpu.models.layers import TorchGRUCell, TorchLinear


# --------------------------------------------------------------------------
# Full_layer: GRU classification head over the rollout steps
# --------------------------------------------------------------------------
class FullLayer(nn.Module):
    """GRU + linear head; call once per rollout step with an explicit carry.

    ``__call__(x (B, F), carry)`` -> ``(logits (B, C), new_carry)``.
    ``carry=None`` means restart (zero hidden), replacing the reference's
    ``restart=True`` flag (``rlmil.py:208-220``). The cascaded-FC mode
    (``fc_rnn=False``, ``rlmil.py:222-239``) accumulates features in the
    carry and dispatches to per-step heads fc_2..fc_5; at the restart step
    it returns ``None`` like the reference.
    """

    feature_num: int
    hidden_state_dim: int = 1024
    fc_rnn: bool = True
    class_num: int = 1000

    @nn.compact
    def __call__(self, x, carry: Optional[jnp.ndarray] = None):
        if self.fc_rnn:
            if carry is None:
                carry = jnp.zeros((x.shape[0], self.hidden_state_dim), x.dtype)
            h, _ = TorchGRUCell(self.hidden_state_dim, name="rnn")(carry, x)
            logits = TorchLinear(self.class_num, name="fc")(h)
            return logits, h
        # cascaded-FC capability (unused by the run scripts)
        acc = x if carry is None else jnp.concatenate([carry, x], axis=1)
        width = acc.shape[1]
        if width not in {self.feature_num * t for t in range(1, 6)}:
            raise ValueError(f"cascaded FullLayer supports T<=5, got width {width}")
        logits = None
        for t in range(2, 6):
            head = TorchLinear(self.class_num, name=f"fc_{t}")
            # every head is materialized in the param tree regardless of the
            # current step, so checkpoints always carry fc_2..fc_5
            head_in = acc if width == self.feature_num * t else jnp.zeros(
                (x.shape[0], self.feature_num * t), x.dtype
            )
            out = head(head_in)
            if width == self.feature_num * t:
                logits = out
        return logits, acc

    def zero_carry(self, batch: int, dtype=jnp.float32):
        if self.fc_rnn:
            return jnp.zeros((batch, self.hidden_state_dim), dtype)
        return None


# --------------------------------------------------------------------------
# ActorCritic policy network
# --------------------------------------------------------------------------
class ActorCritic(nn.Module):
    """State encoder + GRU + sigmoid actor + critic; carry is explicit.

    ``__call__(state (B, S), carry (B, H))`` ->
    ``(action_mean (B, K), value (B,), new_carry)``. The conv state-encoder
    variant (``rlmil.py:31-37``, for conv feature maps) is kept as a
    capability behind ``policy_conv``.
    """

    state_dim: int
    hidden_state_dim: int = 1024
    action_size: int = 2
    action_std: float = 0.1
    policy_conv: bool = False
    feature_dim: Optional[int] = None

    @nn.compact
    def __call__(self, state, carry):
        if self.policy_conv:
            # state: (B, C=feature_dim, h, w); 1x1 conv == dense over channels
            b = state.shape[0]
            x = jnp.moveaxis(state, 1, -1)  # (B, h, w, C)
            x = nn.relu(TorchLinear(32, use_bias=False, name="conv1x1")(x))
            x = x.reshape(b, -1)
            x = nn.relu(TorchLinear(self.hidden_state_dim, name="enc_out")(x))
        else:
            x = state.reshape(state.shape[0], -1)
            x = nn.relu(TorchLinear(2048, name="enc_hidden")(x))
            x = nn.relu(TorchLinear(self.hidden_state_dim, name="enc_out")(x))

        h, _ = TorchGRUCell(self.hidden_state_dim, name="gru")(carry, x)
        action_mean = jax.nn.sigmoid(TorchLinear(self.action_size, name="actor")(h))
        value = TorchLinear(1, name="critic")(h)[..., 0]
        return action_mean, value, h

    def zero_carry(self, batch: int, dtype=jnp.float32):
        return jnp.zeros((batch, self.hidden_state_dim), dtype)


def _diag_gaussian_logprob(x, mean, std, axis=-1):
    k = x.shape[axis]
    z = (x - mean) / std
    return (
        -0.5 * jnp.sum(z * z, axis=axis)
        - k * jnp.log(std)
        - 0.5 * k * math.log(2.0 * math.pi)
    )


def _diag_gaussian_entropy(k: int, std: float):
    return 0.5 * k * math.log(2.0 * math.pi * math.e) + k * math.log(std)


class PolicyStep(NamedTuple):
    """What the policy records per rollout step (the reference ``Memory``)."""

    state: jnp.ndarray  # (B, S)   pre-encoder state, as recorded at :91
    action: jnp.ndarray  # (B, K)  clamped sampled action
    logprob: jnp.ndarray  # (B,)


class Rollout(NamedTuple):
    """Stacked policy steps + rewards: arrays of leading dim T-1."""

    states: jnp.ndarray  # (T-1, B, S)
    actions: jnp.ndarray  # (T-1, B, K)
    logprobs: jnp.ndarray  # (T-1, B)
    rewards: jnp.ndarray  # (T-1, B)


def act(
    model: ActorCritic,
    params,
    state,
    carry,
    rng,
    training: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, PolicyStep]:
    """One policy step: sample, clamp to [0,1], log-prob of the clamp.

    Returns ``(action (B, K), new_carry, PolicyStep)``. With
    ``training=False`` the deterministic mean is returned (reference
    ``rlmil.py:94-95`` — a path no reference call site uses).
    """
    mean, _, new_carry = model.apply(params, state, carry)
    noise = jax.random.normal(rng, mean.shape, mean.dtype) * model.action_std
    sampled = mean + noise
    clamped = jnp.clip(sampled, 0.0, 1.0)
    logprob = _diag_gaussian_logprob(clamped, mean, model.action_std)
    action = clamped if training else mean
    step = PolicyStep(state=state, action=clamped, logprob=logprob)
    return jax.lax.stop_gradient(action), new_carry, step


def evaluate(model: ActorCritic, params, states, actions):
    """Re-run the policy over a rollout from a ZERO hidden state.

    ``states``: (T, B, S), ``actions``: (T, B, K). Returns
    ``(logprobs, values, entropy)`` each (T, B). Matches the reference
    ``evaluate`` (``rlmil.py:99-127``), including the zero GRU init that
    differs from the rollout-time hidden.
    """
    t, b = states.shape[0], states.shape[1]

    def scan_step(carry, state_t):
        mean, value, new_carry = model.apply(params, state_t, carry)
        return new_carry, (mean, value)

    carry0 = jnp.zeros((b, model.hidden_state_dim), states.dtype)
    _, (means, values) = jax.lax.scan(scan_step, carry0, states)
    logprobs = _diag_gaussian_logprob(actions, means, model.action_std)
    entropy = jnp.full((t, b), _diag_gaussian_entropy(model.action_size, model.action_std))
    return logprobs, values, entropy


# --------------------------------------------------------------------------
# PPO
# --------------------------------------------------------------------------
class PPOTrainState(NamedTuple):
    params: Any  # current policy
    old_params: Any  # action-source policy (synced after each update)
    opt_state: Any


class PPO:
    """Clipped PPO over the rollout buffer; all state is explicit.

    Semantics mirror ``rlmil.py:130-184``: reverse discounted returns with
    ``gamma``, normalization by mean/unbiased-std + 1e-5, ``K_epochs`` of
    ``-min(r*A, clip(r)*A) + 0.5*MSE(V, R) - 0.01*entropy`` with Adam, then
    ``policy_old <- policy``.
    """

    def __init__(
        self,
        state_dim: int,
        hidden_state_dim: int = 1024,
        policy_conv: bool = False,
        action_std: float = 0.1,
        lr: float = 3e-4,
        betas=(0.9, 0.999),
        gamma: float = 0.7,
        K_epochs: int = 1,
        eps_clip: float = 0.2,
        action_size: int = 2,
        feature_dim: Optional[int] = None,
    ):
        self.gamma = gamma
        self.eps_clip = eps_clip
        self.K_epochs = K_epochs
        self.model = ActorCritic(
            state_dim=state_dim,
            hidden_state_dim=hidden_state_dim,
            action_size=action_size,
            action_std=action_std,
            policy_conv=policy_conv,
            feature_dim=feature_dim,
        )
        self.tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=1e-8)
        self._update = jax.jit(self._update_impl)

    def init(self, rng, example_state) -> PPOTrainState:
        carry = self.model.zero_carry(example_state.shape[0], example_state.dtype)
        params = self.model.init(rng, example_state, carry)
        return PPOTrainState(
            params=params, old_params=params, opt_state=self.tx.init(params)
        )

    def zero_carry(self, batch: int, dtype=jnp.float32):
        return self.model.zero_carry(batch, dtype)

    def select_action(self, train_state: PPOTrainState, state, carry, rng,
                      training: bool = True):
        """Action from ``policy_old`` (the reference's action source)."""
        return act(self.model, train_state.old_params, state, carry, rng, training)

    def discounted_returns(self, rewards):
        """Reverse discounted scan + global normalization (``rlmil.py:153-162``)."""

        def step(carry, r):
            g = r + self.gamma * carry
            return g, g

        _, returns = jax.lax.scan(step, jnp.zeros_like(rewards[0]), rewards, reverse=True)
        std = jnp.std(returns, ddof=1) if returns.size > 1 else jnp.float32(0.0)
        return (returns - returns.mean()) / (std + 1e-5)

    def _update_impl(self, train_state: PPOTrainState, rollout: Rollout):
        returns = self.discounted_returns(rollout.rewards)
        states = jax.lax.stop_gradient(rollout.states)
        actions = jax.lax.stop_gradient(rollout.actions)
        old_logprobs = jax.lax.stop_gradient(rollout.logprobs)

        def loss_fn(params):
            logprobs, values, entropy = evaluate(self.model, params, states, actions)
            ratios = jnp.exp(logprobs - old_logprobs)
            advantages = returns - jax.lax.stop_gradient(values)
            surr1 = ratios * advantages
            surr2 = jnp.clip(ratios, 1.0 - self.eps_clip, 1.0 + self.eps_clip) * advantages
            value_mse = jnp.mean((values - returns) ** 2)
            loss = jnp.mean(-jnp.minimum(surr1, surr2)) + 0.5 * value_mse - 0.01 * jnp.mean(entropy)
            return loss

        params, opt_state = train_state.params, train_state.opt_state
        loss = jnp.float32(0.0)
        for _ in range(self.K_epochs):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

        return PPOTrainState(params=params, old_params=params, opt_state=opt_state), loss

    def update(self, train_state: PPOTrainState, rollout: Rollout):
        """K-epoch clipped-PPO update; returns ``(new_state, last_loss)``."""
        return self._update(train_state, rollout)
