"""Supervised RLMIL engine: the whole T-step rollout is ONE jitted program.

Reference semantics (``train_RLMIL.py:290-854``, per-arch ``train_*`` /
``test_*``): per batch, T forwards over PPO/random-selected sub-bags with a
GRU head accumulating across steps; per-arch step losses

- ABMIL:   ``CE(fc_out)``; the t=0 forward only trains when
  ``--train_model_prime`` (``:719-725``)
- CLAM_SB: ``bag_weight*CE + (1-bag_weight)*instance_loss`` (``:336``)
- DSMIL:   ``0.5*CE(fc_out) + 0.5*CE(max-pooled instance logits)``
  (``:527-529``), with ``fc`` input / RL state = mean over the class axis
  of the bag tensor (``:514-517``)

reward ``confidence_t - confidence_{t-1}`` of the true class; stage 1 uses
random actions, stages 2/3 sample from ``policy_old`` (restarted at t=1);
stage 2 freezes the aggregator and updates PPO, stages 1/3 backprop the
mean of the T step losses. Eval runs the same rollout with *sampled*
actions (the reference never passes ``training=False``,
``rlmil.py:149``).

The reference executes this as ~T*B Python-level forwards with a host
round-trip per cluster per bag. Here: t=0 outside, t=1..T-1 as a
``lax.scan`` whose carry is ``(fc_hidden, policy_hidden, prev_state,
prev_confidence, rng)``; sub-bag selection is the on-device gather of
:mod:`murcl_tpu.ops.select`; the rollout buffer is the scan's stacked
output. One compile per (arch, stage); everything else is data.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from murcl_tpu.engine.config import RolloutConfig
from murcl_tpu.engine.losses import cross_entropy, label_confidence, masked_mean
from murcl_tpu.models.rlmil import PPO, PPOTrainState, PolicyStep, Rollout, act
from murcl_tpu.ops.select import select_feats, select_ranks


def _use_compact(cfg, bank) -> bool:
    import jax as _jax

    return (
        cfg.select_impl == "auto"
        and bank.patch_cluster is not None
        and _jax.default_backend() == "tpu"
    )


def _materialize_subbags(cfg, bank, slide_ids, actions, repeat: int = 1):
    """Gather the ``(B, feat_size, D)`` sub-bags for a flat batch.

    On TPU (``cfg.select_impl='auto'``) the compaction-matmul kernel
    (:mod:`murcl_tpu.ops.compact_pallas`) materializes each bag with one
    contiguous-row DMA + an MXU one-hot contraction — replacing the rank
    scatter + per-row HBM gather + mask pass (~41 ms/step at the canonical
    shape). Identical outputs to :func:`select_feats`.

    ``repeat`` declares that ``slide_ids`` is the same slide list tiled
    ``repeat`` times (the contrastive engines' two-view / batched-T
    layouts): the kernel then shares each slide window's DMA across the
    same-slide bags (``gather_compact`` grouped path) — bitwise-identical
    outputs, ``repeat``-fold less window traffic.
    """
    if _use_compact(cfg, bank):
        from murcl_tpu.ops.compact_pallas import gather_compact

        ranks, row_offs, _valid = select_ranks(
            slide_ids, bank.offsets, bank.num_patches, bank.cluster_sizes,
            actions, bank.patch_cluster, bank.patch_pos,
            feat_size=cfg.feat_size,
        )
        return gather_compact(bank.feats, row_offs, ranks, cfg.feat_size,
                              num_patches=bank.num_patches[slide_ids],
                              repeat=repeat)
    return select_feats(
        bank.feats, slide_ids, bank.offsets, bank.num_patches,
        bank.cluster_tables, bank.cluster_sizes, actions,
        feat_size=cfg.feat_size, max_patches=cfg.max_patches,
        patch_cluster=bank.patch_cluster, patch_pos=bank.patch_pos,
    )


class BankArrays(NamedTuple):
    """The device-resident split: passed whole into the jitted step."""

    feats: jnp.ndarray  # (P, D)
    offsets: jnp.ndarray  # (S,)
    num_patches: jnp.ndarray  # (S,)
    cluster_tables: jnp.ndarray  # (S, K, Cmax)
    cluster_sizes: jnp.ndarray  # (S, K)
    # per-patch (cluster, pos) inverse tables; enable the scatter-free
    # selection path (ops/select.py) when present
    patch_cluster: Optional[jnp.ndarray] = None  # (S, Nmax)
    patch_pos: Optional[jnp.ndarray] = None  # (S, Nmax)

    @classmethod
    def from_bank(cls, bank) -> "BankArrays":
        return cls(
            feats=bank.feats,
            offsets=bank.offsets,
            num_patches=bank.num_patches,
            cluster_tables=bank.cluster_tables,
            cluster_sizes=bank.cluster_sizes,
            patch_cluster=getattr(bank, "patch_cluster", None),
            patch_pos=getattr(bank, "patch_pos", None),
        )


class AggTrainState(NamedTuple):
    params: Any  # {'model': ..., 'fc': ...}
    opt_state: Any


class StepStats(NamedTuple):
    loss: jnp.ndarray  # scalar: mean of the T step losses
    step_losses: jnp.ndarray  # (T,)
    rewards: jnp.ndarray  # (T-1,) batch-mean reward per step
    logits: jnp.ndarray  # (B, C) final-step outputs (metrics source)


class SupervisedEngine:
    """Builds and caches the jitted train/eval programs for one config."""

    def __init__(
        self,
        cfg: RolloutConfig,
        model,
        fc,
        ppo: Optional[PPO] = None,
        tx: Optional[optax.GradientTransformation] = None,
        mesh=None,
    ):
        if cfg.uses_policy and ppo is None:
            raise ValueError(f"stage {cfg.train_stage} requires a PPO policy")
        if cfg.train_stage != 2 and tx is None:
            raise ValueError("stages 1/3 require an optimizer")
        self.cfg = cfg
        # parameters-only differentiation (the bag input is data): skip the
        # fused backward's dead (B, N, Fin) input-gradient matmul + HBM
        # write, same guard as ContrastiveEngine
        if getattr(model, "attn_input_grad", False):
            model = model.clone(attn_input_grad=False)
        self.model = model
        self.fc = fc
        self.ppo = ppo
        self.tx = tx
        self._cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        # ``mesh``: SPMD data-parallel mode — the step becomes a per-shard
        # shard_map program (so the Pallas kernels run per shard and SCALE,
        # unlike global-view jit where XLA replicates custom-call operands;
        # see tests/test_parallel.py::test_pallas_calls_replicate_*).
        # Semantics stay global-batch: CE/extras reduce with psum'd
        # numerator+count, rollout rngs fold in the shard index, grads psum
        # before the (replicated) optimizer update. PARITY.md §spmd.
        self._mesh = mesh
        self._axis = "data" if mesh is not None else None
        if mesh is None:
            self._train = jax.jit(self._train_impl)
            self._eval = jax.jit(self._eval_impl)
        else:
            from jax.sharding import PartitionSpec as P

            stats_spec = StepStats(
                loss=P(), step_losses=P(), rewards=P(), logits=P("data"))
            rollout_spec = Rollout(
                states=P(None, "data"), actions=P(None, "data"),
                logprobs=P(None, "data"), rewards=P(None, "data"))
            in_common = (P(), P(), P(), P("data"), P("data"), P("data"), P())
            self._train = jax.jit(jax.shard_map(
                self._train_impl, mesh=mesh, in_specs=in_common,
                out_specs=(P(), stats_spec, rollout_spec), check_vma=False))
            self._eval = jax.jit(jax.shard_map(
                self._eval_impl, mesh=mesh, in_specs=in_common,
                out_specs=stats_spec, check_vma=False))

    def _shard_rng(self, rng):
        """Distinct per-shard streams for action draws / mixup / dropout.

        The in-kernel Pallas dropout seeds derive from this rng (the bag
        index added by the kernel restarts per shard, so shards MUST not
        share the base seed)."""
        if self._axis is None:
            return rng
        return jax.random.fold_in(rng, jax.lax.axis_index(self._axis))

    def _bmean(self, x, axis):
        """Batch-axis mean for stats; global (pmean) in SPMD mode."""
        m = jnp.mean(x, axis=axis)
        if self._axis is not None:
            m = jax.lax.pmean(m, self._axis)
        return m

    # ------------------------------------------------------------- setup --
    def init_params(self, rng, example_feats, example_labels):
        """Init {'model','fc'} params from one example sub-bag batch."""
        r_model, r_fc = jax.random.split(rng)
        kwargs = {}
        if self.cfg.arch == "CLAM_SB":
            model_params = self.model.init(
                r_model, example_feats, example_labels, True
            )
        else:
            model_params = self.model.init(r_model, example_feats, **kwargs)
        fc_in, _ = self._arch_forward(
            model_params, example_feats, example_labels, None, False, rng
        )
        fc_params = self.fc.init(r_fc, fc_in, None)
        return {"model": model_params, "fc": fc_params}

    def init_state(self, params) -> AggTrainState:
        opt_state = self.tx.init(params) if self.tx is not None else None
        return AggTrainState(params=params, opt_state=opt_state)

    # ------------------------------------------------------- arch adapter --
    def _arch_forward_raw(self, model_params, feats, labels, train, rng):
        """Returns ``(fc_in (B, F), extra_per_sample (B,))`` per arch.

        ``extra_per_sample`` carries the arch's auxiliary step loss
        pre-reduction (weighted), so callers can reduce over any grouping
        (per step in the batched stage-1 layout): its ``masked_mean`` over
        the batch equals the sequential path's scalar extra exactly.
        """
        cfg = self.cfg
        feats = feats.astype(self._cdtype)
        rngs = {"dropout": rng} if train else None
        if cfg.arch == "ABMIL":
            out, _aux = self.model.apply(model_params, feats, train=train, rngs=rngs)
            return out.astype(jnp.float32), jnp.zeros(feats.shape[0], jnp.float32)
        if cfg.arch == "CLAM_SB":
            m, aux = self.model.apply(
                model_params, feats, labels, True, train=train, rngs=rngs
            )
            extra = (1.0 - cfg.bag_weight) * aux["instance_loss"].astype(jnp.float32)
            return m.astype(jnp.float32), extra
        if cfg.arch == "DSMIL":
            inst, bag, _aux = self.model.apply(model_params, feats, train=train, rngs=rngs)
            fc_in = jnp.mean(bag, axis=1).astype(jnp.float32)
            inst_max = jnp.max(inst, axis=1).astype(jnp.float32)
            logp = jax.nn.log_softmax(inst_max, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return fc_in, 0.5 * nll
        raise ValueError(f"unknown arch {self.cfg.arch!r}")

    def _arch_forward(self, model_params, feats, labels, valid, train, rng,
                      axis_name=None):
        """Returns ``(fc_in (B, F), extra_step_loss scalar)`` per arch.

        ``axis_name`` must be passed (``self._axis``) only from INSIDE the
        shard_map program — ``init_params`` calls this outside any mesh,
        where a named-axis psum would be unbound.
        """
        fc_in, extra_per = self._arch_forward_raw(
            model_params, feats, labels, train, rng
        )
        return fc_in, masked_mean(extra_per, valid, axis_name=axis_name)

    @property
    def _ce_weight(self) -> float:
        return {"ABMIL": 1.0, "CLAM_SB": self.cfg.bag_weight, "DSMIL": 0.5}[self.cfg.arch]

    # ----------------------------------------------------------- rollout --
    def _rollout(self, params, ppo_old_params, bank: BankArrays, slide_ids,
                 labels, valid, rng, train: bool):
        """The full T-step program. Returns ``(loss, (stats, rollout))``."""
        if not self.cfg.uses_policy and self.cfg.stage1_layout == "batched":
            return self._rollout_batched(
                params, bank, slide_ids, labels, valid, rng, train
            )
        return self._rollout_sequential(
            params, ppo_old_params, bank, slide_ids, labels, valid, rng, train
        )

    def _rollout_batched(self, params, bank: BankArrays, slide_ids, labels,
                         valid, rng, train: bool, actions=None):
        """Stage-1 rollout with all T steps' heavy compute in ONE batch.

        Stage 1 draws every action uniformly at random
        (``train_RLMIL.py:347``), so selection and the aggregator forward
        batch over ``(T*B)``; only the GRU head scans. Identical math to
        the sequential layout (per-step CE + per-step reduced arch extras;
        the ``train_model_prime`` gate stops every t=0 gradient exactly as
        the reference's no-grad prime forward, ``train_RLMIL.py:719-725``).

        ``actions`` (T, B, K) overrides the random draw (tests).
        """
        cfg = self.cfg
        b = slide_ids.shape[0]
        t_steps = cfg.T
        mp, fcp = params["model"], params["fc"]
        from jax.ad_checkpoint import checkpoint_name

        rng, r_act, r_drop = jax.random.split(rng, 3)
        if actions is None:
            actions = jax.random.uniform(r_act, (t_steps, b, cfg.num_clusters))

        x = _materialize_subbags(
            cfg, bank, jnp.tile(slide_ids, t_steps),
            actions.reshape(t_steps * b, cfg.num_clusters),
            repeat=t_steps,  # same b slides every step: the compaction
            # kernel shares each slide window's DMA across the group
        )
        labels_t = jnp.tile(labels, t_steps)

        def encode_all(x_flat):
            feats = checkpoint_name(x_flat.astype(self._cdtype), "subbag")
            return self._arch_forward_raw(mp, feats, labels_t, train, r_drop)

        if cfg.remat != "none":
            policy = jax.checkpoint_policies.save_only_these_names("subbag")
            encode_all = jax.checkpoint(encode_all, policy=policy)

        fc_in_flat, extra_flat = encode_all(x)
        fc_in = fc_in_flat.reshape(t_steps, b, -1)
        extra_step = jax.vmap(
            lambda e: masked_mean(e, valid, axis_name=self._axis)
        )(extra_flat.reshape(t_steps, b))

        prime_nograd = cfg.arch == "ABMIL" and not cfg.train_model_prime
        fc_in0 = jax.lax.stop_gradient(fc_in[0]) if prime_nograd else fc_in[0]
        logits0, fc_carry = self.fc.apply(fcp, fc_in0, None)
        if prime_nograd:
            logits0 = jax.lax.stop_gradient(logits0)
            fc_carry = jax.lax.stop_gradient(fc_carry)

        def fc_step(c, e):
            lg, c2 = self.fc.apply(fcp, e, c)
            return c2, lg

        _, logits_t = jax.lax.scan(fc_step, fc_carry, fc_in[1:])
        logits_all = jnp.concatenate([logits0[None], logits_t])  # (T, B, C)

        step_ce = jax.vmap(
            lambda lg: cross_entropy(lg, labels, valid, axis_name=self._axis)
        )(logits_all)
        step_losses = self._ce_weight * step_ce + extra_step
        if prime_nograd:
            # extras are zero for ABMIL; CE0 is constant like the reference
            step_losses = jnp.concatenate(
                [jax.lax.stop_gradient(step_losses[:1]), step_losses[1:]]
            )
        total = jnp.sum(step_losses) / t_steps

        conf = jax.vmap(label_confidence)(
            jax.lax.stop_gradient(logits_all), jnp.broadcast_to(labels, (t_steps, b))
        )  # (T, B)
        rewards = conf[1:] - conf[:-1]

        states = jax.lax.stop_gradient(fc_in)
        rollout = Rollout(
            states=states[:-1], actions=actions[1:],
            logprobs=jnp.zeros((t_steps - 1, b)), rewards=rewards,
        )
        stats = StepStats(
            loss=total, step_losses=step_losses,
            rewards=self._bmean(rewards, 1), logits=logits_all[-1],
        )
        return total, (stats, rollout)

    def _rollout_sequential(self, params, ppo_old_params, bank: BankArrays,
                            slide_ids, labels, valid, rng, train: bool):
        cfg = self.cfg
        b = slide_ids.shape[0]
        mp, fcp = params["model"], params["fc"]

        def select(actions):
            return _materialize_subbags(cfg, bank, slide_ids, actions)

        # remat: recompute each rollout step's aggregator activations in the
        # backward pass instead of keeping T steps of (B, feat_size, D)
        # tensors live (OOMs 16 GB HBM at batch 128) — but save the selected
        # sub-bag itself so the backward skips the T re-gathers
        from functools import partial as _partial

        from jax.ad_checkpoint import checkpoint_name

        _policy = jax.checkpoint_policies.save_only_these_names("subbag")

        def _maybe_remat(fn):
            if cfg.remat == "none":
                return fn
            return _partial(jax.checkpoint, policy=_policy)(fn)

        @_maybe_remat
        def forward(actions, fc_carry, rngd):
            feats = checkpoint_name(select(actions).astype(self._cdtype), "subbag")
            fc_in, extra = self._arch_forward(mp, feats, labels, valid, train,
                                              rngd, axis_name=self._axis)
            logits, new_carry = self.fc.apply(fcp, fc_in, fc_carry)
            loss = self._ce_weight * cross_entropy(
                logits, labels, valid, axis_name=self._axis) + extra
            return logits, new_carry, jax.lax.stop_gradient(fc_in), loss

        # ---- t = 0: uniform random actions, fresh GRU hidden -------------
        rng, r_act0, r_drop0 = jax.random.split(rng, 3)
        actions0 = jax.random.uniform(r_act0, (b, cfg.num_clusters))
        logits0, fc_carry, states0, loss0 = forward(actions0, None, r_drop0)
        if cfg.arch == "ABMIL" and not cfg.train_model_prime:
            # reference runs the prime forward under no_grad (:719-725); the
            # loss still counts toward the T-step average as a constant
            logits0 = jax.lax.stop_gradient(logits0)
            fc_carry = jax.lax.stop_gradient(fc_carry)
            loss0 = jax.lax.stop_gradient(loss0)
        conf0 = label_confidence(jax.lax.stop_gradient(logits0), labels)

        policy_carry0 = (
            self.ppo.zero_carry(b) if cfg.uses_policy else jnp.zeros((b, 1))
        )

        # ---- t = 1 .. T-1: one scan ---------------------------------------
        def scan_step(carry, rng_t):
            fc_c, pol_c, prev_state, conf_last = carry
            r_act, r_drop = jax.random.split(rng_t)
            if cfg.uses_policy:
                action, pol_c, pstep = act(
                    self.ppo.model, ppo_old_params, prev_state, pol_c, r_act
                )
            else:
                action = jax.random.uniform(r_act, (b, cfg.num_clusters))
                pstep = PolicyStep(
                    state=prev_state, action=action, logprob=jnp.zeros((b,))
                )

            logits, fc_c, states, loss = forward(action, fc_c, r_drop)
            conf = label_confidence(jax.lax.stop_gradient(logits), labels)
            reward = conf - conf_last
            out = (loss, pstep, reward, logits)
            return (fc_c, pol_c, states, conf), out

        rngs_t = jax.random.split(rng, cfg.T - 1)
        carry0 = (fc_carry, policy_carry0, states0, conf0)
        (_, _, _, _), (losses_t, psteps, rewards, logits_t) = jax.lax.scan(
            scan_step, carry0, rngs_t
        )

        step_losses = jnp.concatenate([loss0[None], losses_t])
        total = jnp.sum(step_losses) / cfg.T
        last_logits = logits_t[-1]

        rollout = Rollout(
            states=psteps.state, actions=psteps.action,
            logprobs=psteps.logprob, rewards=rewards,
        )
        stats = StepStats(
            loss=total,
            step_losses=step_losses,
            rewards=self._bmean(rewards, 1),
            logits=last_logits,
        )
        return total, (stats, rollout)

    # ------------------------------------------------------------- steps --
    def _train_impl(self, agg_state: AggTrainState, ppo_params, bank: BankArrays,
                    slide_ids, labels, valid, rng):
        cfg = self.cfg
        rng = self._shard_rng(rng)
        if cfg.train_stage == 2:
            # frozen aggregator (eval mode), collect the rollout for PPO
            _, (stats, rollout) = self._rollout(
                jax.lax.stop_gradient(agg_state.params), ppo_params, bank,
                slide_ids, labels, valid, rng, train=False,
            )
            return agg_state, stats, rollout

        def loss_fn(params):
            return self._rollout(
                params, ppo_params, bank, slide_ids, labels, valid, rng, train=True
            )

        (_, (stats, rollout)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            agg_state.params
        )
        if self._axis is not None:
            # every batch reduction in the loss is a psum'd global mean, so
            # the loss scalar is computed redundantly on all N shards and
            # the collective transposes hand each shard N x its local
            # contribution to the (single) global loss (measured: raw grads
            # sum to N x the true gradient). pmean — not psum — therefore
            # reconstructs EXACTLY the gradient the reference's
            # gathered-batch backward computes; the update runs replicated.
            grads = jax.lax.pmean(grads, self._axis)
        updates, opt_state = self.tx.update(grads, agg_state.opt_state, agg_state.params)
        params = optax.apply_updates(agg_state.params, updates)
        return AggTrainState(params=params, opt_state=opt_state), stats, rollout

    def _eval_impl(self, params, ppo_params, bank: BankArrays, slide_ids,
                   labels, valid, rng):
        _, (stats, _) = self._rollout(
            params, ppo_params, bank, slide_ids, labels, valid,
            self._shard_rng(rng), train=False
        )
        return stats

    # -------------------------------------------------------------- API ---
    def train_step(
        self,
        agg_state: AggTrainState,
        ppo_state: Optional[PPOTrainState],
        bank: BankArrays,
        slide_ids,
        labels,
        rng,
        valid=None,
    ) -> Tuple[AggTrainState, Optional[PPOTrainState], StepStats]:
        """One optimizer step (stages 1/3) or one PPO update (stage 2)."""
        if valid is None:
            valid = jnp.ones(slide_ids.shape, dtype=bool)
        ppo_params = ppo_state.old_params if self.cfg.uses_policy else None
        agg_state, stats, rollout = self._train(
            agg_state, ppo_params, bank, slide_ids, labels, valid, rng
        )
        if self.cfg.train_stage == 2:
            ppo_state, _ = self.ppo.update(ppo_state, rollout)
        return agg_state, ppo_state, stats

    def eval_step(self, agg_state: AggTrainState, ppo_state, bank: BankArrays,
                  slide_ids, labels, rng, valid=None) -> StepStats:
        """T-step rollout in eval mode (sampled actions, reference quirk)."""
        if valid is None:
            valid = jnp.ones(slide_ids.shape, dtype=bool)
        ppo_params = ppo_state.old_params if self.cfg.uses_policy else None
        return self._eval(
            agg_state.params, ppo_params, bank, slide_ids, labels, valid, rng
        )
