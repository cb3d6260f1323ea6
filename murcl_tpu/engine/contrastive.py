"""MuRCL contrastive pretraining engine: dual-view rollout as one program.

Reference semantics (``train_MuRCL.py:189-343``): per full batch, two
random action vectors select two sub-bag views, each mixup-augmented, both
encoded by the shared aggregator (``CL`` wrapper) and projected by the
shared GRU head; ``loss_t = NT_Xent(out_v0, out_v1)``; from t=1 actions
come per view from ``policy_old`` with separate memories
(``train_MuRCL.py:204,262-265``); ``reward_t = cos_sim_{t-1} - cos_sim_t``
(*decreasing* similarity is rewarded, ``:286``); stage 2 freezes the
aggregator and runs one PPO update per view, stages 1/3 backprop the mean
of the T NT-Xent losses.

**Faithfully reproduced quirk** — the reference's ``Full_layer`` keeps its
GRU hidden as module state and the two views call it alternately
(``:243,276``), so the hidden state *interleaves across views*: after t=0
the carry is view-1's (view-0's is overwritten), and at each later step
view 0 consumes the carry view 1 wrote. The scan below threads one shared
``fc_carry`` through ``view0 -> view1`` per step to match exactly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from murcl_tpu.engine.config import PretrainConfig
from murcl_tpu.engine.losses import cosine_similarity
from murcl_tpu.engine.supervised import (
    AggTrainState,
    BankArrays,
    _materialize_subbags,
    _use_compact,
)
from murcl_tpu.models.rlmil import PPO, PPOTrainState, PolicyStep, Rollout, act
from murcl_tpu.ops.mixup import mixup, mixup_factors
from murcl_tpu.ops.ntxent_pallas import nt_xent_fused as nt_xent
from murcl_tpu.ops.select import select_feats


class PretrainStats(NamedTuple):
    loss: jnp.ndarray  # scalar: mean of the T NT-Xent losses
    step_losses: jnp.ndarray  # (T,)
    rewards: jnp.ndarray  # (T-1,) batch-mean reward per step


class ContrastiveEngine:
    """Jitted MuRCL pretraining step for one (stage, arch) config."""

    def __init__(
        self,
        cfg: PretrainConfig,
        model,  # the CL-wrapped aggregator is implicit: we apply the encoder per view
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
        # the engine differentiates parameters only — the bag input is
        # data — so the fused kernel's input-gradient output is dead
        # weight (one matmul + a (B, N, Fin) HBM write per backward)
        if getattr(model, "attn_input_grad", False):
            model = model.clone(attn_input_grad=False)
        self.model = model
        self.fc = fc
        self.ppo = ppo
        self.tx = tx
        self._cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        # ``mesh``: SPMD data-parallel mode (shard_map per-shard program so
        # the Pallas kernels partition and scale). NT-Xent keeps its
        # GLOBAL-batch semantics via an in-program all_gather of the (B, C)
        # projections (tiny next to the bags); grads psum before the
        # replicated update. Mixup pairs WITHIN each shard in this mode
        # (PARITY.md §spmd) — the rng folds in the shard index so draws
        # differ per shard.
        self._mesh = mesh
        self._axis = "data" if mesh is not None else None
        if mesh is None:
            self._train = jax.jit(self._train_impl)
        else:
            from jax.sharding import PartitionSpec as P

            stats_spec = PretrainStats(
                loss=P(), step_losses=P(), rewards=P())
            rollout_spec = Rollout(
                states=P(None, "data"), actions=P(None, "data"),
                logprobs=P(None, "data"), rewards=P(None, "data"))
            self._train = jax.jit(jax.shard_map(
                self._train_impl, mesh=mesh,
                in_specs=(P(), P(), P(), P("data"), P()),
                out_specs=(P(), stats_spec, (rollout_spec, rollout_spec)),
                check_vma=False))

    def _shard_rng(self, rng):
        """Per-shard rng stream (actions / mixup / in-kernel dropout seeds)."""
        if self._axis is None:
            return rng
        return jax.random.fold_in(rng, jax.lax.axis_index(self._axis))

    def _nt_xent(self, a, b):
        """NT-Xent over the GLOBAL batch (reference gathered-batch
        semantics, tests/test_parallel.py:192): in SPMD mode the per-shard
        projections all_gather over the data axis first — the gradient
        flows back through the gather (transpose: each shard receives its
        own slice's cotangent)."""
        if self._axis is not None:
            a = jax.lax.all_gather(a, self._axis, axis=0, tiled=True)
            b = jax.lax.all_gather(b, self._axis, axis=0, tiled=True)
        return nt_xent(a, b, self.cfg.temperature)

    def _bmean(self, x, axis):
        m = jnp.mean(x, axis=axis)
        if self._axis is not None:
            m = jax.lax.pmean(m, self._axis)
        return m

    # ------------------------------------------------------------- setup --
    def init_params(self, rng, example_feats):
        r_model, r_fc = jax.random.split(rng)
        model_params = self.model.init(r_model, example_feats)
        out = self.model.apply(model_params, example_feats)
        fc_in = out[0] if isinstance(out, tuple) else out
        fc_params = self.fc.init(r_fc, fc_in, None)
        return {"model": model_params, "fc": fc_params}

    def init_state(self, params) -> AggTrainState:
        opt_state = self.tx.init(params) if self.tx is not None else None
        return AggTrainState(params=params, opt_state=opt_state)

    # ----------------------------------------------------------- rollout --
    def _encode(self, model_params, feats, train, rng, mix=None):
        """Aggregator forward -> (projection input (B, F), rl state (B, S)).

        ``mix=(perm, lam)`` fuses bag-level mixup into the aggregator's
        Pallas kernel (CLAM's fused-trunk path only) — the mixed bags
        never exist in HBM.
        """
        rngs = {"dropout": rng} if train else None
        feats = feats.astype(self._cdtype)
        kwargs = {"mix": mix} if mix is not None else {}
        out = self.model.apply(model_params, feats, train=train, rngs=rngs,
                               **kwargs)
        emb = out[0] if isinstance(out, tuple) else out
        emb = emb.astype(jnp.float32)  # GRU head / losses stay f32
        return emb, jax.lax.stop_gradient(emb)

    def _fused_trunk_mix(self, x_flat) -> bool:
        """True when the model forward takes CLAM's fused trunk+attention
        Pallas route (pallas impl, VMEM-resident bag), so bag-level mixup
        can ride that kernel instead of a standalone pass. Shares
        AttentionPool's residency predicate (ops/attention_pallas.py) so the
        prediction can never diverge from the pool's actual routing."""
        if self.cfg.arch != "CLAM_SB":
            return False
        impl = getattr(self.model, "attn_impl", "auto")
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl != "pallas":
            return False
        from murcl_tpu.models.clam import SIZE_DICT
        from murcl_tpu.ops.attention_pallas import fused_trunk_resident

        l1 = SIZE_DICT[getattr(self.model, "size_arg", "small")][0]
        return fused_trunk_resident(
            self.cfg.feat_size, x_flat.shape[-1], l1,
            jnp.dtype(self._cdtype).itemsize, mixed=True,
        )

    def _rollout(self, params, ppo_old_params, bank: BankArrays, slide_ids,
                 rng, train: bool):
        if not self.cfg.uses_policy and self.cfg.stage1_layout == "batched":
            return self._rollout_batched(params, bank, slide_ids, rng, train)
        return self._rollout_sequential(
            params, ppo_old_params, bank, slide_ids, rng, train
        )

    def _rollout_batched(self, params, bank: BankArrays, slide_ids, rng,
                         train: bool, actions=None):
        """Stage-1 rollout with all T steps' heavy compute in ONE batch.

        Stage 1's actions are all uniform random (``train_MuRCL.py:235-236,
        256-258``), so selection/mixup/encode for every step and view batch
        into a single ``(T*2B, feat_size, D)`` program; only the GRU head
        (whose carry interleaves across views and steps — see module
        docstring) and the per-step NT-Xent remain sequential. Identical
        math to the sequential layout, one kernel grid instead of T.

        ``actions`` (T, 2, B, K) overrides the random draw (parity tests).
        """
        cfg = self.cfg
        b = slide_ids.shape[0]
        t_steps = cfg.T
        mp, fcp = params["model"], params["fc"]
        from jax.ad_checkpoint import checkpoint_name

        rng, r_act, r_mix, r_drop = jax.random.split(rng, 4)
        if actions is None:
            actions = jax.random.uniform(
                r_act, (t_steps, 2, b, cfg.num_clusters)
            )

        both_ids = jnp.concatenate([slide_ids, slide_ids])
        x_flat = _materialize_subbags(
            self.cfg, bank, jnp.tile(both_ids, t_steps),
            actions.reshape(t_steps * 2 * b, cfg.num_clusters),
            repeat=t_steps * 2,  # same b slides every (step, view): the
            # compaction kernel shares each slide window's DMA group-wide
        )

        # mixup permutes within each (step, view) batch separately. On the
        # kernel path the partner bag is block-gathered in-kernel — either
        # by the standalone mixup_rows kernel, or (CLAM's fused-trunk
        # route) directly inside the attention kernel so the mixed
        # (T*2B, N, D) tensor never exists in HBM. XLA's permuted-copy +
        # multiply-add chain costs ~22 ms/step at the canonical shape;
        # same draws on every route.
        mix_keys = jax.random.split(r_mix, t_steps * 2)
        kernel_mix = None
        if _use_compact(cfg, bank):
            lams, perms = jax.vmap(
                lambda k: mixup_factors(k, b, cfg.alpha)
            )(mix_keys)  # (T*2, b, 1), (T*2, b)
            base = jnp.arange(t_steps * 2, dtype=jnp.int32)[:, None] * b
            perm_abs = (perms.astype(jnp.int32) + base).reshape(-1)
            lam_flat = lams.reshape(-1)
            if self._fused_trunk_mix(x_flat):
                kernel_mix = (perm_abs, lam_flat)
                mixed = x_flat.reshape(t_steps, 2, b, cfg.feat_size, -1)
            else:
                from murcl_tpu.ops.compact_pallas import mixup_rows

                mixed = mixup_rows(x_flat, perm_abs, lam_flat).reshape(
                    t_steps, 2, b, cfg.feat_size, -1)
        else:
            mixed = jax.vmap(jax.vmap(
                lambda k, xi: mixup(k, xi, cfg.alpha)[0]
            ))(mix_keys.reshape(t_steps, 2, -1),
               x_flat.reshape(t_steps, 2, b, cfg.feat_size, -1))

        def encode_all(mixed_in):
            x2 = checkpoint_name(
                mixed_in.reshape(t_steps * 2 * b, cfg.feat_size, -1)
                .astype(self._cdtype),
                "subbag",
            )
            return self._encode(mp, x2, train, r_drop, mix=kernel_mix)

        if cfg.remat != "none":
            policy = jax.checkpoint_policies.save_only_these_names("subbag")
            encode_all = jax.checkpoint(encode_all, policy=policy)

        emb_flat, state_flat = encode_all(mixed)
        emb = emb_flat.reshape(t_steps, 2, b, -1)
        states = state_flat.reshape(t_steps, 2, b, -1)

        # GRU head: sequential by construction (shared carry, view0 -> view1
        # per step; t=0 restarts each view from zeros and keeps view 1's)
        proj0_a, _ = self.fc.apply(fcp, emb[0, 0], None)
        proj0_b, carry = self.fc.apply(fcp, emb[0, 1], None)

        def fc_step(c, e):
            pa, c_mid = self.fc.apply(fcp, e[0], c)
            pb, c_new = self.fc.apply(fcp, e[1], c_mid)
            return c_new, (pa, pb)

        _, (pas, pbs) = jax.lax.scan(fc_step, carry, emb[1:])
        proj_a = jnp.concatenate([proj0_a[None], pas])  # (T, b, C)
        proj_b = jnp.concatenate([proj0_b[None], pbs])

        step_losses = jnp.stack(
            [self._nt_xent(proj_a[t], proj_b[t]) for t in range(t_steps)]
        )
        total = jnp.sum(step_losses) / t_steps

        sims = jax.vmap(cosine_similarity)(
            jax.lax.stop_gradient(proj_a), jax.lax.stop_gradient(proj_b)
        )  # (T, b)
        rewards = sims[:-1] - sims[1:]  # (T-1, b)

        # stage-1 rollout buffers (unused downstream, shape-compatible):
        # step t's recorded state is the PREVIOUS step's encoder state
        zero_lp = jnp.zeros((t_steps - 1, b))
        rollouts = tuple(
            Rollout(states=states[:-1, v], actions=actions[1:, v],
                    logprobs=zero_lp, rewards=rewards)
            for v in (0, 1)
        )
        stats = PretrainStats(
            loss=total, step_losses=step_losses,
            rewards=self._bmean(rewards, 1),
        )
        return total, (stats, rollouts)

    def _rollout_sequential(self, params, ppo_old_params, bank: BankArrays,
                            slide_ids, rng, train: bool):
        cfg = self.cfg
        b = slide_ids.shape[0]
        mp, fcp = params["model"], params["fc"]

        # remat: one rollout step's activations (the (B, feat_size, D)
        # sub-bag and the aggregator's gate tensors) are ~0.5 GB at the
        # canonical shape; storing them for all T steps x 2 views OOMs a
        # 16 GB chip. Recomputing the step in the backward pass trades one
        # extra fused forward for ~12x less live memory — except the mixed
        # sub-bag itself, which is named and saved (1.6 GB in bf16 for the
        # whole rollout) so the backward skips the 12 re-gathers.
        from jax.ad_checkpoint import checkpoint_name

        policy = jax.checkpoint_policies.save_only_these_names("subbag")

        both_ids = jnp.concatenate([slide_ids, slide_ids])

        def _maybe_remat(fn):
            if cfg.remat == "none":
                return fn
            return partial(jax.checkpoint, policy=policy, static_argnums=(4,))(fn)

        @_maybe_remat
        def pair_forward(actions_a, actions_b, fc_carry, rng_t, restart: bool):
            """Both views through ONE aggregator forward of (2B, F, D).

            Selection and encoding batch across the views (bigger matmuls,
            half the call overhead); mixup permutes within each view
            separately (reference semantics); the GRU head stays sequential
            (view a then b) because its carry threads across views.
            """
            r_mix_a, r_mix_b, r_drop = jax.random.split(rng_t, 3)
            x2 = _materialize_subbags(
                cfg, bank, both_ids,
                jnp.concatenate([actions_a, actions_b]),
                repeat=2,  # both views select from the same slide windows
            )
            if self._fused_trunk_mix(x2):
                # mixup rides the fused trunk+attention kernel (same draws;
                # within one ulp of the XLA expression — PARITY.md mixup row)
                lam_a, perm_a = mixup_factors(r_mix_a, b, cfg.alpha)
                lam_b_, perm_b = mixup_factors(r_mix_b, b, cfg.alpha)
                kmix = (
                    jnp.concatenate([perm_a, perm_b + b]).astype(jnp.int32),
                    jnp.concatenate([lam_a[:, 0], lam_b_[:, 0]]),
                )
                x2 = checkpoint_name(x2.astype(self._cdtype), "subbag")
                emb2, state2 = self._encode(mp, x2, train, r_drop, mix=kmix)
            else:
                xa, _, _ = mixup(r_mix_a, x2[:b], cfg.alpha)
                xb, _, _ = mixup(r_mix_b, x2[b:], cfg.alpha)
                x2 = checkpoint_name(
                    jnp.concatenate([xa, xb]).astype(self._cdtype), "subbag"
                )
                emb2, state2 = self._encode(mp, x2, train, r_drop)
            if restart:
                # reference: fc(o, restart=True) per view — each restarts
                # from zeros; view 0's carry is overwritten by view 1's
                proj_a, _ = self.fc.apply(fcp, emb2[:b], None)
                proj_b, new_carry = self.fc.apply(fcp, emb2[b:], None)
            else:
                proj_a, c_mid = self.fc.apply(fcp, emb2[:b], fc_carry)
                proj_b, new_carry = self.fc.apply(fcp, emb2[b:], c_mid)
            return proj_a, proj_b, state2[:b], state2[b:], new_carry

        # ---- t = 0: two uniform random views, fresh hidden per view -------
        rng, ra0, ra1, rv0 = jax.random.split(rng, 4)
        act0 = jax.random.uniform(ra0, (b, cfg.num_clusters))
        act1 = jax.random.uniform(ra1, (b, cfg.num_clusters))
        proj0, proj1, state0, state1, fc_carry = pair_forward(
            act0, act1, None, rv0, True
        )
        loss0 = self._nt_xent(proj0, proj1)
        sim0 = cosine_similarity(
            jax.lax.stop_gradient(proj0), jax.lax.stop_gradient(proj1)
        )

        pol_c0 = self.ppo.zero_carry(b) if cfg.uses_policy else jnp.zeros((b, 1))

        # ---- t = 1 .. T-1 --------------------------------------------------
        def scan_step(carry, rng_t):
            fc_c, pol_a, pol_b, st_a, st_b, sim_last = carry
            r_aa, r_ab, r_va, r_vb = jax.random.split(rng_t, 4)
            if cfg.uses_policy:
                action_a, pol_a, pstep_a = act(
                    self.ppo.model, ppo_old_params, st_a, pol_a, r_aa
                )
                action_b, pol_b, pstep_b = act(
                    self.ppo.model, ppo_old_params, st_b, pol_b, r_ab
                )
            else:
                action_a = jax.random.uniform(r_aa, (b, cfg.num_clusters))
                action_b = jax.random.uniform(r_ab, (b, cfg.num_clusters))
                zero_lp = jnp.zeros((b,))
                pstep_a = PolicyStep(state=st_a, action=action_a, logprob=zero_lp)
                pstep_b = PolicyStep(state=st_b, action=action_b, logprob=zero_lp)

            # shared fc carry threads view0 -> view1 (reference quirk)
            proj_a, proj_b, st_a, st_b, fc_c = pair_forward(
                action_a, action_b, fc_c, r_va, False
            )

            loss_t = self._nt_xent(proj_a, proj_b)
            sim = cosine_similarity(
                jax.lax.stop_gradient(proj_a), jax.lax.stop_gradient(proj_b)
            )
            reward = sim_last - sim  # decreasing similarity is rewarded
            out = (loss_t, pstep_a, pstep_b, reward)
            return (fc_c, pol_a, pol_b, st_a, st_b, sim), out

        rngs_t = jax.random.split(rng, cfg.T - 1)
        carry0 = (fc_carry, pol_c0, pol_c0, state0, state1, sim0)
        _, (losses_t, psteps_a, psteps_b, rewards) = jax.lax.scan(
            scan_step, carry0, rngs_t
        )

        step_losses = jnp.concatenate([loss0[None], losses_t])
        total = jnp.sum(step_losses) / cfg.T
        rollouts = tuple(
            Rollout(states=p.state, actions=p.action, logprobs=p.logprob,
                    rewards=rewards)
            for p in (psteps_a, psteps_b)
        )
        stats = PretrainStats(
            loss=total, step_losses=step_losses, rewards=self._bmean(rewards, 1)
        )
        return total, (stats, rollouts)

    # ------------------------------------------------------------- steps --
    def _train_impl(self, agg_state: AggTrainState, ppo_params,
                    bank: BankArrays, slide_ids, rng):
        cfg = self.cfg
        rng = self._shard_rng(rng)
        if cfg.train_stage == 2:
            _, (stats, rollouts) = self._rollout(
                jax.lax.stop_gradient(agg_state.params), ppo_params, bank,
                slide_ids, rng, train=False,
            )
            return agg_state, stats, rollouts

        def loss_fn(params):
            return self._rollout(params, ppo_params, bank, slide_ids, rng, train=True)

        (_, (stats, rollouts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            agg_state.params
        )
        if self._axis is not None:
            # the NT-Xent losses flow entirely through the all_gather'd
            # projections, so the loss is computed redundantly on all N
            # shards and the gather's transpose (psum_scatter) hands each
            # shard N x its local contribution (measured). pmean — not psum
            # — reconstructs the exact global-batch gradient; the update
            # runs replicated.
            grads = jax.lax.pmean(grads, self._axis)
        updates, opt_state = self.tx.update(grads, agg_state.opt_state, agg_state.params)
        params = optax.apply_updates(agg_state.params, updates)
        return AggTrainState(params=params, opt_state=opt_state), stats, rollouts

    # -------------------------------------------------------------- API ---
    def train_step(
        self,
        agg_state: AggTrainState,
        ppo_state: Optional[PPOTrainState],
        bank: BankArrays,
        slide_ids,
        rng,
    ) -> Tuple[AggTrainState, Optional[PPOTrainState], PretrainStats]:
        ppo_params = ppo_state.old_params if self.cfg.uses_policy else None
        agg_state, stats, rollouts = self._train(
            agg_state, ppo_params, bank, slide_ids, rng
        )
        if self.cfg.train_stage == 2:
            # one PPO update per view, sequentially (train_MuRCL.py:296-298)
            for rollout in rollouts:
                ppo_state, _ = self.ppo.update(ppo_state, rollout)
        return agg_state, ppo_state, stats
