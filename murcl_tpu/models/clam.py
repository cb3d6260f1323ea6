"""CLAM_SB: single-branch clustering-constrained attention MIL, batched.

Reference (``models/clam.py``): backbone ``Linear(in,512)+ReLU(+Dropout)``
feeding a gated attention net ``A = W_c(tanh(W_a h) * sigmoid(W_b h))``
(``:37-60,69-77``), softmax over the bag (``:144``), bag embedding
``M = A @ h`` (``:170``). Instance-level clustering loss (``:103-132``):
for the in-the-class branch, the ``k_sample`` highest- and lowest-attention
patches are scored by a per-class binary instance classifier against
pseudo-labels (top=1 / bottom=0); the out-of-class branch (subtyping only)
pushes its top-k toward 0. Which branches fire is driven by the one-hot
slide label (``:146-168``). Weights are xavier-normal, zero bias (``:7-15``).
The ``classifiers`` bag head is dead code in ``forward`` (``:171-173``) but
kept as a parameter.

TPU redesign: the reference Python-loops over bags *and* over classes with
host branching on the label. Here one program handles ``(B, N, D)``:
gated attention is two fused matmuls; the instance-eval branch computes the
in/out losses for ALL classes via stacked classifier weights
``(n_classes, 512, 2)`` and a vmapped static ``top_k``, then selects with
the one-hot mask — no data-dependent control flow, same math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from murcl_tpu.models.layers import TorchLinear, xavier_normal

_NEG_INF = -1e30

SIZE_DICT = {"small": (512, 256), "big": (512, 384)}


def _xavier_linear(features: int, name: str) -> TorchLinear:
    return TorchLinear(
        features,
        kernel_init=xavier_normal(),
        bias_init=jax.nn.initializers.zeros,
        name=name,
    )


class _TrunkParams(nn.Module):
    """TorchLinear-compatible parameters without the forward.

    Exposes ``(kernel (in, out), bias (out,))`` under the same leaf names
    and init as :class:`TorchLinear` (so checkpoints and the torch bridge
    are unaffected) while letting the caller feed them into the fused
    trunk+attention kernel instead of a standalone matmul.
    """

    dim_in: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_normal(), (self.dim_in, self.features))
        bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        return kernel, bias


class AttentionPool(nn.Module):
    """Attention scorer + softmax pooling, fusable into one Pallas kernel.

    Owns the parameters directly (``wa/ba/wb/bb/wc/bc``, xavier-normal /
    zero-bias like the reference init) so the fused TPU kernel
    (:mod:`murcl_tpu.ops.attention_pallas`) can consume them without
    re-tracing submodules. Semantics per mode:

    - ``gated=True``:  ``s = W_c(tanh(W_a x) * sigmoid(W_b x))`` (clam.py:37-60)
    - ``gated=False``: ``s = W_c(tanh(W_a x))``                  (clam.py:19-34)

    ``__call__(x, mask, train)`` returns ``(pooled (B,F), weights (B,N),
    raw_scores (B,N))``. The fused kernel has no dropout, so when attention
    dropout is active (train mode, dropout>0) the XLA path runs regardless
    of ``impl`` — identical math, XLA-fused.
    """

    D: int
    gated: bool = True
    dropout: float = 0.0
    impl: str = "auto"  # auto | xla | pallas
    init: str = "xavier"  # xavier (CLAM) | torch (ABMIL's nn.Linear default)
    # False: the fused trunk kernel's backward skips the input-gradient
    # matmul + (B, N, Fin) write (h cotangent becomes exact zeros). Safe
    # only when callers differentiate parameters, never the bag — the
    # training engines clone their model with this off
    input_grad: bool = True
    # gate transcendentals inside the Pallas kernels: "approx" = relaxed-ulp
    # rational tanh/sigmoid (abs err <= ~1e-3, invisible after the bf16
    # activation cast — see ops/attention_pallas.fast_tanh). The XLA path
    # (CPU, fallback) always computes exactly. PARITY.md documents the
    # deviation; "exact" restores library transcendentals in-kernel.
    gate_math: str = "exact"  # exact | approx

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, trunk=None,
                 mix=None):
        import math

        from murcl_tpu.ops.attention_pallas import (
            fused_trunk_attention_pool,
            fused_trunk_resident,
            gated_attention_pool,
        )
        from murcl_tpu.ops.mixup import apply_mix

        f = trunk[0].shape[1] if trunk is not None else x.shape[-1]
        if self.init == "xavier":
            k1 = k2 = xavier_normal()
            b1 = b2 = jax.nn.initializers.zeros
        else:  # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            def uni(bound):
                return lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, minval=-bound, maxval=bound
                )

            k1 = b1 = uni(1.0 / math.sqrt(f))
            k2 = b2 = uni(1.0 / math.sqrt(self.D))
        wa = self.param("wa", k1, (f, self.D))
        ba = self.param("ba", b1, (self.D,))
        if self.gated:
            wb = self.param("wb", k1, (f, self.D))
            bb = self.param("bb", b1, (self.D,))
        else:  # no gate branch: inert inputs for the fused op's signature
            wb = jnp.zeros((f, self.D), x.dtype)
            bb = jnp.zeros((self.D,), x.dtype)
        wc = self.param("wc", k2, (self.D, 1))
        bc = self.param("bc", b2, (1,))

        use_dropout = train and self.dropout > 0
        impl = self.impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"

        if mix is not None and trunk is None:
            raise ValueError("mix=(perm, lam) is only supported on the "
                             "fused-trunk path (CLAM's hot path)")

        if trunk is not None:
            wf, bf = trunk
            n = x.shape[1]
            resident = fused_trunk_resident(
                n, x.shape[-1], f, x.dtype.itemsize, mixed=mix is not None
            )
            if impl == "pallas" and resident and not self.is_initializing():
                # ONE kernel: (optional in-kernel mixup,) trunk matmul+relu
                # +dropout, gates, softmax, pooling — the (B, N, L1) trunk
                # output never touches HBM
                seed = None
                rate = 0.0
                if use_dropout:
                    rate = self.dropout
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (), 0, 2**31 - 1,
                        dtype=jnp.int32,
                    )
                return fused_trunk_attention_pool(
                    x, wf, bf, wa, ba, wb, bb, wc[:, 0], bc[0], mask=mask,
                    impl="pallas", gated=self.gated, dropout=rate, seed=seed,
                    input_grad=self.input_grad, gate_math=self.gate_math,
                    mix=mix,
                )
            # unfused fallback (CPU, init trace, oversized bags): explicit
            # mix (mixup_rows-identical numerics), trunk in XLA, then the
            # standard attention path below
            if mix is not None:
                x = apply_mix(x, *mix)
            x = nn.relu(jnp.dot(x, wf.astype(x.dtype)) + bf.astype(x.dtype))
            if use_dropout:
                x = nn.Dropout(self.dropout, deterministic=False)(x)

        if impl == "pallas" and not self.is_initializing():
            # fused kernel path, incl. training: dropout masks are generated
            # by the on-chip PRNG inside the kernel (same per-gate inverted
            # dropout as clam.py:46-48, regenerated exactly in the backward)
            seed = None
            rate = 0.0
            if use_dropout:
                rate = self.dropout
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            return gated_attention_pool(
                x, wa, ba, wb, bb, wc[:, 0], bc[0], mask=mask,
                impl="pallas", gated=self.gated, dropout=rate, seed=seed,
                gate_math=self.gate_math,
            )

        # XLA path (CPU, init trace, or impl='xla'): explicit gates with
        # per-gate dropout masks (clam.py:46-48)
        a = jnp.tanh(jnp.einsum("bnf,fd->bnd", x, wa) + ba)
        if self.gated:
            b = jax.nn.sigmoid(jnp.einsum("bnf,fd->bnd", x, wb) + bb)
        if use_dropout:
            a = nn.Dropout(self.dropout, deterministic=False)(a)
            if self.gated:
                b = nn.Dropout(self.dropout, deterministic=False)(b)
        u = a * b if self.gated else a
        s = jnp.einsum("bnd,do->bno", u, wc)[..., 0] + bc[0]
        masked = s if mask is None else jnp.where(mask, s, -1e30)
        p = nn.softmax(masked, axis=-1)
        m = jnp.einsum("bn,bnf->bf", p, x)
        return m, p, s


def _cross_entropy(logits, targets):
    """Mean CE over the leading axis (torch ``CrossEntropyLoss`` default)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))


class CLAM_SB(nn.Module):
    """Single-branch CLAM. ``__call__`` returns ``(M (B, L1), aux dict)``.

    ``aux`` carries ``attention`` (raw pre-softmax scores, (B, N) — the
    reference's ``attention_only`` output), ``logits`` (dead-code bag head),
    and with ``instance_eval``: ``instance_loss`` (B,), ``inst_preds`` /
    ``inst_targets`` (B, n_inst).
    """

    in_dim: int = 512
    gate: bool = True
    size_arg: str = "small"
    dropout: float = 0.0  # reference uses 0.25 when its bool flag is set
    k_sample: int = 8
    n_classes: int = 2
    subtyping: bool = False
    attn_impl: str = "auto"  # auto | xla | pallas (fused attention pooling)
    attn_input_grad: bool = True  # see AttentionPool.input_grad
    attn_gate_math: str = "exact"  # see AttentionPool.gate_math

    @nn.compact
    def __call__(
        self,
        h,
        label: Optional[jnp.ndarray] = None,
        instance_eval: bool = False,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        mix=None,
    ):
        l1, l2 = SIZE_DICT[self.size_arg]
        wf, bf = _TrunkParams(dim_in=h.shape[-1], features=l1, name="fc")()
        pool = AttentionPool(
            D=l2, gated=self.gate, dropout=self.dropout, impl=self.attn_impl,
            input_grad=self.attn_input_grad, gate_math=self.attn_gate_math,
            name="attn",
        )
        if mix is not None and instance_eval:
            # instance-eval gathers trunk rows of the (mixed) bag; mix
            # explicitly up front (contrastive pretraining — the only mix
            # user — never takes this branch)
            from murcl_tpu.ops.mixup import apply_mix

            h = apply_mix(h, *mix)
            mix = None
        if instance_eval:
            # the instance branch gathers trunk-output rows; keep the trunk
            # materialized (XLA fuses it with the gather) and the attention
            # kernel standalone
            x = nn.relu(jnp.dot(h, wf.astype(h.dtype)) + bf.astype(h.dtype))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            m, weights, scores = pool(x, mask=mask, train=train)
        else:
            # hot path (pretraining encodes, eval): trunk fused into the
            # attention kernel — no (B, N, l1) HBM round-trip per call;
            # mix=(perm, lam) additionally fuses bag-level mixup in-kernel
            m, weights, scores = pool(h, mask=mask, train=train,
                                      trunk=(wf, bf), mix=mix)
            x = None

        # dead-code bag head, kept as parameters (clam.py:78,171-173)
        logits = _xavier_linear(self.n_classes, "classifiers")(m)

        aux = {"attention": scores, "logits": logits}

        # stacked per-class binary instance classifiers (clam.py:79-80)
        inst_kernel = self.param(
            "instance_kernel",
            lambda key, shape: jax.vmap(lambda k: xavier_normal()(k, shape[1:]))(
                jax.random.split(key, shape[0])
            ),
            (self.n_classes, l1, 2),
        )
        inst_bias = self.param(
            "instance_bias", jax.nn.initializers.zeros, (self.n_classes, 2)
        )

        if instance_eval:
            if label is None:
                raise ValueError("instance_eval=True requires integer labels (B,)")
            aux.update(
                self._instance_losses(weights, x, label, inst_kernel, inst_bias)
            )
        return m, aux

    def _instance_losses(self, weights, x, label, inst_kernel, inst_bias):
        """Vectorized in/out-of-class instance losses (clam.py:103-168).

        The reference selects top/bottom-k patches by post-softmax attention
        (its ``inst_eval`` receives the softmaxed ``A``) per class, runs the
        class's binary classifier, and CEs against pseudo-labels. Here all
        classes are computed at once and masked by the one-hot label.
        """
        k = self.k_sample

        def one_bag(w, h_bag, onehot):
            _, top_idx = jax.lax.top_k(w, k)
            _, bot_idx = jax.lax.top_k(-w, k)
            top = h_bag[top_idx]  # (k, l1)
            bot = h_bag[bot_idx]

            def per_class(kernel, bias):
                inst = jnp.concatenate([top, bot], axis=0)  # (2k, l1)
                logit = inst @ kernel + bias
                tgt_in = jnp.concatenate(
                    [jnp.ones((k,), jnp.int32), jnp.zeros((k,), jnp.int32)]
                )
                loss_in = _cross_entropy(logit, tgt_in)
                preds_in = jnp.argmax(logit, axis=-1)
                # out-of-class: top-k pushed to 0 (clam.py:122-132)
                logit_out = top @ kernel + bias
                loss_out = _cross_entropy(logit_out, jnp.zeros((k,), jnp.int32))
                preds_out = jnp.argmax(logit_out, axis=-1)
                return loss_in, preds_in, tgt_in, loss_out, preds_out

            loss_in, preds_in, tgt_in, loss_out, preds_out = jax.vmap(per_class)(
                inst_kernel, inst_bias
            )
            in_mask = onehot.astype(loss_in.dtype)
            total = jnp.sum(loss_in * in_mask)
            if self.subtyping:
                total = total + jnp.sum(loss_out * (1.0 - in_mask))
                total = total / self.n_classes
            # reported preds/targets: the fired in-class branch's
            sel = jnp.argmax(onehot)
            return total, preds_in[sel], tgt_in

        onehots = jax.nn.one_hot(label, self.n_classes)
        total, preds, targets = jax.vmap(one_bag)(weights, x, onehots)
        return {
            "instance_loss": total,
            "inst_preds": preds,
            "inst_targets": targets,
        }
