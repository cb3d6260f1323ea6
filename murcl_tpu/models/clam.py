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


class AttnNet(nn.Module):
    """Ungated attention scorer ``L -> D -> tanh -> n_classes``."""

    D: int
    n_classes: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = jnp.tanh(_xavier_linear(self.D, "dense")(x))
        if self.dropout > 0:
            a = nn.Dropout(self.dropout, deterministic=not train)(a)
        return _xavier_linear(self.n_classes, "score")(a)


class AttnNetGated(nn.Module):
    """Gated attention: ``W_c(tanh(W_a x) * sigmoid(W_b x))``."""

    D: int
    n_classes: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = jnp.tanh(_xavier_linear(self.D, "attention_a")(x))
        b = jax.nn.sigmoid(_xavier_linear(self.D, "attention_b")(x))
        if self.dropout > 0:
            a = nn.Dropout(self.dropout, deterministic=not train)(a)
            b = nn.Dropout(self.dropout, deterministic=not train)(b)
        return _xavier_linear(self.n_classes, "attention_c")(a * b)


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

    @nn.compact
    def __call__(
        self,
        h,
        label: Optional[jnp.ndarray] = None,
        instance_eval: bool = False,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        l1, l2 = SIZE_DICT[self.size_arg]
        x = nn.relu(_xavier_linear(l1, "fc")(h))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        attn_cls = AttnNetGated if self.gate else AttnNet
        scores = attn_cls(D=l2, n_classes=1, dropout=self.dropout, name="attn")(x, train=train)
        scores = scores[..., 0]  # (B, N)

        masked = scores if mask is None else jnp.where(mask, scores, _NEG_INF)
        weights = nn.softmax(masked, axis=-1)  # (B, N)
        m = jnp.einsum("bn,bnl->bl", weights, x)  # (B, l1)

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
