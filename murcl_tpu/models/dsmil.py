"""DSMIL: dual-stream MIL (instance classifier + critical-instance attention).

Reference (``models/dsmil.py``): ``FCLayer`` scores every patch with a
linear head ``in -> C`` (``:6-36``); ``BClassifier`` (``:52-81``) projects
queries ``q: in -> 128`` and values ``v: in -> in`` (with dropout), picks
the top-scoring ("critical") instance per class, computes attention
``A = softmax_N(Q @ q_crit^T / sqrt(128))`` and the bag representation
``B = A^T @ V`` of shape ``(C, in)``; the ``fcc`` conv head (``:62,80``) is
dead code in ``forward`` but kept as parameters. ``MILNet`` composes the two
and returns ``(instance_logits, B, B.detach())`` (``:103-113``).

The reference loops per bag and hardcodes ``.cuda()`` (``:14,117-119``).
Here everything is a single batched program over ``(B, N, D)``: the critical
instance per class is an argmax + gather, attention is one batched matmul.
An optional mask excludes padding rows from the instance softmax/argmax for
variable-length full-bag evaluation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from murcl_tpu.models.layers import TorchLinear

_NEG_INF = -1e30


class MILNet(nn.Module):
    """DSMIL network. Returns ``(instance_logits (B,N,C), bag (B,C,D), aux)``."""

    dim_feat: int
    num_classes: int
    dropout_v: float = 0.0
    q_dim: int = 128

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = False):
        # instance stream (FCLayer): per-patch class scores
        inst_logits = TorchLinear(self.num_classes, name="i_classifier")(x)  # (B,N,C)

        # bag stream (BClassifier)
        q = TorchLinear(self.q_dim, name="q")(x)  # (B,N,128)
        v = x
        if self.dropout_v > 0:
            v = nn.Dropout(self.dropout_v, deterministic=not train)(v)
        v = TorchLinear(self.dim_feat, name="v")(v)  # (B,N,D)

        # critical instance per class: argmax of the instance score over N
        scores = inst_logits if mask is None else jnp.where(
            mask[..., None], inst_logits, _NEG_INF
        )
        crit_idx = jnp.argmax(scores, axis=1)  # (B,C)
        q_crit = jnp.take_along_axis(q, crit_idx[..., None], axis=1)  # (B,C,128)

        att = jnp.einsum("bnq,bcq->bnc", q, q_crit) / jnp.sqrt(
            jnp.asarray(self.q_dim, dtype=q.dtype)
        )
        if mask is not None:
            att = jnp.where(mask[..., None], att, _NEG_INF)
        att = nn.softmax(att, axis=1)  # softmax over instances, per class
        bag = jnp.einsum("bnc,bnd->bcd", att, v)  # (B,C,D)

        # dead-code conv head (Conv1d(C, C, kernel_size=D) == full-width dot),
        # kept as parameters for checkpoint parity (dsmil.py:62)
        fcc_kernel = self.param(
            "fcc_kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / jnp.sqrt(shape[1] * shape[2]),
                maxval=1.0 / jnp.sqrt(shape[1] * shape[2]),
            ),
            (self.num_classes, self.num_classes, self.dim_feat),
        )
        fcc_bias = self.param(
            "fcc_bias",
            lambda key, shape: jax.random.uniform(
                key, shape,
                minval=-1.0 / jnp.sqrt(self.num_classes * self.dim_feat),
                maxval=1.0 / jnp.sqrt(self.num_classes * self.dim_feat),
            ),
            (self.num_classes,),
        )
        conv_out = jnp.einsum("bcd,ocd->bo", bag, fcc_kernel) + fcc_bias

        return inst_logits, bag, {"attention": att, "conv_logits": conv_out}
