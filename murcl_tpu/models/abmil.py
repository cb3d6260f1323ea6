"""ABMIL: attention-based multiple-instance pooling, natively batched.

Reference (``models/abmil.py``): 3-layer ReLU/Dropout MLP encoder
``dim_in -> L -> L -> L`` (``:12-21``), attention scorer ``L -> D -> tanh ->
K=1`` (``:23-27``), softmax over the bag then scaled by ``1/sqrt(N)``
(``:40-41``), pooled ``M = A @ H`` (``:42``), decoder ``L -> L -> ReLU``
(``:29-32``). The ``fc`` head (``:33``) is constructed but never applied in
``forward`` — classification happens downstream in ``Full_layer``; it still
must exist as a parameter (checkpoints, linear-eval unfreeze list).

The reference loops bag-by-bag in Python (``:47-51``, B sequential
forwards). Here the whole batch is one ``(B, N, D)`` einsum program: two big
matmuls for the MXU, attention softmax fused by XLA. Zero-padded rows (the
fixed-shape sub-bag padding) flow through exactly like the reference's —
they participate in the softmax via their encoder bias response. An
optional boolean ``mask`` supports true variable-length bags (full-bag
heatmap/eval path), which the reference cannot batch at all.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from murcl_tpu.models.layers import MLP, TorchLinear

_NEG_INF = -1e30


def masked_attention_pool(scores, values, mask=None, scale_by_sqrt_n: bool = True):
    """Softmax-normalize ``scores`` over the bag axis and pool ``values``.

    ``scores``: (B, N)  raw attention logits
    ``values``: (B, N, L)
    ``mask``:   (B, N) bool, True = real patch; None = all real
    Returns ``(pooled (B, L), weights (B, N))``. When ``scale_by_sqrt_n``,
    weights are divided by sqrt(N) after the softmax (``abmil.py:41``; N is
    the static bag width, matching the reference where every padded bag has
    exactly feat_size rows).
    """
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    weights = nn.softmax(scores, axis=-1)
    if scale_by_sqrt_n:
        if mask is None:
            n = jnp.asarray(scores.shape[-1], dtype=weights.dtype)
            weights = weights / jnp.sqrt(n)
        else:
            n = jnp.maximum(mask.sum(axis=-1, keepdims=True), 1).astype(weights.dtype)
            weights = weights / jnp.sqrt(n)
    pooled = jnp.einsum("bn,bnl->bl", weights, values)
    return pooled, weights


class ABMIL(nn.Module):
    """Gateless attention-MIL aggregator. Returns ``(bag_emb (B, L), aux)``."""

    dim_in: int
    L: int = 512
    D: int = 128
    K: int = 1
    dim_out: int = 2
    dropout: float = 0.0
    attn_impl: str = "auto"  # auto | xla | pallas (fused attention pooling)
    attn_gate_math: str = "exact"  # see clam.AttentionPool.gate_math

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = False):
        from murcl_tpu.models.clam import AttentionPool

        # encoder: three Linear+ReLU blocks, dropout after the first two
        h = MLP((self.L, self.L, self.L), dropout=self.dropout, name="encoder")(x, train=train)

        # ungated tanh attention + softmax pooling (fused kernel on TPU);
        # ABMIL has no attention dropout, so the fused path also trains
        pooled, weights, _scores = AttentionPool(
            D=self.D, gated=False, impl=self.attn_impl, init="torch",
            gate_math=self.attn_gate_math, name="attn",
        )(h, mask=mask, train=train)
        # post-softmax 1/sqrt(N) scaling (abmil.py:41); linear in the pool,
        # so scaling the pooled vector is exact
        if mask is None:
            n = jnp.asarray(h.shape[1], dtype=pooled.dtype)
            scale = 1.0 / jnp.sqrt(n)
            pooled = pooled * scale
            weights = weights * scale
        else:
            n = jnp.maximum(mask.sum(axis=-1, keepdims=True), 1).astype(pooled.dtype)
            pooled = pooled / jnp.sqrt(n)
            weights = weights / jnp.sqrt(n)
        out = nn.relu(TorchLinear(self.L, name="decoder")(pooled))

        # unused-in-forward classification head, kept as a parameter for
        # checkpoint/linear-eval parity (reference abmil.py:33)
        logits = TorchLinear(self.dim_out, name="fc")(out)
        return out, {"logits": logits, "attention": weights}
