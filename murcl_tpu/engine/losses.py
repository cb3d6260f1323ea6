"""Loss helpers shared by the training engines."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, valid=None):
    """Torch ``CrossEntropyLoss`` semantics: mean over the batch.

    ``valid`` (B,) bool restricts the mean to real (non-padded) rows —
    identical to the reference when the batch is full.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if valid is None:
        return jnp.mean(nll)
    w = valid.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_mean(x, valid=None):
    if valid is None:
        return jnp.mean(x)
    w = valid.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def label_confidence(logits, labels):
    """Softmax probability of the true class, per sample: (B,).

    The supervised RL reward signal (``train_RLMIL.py:344,371``):
    ``reward_t = confidence_t - confidence_{t-1}``.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.take_along_axis(probs, labels[:, None], axis=1)[:, 0]


def cosine_similarity(a, b, eps: float = 1e-8):
    """Row-wise cosine similarity (torch semantics, norm clamped at eps)."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)
