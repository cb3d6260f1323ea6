"""Loss helpers shared by the training engines."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, valid=None, axis_name=None):
    """Torch ``CrossEntropyLoss`` semantics: mean over the batch.

    ``valid`` (B,) bool restricts the mean to real (non-padded) rows —
    identical to the reference when the batch is full. ``axis_name`` makes
    the mean GLOBAL across a shard_map/pmap axis (numerator and count are
    ``psum``-reduced), so a data-parallel per-shard program computes the
    same loss the reference's gathered-batch ``DataParallel`` loss does.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return masked_mean(nll, valid, axis_name=axis_name)


def masked_mean(x, valid=None, axis_name=None):
    """Mean of ``x`` over valid rows; global over ``axis_name`` when set."""
    if valid is None:
        s = jnp.sum(x)
        n = jnp.asarray(x.size, x.dtype)
    else:
        w = valid.astype(x.dtype)
        s = jnp.sum(x * w)
        n = jnp.sum(w)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        n = jax.lax.psum(n, axis_name)
    return s / jnp.maximum(n, 1.0)


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
