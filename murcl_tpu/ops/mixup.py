"""Bag-level mixup (reference ``utils/datasets.py:263-271``).

Per sample: ``lambda_i ~ alpha + U[0,1) * (1 - alpha)`` and a random batch
permutation; ``out_i = lambda_i * x_i + (1 - lambda_i) * x_perm[i]``. The
reference builds this with a per-sample Python loop; here it is a single
fused elementwise expression under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def mixup_factors(rng, batch_size: int, alpha):
    """The random draw behind :func:`mixup`: ``(lambda (B,1), perm (B,))``.

    Split out so callers can fuse the mixing arithmetic into neighbouring
    elementwise work (e.g. the selection valid-mask) while consuming the
    exact same PRNG stream as ``mixup`` itself.
    """
    rng_lam, rng_perm = jax.random.split(rng)
    lam = alpha + jax.random.uniform(rng_lam, (batch_size, 1)) * (1.0 - alpha)
    perm = jax.random.permutation(rng_perm, batch_size)
    return lam, perm


@partial(jax.jit, static_argnames=())
def mixup(rng, inputs, alpha):
    """Mix a batch of bags. Returns ``(mixed, lambda (B,1), perm (B,))``."""
    batch_size = inputs.shape[0]
    lam, perm = mixup_factors(rng, batch_size, alpha)
    lam_b = lam.reshape((batch_size,) + (1,) * (inputs.ndim - 1)).astype(inputs.dtype)
    mixed = lam_b * inputs + (1.0 - lam_b) * jnp.take(inputs, perm, axis=0)
    return mixed, lam, perm
