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


def apply_mix(x, perm, lam):
    """The Pallas kernels' mix expression, for fallback paths.

    ``lam_i * x_i + (1 - lam_i) * x[perm[i]]`` with ``1 - lam`` computed in
    f32 *before* the cast to ``x.dtype`` — bitwise-identical to the in-kernel
    formula (``compact_pallas._mix_kernel``; Mosaic cannot legalize scalar
    bf16 arithmetic, so the kernels must subtract in f32). Every non-kernel
    site that stands in for a kernel route (the fused-trunk XLA fallback,
    CLAM's instance-eval branch) must call this ONE helper so the documented
    kernel/fallback parity stays structural. :func:`mixup` keeps the
    reference's own expression (``1 - lam`` in the input dtype), which is
    within one ulp for bf16 (PARITY.md mixup row).
    """
    lam32 = lam.reshape((-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
    return lam32.astype(x.dtype) * x + (1.0 - lam32).astype(x.dtype) * x[perm]


@partial(jax.jit, static_argnames=())
def mixup(rng, inputs, alpha):
    """Mix a batch of bags. Returns ``(mixed, lambda (B,1), perm (B,))``."""
    batch_size = inputs.shape[0]
    lam, perm = mixup_factors(rng, batch_size, alpha)
    lam_b = lam.reshape((batch_size,) + (1,) * (inputs.ndim - 1)).astype(inputs.dtype)
    mixed = lam_b * inputs + (1.0 - lam_b) * jnp.take(inputs, perm, axis=0)
    return mixed, lam, perm
