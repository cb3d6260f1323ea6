"""NT-Xent (SimCLR) contrastive loss, fused form.

Reference (``utils/losses.py:5-41``): cosine-similarity matrix over the
``2B`` stacked projections divided by temperature, positives at offsets
``+-B``, cross-entropy with the positive as class 0 over
``[positive, 2B-2 negatives]``, summed and divided by ``2B``.

Algebraic identity used here: for row ``i`` the CE logits are exactly the
row's similarities excluding self (the positive entry *is* ``sim[i,
partner]``), so

    loss_i = logsumexp_{j != i}(sim_ij) - sim_{i, partner}
    loss   = mean_i loss_i

which is one ``(2B, d) @ (d, 2B)`` matmul plus a masked log-sum-exp — no
mask materialization, no concat, XLA fuses the rest. The reference
precomputes a fixed-batch boolean mask and crashes on partial batches;
here the batch size is a trace-time constant (good for TPU) with the same
drop-partial-batch behavior enforced by the driver.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


@partial(jax.jit, static_argnames=())
def nt_xent(z_i, z_j, temperature):
    """NT-Xent loss over two views of a batch. ``z_*``: ``(B, d)``."""
    b = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0).astype(jnp.float32)
    # torch.nn.CosineSimilarity clamps the norm product at eps=1e-8.
    norms = jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    zn = z / norms
    sim = (zn @ zn.T) / temperature  # (2B, 2B)

    n = 2 * b
    eye = jnp.eye(n, dtype=bool)
    sim_masked = jnp.where(eye, _NEG_INF, sim)
    lse = jax.nn.logsumexp(sim_masked, axis=1)

    partner = (jnp.arange(n) + b) % n
    pos = sim[jnp.arange(n), partner]
    return jnp.mean(lse - pos)
