#!/usr/bin/env python
"""Locate the fused trunk+attention kernel's overhead: time fwd/bwd variants.

All timings are jitted on-device loops at the batched-rollout shape
(1536, 1024, 512) bf16 — eager per-call timing through the tunnel measures
dispatch RPC, not kernel time (CLAUDE.md).

Variants: production (dropout 0.25) vs no-dropout (isolates the on-chip
PRNG + mask cost) vs ungated (isolates one gate matmul + sigmoid) vs
XLA (fusion baseline).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

B, N, FIN, L1, D = 1536, 1024, 512, 512, 256


def main():
    import jax
    import jax.numpy as jnp

    from murcl_tpu.ops.attention_pallas import (
        fused_trunk_attention_pool,
        fused_trunk_attention_pool_xla,
    )

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, N, FIN)) * 0.3, jnp.bfloat16)
    wf = jnp.asarray(rng.normal(size=(FIN, L1)) * 0.05, jnp.float32)
    bf = jnp.zeros((L1,), jnp.float32)
    wa = jnp.asarray(rng.normal(size=(L1, D)) * 0.05, jnp.float32)
    ba = jnp.zeros((D,), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(L1, D)) * 0.05, jnp.float32)
    bb = jnp.zeros((D,), jnp.float32)
    wc = jnp.asarray(rng.normal(size=(D,)) * 0.05, jnp.float32)
    bc = jnp.float32(0.0)

    def timed(fn, *args, k=6):
        fn(*args)
        out = fn(*args)
        jax.block_until_ready(out)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / k * 1000

    def fwd_fn(dropout, gated, impl):
        @jax.jit
        def f(h, seed):
            m, p, s = fused_trunk_attention_pool(
                h, wf, bf, wa, ba, wb, bb, wc, bc, impl=impl, gated=gated,
                dropout=dropout, seed=seed)
            return jnp.sum(m)
        return f

    def bwd_fn(dropout, input_grad):
        def loss(wf_, wa_, wb_, wc_, h, seed):
            m, p, s = fused_trunk_attention_pool(
                h, wf_, bf, wa_, ba, wb_, bb, wc_, bc, impl="pallas",
                gated=True, dropout=dropout, seed=seed,
                input_grad=input_grad)
            return jnp.sum(m.astype(jnp.float32))
        g = jax.grad(loss, argnums=(0, 1, 2, 3))
        return jax.jit(lambda h, seed: g(wf, wa, wb, wc, h, seed))

    seed = jnp.int32(7)
    print(f"shape: ({B}, {N}, {FIN}) bf16, L1={L1}, D={D}")
    print(f"fwd pallas drop=0.25 gated: {timed(fwd_fn(0.25, True, 'pallas'), h, seed):7.2f} ms")
    print(f"fwd pallas drop=0    gated: {timed(fwd_fn(0.0, True, 'pallas'), h, seed):7.2f} ms")
    print(f"fwd pallas drop=0  ungated: {timed(fwd_fn(0.0, False, 'pallas'), h, seed):7.2f} ms")
    print(f"fwd XLA    drop=0    gated: {timed(fwd_fn(0.0, True, 'xla'), h, seed):7.2f} ms")
    print(f"bwd pallas drop=0.25 no-dh: {timed(bwd_fn(0.25, False), h, seed):7.2f} ms (incl. fwd)")
    print(f"bwd pallas drop=0    no-dh: {timed(bwd_fn(0.0, False), h, seed):7.2f} ms (incl. fwd)")
    # (the with-dh bwd variant OOMs the 16 MB scoped VMEM when compiled
    # standalone at this shape; it is no longer used by the engines)


if __name__ == "__main__":
    main()
