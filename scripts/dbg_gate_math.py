#!/usr/bin/env python
"""Measure exact vs relaxed-ulp (approx) gate transcendentals on TPU.

Times the fused trunk+attention kernel fwd and bwd at the canonical
batched-rollout shape (1536, 1024, 512) bf16, production dropout 0.25.
All timings are jitted on-device loops (eager per-call timing through the
tunnel measures dispatch RPC — CLAUDE.md).

Also cross-checks numerics on-device: approx vs exact pooled outputs at
dropout=0 must agree within the documented ~1e-3 bound.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

B, N, FIN, L1, D = 1536, 1024, 512, 512, 256
K = 20


def main():
    import jax
    import jax.numpy as jnp

    from murcl_tpu.ops.attention_pallas import fused_trunk_attention_pool

    assert jax.default_backend() == "tpu"
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

    def loop_fwd(gate_math, dropout):
        def run(h, seed):
            def body(i, carry):
                m, _, _ = fused_trunk_attention_pool(
                    carry, wf, bf, wa, ba, wb, bb, wc, bc, impl="pallas",
                    gated=True, dropout=dropout, seed=seed + i,
                    gate_math=gate_math)
                return carry + (jnp.mean(m) * 1e-9).astype(carry.dtype)
            out = jax.lax.fori_loop(0, K, body, h)
            # scalar result: never ship the (B, N, F) carry through the
            # tunnel (a 1.6 GB D2H over the relay dwarfs the kernel)
            return jnp.sum(out[0, 0].astype(jnp.float32))
        return jax.jit(run)

    def loop_bwd(gate_math, dropout):
        def loss(wf_, h, seed):
            m, _, _ = fused_trunk_attention_pool(
                h, wf_, bf, wa, ba, wb, bb, wc, bc, impl="pallas",
                gated=True, dropout=dropout, seed=seed, input_grad=False,
                gate_math=gate_math)
            return jnp.sum(m.astype(jnp.float32))
        g = jax.grad(loss)

        def run(h, seed):
            def body(i, carry):
                dwf = g(wf + carry, h, seed + i)
                return carry + dwf * 1e-12
            return jnp.sum(jax.lax.fori_loop(0, K, body, jnp.zeros_like(wf)))
        return jax.jit(run)

    def timed(fn, *args):
        r = fn(*args)
        float(r)  # forced scalar read (tunnel sync)
        t0 = time.perf_counter()
        r = fn(*args)
        float(r)
        return (time.perf_counter() - t0) / K * 1000

    seed = jnp.int32(7)
    print(f"shape: ({B}, {N}, {FIN}) bf16, L1={L1}, D={D}, {K} iters/program")
    for gm in ("exact", "approx"):
        print(f"fwd  drop=0.25 {gm:>6}: {timed(loop_fwd(gm, 0.25), h, seed):7.2f} ms")
    for gm in ("exact", "approx"):
        print(f"bwd  drop=0.25 {gm:>6}: {timed(loop_bwd(gm, 0.25), h, seed):7.2f} ms (incl. fwd)")

    # numerics cross-check on hardware (dropout=0: same masks trivially)
    @jax.jit
    def pair(h):
        me, _, _ = fused_trunk_attention_pool(
            h, wf, bf, wa, ba, wb, bb, wc, bc, impl="pallas", gated=True,
            gate_math="exact")
        ma, _, _ = fused_trunk_attention_pool(
            h, wf, bf, wa, ba, wb, bb, wc, bc, impl="pallas", gated=True,
            gate_math="approx")
        return jnp.max(jnp.abs(me - ma)), jnp.max(jnp.abs(me))
    err, scale = pair(h)
    print(f"max |approx - exact| pooled: {float(err):.2e} (scale {float(scale):.2e})")


if __name__ == "__main__":
    main()
