#!/usr/bin/env python
"""Does Mosaic overlap INDEPENDENT MXU and VPU work inside one program?

The fused attention kernels lose ~10 ms (fwd) / ~13 ms (bwd) to VPU
elementwise that strictly alternates with MXU matmuls through per-bag data
dependencies (BASELINE.md ablations). If Mosaic's static scheduler can
overlap an independent matmul with independent elementwise work, a 2-bag
stage-interleaved kernel (bag A's gates while bag B's trunk runs) would
claw most of that back; if it serializes everything, the kernels really
are at their structural floor and no restructuring helps.

Three kernels over identical data volumes, grid=(steps,):

- ``dep``:    v = heavy_vpu(x @ W)            — forced serial (baseline)
- ``indep``:  m = x @ W ; v = heavy_vpu(y)    — schedulable in parallel
- ``mxu``:    m = x @ W                       — matmul alone
- ``vpu``:    v = heavy_vpu(y)                — elementwise alone

Verdict: overlap exists iff t(indep) << t(mxu) + t(vpu) (ideal:
max(mxu, vpu)); t(dep) should sit near the sum either way.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

N, D, STEPS, K = 1024, 512, 256, 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert jax.default_backend() == "tpu"

    R_MXU, R_VPU = 4, 8  # compute repeats so compute >> the 2 MB/step IO

    def heavy(v):
        # tanh/sigmoid chains, f32 math with a bf16 cast per round like the
        # production kernels (Mosaic rejects bf16 transcendentals: f32
        # constants broadcast into bf16 vectors fails verification)
        for _ in range(R_VPU):
            v32 = v.astype(jnp.float32)
            v = (jnp.tanh(v32) * jax.nn.sigmoid(v32)).astype(jnp.bfloat16)
        return v

    def mxu_chain(x, w):
        m = x
        for _ in range(R_MXU):
            m = jnp.dot(m, w, preferred_element_type=jnp.float32).astype(x.dtype)
        return m

    def make(mode):
        # outputs are (1, D) reductions — write traffic is negligible, so
        # the measurement is compute-bound, not pipeline/IO-bound (the
        # first version of this script wrote full blocks and every mode
        # timed the same ~4.4 ms memory floor)
        def kernel(x_ref, y_ref, w_ref, m_ref, v_ref):
            x = x_ref[0]
            y = y_ref[0]
            if mode == "dep":
                m = mxu_chain(x, w_ref[:])
                v = heavy(m)
                m_ref[0] = jnp.sum(m, axis=0).reshape(1, -1).astype(jnp.float32)
                v_ref[0] = jnp.sum(v, axis=0).reshape(1, -1).astype(jnp.float32)
            elif mode == "indep":
                m = mxu_chain(x, w_ref[:])
                v = heavy(y)
                m_ref[0] = jnp.sum(m, axis=0).reshape(1, -1).astype(jnp.float32)
                v_ref[0] = jnp.sum(v, axis=0).reshape(1, -1).astype(jnp.float32)
            elif mode == "mxu":
                m = mxu_chain(x, w_ref[:])
                m_ref[0] = jnp.sum(m, axis=0).reshape(1, -1).astype(jnp.float32)
                v_ref[0] = jnp.sum(y, axis=0).reshape(1, -1).astype(jnp.float32)
            else:  # vpu
                v = heavy(y)
                m_ref[0] = jnp.sum(x, axis=0).reshape(1, -1).astype(jnp.float32)
                v_ref[0] = jnp.sum(v, axis=0).reshape(1, -1).astype(jnp.float32)

        return kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(STEPS, N, D)) * 0.3, jnp.bfloat16)
    y = jnp.asarray(rng.normal(size=(STEPS, N, D)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.bfloat16)

    def run(mode):
        call = pl.pallas_call(
            make(mode),
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((STEPS, 1, D), jnp.float32),
                jax.ShapeDtypeStruct((STEPS, 1, D), jnp.float32),
            ],
        )

        def loop(x, y):
            def body(i, acc):
                bump = jnp.where(acc > 1e30, jnp.bfloat16(1), jnp.bfloat16(0))
                m, v = call(x + bump, y, w)
                return acc + m[0, 0, 0] * 1e-20 + v[0, 0, 0] * 1e-20
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(loop)
        float(f(x, y))
        t0 = time.perf_counter()
        float(f(x, y))
        return (time.perf_counter() - t0) / K * 1000

    t = {m: run(m) for m in ("mxu", "vpu", "dep", "indep")}
    for m, ms in t.items():
        print(f"{m:6s}: {ms:7.2f} ms")
    seq = t["mxu"] + t["vpu"]
    print(f"sum(mxu, vpu) = {seq:.2f}  max = {max(t['mxu'], t['vpu']):.2f}")
    print("verdict:",
          "OVERLAP (restructuring the fused kernels could pay)"
          if t["indep"] < 0.75 * seq else
          "NO overlap (serial issue — the kernels are at their floor)")


if __name__ == "__main__":
    main()
