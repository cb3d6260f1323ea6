#!/usr/bin/env python
"""Ablate the fused trunk+attention BACKWARD kernel to attribute its time.

Round-3 finding (scripts/dbg_gate_math.py): swapping tanh/sigmoid for
cheap rationals is perf-neutral, so the bwd's ~33 ms (vs ~10 ideal
matmul-bound) is NOT transcendental. This times the bwd kernel DIRECTLY
(no fwd in the loop) and ablated copies with pieces removed:

  full        production kernel (dropout 0.25, need_dh=False)
  nodrop      dropout=0 (PRNG generation + 5 mask-multiply chains gone)
  nowgrad     weight-grad accumulations skipped (the x.T @ dz reverse
              contractions for dwf/dwa/dwb — MXU work with transposed
              operands + revisited f32 accumulators)
  nodx        dx/dz trunk-backward chain skipped (2 reverse matmuls +
              elementwise; keeps weight grads)
  recompute   only the forward-replay part (trunk+gates+u, dwc/dbc) —
              the floor any recompute-based bwd pays

All timings: jitted on-device fori_loop, scalar result (CLAUDE.md).
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from murcl_tpu.ops.attention_pallas import _dropout_masks_trunk

    assert jax.default_backend() == "tpu"

    def make_kernel(dropout, wgrad=True, dx_chain=True, full=True):
        def kernel(h_ref, wf_ref, bf_ref, wa_ref, ba_ref, wb_ref, bb_ref,
                   wc_ref, mask_ref, seed_ref, p_ref, gm_ref, gp_ref, gs_ref,
                   dwf_ref, dbf_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
                   dwc_ref, dbc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                dwf_ref[:] = jnp.zeros_like(dwf_ref)
                dbf_ref[:] = jnp.zeros_like(dbf_ref)
                dwa_ref[:] = jnp.zeros_like(dwa_ref)
                dba_ref[:] = jnp.zeros_like(dba_ref)
                dwb_ref[:] = jnp.zeros_like(dwb_ref)
                dbb_ref[:] = jnp.zeros_like(dbb_ref)
                dwc_ref[:] = jnp.zeros_like(dwc_ref)
                dbc_ref[:] = jnp.zeros_like(dbc_ref)

            h = h_ref[0]
            p = p_ref[0, 0]
            gm = gm_ref[0, 0]
            mask = mask_ref[0, 0]

            z = jnp.dot(h, wf_ref[:].astype(h.dtype),
                        preferred_element_type=jnp.float32) + bf_ref[0]
            relu_pos = (z > 0).astype(h.dtype)
            x = jnp.maximum(z, 0.0)
            if dropout > 0:
                keep_x, keep_a, keep_b, scale = _dropout_masks_trunk(
                    seed_ref[0, 0], dropout, x.shape, (x.shape[0], D), True,
                    dtype=h.dtype)
                x = x * keep_x * scale
            else:
                keep_x = keep_a = keep_b = None
                scale = 1.0
            xc = x.astype(h.dtype)
            a = jnp.tanh(
                jnp.dot(xc, wa_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + ba_ref[0]
            ).astype(h.dtype)
            g = jax.nn.sigmoid(
                jnp.dot(xc, wb_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            ).astype(h.dtype)
            scale_c = jnp.asarray(scale, jnp.float32).astype(h.dtype)
            if dropout > 0:
                a_eff = a * keep_a * scale_c
                g_eff = g * keep_b * scale_c
            else:
                a_eff, g_eff = a, g
            u = a_eff * g_eff

            dp = jnp.dot(xc, gm.reshape(-1, 1).astype(xc.dtype),
                         preferred_element_type=jnp.float32)[:, 0]
            dp = dp + gp_ref[0, 0]
            ds = p * (dp - jnp.sum(p * dp))
            ds = jnp.where(mask, ds, 0.0) + gs_ref[0, 0]

            dbc_ref[:] += jnp.sum(ds).reshape(1, 1)
            dwc_ref[:] += jnp.dot(u.T, ds.reshape(-1, 1).astype(h.dtype),
                                  preferred_element_type=jnp.float32)
            if not full:
                return
            du = (ds.reshape(-1, 1).astype(h.dtype)
                  * wc_ref[:].reshape(1, -1).astype(h.dtype))
            da_eff = du * g_eff
            dg_eff = du * a_eff
            if dropout > 0:
                da = da_eff * keep_a * scale_c
                dg = dg_eff * keep_b * scale_c
            else:
                da, dg = da_eff, dg_eff
            one = jnp.asarray(1.0, h.dtype)
            dza = da * (one - a * a)
            dzb = dg * g * (one - g)
            # bias sums run in every variant: they keep dza/dzb (and below,
            # dz) alive under Mosaic DCE when the big transposed matmuls
            # are ablated, at negligible cost
            dbb_ref[0] += jnp.sum(dzb.astype(jnp.float32), axis=0)
            dba_ref[0] += jnp.sum(dza.astype(jnp.float32), axis=0)
            if wgrad:
                dwb_ref[:] += jnp.dot(xc.T, dzb,
                                      preferred_element_type=jnp.float32)
                dwa_ref[:] += jnp.dot(xc.T, dza,
                                      preferred_element_type=jnp.float32)

            if dx_chain:
                dx = (
                    (p.reshape(-1, 1) * gm.reshape(1, -1)).astype(h.dtype)
                    + jnp.dot(dza.astype(xc.dtype), wa_ref[:].T.astype(xc.dtype),
                              preferred_element_type=jnp.float32).astype(h.dtype)
                )
                dx = dx + jnp.dot(dzb.astype(xc.dtype), wb_ref[:].T.astype(xc.dtype),
                                  preferred_element_type=jnp.float32).astype(h.dtype)
                if dropout > 0:
                    dx = dx * keep_x * scale_c
                dz = dx * relu_pos
                dbf_ref[0] += jnp.sum(dz.astype(jnp.float32), axis=0)
                if wgrad:
                    dwf_ref[:] += jnp.dot(h.T, dz,
                                          preferred_element_type=jnp.float32)

        return kernel

    def run_bwd(kernel):
        def call(h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs):
            return pl.pallas_call(
                kernel,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, N, FIN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((FIN, L1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, L1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((L1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((L1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, L1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((FIN, L1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, L1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((L1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((L1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((FIN, L1), jnp.float32),
                    jax.ShapeDtypeStruct((1, L1), jnp.float32),
                    jax.ShapeDtypeStruct((L1, D), jnp.float32),
                    jax.ShapeDtypeStruct((1, D), jnp.float32),
                    jax.ShapeDtypeStruct((L1, D), jnp.float32),
                    jax.ShapeDtypeStruct((1, D), jnp.float32),
                    jax.ShapeDtypeStruct((D, 1), jnp.float32),
                    jax.ShapeDtypeStruct((1, 1), jnp.float32),
                ],
            )(h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs)
        return call

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, N, FIN)) * 0.3, jnp.bfloat16)
    wf = jnp.asarray(rng.normal(size=(FIN, L1)) * 0.05, jnp.float32)
    bf = jnp.zeros((1, L1), jnp.float32)
    wa = jnp.asarray(rng.normal(size=(L1, D)) * 0.05, jnp.float32)
    ba = jnp.zeros((1, D), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(L1, D)) * 0.05, jnp.float32)
    bb = jnp.zeros((1, D), jnp.float32)
    wc = jnp.asarray(rng.normal(size=(D, 1)) * 0.05, jnp.float32)
    mask = jnp.ones((B, 1, N), bool)
    seed = jnp.full((1, 1), 7, jnp.int32)
    p = jnp.full((B, 1, N), 1.0 / N, jnp.float32)
    gm = jnp.asarray(rng.normal(size=(B, 1, L1)) * 0.1, jnp.float32)
    gp = jnp.zeros((B, 1, N), jnp.float32)
    gs = jnp.zeros((B, 1, N), jnp.float32)
    args = (h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs)

    def timed(call):
        def loop(*a):
            def body(i, acc):
                # data dependence on the carry: stops XLA hoisting the
                # loop-invariant pallas_call out of the loop
                gm_i = a[11] + acc * 1e-30
                outs = call(*a[:11], gm_i, *a[12:])
                return acc + outs[0][0, 0] * 1e-20
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        f = jax.jit(loop)
        r = f(*args)
        float(r)
        t0 = time.perf_counter()
        float(f(*args))
        return (time.perf_counter() - t0) / K * 1000

    variants = [
        ("full      ", make_kernel(0.25)),
        ("nodrop    ", make_kernel(0.0)),
        ("nowgrad   ", make_kernel(0.25, wgrad=False)),
        ("nodx      ", make_kernel(0.25, dx_chain=False)),
        ("recompute ", make_kernel(0.25, full=False)),
    ]
    print(f"bwd kernel ablation, ({B}, {N}, {FIN}) bf16, {K} iters/program")
    for name, k in variants:
        print(f"  {name}: {timed(run_bwd(k)):7.2f} ms")


if __name__ == "__main__":
    main()
