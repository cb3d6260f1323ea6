#!/usr/bin/env python
"""Measure a reduced-VPU-op-volume ("lean") formulation of the fused
trunk+attention kernels against the production one.

Motivation (BASELINE.md round-3 attribution): the fused pair is VPU
op-COUNT bound at ~75% MXU/VPU overlap — fwd 15.0 ms (MXU ideal ~4.2),
bwd 34.3 ms (MXU ideal ~21). The only unexplored lever is reducing the
mask/mult/cast VOLUME of the elementwise chains. The lean formulation
folds relu + dropout-keep + the 1/(1-p) scale into ONE {0, scale} mask
per tensor, built once from the SAME PRNG draws:

  mzx = where((z > 0) & (bits_x >= thresh), scale_c, 0)   # (N, L1)
  xc  = z.astype(bf16) * mzx        # replaces max/cast/2-mult chain
  dz  = dx * mzx                    # replaces 3-mult chain in the bwd
  ka  = where(bits_a >= thresh, scale_c, 0)               # (N, D)
  a_eff = a * ka                    # replaces a * keep_a * scale_c

Numerics: for kept elements the product sequences are IEEE-identical
(multiplying by exact 1.0 is the identity; {0, scale_c} masks hit the
same scale_c rounding), so the lean FWD is bitwise-equal to production.
The lean BWD's trunk recompute xc = round_bf16(z) * scale_c actually
matches the forward's value exactly, where the production bwd computes
round_bf16(z * scale_f32) — a last-ulp difference the docstrings note as
remat-in-bf16. Gradients shift only through that xc rounding.

All timings: jitted on-device fori_loop with a scalar carry (CLAUDE.md).
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
DROP = 0.25


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert jax.default_backend() == "tpu"

    # python int at closure scope; materialized INSIDE each kernel body
    # (a captured device array trips pallas 'captures constants')
    thresh_i = min(2**32 - 1, int(DROP * 2**32))
    scale = 1.0 / (1.0 - DROP)

    def draw_bits(seed, shape):
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)

    # ---------------- forward kernels ----------------
    def make_fwd(lean):
        def kernel(h_ref, wf_ref, bf_ref, wa_ref, ba_ref, wb_ref, bb_ref,
                   wc_ref, bc_ref, mask_ref, seed_ref, m_ref, p_ref, s_ref):
            h = h_ref[0]
            thresh = jnp.uint32(thresh_i)
            z = jnp.dot(h, wf_ref[:].astype(h.dtype),
                        preferred_element_type=jnp.float32) + bf_ref[0]
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
            bits_x = draw_bits(None, z.shape)
            bits_a = draw_bits(None, (z.shape[0], D))
            bits_b = draw_bits(None, (z.shape[0], D))
            scale_c = jnp.asarray(scale, jnp.float32).astype(h.dtype)
            zero = jnp.asarray(0.0, h.dtype)
            if lean:
                # 32-bit-domain select + single cast: Mosaic refuses the
                # i1 (8,128)->(16,128) relayout a bf16 select off a
                # 32-bit compare needs (production formulation, round 4)
                mzx = jnp.where((z > 0) & (bits_x >= thresh),
                                jnp.float32(scale), jnp.float32(0.0)
                                ).astype(h.dtype)
                xc = z.astype(h.dtype) * mzx
            else:
                keep_x = (bits_x >= thresh).astype(h.dtype)
                x = jnp.maximum(z, 0.0).astype(h.dtype)
                xc = x * keep_x * scale_c
            a = jnp.tanh(
                jnp.dot(xc, wa_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + ba_ref[0]
            ).astype(h.dtype)
            g = jax.nn.sigmoid(
                jnp.dot(xc, wb_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            ).astype(h.dtype)
            if lean:
                ka = jnp.where(bits_a >= thresh, jnp.float32(scale),
                               jnp.float32(0.0)).astype(h.dtype)
                kb = jnp.where(bits_b >= thresh, jnp.float32(scale),
                               jnp.float32(0.0)).astype(h.dtype)
                a = a * ka
                g = g * kb
            else:
                keep_a = (bits_a >= thresh).astype(h.dtype)
                keep_b = (bits_b >= thresh).astype(h.dtype)
                a = a * keep_a * scale_c
                g = g * keep_b * scale_c
            u = a * g
            s = jnp.dot(u, wc_ref[:].astype(u.dtype),
                        preferred_element_type=jnp.float32)[:, 0] + bc_ref[0, 0]
            s_ref[0, 0] = s
            sm = jnp.where(mask_ref[0, 0], s, -jnp.inf)
            sm = sm - jnp.max(sm)
            e = jnp.exp(sm)
            p = e / jnp.sum(e)
            p_ref[0, 0] = p
            m_ref[0, 0] = jnp.dot(p.reshape(1, -1).astype(xc.dtype), xc,
                                  preferred_element_type=jnp.float32)[0]

        return kernel

    def run_fwd(kernel):
        def call(h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed):
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
                    pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, L1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((B, 1, L1), jnp.float32),
                    jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
                    jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
                ],
            )(h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed)
        return call

    # ---------------- backward kernels ----------------
    # variant: 'full' (production pre-lean), 'lean' (folded {0,scale}
    # masks), 'lean2' (lean + f32 dx assembly: the three bf16 casts on the
    # dx chain become one; costs ~2 MB more live VMEM — affordable only
    # because lean freed relu_pos/keep_x/x-f32)
    def make_bwd(variant):
        lean = variant in ("lean", "lean2")
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
            thresh = jnp.uint32(thresh_i)
            p = p_ref[0, 0]
            gm = gm_ref[0, 0]
            mask = mask_ref[0, 0]

            z = jnp.dot(h, wf_ref[:].astype(h.dtype),
                        preferred_element_type=jnp.float32) + bf_ref[0]
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
            bits_x = draw_bits(None, z.shape)
            bits_a = draw_bits(None, (z.shape[0], D))
            bits_b = draw_bits(None, (z.shape[0], D))
            scale_c = jnp.asarray(scale, jnp.float32).astype(h.dtype)
            zero = jnp.asarray(0.0, h.dtype)
            if lean:
                mzx = jnp.where((z > 0) & (bits_x >= thresh),
                                jnp.float32(scale), jnp.float32(0.0)
                                ).astype(h.dtype)
                xc = z.astype(h.dtype) * mzx
                ka = jnp.where(bits_a >= thresh, jnp.float32(scale),
                               jnp.float32(0.0)).astype(h.dtype)
                kb = jnp.where(bits_b >= thresh, jnp.float32(scale),
                               jnp.float32(0.0)).astype(h.dtype)
            else:
                relu_pos = (z > 0).astype(h.dtype)
                keep_x = (bits_x >= thresh).astype(h.dtype)
                keep_a = (bits_a >= thresh).astype(h.dtype)
                keep_b = (bits_b >= thresh).astype(h.dtype)
                x = jnp.maximum(z, 0.0)
                x = x * keep_x * scale
                xc = x.astype(h.dtype)
            a = jnp.tanh(
                jnp.dot(xc, wa_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + ba_ref[0]
            ).astype(h.dtype)
            g = jax.nn.sigmoid(
                jnp.dot(xc, wb_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            ).astype(h.dtype)
            if lean:
                a_eff = a * ka
                g_eff = g * kb
            else:
                a_eff = a * keep_a * scale_c
                g_eff = g * keep_b * scale_c
            u = a_eff * g_eff

            dp = jnp.dot(xc, gm.reshape(-1, 1).astype(xc.dtype),
                         preferred_element_type=jnp.float32)[:, 0]
            dp = dp + gp_ref[0, 0]
            ds = p * (dp - jnp.sum(p * dp))
            ds = jnp.where(mask, ds, 0.0) + gs_ref[0, 0]

            dbc_ref[:] += jnp.sum(ds).reshape(1, 1)
            dwc_ref[:] += jnp.dot(u.T, ds.reshape(-1, 1).astype(h.dtype),
                                  preferred_element_type=jnp.float32)
            du = (ds.reshape(-1, 1).astype(h.dtype)
                  * wc_ref[:].reshape(1, -1).astype(h.dtype))
            da_eff = du * g_eff
            dg_eff = du * a_eff
            if lean:
                da = da_eff * ka
                dg = dg_eff * kb
            else:
                da = da_eff * keep_a * scale_c
                dg = dg_eff * keep_b * scale_c
            one = jnp.asarray(1.0, h.dtype)
            dza = da * (one - a * a)
            dzb = dg * g * (one - g)
            dwb_ref[:] += jnp.dot(xc.T, dzb,
                                  preferred_element_type=jnp.float32)
            dbb_ref[0] += jnp.sum(dzb.astype(jnp.float32), axis=0)
            dwa_ref[:] += jnp.dot(xc.T, dza,
                                  preferred_element_type=jnp.float32)
            dba_ref[0] += jnp.sum(dza.astype(jnp.float32), axis=0)

            if variant == "lean2":
                dx32 = (
                    p.reshape(-1, 1) * gm.reshape(1, -1)
                    + jnp.dot(dza, wa_ref[:].T.astype(xc.dtype),
                              preferred_element_type=jnp.float32)
                )
                dx32 = dx32 + jnp.dot(dzb, wb_ref[:].T.astype(xc.dtype),
                                      preferred_element_type=jnp.float32)
                dz = dx32.astype(h.dtype) * mzx
            else:
                dx = (
                    (p.reshape(-1, 1) * gm.reshape(1, -1)).astype(h.dtype)
                    + jnp.dot(dza.astype(xc.dtype), wa_ref[:].T.astype(xc.dtype),
                              preferred_element_type=jnp.float32).astype(h.dtype)
                )
                dx = dx + jnp.dot(dzb.astype(xc.dtype), wb_ref[:].T.astype(xc.dtype),
                                  preferred_element_type=jnp.float32).astype(h.dtype)
                if lean:
                    dz = dx * mzx
                else:
                    dx = dx * keep_x * scale_c
                    dz = dx * relu_pos
            dwf_ref[:] += jnp.dot(h.T, dz, preferred_element_type=jnp.float32)
            dbf_ref[0] += jnp.sum(dz.astype(jnp.float32), axis=0)

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
    bc = jnp.zeros((1, 1), jnp.float32)
    mask = jnp.ones((B, 1, N), bool)
    seed = jnp.full((1, 1), 7, jnp.int32)
    p = jnp.full((B, 1, N), 1.0 / N, jnp.float32)
    gm = jnp.asarray(rng.normal(size=(B, 1, L1)) * 0.1, jnp.float32)
    gp = jnp.zeros((B, 1, N), jnp.float32)
    gs = jnp.zeros((B, 1, N), jnp.float32)

    fargs = (h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed)
    bargs = (h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs)

    def timed(call, args, feed=0):
        def loop(*a):
            def body(i, acc):
                a2 = list(a)
                a2[feed] = a[feed] + (acc * 1e-30).astype(a[feed].dtype)
                outs = call(*a2)
                return acc + outs[0].reshape(-1)[0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        f = jax.jit(loop)
        r = f(*args)
        float(r)
        t0 = time.perf_counter()
        float(f(*args))
        return (time.perf_counter() - t0) / K * 1000

    fwd_full = run_fwd(make_fwd(False))
    fwd_lean = run_fwd(make_fwd(True))
    bwd_full = run_bwd(make_bwd("full"))
    bwd_lean = run_bwd(make_bwd("lean"))
    bwd_lean2 = run_bwd(make_bwd("lean2"))

    # numerics first (the compiled programs are then reused by the timers)
    of = jax.jit(fwd_full)(*fargs)
    ol = jax.jit(fwd_lean)(*fargs)
    print("fwd lean-vs-full max|diff| (expect 0):",
          [float(jnp.max(jnp.abs(x - y))) for x, y in zip(of, ol)],
          flush=True)
    # the 'full' (pre-lean) bwd reconstruction keeps f32 relu_pos/keep_x
    # extras the production kernel never materialized — it can exceed the
    # 16 MB scoped-VMEM budget (measured: 16.05M, +53K over). Numerics and
    # timing then fall back to lean as the reference.
    try:
        obf = jax.jit(bwd_full)(*bargs)
    except Exception as e:
        print(f"bwd full FAILED ({type(e).__name__}) — comparing lean2 "
              f"against lean instead", flush=True)
        bwd_full, obf = None, jax.jit(bwd_lean)(*bargs)
    names = ["dwf", "dbf", "dwa", "dba", "dwb", "dbb", "dwc", "dbc"]
    for tag, call in [("lean", bwd_lean), ("lean2", bwd_lean2)]:
        try:
            ob = jax.jit(call)(*bargs)
        except Exception as e:  # VMEM overflow etc — report, keep going
            print(f"bwd {tag} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"bwd {tag}-vs-reference rel diff (expect ~1e-3 from xc remat ulp):")
        for nm, x, y in zip(names, obf, ob):
            denom = float(jnp.max(jnp.abs(x))) or 1.0
            print(f"  {nm}: {float(jnp.max(jnp.abs(x - y))) / denom:.3e}")

    print(f"\ntimings, ({B}, {N}, {FIN}) bf16, {K} iters/program", flush=True)
    for tag, call, args, feed in [
        ("fwd full ", fwd_full, fargs, 0),
        ("fwd lean ", fwd_lean, fargs, 0),
        ("bwd full ", bwd_full, bargs, 11),
        ("bwd lean ", bwd_lean, bargs, 11),
        ("bwd lean2", bwd_lean2, bargs, 11),
    ]:
        if call is None:
            print(f"  {tag}: SKIPPED (did not compile)", flush=True)
            continue
        try:
            print(f"  {tag}: {timed(call, args, feed=feed):7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"  {tag}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
