#!/usr/bin/env python
"""Attribute the slide-grouped compaction kernel's time (post-DMA-cut).

Grouping the window DMA (dbg_compact_grouped.py) exposed the kernel's
compute side, and the r5 gate removal (dbg_grouped_gate.py) cut it to
6.00 ms at g=4 vs a ~4.3 ms memory floor. Standalone variants of the
grouped NO-GATE production formulation isolate where the residual
~1.7 ms goes:

  full       the production grouped formulation (g=4, band, tile=128)
  dmafloor   chunk DMA + output write only — the grouped memory floor
  normw      slab product STORED, not accumulated (wrong result; removes
             the output-block RMW's read half)
  noonehot   a CONSTANT one-hot reused for every tile (wrong result;
             removes the per-tile compare/cast VPU volume, keeps MXU+RMW)
  leanoh     compare rebased on the ranks row (ranks - base_al) instead of
             the (slab, tile) iota add — was a wash when DMA-bound
  chunk16    whole-window chunks (16 tiles): fewest grid steps; VMEM =
             2x4 MB out block + 2x2 MB chunks (may not compile)

Timings: jitted on-device fori_loop (CLAUDE.md); result-preserving
variants are cross-checked bitwise against the XLA golden on hardware.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

S, REPEAT, NMAX, D, FEAT = 128, 12, 2048, 512, 1024
B = S * REPEAT
TILE, GROUP = 128, 4
K = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import murcl_tpu.ops.compact_pallas as cp

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.normal(size=(64 * NMAX + NMAX, D)) * 0.3,
                       jnp.bfloat16)
    offs_s = rng.integers(0, 64, size=S).astype(np.int32) * NMAX
    offs = jnp.asarray(np.tile(offs_s, REPEAT))
    sel = rng.random((B, NMAX)) < (FEAT / NMAX)
    ranks_np = np.where(sel, np.cumsum(sel, axis=1) - 1, -1)
    ranks_np = np.where(ranks_np >= FEAT, -1, ranks_np)
    ranks = jnp.asarray(ranks_np, jnp.int32)
    nump = jnp.full((B,), NMAX, jnp.int32)

    slab = TILE + 128
    n_tiles = NMAX // TILE
    b_slides = S
    rg = REPEAT // GROUP

    def make_kernel(mode, chunk_tiles):
        chunk = chunk_tiles * TILE
        n_chunks = -(-n_tiles // chunk_tiles)

        def kernel(offs8_ref, nump_ref, ranks_ref, feats_hbm, out_ref,
                   rows_buf, base_ref, sems):
            gi = pl.program_id(0)
            c = pl.program_id(1)
            ng = pl.num_programs(0)
            li = gi * n_chunks + c
            slot = jax.lax.rem(li, 2)

            def flat0(g):
                go = jax.lax.div(g, b_slides)
                s = jax.lax.rem(g, b_slides)
                return go * (GROUP * b_slides) + s

            def dma(g, ch, sl):
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(offs8_ref[flat0(g)] * 8 + ch * chunk,
                                       chunk), :],
                    rows_buf.at[sl], sems.at[sl],
                )

            @pl.when(li == 0)
            def _():
                dma(0, 0, 0).start()

            nxt_g = jax.lax.div(li + 1, n_chunks)
            nxt_c = jax.lax.rem(li + 1, n_chunks)

            @pl.when(nxt_g < ng)
            def _():
                dma(nxt_g, nxt_c, jax.lax.rem(li + 1, 2)).start()

            @pl.when(c == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)
                for j in range(GROUP):
                    base_ref[j, 0] = 0

            dma(gi, c, slot).wait()
            if mode == "dmafloor":
                @pl.when(c == 0)
                def _():
                    for j in range(GROUP):
                        out_ref[0, j, 0] = rows_buf[slot, :FEAT, :]
                return

            iota_s = jax.lax.broadcasted_iota(jnp.int32, (slab, TILE), 0)
            const_oh = (iota_s < 1).astype(rows_buf.dtype)  # noonehot reuse
            # No per-tile liveness gate: matches the r5 production
            # formulation (ragged_gate off below the Nmax>=4096 threshold;
            # the gate measured as 2.8 ms of branch stalls,
            # scripts/dbg_grouped_gate.py). Every tile here is live anyway
            # (NMAX % chunk == 0 at this shape).
            for j in range(GROUP):
                for k in range(chunk_tiles):
                    tile_start = c * chunk + k * TILE
                    ranks_t = ranks_ref[0, j, 0, :, pl.ds(tile_start, TILE)]
                    rows_t = rows_buf[slot, k * TILE:(k + 1) * TILE, :]
                    base = base_ref[j, 0]
                    base_al = jnp.minimum((base // 128) * 128,
                                          jnp.int32(FEAT - slab))
                    start = pl.multiple_of(base_al, 128)
                    if mode == "noonehot":
                        oh = const_oh
                    elif mode == "leanoh":
                        oh = (iota_s == (ranks_t - base_al)).astype(
                            rows_buf.dtype)
                    else:
                        oh = (iota_s + base_al == ranks_t).astype(
                            rows_buf.dtype)
                    prod = jnp.dot(oh, rows_t,
                                   preferred_element_type=jnp.float32)
                    if mode == "normw":
                        out_ref[0, j, 0, pl.ds(start, slab), :] = \
                            prod.astype(out_ref.dtype)
                    else:
                        out_ref[0, j, 0, pl.ds(start, slab), :] += \
                            prod.astype(out_ref.dtype)
                    base_ref[j, 0] = base + jnp.sum(
                        (ranks_t >= 0).astype(jnp.int32))

        return kernel, n_chunks

    def build(mode, chunk_tiles=8):
        kernel, n_chunks = make_kernel(mode, chunk_tiles)

        def im(gi, c, offs, nump):
            return (gi // b_slides, 0, gi % b_slides, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rg * b_slides, n_chunks),
            in_specs=[
                pl.BlockSpec((1, GROUP, 1, 1, NMAX), im,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, GROUP, 1, FEAT, D), im,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_tiles * TILE, D), bank.dtype),
                pltpu.SMEM((GROUP, 1), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def fn(r):
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (rg, GROUP, b_slides, FEAT, D), bank.dtype),
            )(offs // 8, nump, r.reshape(rg, GROUP, b_slides, 1, NMAX), bank)
            return out.reshape(B, FEAT, D)

        return fn

    def loop(fn):
        def run(r):
            def body(_, acc):
                bump = jnp.where(acc > 1e30, jnp.int32(1), jnp.int32(0))
                out = fn(r + bump)
                return acc + out[0, 0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        return jax.jit(run)

    def timed(f):
        float(f(ranks))
        t0 = time.perf_counter()
        float(f(ranks))
        return (time.perf_counter() - t0) / K * 1000

    want = np.asarray(cp.gather_compact_xla(bank, offs[:8], ranks[:8], FEAT))

    prod = lambda r: cp.gather_compact(bank, offs, r, FEAT,
                                       num_patches=nump, variant="tiled",
                                       band="on", tile=TILE, repeat=REPEAT,
                                       group=GROUP)
    got = np.asarray(prod(ranks)[:8])
    assert np.array_equal(got, want)
    print(f"production grouped g=4 : {timed(loop(prod)):7.2f} ms   golden-exact")

    cases = [("full", 8), ("dmafloor", 8), ("normw", 8), ("noonehot", 8),
             ("leanoh", 8), ("chunk16", 16)]
    for mode, ct in cases:
        kmode = "full" if mode == "chunk16" else mode
        try:
            fn = build(kmode, chunk_tiles=ct)
            note = ""
            if kmode in ("full", "leanoh"):
                got = np.asarray(fn(ranks)[:8])
                ok = np.array_equal(got, want)
                note = f"   golden-exact: {ok}"
                assert ok, f"{mode} diverged"
            ms = timed(loop(fn))
            print(f"{mode:22s} : {ms:7.2f} ms{note}")
        except Exception as e:
            print(f"{mode:22s} : FAILED ({type(e).__name__}: {str(e)[:140]})")


if __name__ == "__main__":
    main()
