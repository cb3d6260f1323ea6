#!/usr/bin/env python
"""Attribute the grouped kernel's 9.5-vs-5.9 ms gap to the ragged gating.

Round-5 finding (scripts/dbg_grouped_ablate.py): the standalone
whole-window-chunk kernel runs 5.90 ms at the canonical engine shape while
the production grouped kernel — which the auto-pick resolves to the SAME
chunk_tiles=16 — measures 9.56 ms. The only formulation differences are
the ragged-window gates (absent from the standalone):

  live(g, ch) predicates on the DMA start/wait + compute body
  the per-tile ``tile_start < nump`` predicate (nump a traced SMEM scalar)
  the ``nump = nump_ref[flat0(gi)]`` SMEM read

Variants (local copies of ``_make_kernel_grouped``; production untouched):

  prod       the production kernel through its real dispatch (auto chunk)
  copy       local verbatim copy through an identical local dispatch
             (sanity: should match prod)
  nolive     live() gates dropped (DMA always starts/waits); inner
             predicate keeps ``tile_start < nump``
  noinner    live() kept; inner predicate reduced to ``tile_start < n_max``
  nogate     both dropped — structurally the ablation's chunk16 kernel

All variants are golden-exact at full windows (dead tiles carry ranks=-1,
whose one-hot rows are zero); nolive/nogate additionally rely on the bank
over-allocation guarantee for their unconditional chunk DMA. Timings:
jitted on-device fori_loop (CLAUDE.md).
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
    chunk_tiles = 16  # what the production auto-pick resolves to here
    chunk = chunk_tiles * TILE
    n_chunks = -(-n_tiles // chunk_tiles)

    def make_kernel(use_live: bool, use_inner: bool):
        def kernel(offs8_ref, nump_ref, ranks_ref, feats_hbm, out_ref,
                   rows_buf, base_ref, sems):
            gi = pl.program_id(0)
            c = pl.program_id(1)
            ng = pl.num_programs(0)
            li = gi * n_chunks + c
            slot = jax.lax.rem(li, 2)
            nb = ng * GROUP

            def flat0(g):
                go = jax.lax.div(g, b_slides)
                s = jax.lax.rem(g, b_slides)
                return go * (GROUP * b_slides) + s

            def live(g, ch):
                if not use_live:
                    return True
                return ch * chunk < nump_ref[jnp.minimum(flat0(g), nb - 1)]

            def dma(g, ch, sl):
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(offs8_ref[flat0(g)] * 8 + ch * chunk,
                                       chunk), :],
                    rows_buf.at[sl], sems.at[sl],
                )

            def when(pred):
                # pl.when(True) confuses nothing, but keep parity with prod
                return pl.when(pred) if pred is not True else (lambda f: f())

            @when((li == 0) & live(0, 0) if use_live else (li == 0))
            def _():
                dma(0, 0, 0).start()

            nxt_g = jax.lax.div(li + 1, n_chunks)
            nxt_c = jax.lax.rem(li + 1, n_chunks)

            @when((nxt_g < ng) & live(nxt_g, nxt_c) if use_live
                  else (nxt_g < ng))
            def _():
                dma(nxt_g, nxt_c, jax.lax.rem(li + 1, 2)).start()

            @pl.when(c == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)
                for j in range(GROUP):
                    base_ref[j, 0] = 0

            def body():
                dma(gi, c, slot).wait()
                nump_s = nump_ref[flat0(gi)] if use_inner else None
                for j in range(GROUP):
                    for k in range(chunk_tiles):
                        tile_start = c * chunk + k * TILE
                        pred = tile_start < NMAX
                        if use_inner:
                            pred = (tile_start < nump_s) & pred

                        @pl.when(pred)
                        def _(tile_start=tile_start, j=j, k=k):
                            ranks_t = ranks_ref[0, j, 0, :,
                                                pl.ds(tile_start, TILE)]
                            rows_t = rows_buf[slot,
                                              k * TILE:(k + 1) * TILE, :]
                            base = base_ref[j, 0]
                            base_al = jnp.minimum((base // 128) * 128,
                                                  jnp.int32(FEAT - slab))
                            start = pl.multiple_of(base_al, 128)
                            iota_s = jax.lax.broadcasted_iota(
                                jnp.int32, (slab, TILE), 0)
                            oh = (iota_s + base_al == ranks_t).astype(
                                rows_buf.dtype)
                            out_ref[0, j, 0, pl.ds(start, slab), :] += \
                                jnp.dot(oh, rows_t,
                                        preferred_element_type=jnp.float32
                                        ).astype(out_ref.dtype)
                            base_ref[j, 0] = base + jnp.sum(
                                (ranks_t >= 0).astype(jnp.int32))

            if use_live:
                @pl.when(live(gi, c))
                def _():
                    body()
            else:
                body()

        return kernel

    def build(use_live, use_inner):
        kernel = make_kernel(use_live, use_inner)

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
                pltpu.VMEM((2, chunk, D), bank.dtype),
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
    print(f"prod (dispatch, auto chunk) : {timed(loop(prod)):7.2f} ms   golden-exact")

    for name, ul, ui in [("copy (live+inner)", True, True),
                         ("nolive (inner only)", False, True),
                         ("noinner (live only)", True, False),
                         ("nogate", False, False)]:
        fn = build(ul, ui)
        got = np.asarray(fn(ranks)[:8])
        ok = np.array_equal(got, want)
        ms = timed(loop(fn))
        print(f"{name:27s} : {ms:7.2f} ms   golden-exact: {ok}")
        assert ok, f"{name} diverged"


if __name__ == "__main__":
    main()
