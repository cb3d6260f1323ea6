#!/usr/bin/env python
"""Ablate the chunked banded compaction kernel to attribute its time.

Round-4 state: the production chunked/banded tile=128 kernel measures
9.33 ms at the canonical shape, while its pure HBM floor (window read
3.2 GB + output write 1.6 GB at ~819 GB/s) is ~5.9 ms and the banded MXU
work only ~1.3 ms. Accounting hypothesis: the f32 accumulator slab's VMEM
read-modify-write dominates the residual — per bag, n_tiles * slab * D *
4 B * (read+write) = 16 * 256 * 512 * 4 * 2 = 16.8 MB of VMEM traffic
(~25 GB/step), comparable to the whole-kernel time at VMEM bandwidth.

Variants (standalone measurement copies; production untouched):

  full      production formulation (tiled, band on, tile=128)
  dmafloor  DMA + output write only (the memory floor the kernel rides)
  normw     acc slab STORED, not accumulated (wrong result; removes the
            RMW's read half — isolates the accumulator-read cost)
  bf16acc   bf16 accumulator slab. EXACT by construction: ranks are
            unique per bag (cumsum of the keep mask, ops/select.py), so
            every output row receives its dot contribution from exactly
            ONE tile — the += only ever adds exact zeros to a written
            value, so accumulation order/precision never mixes values and
            bf16(acc) == bf16(f32 acc) bitwise. Halves RMW traffic.
  leanoh    one-hot compare rebased on the (1, tile) ranks row
            (ranks - base vs iota) instead of the (slab, tile) iota add —
            one large elementwise op fewer per tile.
  bf16lean  bf16acc + leanoh combined.

All timings: jitted on-device fori_loop with a scalar result (CLAUDE.md);
bf16acc/leanoh/bf16lean are cross-checked bitwise against the XLA golden
on hardware before timing.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

B, NMAX, D, FEAT = 1536, 2048, 512, 1024
TILE = 128
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
    offs = jnp.asarray(rng.integers(0, 64, size=B) * NMAX, jnp.int32)
    sel = rng.random((B, NMAX)) < (FEAT / NMAX)
    ranks_np = np.where(sel, np.cumsum(sel, axis=1) - 1, -1)
    ranks_np = np.where(ranks_np >= FEAT, -1, ranks_np)
    ranks = jnp.asarray(ranks_np, jnp.int32)
    nump = jnp.full((B,), NMAX, jnp.int32)

    slab = TILE + 128
    n_tiles = NMAX // TILE
    chunk = NMAX  # canonical shape fits one chunk (production auto choice)

    def make_kernel(mode):
        acc_dtype = jnp.bfloat16 if mode in ("bf16acc", "bf16lean") \
            else jnp.float32

        def kernel(offs8_ref, nump_ref, ranks_ref, feats_hbm, out_ref,
                   rows_buf, acc_ref, base_ref, sems):
            i = pl.program_id(0)
            nb = pl.num_programs(0)
            slot = jax.lax.rem(i, 2)

            def dma(bag, sl):
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(offs8_ref[bag] * 8, chunk), :],
                    rows_buf.at[sl], sems.at[sl],
                )

            @pl.when(i == 0)
            def _():
                dma(0, 0).start()

            @pl.when(i + 1 < nb)
            def _():
                dma(i + 1, jax.lax.rem(i + 1, 2)).start()

            dma(i, slot).wait()

            if mode == "dmafloor":
                out_ref[0] = rows_buf[slot, :FEAT, :]
                return

            acc_ref[:] = jnp.zeros_like(acc_ref)
            base_ref[0, 0] = 0
            nump_i = nump_ref[i]
            for t in range(n_tiles):
                @pl.when(t * TILE < nump_i)
                def _(t=t):
                    ranks_t = ranks_ref[0, :, pl.ds(t * TILE, TILE)]
                    rows_t = rows_buf[slot, t * TILE:(t + 1) * TILE, :]
                    base = base_ref[0, 0]
                    base_al = jnp.minimum((base // 128) * 128,
                                          jnp.int32(FEAT - slab))
                    start = pl.multiple_of(base_al, 128)
                    if mode in ("leanoh", "bf16lean"):
                        iota_s = jax.lax.broadcasted_iota(
                            jnp.int32, (slab, TILE), 0)
                        oh = (iota_s == (ranks_t - base_al)).astype(
                            rows_buf.dtype)
                    else:
                        iota_s = jax.lax.broadcasted_iota(
                            jnp.int32, (slab, TILE), 0)
                        oh = (iota_s + base_al == ranks_t).astype(
                            rows_buf.dtype)
                    prod = jnp.dot(oh, rows_t,
                                   preferred_element_type=jnp.float32)
                    if mode == "normw":
                        acc_ref[pl.ds(start, slab), :] = prod
                    else:
                        acc_ref[pl.ds(start, slab), :] += prod.astype(
                            acc_dtype)
                    base_ref[0, 0] = base + jnp.sum(
                        (ranks_t >= 0).astype(jnp.int32))

            out_ref[0] = acc_ref[:].astype(out_ref.dtype)

        return kernel, acc_dtype

    def build(mode):
        kernel, acc_dtype = make_kernel(mode)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1, NMAX), lambda i, offs, nump: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, FEAT, D),
                                   lambda i, offs, nump: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chunk, D), bank.dtype),
                pltpu.VMEM((FEAT, D), acc_dtype),
                pltpu.SMEM((1, 1), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def fn(r):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, FEAT, D), bank.dtype),
            )(offs // 8, nump, r.reshape(B, 1, NMAX), bank)

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
        r = f(ranks)
        float(r)
        t0 = time.perf_counter()
        float(f(ranks))
        return (time.perf_counter() - t0) / K * 1000

    want = np.asarray(cp.gather_compact_xla(bank, offs[:4], ranks[:4], FEAT))

    prod = lambda r: cp.gather_compact(bank, offs, r, FEAT,
                                       num_patches=nump, variant="tiled",
                                       band="on", tile=TILE)
    print(f"production tile={TILE}: {timed(loop(prod)):7.2f} ms")

    for mode in ("full", "dmafloor", "normw", "bf16acc", "leanoh",
                 "bf16lean"):
        fn = build(mode)
        note = ""
        if mode in ("full", "bf16acc", "leanoh", "bf16lean"):
            got = np.asarray(fn(ranks)[:4])
            ok = np.array_equal(got, want)
            note = f"   golden-exact: {ok}"
            assert ok, f"{mode} diverged from the XLA golden"
        ms = timed(loop(fn))
        print(f"{mode:9s}: {ms:7.2f} ms{note}")


if __name__ == "__main__":
    main()
