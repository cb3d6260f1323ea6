#!/usr/bin/env python
"""A/B the per-tile ragged gate at the TCGA shape (production dispatch).

Round-5: removing the per-tile ``tile_start < nump`` pl.when won 2.8 ms at
the canonical shape (uniform 2048-patch slides — the gate never skips
anything there, scripts/dbg_grouped_gate.py), but the TCGA bench read
12.82 -> 12.21 after the removal. At TCGA (3k-10240 patches, Nmax 10240)
the trade has both sides: the gate pays its branch cost on every LIVE tile
(~nump/128 per bag) but skips the dead tiles of each bag's LAST live chunk
(~chunk_tiles/2 per bag of pure one-hot/matmul waste). This times the
production grouped dispatch with ``ragged_gate`` on vs off at exactly the
bench regime — a static jit key, so the two programs are distinct
(CLAUDE.md measurement rule).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

S, REPEAT, D, FEAT = 128, 12, 512, 1024  # batched stage-1: T*2 = 12
NUM_SLIDES, NMAX = 24, 10240
B = S * REPEAT
K_ITER = 20


def main():
    import jax
    import jax.numpy as jnp

    import murcl_tpu.ops.compact_pallas as cp

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    # 24 ragged slides laid out 8-aligned in one bank (bench_tcga regime)
    numps, offs_slide = [], []
    off = 0
    for _ in range(NUM_SLIDES):
        n = int(rng.integers(3000, NMAX + 1))
        numps.append(n)
        offs_slide.append(off)
        off += -(-n // 8) * 8
    bank = jnp.asarray(rng.normal(size=(off + NMAX, D)) * 0.3, jnp.bfloat16)

    slots = rng.integers(0, NUM_SLIDES, size=S)
    offs_s = np.asarray([offs_slide[s] for s in slots], np.int32)
    nump_s = np.asarray([numps[s] for s in slots], np.int32)
    offs = jnp.asarray(np.tile(offs_s, REPEAT))
    nump = jnp.asarray(np.tile(nump_s, REPEAT))

    # ranks: ~FEAT selected rows in [0, nump), -1 elsewhere (incl. >= nump)
    pos = np.arange(NMAX)[None, :]
    nall = np.tile(nump_s, REPEAT)[:, None]
    sel = (rng.random((B, NMAX)) < (FEAT / nall)) & (pos < nall)
    ranks_np = np.where(sel, np.cumsum(sel, axis=1) - 1, -1)
    ranks_np = np.where(ranks_np >= FEAT, -1, ranks_np)
    ranks = jnp.asarray(ranks_np, jnp.int32)

    def run(gatemode):
        return lambda r: cp.gather_compact(
            bank, offs, r, FEAT, num_patches=nump, variant="tiled",
            band="on", repeat=REPEAT, ragged_gate=gatemode)

    def loop(fn):
        def go(r):
            def body(_, acc):
                bump = jnp.where(acc > 1e30, jnp.int32(1), jnp.int32(0))
                out = fn(r + bump)
                return acc + out[0, 0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, K_ITER, body, jnp.float32(0.0))
        return jax.jit(go)

    def timed(f):
        float(f(ranks))
        t0 = time.perf_counter()
        float(f(ranks))
        return (time.perf_counter() - t0) / K_ITER * 1000

    want = np.asarray(cp.gather_compact_xla(bank, offs[:8], ranks[:8], FEAT))
    for mode in ("off", "on"):
        got = np.asarray(run(mode)(ranks)[:8])
        ok = np.array_equal(got, want)
        ms = timed(loop(run(mode)))
        print(f"ragged_gate={mode:3s} : {ms:7.2f} ms   golden-exact: {ok}")
        assert ok


if __name__ == "__main__":
    main()
