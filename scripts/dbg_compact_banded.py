#!/usr/bin/env python
"""Time banded vs full one-hot compaction kernels at the canonical shape.

The banded path anchors a (tile+128, tile) one-hot slab at the running
kept-count (ranks are monotone in bank-row order), cutting the per-tile
MXU contraction 2.7x at feat=1024/tile=256. Variants are selected with
``gather_compact(..., variant=..., band=...)`` — both are STATIC jit keys,
so every line below is a distinct compiled program (the original version
of this script monkeypatched ``_banded_slab`` under ``@jax.jit`` and timed
the trace-cache hit of the first program twice; its recorded numbers were
meaningless). Timed as jitted on-device loops (CLAUDE.md); banded outputs
are cross-checked bitwise against the XLA golden on hardware.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import numpy as np

B, NMAX, D, FEAT = 1536, 2048, 512, 1024
K = 20


def main():
    import jax
    import jax.numpy as jnp

    import murcl_tpu.ops.compact_pallas as cp

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.normal(size=(64 * NMAX + NMAX, D)) * 0.3,
                       jnp.bfloat16)
    offs = jnp.asarray(rng.integers(0, 64, size=B) * NMAX, jnp.int32)
    # monotone ranks with ~half the rows selected, truncated at FEAT
    sel = rng.random((B, NMAX)) < (FEAT / NMAX)
    ranks_np = np.where(sel, np.cumsum(sel, axis=1) - 1, -1)
    ranks_np = np.where(ranks_np >= FEAT, -1, ranks_np)
    ranks = jnp.asarray(ranks_np, jnp.int32)
    nump = jnp.full((B,), NMAX, jnp.int32)

    def loop(fn):
        def run(ranks):
            def body(i, acc):
                # data dependence XLA cannot fold away (acc is never > 1e30)
                bump = jnp.where(acc > 1e30, jnp.int32(1), jnp.int32(0))
                out = fn(ranks + bump)
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
    for variant, band, tile in (("resident", "off", 0), ("resident", "on", 0),
                                ("resident", "on", 128),
                                ("tiled", "on", 0), ("tiled", "off", 0),
                                # tile=128 halves the slab (256 vs 384):
                                # 0.67x one-hot FLOPs/bag vs tile=256 at the
                                # same chunked DMA granularity (round 4)
                                ("tiled", "on", 128)):
        fn = lambda r: cp.gather_compact(bank, offs, r, FEAT,
                                         num_patches=nump, variant=variant,
                                         band=band, tile=tile)
        ms = timed(loop(fn))
        note = ""
        if band == "on":
            # hardware numerics for the banded (dynamic slab-store) paths;
            # band='off' residency is already smoke-covered (tpu_smoke.py)
            got = np.asarray(fn(ranks)[:4])
            ok = np.array_equal(got, want)
            note = f"   golden-exact: {ok}"
            assert ok, f"{variant}/{band} diverged from the XLA golden"
        print(f"{variant:9s} band={band:3s} tile={tile or 'auto':>4}: "
              f"{ms:7.2f} ms{note}")


if __name__ == "__main__":
    main()
