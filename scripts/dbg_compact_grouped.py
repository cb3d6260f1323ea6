#!/usr/bin/env python
"""Measure the slide-grouped compaction kernel against the plain tiled one.

The batched stage-1 layout tiles the same 128 slides T*2 = 12 times
(``engine/contrastive.py``), so the plain kernel re-reads each slide's
window 12x — and its ablation (``dbg_compact_ablate.py``) pinned the window
DMA at 91% of the kernel. ``gather_compact(..., repeat=12)`` groups
same-slide bags per grid step and shares one window DMA across the group's
one-hot contractions (``_make_kernel_grouped``); this script checks
golden-exactness ON HARDWARE and times group sizes with the jitted
on-device-loop pattern (CLAUDE.md: eager per-call timing through the
tunnel measures dispatch RPC, not kernel).

Layout mirrors the canonical bench: B = 12 * 128 bags, offsets tiled
(m, s)-major exactly like ``jnp.tile(both_ids, T)``.
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
K = 20


def main():
    import jax
    import jax.numpy as jnp

    import murcl_tpu.ops.compact_pallas as cp

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    # 64 bank windows for the 128 slide slots: DMA traffic is identical
    # (no HBM cache), and the closure-baked bank constant stays under the
    # remote-compile request limit (a 128-window bank 413s the tunnel)
    bank = jnp.asarray(rng.normal(size=(64 * NMAX + NMAX, D)) * 0.3,
                       jnp.bfloat16)
    offs_s = rng.integers(0, 64, size=S).astype(np.int32) * NMAX
    offs = jnp.asarray(np.tile(offs_s, REPEAT))  # (m, s)-major, engine layout
    sel = rng.random((B, NMAX)) < (FEAT / NMAX)
    ranks_np = np.where(sel, np.cumsum(sel, axis=1) - 1, -1)
    ranks_np = np.where(ranks_np >= FEAT, -1, ranks_np)
    ranks = jnp.asarray(ranks_np, jnp.int32)
    nump = jnp.full((B,), NMAX, jnp.int32)

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

    want = np.asarray(cp.gather_compact_xla(bank, offs[:8], ranks[:8], FEAT))

    def check(fn, label):
        got = np.asarray(fn(ranks)[:8])
        ok = np.array_equal(got, want)
        assert ok, f"{label} diverged from the XLA golden"
        return "golden-exact"

    prod = lambda r: cp.gather_compact(bank, offs, r, FEAT,
                                       num_patches=nump, variant="tiled",
                                       band="on", tile=128)
    note = check(prod, "production")
    print(f"production (ungrouped)    : {timed(loop(prod)):7.2f} ms   {note}")

    for g in (2, 3, 4, 6, 12):
        fn = (lambda g: lambda r: cp.gather_compact(
            bank, offs, r, FEAT, num_patches=nump, variant="tiled",
            band="on", tile=128, repeat=REPEAT, group=g))(g)
        try:
            note = check(fn, f"group={g}")
            ms = timed(loop(fn))
            print(f"grouped g={g:2d}              : {ms:7.2f} ms   {note}")
        except Exception as e:  # VMEM blowups expected at large g
            print(f"grouped g={g:2d}              : FAILED "
                  f"({type(e).__name__}: {str(e)[:160]})")


if __name__ == "__main__":
    main()
