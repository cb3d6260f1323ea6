#!/usr/bin/env python
"""Isolate true on-device time of the tiled attention kernel vs XLA.

Wraps each implementation in ONE jitted program that runs the op K times
with a data dependence (so XLA cannot elide iterations), then times the
whole program — tunnel dispatch cost is paid once, not per call.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import jax
import jax.numpy as jnp
import numpy as np

from murcl_tpu.ops.attention_pallas import (
    _fwd_tiled_pallas,
    attention_pool_tiled,
    gated_attention_pool_xla,
)

K = 20
N, F, D = 10240, 512, 256


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    x = jnp.asarray(rng.normal(size=(1, N, F)), dtype)
    wa = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32) * 0.1)
    ba = jnp.zeros((D,))
    wb = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32) * 0.1)
    bb = jnp.zeros((D,))
    wc = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    bc = jnp.float32(0.0)
    mask = jnp.asarray(np.arange(N)[None, :] < 9970)

    def loop(fn):
        def run(x):
            def body(i, carry):
                m, _, _ = fn(carry)
                # data dependence: perturb input by the pooled output's mean
                return carry + (jnp.mean(m) * 1e-9).astype(carry.dtype)
            return jax.lax.fori_loop(0, K, body, x)
        return jax.jit(run)

    for tile in (512, 1024, 2048):
        f_tiled = loop(lambda x_, t=tile: attention_pool_tiled(
            x_, wa, ba, wb, bb, wc, bc, mask=mask, gated=True, tile=t))
        r = f_tiled(x)
        float(r[0, 0, 0])  # force through the tunnel
        t0 = time.perf_counter()
        r = f_tiled(x)
        float(r[0, 0, 0])
        dt = (time.perf_counter() - t0) / K
        print(f"tiled tile={tile}: {dt*1000:.2f} ms/call")

    f_xla = loop(lambda x_: gated_attention_pool_xla(
        x_, wa, ba, wb, bb, wc, bc, mask=mask))
    r = f_xla(x)
    float(r[0, 0, 0])
    t0 = time.perf_counter()
    r = f_xla(x)
    float(r[0, 0, 0])
    dt = (time.perf_counter() - t0) / K
    print(f"xla: {dt*1000:.2f} ms/call")


if __name__ == "__main__":
    main()
