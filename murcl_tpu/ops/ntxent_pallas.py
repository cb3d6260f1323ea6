"""NT-Xent as a single-invocation Pallas kernel (fwd + custom VJP).

At MuRCL's batch (B=128 -> 2B=256 rows of 128-d projections) the whole
computation — row normalization, the (2B, 2B) similarity matrix, masked
log-sum-exp, and the positive-pair gather — fits in VMEM many times over,
so one kernel invocation does everything in a single fused pass with no
HBM round-trips between stages. The backward kernel reuses the normalized
projections and the row-softmax to emit both views' gradients.

Matches :func:`murcl_tpu.ops.ntxent.nt_xent` (the XLA reference, itself
validated against the reference torch loss) to float32 precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9
_EPS = 1e-8  # torch CosineSimilarity norm clamp


def _normalize(z):
    norms = jnp.maximum(
        jnp.sqrt(jnp.sum(z * z, axis=-1, keepdims=True)), _EPS
    )
    return z / norms, norms


def _partner_mask(n: int):
    """(n, n) bool: True at column ``(row + n/2) mod n`` (the positive pair).

    Built entirely from 2-D iotas — Mosaic's layout engine rejects the 1-D
    vector intermediates a gather/squeeze formulation produces.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    b = n // 2
    partner = jnp.where(rows < b, rows + b, rows - b)
    return cols == partner, rows == cols


def _fwd_kernel(zi_ref, zj_ref, temp_ref, loss_ref):
    z = jnp.concatenate([zi_ref[:], zj_ref[:]], axis=0).astype(jnp.float32)
    n = z.shape[0]
    zn, _ = _normalize(z)
    sim = jnp.dot(zn, zn.T, preferred_element_type=jnp.float32) / temp_ref[0, 0]
    pos_mask, eye = _partner_mask(n)
    sm = jnp.where(eye, _NEG_INF, sim)
    row_max = jnp.max(sm, axis=1, keepdims=True)  # (n, 1)
    lse = jnp.log(jnp.sum(jnp.exp(sm - row_max), axis=1, keepdims=True)) + row_max
    pos = jnp.sum(jnp.where(pos_mask, sim, 0.0), axis=1, keepdims=True)  # (n, 1)
    loss_ref[0, 0] = jnp.sum(lse - pos) / n


def _bwd_kernel(zi_ref, zj_ref, temp_ref, g_ref, dzi_ref, dzj_ref):
    z = jnp.concatenate([zi_ref[:], zj_ref[:]], axis=0).astype(jnp.float32)
    n = z.shape[0]
    zn, norms = _normalize(z)
    temp = temp_ref[0, 0]
    sim = jnp.dot(zn, zn.T, preferred_element_type=jnp.float32) / temp
    pos_mask, eye = _partner_mask(n)
    sm = jnp.where(eye, _NEG_INF, sim)
    row_max = jnp.max(sm, axis=1, keepdims=True)
    e = jnp.exp(sm - row_max)
    softmax = e / jnp.sum(e, axis=1, keepdims=True)

    # dL/dsim = (softmax - 1{partner}) / n, zero on the diagonal
    gsim = (softmax - jnp.where(pos_mask, 1.0, 0.0)) / n
    gsim = jnp.where(eye, 0.0, gsim) * g_ref[0, 0]

    # sim symmetric in zn: dzn = (G + G^T) @ zn / temp
    b = n // 2
    dzn = jnp.dot(gsim + gsim.T, zn, preferred_element_type=jnp.float32) / temp
    # zn = z / max(|z|, eps): project out the radial component where |z|>eps
    radial = jnp.sum(zn * dzn, axis=1, keepdims=True)
    clamped = norms <= _EPS
    dz = jnp.where(clamped, dzn / _EPS, (dzn - zn * radial) / norms)

    dzi_ref[:] = dz[:b]
    dzj_ref[:] = dz[b:]


def _pallas_fwd(z_i, z_j, temperature):
    b, d = z_i.shape
    temp = jnp.asarray(temperature, jnp.float32).reshape(1, 1)
    loss = pl.pallas_call(
        _fwd_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(z_i.astype(jnp.float32), z_j.astype(jnp.float32), temp)
    return loss[0, 0]


def _pallas_bwd(z_i, z_j, temperature, g):
    b, d = z_i.shape
    temp = jnp.asarray(temperature, jnp.float32).reshape(1, 1)
    gg = jnp.asarray(g, jnp.float32).reshape(1, 1)
    dzi, dzj = pl.pallas_call(
        _bwd_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
    )(z_i.astype(jnp.float32), z_j.astype(jnp.float32), temp, gg)
    return dzi, dzj


@jax.custom_vjp
def nt_xent_pallas(z_i, z_j, temperature):
    return _pallas_fwd(z_i, z_j, temperature)


def _fwd(z_i, z_j, temperature):
    return _pallas_fwd(z_i, z_j, temperature), (z_i, z_j, temperature)


def _bwd(res, g):
    z_i, z_j, temperature = res
    dzi, dzj = _pallas_bwd(z_i, z_j, temperature, g)
    return dzi, dzj, None


nt_xent_pallas.defvjp(_fwd, _bwd)


def nt_xent_fused(z_i, z_j, temperature, impl: str = "auto"):
    """NT-Xent; Pallas single-pass kernel on TPU, fused XLA elsewhere."""
    from murcl_tpu.ops.ntxent import nt_xent

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return nt_xent_pallas(z_i, z_j, temperature)
    return nt_xent(z_i, z_j, temperature)
