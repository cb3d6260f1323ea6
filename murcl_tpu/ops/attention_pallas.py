"""Fused (gated-)attention pooling as a Pallas TPU kernel (fwd + custom VJP).

The hot op of CLAM_SB (gated) and ABMIL (ungated): per bag,

    a = tanh(x @ Wa + ba)                                  # (N, D)
    g = sigmoid(x @ Wb + bb)          (gated only)
    s = (a [* g]) @ wc + bc                                # scores (N,)
    p = softmax(s) over the bag                            # weights
    M = p @ x                                              # pooled (F,)

XLA materializes the (B, N, D) gate tensors in HBM between the matmuls and
the softmax breaks fusion into multiple passes over the bag. Here one
kernel invocation per bag keeps the whole bag resident in VMEM (a
1024 x 512 f32 bag is 2 MB against ~16 MB VMEM): the MXU matmuls, the
elementwise gates, the softmax, and the pooling contraction all fuse, and
the gate tensors never touch HBM. The backward kernel recomputes the gates
from the same VMEM-resident bag (rematerialization is one more fused pass)
and accumulates weight gradients across the sequential grid steps directly
in the output buffers.

Returns ``(M, p, s)`` — pooled embedding, softmax weights, and the RAW
pre-softmax scores (the reference's ``attention_only`` output,
``clam.py:141-142``). Numerics are tested against the plain-XLA reference
(:func:`gated_attention_pool_xla`), which remains the default on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Relaxed-ulp gate transcendentals
# ---------------------------------------------------------------------------
# The gate math tanh(x@Wa+ba) * sigmoid(x@Wb+bb) (reference clam.py:43-47)
# is VPU-transcendental-bound at the canonical pretrain shape: ~0.8G
# tanh+sigmoid evaluations per step dominate the fused kernels (BASELINE.md
# per-op profile: fwd 15.3 ms vs ~4 ideal, bwd 32.7 vs ~10). The gate
# activations are cast to the bag dtype (bfloat16, eps ~= 3.9e-3)
# immediately after evaluation, so any approximation whose error is well
# under half a bf16 ulp of the exact value is invisible downstream.
#
# ``fast_tanh`` is a minimax-fitted (2,2) rational in x**2 on [0, 4.2]
# (max abs error 1.5e-5) with saturation clamping (|tanh(4.2)-1| = 4.5e-4)
# — total abs error <= ~5e-4 exact-division, <= ~8e-4 with the approximate
# hardware reciprocal, an order of magnitude under bf16 visibility.
# ``fast_sigmoid`` shares it via sigmoid(x) = 0.5*tanh(x/2) + 0.5 (error
# halves). ~9 VPU ops vs the library's wide rational.
_TANH_P = (0.9999301777, 0.1042799335, 7.358176706e-04)
_TANH_Q = (0.4373807867, 1.342501468e-02)
_TANH_CLAMP = 4.2


def fast_tanh(x, approx_recip: bool = False):
    """Minimax (2,2) rational tanh; abs err <= ~5e-4 (8e-4 approx-recip).

    ``approx_recip=True`` uses the TPU's hardware reciprocal estimate
    (``pl.reciprocal(..., approx=True)``) — only legal inside a Pallas
    kernel; the default divides exactly and runs anywhere.
    """
    xc = jnp.clip(x, -_TANH_CLAMP, _TANH_CLAMP)
    y = xc * xc
    p = _TANH_P[0] + y * (_TANH_P[1] + y * _TANH_P[2])
    q = 1.0 + y * (_TANH_Q[0] + y * _TANH_Q[1])
    num = xc * p
    if approx_recip:
        return num * pl.reciprocal(q, approx=True)
    return num / q


def fast_sigmoid(x, approx_recip: bool = False):
    """sigmoid via the shared tanh rational; abs err <= ~4e-4."""
    return 0.5 * fast_tanh(0.5 * x, approx_recip=approx_recip) + 0.5


def _gate_fns(gate_math: str, in_kernel: bool = True):
    """(tanh_fn, sigmoid_fn) for a ``gate_math`` mode (``exact | approx``)."""
    if gate_math == "exact":
        return jnp.tanh, jax.nn.sigmoid
    if gate_math == "approx":
        return (
            lambda x: fast_tanh(x, approx_recip=in_kernel),
            lambda x: fast_sigmoid(x, approx_recip=in_kernel),
        )
    raise ValueError(f"gate_math must be 'exact' or 'approx', got {gate_math!r}")


# ---------------------------------------------------------------------------
# Plain-XLA reference (default on CPU; golden model for the kernel)
# ---------------------------------------------------------------------------
def gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask=None,
                             gated: bool = True, dropout: float = 0.0,
                             seed=None):
    """Reference implementation. ``x``: (B, N, F); returns ``(M, p, s)``.

    ``dropout``/``seed`` mirror the kernel's in-kernel dropout (different
    bit stream, same distribution) so the large-bag fallback keeps
    training semantics.
    """
    a = jnp.tanh(jnp.einsum("bnf,fd->bnd", x, wa) + ba)
    if gated:
        g = jax.nn.sigmoid(jnp.einsum("bnf,fd->bnd", x, wb) + bb)
    if dropout > 0 and seed is not None:
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32))
        ka_key, kb_key = jax.random.split(key)
        scale = 1.0 / (1.0 - dropout)
        a = jnp.where(jax.random.bernoulli(ka_key, 1.0 - dropout, a.shape),
                      a * scale, 0.0)
        if gated:
            g = jnp.where(jax.random.bernoulli(kb_key, 1.0 - dropout, g.shape),
                          g * scale, 0.0)
    if gated:
        a = a * g
    s = jnp.einsum("bnd,d->bn", a, wc) + bc
    masked = s if mask is None else jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(masked, axis=-1)
    m = jnp.einsum("bn,bnf->bf", p, x)
    return m, p, s


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------
def _dropout_masks(seed, rate: float, shape, gated: bool):
    """Deterministic per-bag keep masks (regenerated identically in bwd).

    Raw PRNG output is signed bits; bitcast to uint32 before thresholding
    (the comparison otherwise promotes through int32 and inverts half the
    distribution).
    """
    pltpu.prng_seed(seed + pl.program_id(0))
    thresh = jnp.uint32(min(2**32 - 1, int(rate * 2**32)))

    def keep():
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return bits >= thresh

    keep_a = keep()
    keep_b = keep() if gated else None
    scale = 1.0 / (1.0 - rate)
    return keep_a, keep_b, scale


def _scaled_keep_masks(seed, rate: float, shape, gated: bool,
                       dtype=jnp.float32):
    """{0, scale} gate keep-masks — lean formulation of ``_dropout_masks``.

    Identical PRNG stream; folds the 1/(1-rate) scale into the mask so
    each use site is one multiply (``v * ka``) instead of the
    ``where(keep, v*scale, 0)`` mult+select pair. Value-identical: kept
    elements see the same f32-rounded scale factor either way.
    """
    pltpu.prng_seed(seed + pl.program_id(0))
    thresh = jnp.uint32(min(2**32 - 1, int(rate * 2**32)))
    scale32 = jnp.float32(1.0 / (1.0 - rate))
    zero32 = jnp.float32(0.0)

    def keep():
        # select in the 32-bit domain, then cast — Mosaic cannot relayout
        # a 32-bit-compare i1 mask for a sub-32-bit select (see
        # _scaled_keep_masks_trunk)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        k = jnp.where(bits >= thresh, scale32, zero32)
        return k if dtype == jnp.float32 else k.astype(dtype)

    ka = keep()
    kb = keep() if gated else None
    return ka, kb


def _make_fwd_kernel(gated: bool, dropout: float, gate_math: str = "exact"):
    tanh_fn, sigmoid_fn = _gate_fns(gate_math)

    def kernel(x_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
               mask_ref, seed_ref, m_ref, p_ref, s_ref):
        x = x_ref[0]  # (N, F), f32 or bf16 — dots accumulate in f32
        a = tanh_fn(
            jnp.dot(x, wa_ref[:].astype(x.dtype),
                    preferred_element_type=jnp.float32) + ba_ref[0]
        )
        if gated:
            g = sigmoid_fn(
                jnp.dot(x, wb_ref[:].astype(x.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            )
        if dropout > 0:
            ka, kb = _scaled_keep_masks(
                seed_ref[0, 0], dropout, a.shape, gated
            )
            a = a * ka
            if gated:
                g = g * kb
        if gated:
            a = a * g
        s = jnp.dot(a, wc_ref[:], preferred_element_type=jnp.float32)[:, 0] + bc_ref[0, 0]
        s_ref[0, 0] = s
        sm = jnp.where(mask_ref[0, 0], s, _NEG_INF)
        sm = sm - jnp.max(sm)
        e = jnp.exp(sm)
        p = e / jnp.sum(e)
        p_ref[0, 0] = p
        m_ref[0, 0] = jnp.dot(p.reshape(1, -1).astype(x.dtype), x,
                              preferred_element_type=jnp.float32)[0]

    return kernel


def _fwd_pallas(x, wa, ba, wb, bb, wc, bc, mask, seed, gated: bool,
                dropout: float, gate_math: str = "exact"):
    b, n, f = x.shape
    d = wa.shape[1]
    m, p, s = pl.pallas_call(
        _make_fwd_kernel(gated, dropout, gate_math),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
    )(x, wa, ba.reshape(1, -1), wb, bb.reshape(1, -1), wc.reshape(-1, 1),
      bc.reshape(1, 1), mask.reshape(b, 1, n), seed.reshape(1, 1))
    return m[:, 0], p[:, 0], s[:, 0]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------
def _make_bwd_kernel(gated: bool, dropout: float, gate_math: str = "exact"):
    tanh_fn, sigmoid_fn = _gate_fns(gate_math)

    def kernel(x_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref,
               mask_ref, seed_ref, p_ref, gm_ref, gp_ref, gs_ref,
               dx_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref, dwc_ref, dbc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dwa_ref[:] = jnp.zeros_like(dwa_ref)
            dba_ref[:] = jnp.zeros_like(dba_ref)
            dwb_ref[:] = jnp.zeros_like(dwb_ref)
            dbb_ref[:] = jnp.zeros_like(dbb_ref)
            dwc_ref[:] = jnp.zeros_like(dwc_ref)
            dbc_ref[:] = jnp.zeros_like(dbc_ref)

        x = x_ref[0]  # (N, F)
        p = p_ref[0, 0]  # (N,)
        gm = gm_ref[0, 0]  # (F,)
        mask = mask_ref[0, 0]

        # recompute gates (VMEM-resident, one fused pass); the same seed
        # regenerates the exact dropout masks of the forward pass
        a = tanh_fn(
            jnp.dot(x, wa_ref[:].astype(x.dtype),
                    preferred_element_type=jnp.float32) + ba_ref[0]
        )
        if gated:
            g = sigmoid_fn(
                jnp.dot(x, wb_ref[:].astype(x.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            )
        if dropout > 0:
            ka, kb = _scaled_keep_masks(
                seed_ref[0, 0], dropout, a.shape, gated
            )
            a_eff = a * ka
            g_eff = g * kb if gated else None
        else:
            ka = kb = None
            a_eff = a
            g_eff = g if gated else None
        u = a_eff * g_eff if gated else a_eff

        # dL/dp: pooling backward + any direct cotangent on p
        dp = jnp.dot(x, gm.reshape(-1, 1).astype(x.dtype),
                     preferred_element_type=jnp.float32)[:, 0]
        dp = dp + gp_ref[0, 0]
        # softmax backward (masked positions got p=0) + raw-score cotangent
        ds = p * (dp - jnp.sum(p * dp))
        ds = jnp.where(mask, ds, 0.0) + gs_ref[0, 0]

        dbc_ref[:] += jnp.sum(ds).reshape(1, 1)  # (1,1) store; scalar VMEM stores are rejected
        dwc_ref[:] += jnp.dot(u.T, ds.reshape(-1, 1),
                              preferred_element_type=jnp.float32)
        du = ds.reshape(-1, 1) * wc_ref[:].reshape(1, -1)  # (N, D)
        if gated:
            da_eff = du * g_eff
            dg_eff = du * a_eff
        else:
            da_eff = du
            dg_eff = None
        if dropout > 0:
            da = da_eff * ka
            dg = dg_eff * kb if gated else None
        else:
            da = da_eff
            dg = dg_eff
        dza = da * (1.0 - a * a)
        if gated:
            dzb = dg * g * (1.0 - g)
            dwb_ref[:] += jnp.dot(x.T, dzb.astype(x.dtype),
                                  preferred_element_type=jnp.float32)
            dbb_ref[0] += jnp.sum(dzb, axis=0)
        else:
            dzb = None

        dwa_ref[:] += jnp.dot(x.T, dza.astype(x.dtype),
                              preferred_element_type=jnp.float32)
        dba_ref[0] += jnp.sum(dza, axis=0)

        dx = (
            p.reshape(-1, 1) * gm.reshape(1, -1)
            + jnp.dot(dza, wa_ref[:].T, preferred_element_type=jnp.float32)
        )
        if gated:
            dx = dx + jnp.dot(dzb, wb_ref[:].T, preferred_element_type=jnp.float32)
        dx_ref[0] = dx.astype(dx_ref.dtype)

    return kernel


def _bwd_pallas(x, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs,
                gated: bool, dropout: float, gate_math: str = "exact"):
    b, n, f = x.shape
    d = wa.shape[1]
    outs = pl.pallas_call(
        _make_bwd_kernel(gated, dropout, gate_math),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, f), x.dtype),  # dx in the bag's dtype
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(x, wa, ba.reshape(1, -1), wb, bb.reshape(1, -1), wc.reshape(-1, 1),
      mask.reshape(b, 1, n), seed.reshape(1, 1), p.reshape(b, 1, n),
      gm.reshape(b, 1, f), gp.reshape(b, 1, n), gs.reshape(b, 1, n))
    dx, dwa, dba, dwb, dbb, dwc, dbc = outs
    return dx, dwa, dba[0], dwb, dbb[0], dwc[:, 0], dbc[0, 0]


# ---------------------------------------------------------------------------
# custom_vjp wrappers (one per gating mode; `gated` must be static)
# ---------------------------------------------------------------------------
def _make_op(gated: bool, dropout: float, gate_math: str = "exact"):
    @jax.custom_vjp
    def op(x, wa, ba, wb, bb, wc, bc, mask, seed):
        return _fwd_pallas(x, wa, ba, wb, bb, wc, bc, mask, seed, gated,
                           dropout, gate_math)

    def fwd(x, wa, ba, wb, bb, wc, bc, mask, seed):
        m, p, s = _fwd_pallas(x, wa, ba, wb, bb, wc, bc, mask, seed, gated,
                              dropout, gate_math)
        return (m, p, s), (x, wa, ba, wb, bb, wc, mask, seed, p)

    def bwd(res, cot):
        x, wa, ba, wb, bb, wc, mask, seed, p = res
        gm, gp, gs = cot
        dx, dwa, dba, dwb, dbb, dwc, dbc = _bwd_pallas(
            x, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs, gated, dropout,
            gate_math
        )
        return dx, dwa, dba, dwb, dbb, dwc, dbc, None, None

    op.defvjp(fwd, bwd)
    return op


_OPS: dict = {}


def _get_op(gated: bool, dropout: float, gate_math: str = "exact"):
    key = (gated, float(dropout), gate_math)
    if key not in _OPS:
        _OPS[key] = _make_op(gated, float(dropout), gate_math)
    return _OPS[key]


def gated_attention_pool(x, wa, ba, wb, bb, wc, bc, mask=None,
                         impl: str = "auto", gated: bool = True,
                         dropout: float = 0.0, seed=None,
                         gate_math: str = "exact"):
    """Fused attention pooling; picks Pallas on TPU, XLA elsewhere.

    ``dropout > 0`` applies inverted dropout to the gate activations inside
    the kernel using the on-chip PRNG seeded by ``seed`` (+bag index); the
    backward regenerates the same masks. Returns ``(M (B,F), p, s)``.

    ``gate_math='approx'`` evaluates the tanh/sigmoid gates with the
    relaxed-ulp rationals (:func:`fast_tanh`) inside the Pallas kernels —
    abs err <= ~1e-3, invisible after the bf16 activation cast. The XLA
    path always computes exactly (it is the golden reference).
    """
    if mask is None:
        mask = jnp.ones(x.shape[:2], dtype=bool)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        # the resident kernel keeps the whole bag in VMEM; very long bags
        # (full-slide heatmap attention, 10k+ patches) exceed the ~16 MB
        # budget. Stream those through the online-softmax tiled kernel.
        # (The tiled kernel has no in-kernel dropout; training bags always
        # fit resident, so dropout>0 oversized bags fall back to XLA.)
        _, n, f = x.shape
        bag_bytes = n * f * x.dtype.itemsize
        if bag_bytes > 6 * 1024 * 1024:
            if dropout > 0:
                impl = "xla"
            else:
                return attention_pool_tiled(x, wa, ba, wb, bb, wc, bc,
                                            mask=mask, gated=gated,
                                            gate_math=gate_math)
    if impl == "pallas":
        op = _get_op(gated, dropout, gate_math)
        if seed is None:
            seed = jnp.zeros((), jnp.int32)
        return op(
            x, wa, ba, wb, bb, wc,
            jnp.asarray(bc, jnp.float32).reshape(()), mask,
            jnp.asarray(seed, jnp.int32),
        )
    return gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask=mask,
                                    gated=gated, dropout=dropout, seed=seed)


# ---------------------------------------------------------------------------
# Fused trunk + attention kernel (CLAM hot path)
# ---------------------------------------------------------------------------
# VMEM residency budget for the fused kernel's per-bag block. Calibrated on
# v5e (16 MB VMEM scoped budget): the bag block double-buffers through the
# pipeline and the kernel's gate/trunk intermediates take the rest. With
# in-kernel mixup a SECOND (1, N, Fin) partner-bag block streams in, so the
# budget halves. ONE predicate shared by the pool (models/clam.py) and the
# engine's mix-routing heuristic (engine/contrastive.py) so they can never
# silently diverge.
FUSED_RESIDENT_BUDGET = 6 * 1024 * 1024


def fused_trunk_resident(n: int, fin: int, l1: int, itemsize: int,
                         mixed: bool = False) -> bool:
    """True when a (N, max(Fin, L1)) bag block fits the fused-kernel budget."""
    budget = FUSED_RESIDENT_BUDGET // (2 if mixed else 1)
    return n * max(fin, l1) * itemsize <= budget
# CLAM's per-view-step compute is trunk -> gated attention -> pool
# (reference ``clam.py:69-77,144,170``). Unfused, the trunk output
# ``x = dropout(relu(h @ Wf + bf))`` — (B, N, 512), 134 MB bf16 at the
# canonical pretrain shape — round-trips through HBM between the XLA trunk
# and the attention kernel on every one of the 12 view-steps. Fusing the
# trunk into the kernel keeps ``x`` in VMEM for its whole life; the
# backward recomputes it from the same VMEM-resident ``h`` (one extra
# fused matmul, zero extra HBM traffic).


def _dropout_masks_trunk(seed, rate: float, shape_x, shape_g, gated: bool,
                         dtype=jnp.bool_):
    """Keep masks for trunk + gate activations (same order in fwd and bwd).

    ``dtype`` selects the storage: bool lowers to 32-bit vmasks in VMEM;
    the backward kernel stores exact 0/1 values in the bag dtype instead
    (half/quarter the bytes) and applies them multiplicatively —
    ``v * mask * scale`` is bitwise ``where(mask, v*scale, 0)`` for f32 v.
    """
    pltpu.prng_seed(seed + pl.program_id(0))
    thresh = jnp.uint32(min(2**32 - 1, int(rate * 2**32)))

    def keep(shape):
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        k = bits >= thresh
        return k if dtype == jnp.bool_ else k.astype(dtype)

    keep_x = keep(shape_x)
    keep_a = keep(shape_g)
    keep_b = keep(shape_g) if gated else None
    scale = 1.0 / (1.0 - rate)
    return keep_x, keep_a, keep_b, scale


def _scaled_keep_masks_trunk(seed, rate: float, z, shape_g,
                             gated: bool, dtype):
    """{0, scale} keep masks — the lean formulation of the trunk dropout.

    Same PRNG stream (seed offset, draw order, threshold compare) as
    :func:`_dropout_masks_trunk`, but each mask carries the 1/(1-rate)
    scale folded in, so every use site is ONE multiply instead of the
    ``v * keep * scale`` pair, and the trunk mask additionally folds the
    relu indicator (``z > 0``) so relu+keep+scale is one multiplier.

    Layout discipline (Mosaic, measured on v5e): a select whose i1 mask
    comes from a 32-bit compare but whose branches are bf16 needs an i1
    relayout (8,128)->(16,128) that Mosaic refuses ("Invalid relayout:
    non-singleton dimension replicated in destination"). So the compare,
    the ``&``, and the select all stay in the 32-bit domain (uint32 bits,
    f32 z, f32 {0, scale}) — one native-layout mask — followed by a
    single cast to the bag dtype. Value-identical to the unfolded chain:
    ``cast(scale_f32)`` is exactly the bf16 scale constant, kept elements
    see ``v * scale_c`` either way, and only dropped elements can differ
    in the sign of their zero.
    """
    pltpu.prng_seed(seed + pl.program_id(0))
    thresh = jnp.uint32(min(2**32 - 1, int(rate * 2**32)))
    scale32 = jnp.float32(1.0 / (1.0 - rate))
    zero32 = jnp.float32(0.0)

    bits = pltpu.bitcast(pltpu.prng_random_bits(z.shape), jnp.uint32)
    mzx = jnp.where((bits >= thresh) & (z > 0), scale32, zero32).astype(dtype)

    def keep(shape):
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return jnp.where(b2 >= thresh, scale32, zero32).astype(dtype)

    ka = keep(shape_g)
    kb = keep(shape_g) if gated else None
    return mzx, ka, kb


def _make_fused_trunk_fwd_kernel(gated: bool, dropout: float,
                                 gate_math: str = "exact",
                                 mixed: bool = False):
    tanh_fn, sigmoid_fn = _gate_fns(gate_math)

    def kernel(*refs):
        if mixed:
            (perm_ref, lam_ref, h_ref, hp_ref, wf_ref, bf_ref, wa_ref,
             ba_ref, wb_ref, bb_ref, wc_ref, bc_ref, mask_ref, seed_ref,
             m_ref, p_ref, s_ref) = refs
        else:
            (h_ref, wf_ref, bf_ref, wa_ref, ba_ref, wb_ref, bb_ref,
             wc_ref, bc_ref, mask_ref, seed_ref, m_ref, p_ref, s_ref) = refs
        return body(h_ref, (lam_ref, hp_ref) if mixed else None, wf_ref,
                    bf_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
                    mask_ref, seed_ref, m_ref, p_ref, s_ref)

    def body(h_ref, mix, wf_ref, bf_ref, wa_ref, ba_ref, wb_ref, bb_ref,
             wc_ref, bc_ref, mask_ref, seed_ref, m_ref, p_ref, s_ref):
        # bag-dtype discipline throughout (relu/dropout/gate products in
        # h.dtype, masks as {0, scale} values): minimizes the VPU op
        # volume of the elementwise chains (the kernels are VPU op-count
        # bound — BASELINE.md round-3 attribution) AND matches the
        # backward's recompute formulas bitwise.
        h = h_ref[0]  # (N, Fin)
        if mix is not None:
            # in-kernel mixup: partner bag block-gathered via the scalar-
            # prefetch index map, mixed in VMEM before the trunk — the
            # mixed (B, N, Fin) tensor never exists in HBM. Same formula
            # as compact_pallas._mix_kernel (1-lam in f32; Mosaic cannot
            # legalize scalar bf16 arithmetic), so numerics match the
            # standalone mixup_rows kernel exactly.
            lam_ref, hp_ref = mix
            lam32 = lam_ref[0, 0, 0]
            h = (lam32.astype(h.dtype) * h
                 + (1.0 - lam32).astype(h.dtype) * hp_ref[0])
        z = jnp.dot(h, wf_ref[:].astype(h.dtype),
                    preferred_element_type=jnp.float32) + bf_ref[0]
        d = wa_ref.shape[1]
        if dropout > 0:
            # lean masks: relu + keep + scale fold into one {0, scale}
            # multiplier per tensor — value-identical to the unfolded
            # max/cast/keep/scale chain (see _scaled_keep_masks_trunk)
            mzx, ka, kb = _scaled_keep_masks_trunk(
                seed_ref[0, 0], dropout, z, (z.shape[0], d), gated,
                dtype=h.dtype,
            )
            xc = z.astype(h.dtype) * mzx
        else:
            xc = jnp.maximum(z, 0.0).astype(h.dtype)
        a = tanh_fn(
            jnp.dot(xc, wa_ref[:].astype(xc.dtype),
                    preferred_element_type=jnp.float32) + ba_ref[0]
        ).astype(h.dtype)
        if gated:
            g = sigmoid_fn(
                jnp.dot(xc, wb_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            ).astype(h.dtype)
        if dropout > 0:
            a = a * ka
            if gated:
                g = g * kb
        if gated:
            a = a * g
        s = jnp.dot(a, wc_ref[:].astype(a.dtype),
                    preferred_element_type=jnp.float32)[:, 0] + bc_ref[0, 0]
        s_ref[0, 0] = s
        sm = jnp.where(mask_ref[0, 0], s, _NEG_INF)
        sm = sm - jnp.max(sm)
        e = jnp.exp(sm)
        p = e / jnp.sum(e)
        p_ref[0, 0] = p
        m_ref[0, 0] = jnp.dot(p.reshape(1, -1).astype(xc.dtype), xc,
                              preferred_element_type=jnp.float32)[0]

    return kernel


def _make_fused_trunk_bwd_kernel(gated: bool, dropout: float,
                                 need_dh: bool = True,
                                 gate_math: str = "exact",
                                 mixed: bool = False):
    tanh_fn, sigmoid_fn = _gate_fns(gate_math)
    if mixed and need_dh:
        raise ValueError("in-kernel mixup requires input_grad=False "
                         "(the h cotangent would need a scatter to the "
                         "partner bag; the engines never differentiate bags)")

    def kernel(*refs):
        if mixed:
            (perm_ref, lam_ref, h_ref, hp_ref, wf_ref, bf_ref, wa_ref,
             ba_ref, wb_ref, bb_ref, wc_ref, mask_ref, seed_ref, p_ref,
             gm_ref, gp_ref, gs_ref, *out_refs) = refs
            mix = (lam_ref, hp_ref)
        else:
            (h_ref, wf_ref, bf_ref, wa_ref, ba_ref, wb_ref, bb_ref,
             wc_ref, mask_ref, seed_ref, p_ref, gm_ref, gp_ref, gs_ref,
             *out_refs) = refs
            mix = None
        return body(h_ref, mix, wf_ref, bf_ref, wa_ref, ba_ref, wb_ref,
                    bb_ref, wc_ref, mask_ref, seed_ref, p_ref, gm_ref,
                    gp_ref, gs_ref, out_refs)

    def body(h_ref, mix, wf_ref, bf_ref, wa_ref, ba_ref, wb_ref, bb_ref,
             wc_ref, mask_ref, seed_ref, p_ref, gm_ref, gp_ref, gs_ref,
             out_refs):
        if need_dh:
            (dh_ref, dwf_ref, dbf_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
             dwc_ref, dbc_ref) = out_refs
        else:
            (dwf_ref, dbf_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
             dwc_ref, dbc_ref) = out_refs
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
        if mix is not None:
            # recompute the in-VMEM mix exactly as the forward did; the
            # trunk grads below then see the mixed bag as their input
            lam_ref, hp_ref = mix
            lam32 = lam_ref[0, 0, 0]
            h = (lam32.astype(h.dtype) * h
                 + (1.0 - lam32).astype(h.dtype) * hp_ref[0])
        p = p_ref[0, 0]
        gm = gm_ref[0, 0]
        mask = mask_ref[0, 0]
        d = wa_ref.shape[1]

        # recompute trunk + gates; the same seed regenerates the exact
        # masks. VMEM discipline (the f32/bool variants blow the 16 MB
        # scoped budget at N=1024, Fin=L1=512 by ~1.2 MB): masks are
        # {0, scale} values in the bag dtype, applied multiplicatively,
        # and the dx chain runs in the bag dtype. With gate_math='approx'
        # the recompute uses the same rational the forward used, so a/g
        # (and hence the derivative formulas below) are self-consistent.
        z = jnp.dot(h, wf_ref[:].astype(h.dtype),
                    preferred_element_type=jnp.float32) + bf_ref[0]
        if dropout > 0:
            # lean recompute (see _scaled_keep_masks_trunk): one {0, scale}
            # mask folds relu+keep+scale, and xc = round(z) * scale_c is
            # BITWISE the forward's value — the old f32 chain
            # round(z * scale_f32) differed in the last bf16 ulp on ~14%
            # of elements (remat drift, now gone)
            mzx, ka, kb = _scaled_keep_masks_trunk(
                seed_ref[0, 0], dropout, z, (z.shape[0], d), gated,
                dtype=h.dtype,
            )
            xc = z.astype(h.dtype) * mzx
        else:
            ka = kb = mzx = None
            relu_pos = (z > 0).astype(h.dtype)  # 0/1 indicator
            xc = jnp.maximum(z, 0.0).astype(h.dtype)
        # gate recompute in the bag dtype: with bf16 bags this halves ~8 MB
        # of (N, D)/(N, L1) intermediates — remat-in-bf16, standard TPU
        # practice; which units were dropped stays exact (masks are 0/1
        # up to the folded scale)
        a = tanh_fn(
            jnp.dot(xc, wa_ref[:].astype(xc.dtype),
                    preferred_element_type=jnp.float32) + ba_ref[0]
        ).astype(h.dtype)
        if gated:
            g = sigmoid_fn(
                jnp.dot(xc, wb_ref[:].astype(xc.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            ).astype(h.dtype)
        if dropout > 0:
            a_eff = a * ka
            g_eff = g * kb if gated else None
        else:
            a_eff = a
            g_eff = g if gated else None
        u = a_eff * g_eff if gated else a_eff

        # pool + softmax backward (f32: these are (N,) vectors, cheap)
        dp = jnp.dot(xc, gm.reshape(-1, 1).astype(xc.dtype),
                     preferred_element_type=jnp.float32)[:, 0]
        dp = dp + gp_ref[0, 0]
        ds = p * (dp - jnp.sum(p * dp))
        ds = jnp.where(mask, ds, 0.0) + gs_ref[0, 0]

        dbc_ref[:] += jnp.sum(ds).reshape(1, 1)
        dwc_ref[:] += jnp.dot(u.T, ds.reshape(-1, 1).astype(h.dtype),
                              preferred_element_type=jnp.float32)
        du = (ds.reshape(-1, 1).astype(h.dtype)
              * wc_ref[:].reshape(1, -1).astype(h.dtype))  # (N, D)
        if gated:
            da_eff = du * g_eff
            dg_eff = du * a_eff
        else:
            da_eff = du
            dg_eff = None
        if dropout > 0:
            da = da_eff * ka
            dg = dg_eff * kb if gated else None
        else:
            da = da_eff
            dg = dg_eff
        one = jnp.asarray(1.0, h.dtype)
        dza = da * (one - a * a)
        if gated:
            dzb = dg * g * (one - g)
            dwb_ref[:] += jnp.dot(xc.T, dzb,
                                  preferred_element_type=jnp.float32)
            dbb_ref[0] += jnp.sum(dzb.astype(jnp.float32), axis=0)
        dwa_ref[:] += jnp.dot(xc.T, dza,
                              preferred_element_type=jnp.float32)
        dba_ref[0] += jnp.sum(dza.astype(jnp.float32), axis=0)

        # grads w.r.t. the (post-dropout) trunk output: pooling + both gates
        # (computed in the input dtype — see VMEM note above)
        dx = (
            (p.reshape(-1, 1) * gm.reshape(1, -1)).astype(h.dtype)
            + jnp.dot(dza.astype(xc.dtype), wa_ref[:].T.astype(xc.dtype),
                      preferred_element_type=jnp.float32).astype(h.dtype)
        )
        if gated:
            dx = dx + jnp.dot(dzb.astype(xc.dtype), wb_ref[:].T.astype(xc.dtype),
                              preferred_element_type=jnp.float32).astype(h.dtype)

        # trunk backward: dropout -> relu -> matmul (one fused mask mult)
        dz = dx * mzx if dropout > 0 else dx * relu_pos
        dwf_ref[:] += jnp.dot(h.T, dz, preferred_element_type=jnp.float32)
        dbf_ref[0] += jnp.sum(dz.astype(jnp.float32), axis=0)
        if need_dh:
            dh_ref[0] = jnp.dot(dz, wf_ref[:].T.astype(h.dtype),
                                preferred_element_type=jnp.float32).astype(dh_ref.dtype)

    return kernel


def _fused_trunk_fwd_pallas(h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed,
                            gated: bool, dropout: float,
                            gate_math: str = "exact", mix=None):
    b, n, fin = h.shape
    l1 = wf.shape[1]
    d = wa.shape[1]

    # index maps gain the prefetched perm operand in the mixed variant
    def im(f):
        return (lambda i, perm: f(i)) if mix is not None else f

    bag_specs = []
    if mix is not None:
        bag_specs = [
            pl.BlockSpec((1, 1, 1), lambda i, perm: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # lam
        ]
    bag_specs += [
        pl.BlockSpec((1, n, fin), im(lambda i: (i, 0, 0)),
                     memory_space=pltpu.VMEM),  # h (self)
    ]
    if mix is not None:
        bag_specs += [
            # partner bag: same array, block index from the prefetched perm
            pl.BlockSpec((1, n, fin), lambda i, perm: (perm[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = bag_specs + [
        pl.BlockSpec((fin, l1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((l1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((l1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), im(lambda i: (0, 0)), memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, l1), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1, l1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
    ]
    kernel = _make_fused_trunk_fwd_kernel(gated, dropout, gate_math,
                                          mixed=mix is not None)
    args = [h, wf, bf.reshape(1, -1), wa, ba.reshape(1, -1), wb,
            bb.reshape(1, -1), wc.reshape(-1, 1), bc.reshape(1, 1),
            mask.reshape(b, 1, n), seed.reshape(1, 1)]
    if mix is None:
        m, p, s = pl.pallas_call(
            kernel, grid=(b,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
        )(*args)
    else:
        perm, lam = mix
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,), in_specs=in_specs,
            out_specs=out_specs,
        )
        m, p, s = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
        )(perm.astype(jnp.int32),
          lam.reshape(b, 1, 1).astype(jnp.float32), h, h, *args[1:])
    return m[:, 0], p[:, 0], s[:, 0]


def _fused_trunk_bwd_pallas(h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p,
                            gm, gp, gs, gated: bool, dropout: float,
                            need_dh: bool = True, gate_math: str = "exact",
                            mix=None):
    b, n, fin = h.shape
    l1 = wf.shape[1]
    d = wa.shape[1]

    def im(f):
        return (lambda i, perm: f(i)) if mix is not None else f

    bag_specs = []
    if mix is not None:
        bag_specs = [
            pl.BlockSpec((1, 1, 1), lambda i, perm: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # lam
        ]
    bag_specs += [
        pl.BlockSpec((1, n, fin), im(lambda i: (i, 0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    if mix is not None:
        bag_specs += [
            pl.BlockSpec((1, n, fin), lambda i, perm: (perm[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = bag_specs + [
        pl.BlockSpec((fin, l1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((l1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((l1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), im(lambda i: (0, 0)), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, l1), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
    ]
    out_specs = ([
        pl.BlockSpec((1, n, fin), im(lambda i: (i, 0, 0)), memory_space=pltpu.VMEM),
    ] if need_dh else []) + [
        pl.BlockSpec((fin, l1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((l1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((l1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), im(lambda i: (0, 0)), memory_space=pltpu.VMEM),
    ]
    out_shape = ([
        jax.ShapeDtypeStruct((b, n, fin), h.dtype),
    ] if need_dh else []) + [
        jax.ShapeDtypeStruct((fin, l1), jnp.float32),
        jax.ShapeDtypeStruct((1, l1), jnp.float32),
        jax.ShapeDtypeStruct((l1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((l1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((d, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    kernel = _make_fused_trunk_bwd_kernel(gated, dropout, need_dh, gate_math,
                                          mixed=mix is not None)
    args = [h, wf, bf.reshape(1, -1), wa, ba.reshape(1, -1), wb,
            bb.reshape(1, -1), wc.reshape(-1, 1), mask.reshape(b, 1, n),
            seed.reshape(1, 1), p.reshape(b, 1, n), gm.reshape(b, 1, l1),
            gp.reshape(b, 1, n), gs.reshape(b, 1, n)]
    if mix is None:
        outs = pl.pallas_call(
            kernel, grid=(b,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
        )(*args)
    else:
        perm, lam = mix
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,), in_specs=in_specs,
            out_specs=out_specs,
        )
        outs = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
        )(perm.astype(jnp.int32),
          lam.reshape(b, 1, 1).astype(jnp.float32), h, h, *args[1:])
    if need_dh:
        dh, dwf, dbf, dwa, dba, dwb, dbb, dwc, dbc = outs
    else:
        dwf, dbf, dwa, dba, dwb, dbb, dwc, dbc = outs
        # zero cotangent for a constant input; never consumed when the
        # caller only differentiates parameters
        dh = jnp.zeros_like(h)
    return dh, dwf, dbf[0], dwa, dba[0], dwb, dbb[0], dwc[:, 0], dbc[0, 0]


def _make_fused_trunk_op(gated: bool, dropout: float, input_grad: bool = True,
                         gate_math: str = "exact", mixed: bool = False):
    if mixed:
        @jax.custom_vjp
        def mop(h, perm, lam, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed):
            return _fused_trunk_fwd_pallas(
                h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed, gated,
                dropout, gate_math, mix=(perm, lam))

        def mfwd(h, perm, lam, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed):
            m, p, s = _fused_trunk_fwd_pallas(
                h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed, gated,
                dropout, gate_math, mix=(perm, lam))
            return (m, p, s), (h, perm, lam, wf, bf, wa, ba, wb, bb, wc,
                               mask, seed, p)

        def mbwd(res, cot):
            h, perm, lam, wf, bf, wa, ba, wb, bb, wc, mask, seed, p = res
            gm, gp, gs = cot
            dh, dwf, dbf, dwa, dba, dwb, dbb, dwc, dbc = _fused_trunk_bwd_pallas(
                h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs,
                gated, dropout, need_dh=False, gate_math=gate_math,
                mix=(perm, lam),
            )
            return (dh, None, None, dwf, dbf, dwa, dba, dwb, dbb, dwc, dbc,
                    None, None)

        mop.defvjp(mfwd, mbwd)
        return mop

    @jax.custom_vjp
    def op(h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed):
        return _fused_trunk_fwd_pallas(h, wf, bf, wa, ba, wb, bb, wc, bc,
                                       mask, seed, gated, dropout, gate_math)

    def fwd(h, wf, bf, wa, ba, wb, bb, wc, bc, mask, seed):
        m, p, s = _fused_trunk_fwd_pallas(h, wf, bf, wa, ba, wb, bb, wc, bc,
                                          mask, seed, gated, dropout,
                                          gate_math)
        return (m, p, s), (h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p)

    def bwd(res, cot):
        h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p = res
        gm, gp, gs = cot
        dh, dwf, dbf, dwa, dba, dwb, dbb, dwc, dbc = _fused_trunk_bwd_pallas(
            h, wf, bf, wa, ba, wb, bb, wc, mask, seed, p, gm, gp, gs,
            gated, dropout, need_dh=input_grad, gate_math=gate_math,
        )
        return dh, dwf, dbf, dwa, dba, dwb, dbb, dwc, dbc, None, None

    op.defvjp(fwd, bwd)
    return op


_FUSED_TRUNK_OPS: dict = {}


def fused_trunk_attention_pool_xla(h, wf, bf, wa, ba, wb, bb, wc, bc,
                                   mask=None, gated: bool = True,
                                   dropout: float = 0.0, seed=None):
    """XLA golden: trunk (linear+relu+dropout) then attention pooling."""
    x = jnp.maximum(jnp.einsum("bnf,fl->bnl", h, wf) + bf, 0.0)
    if dropout > 0 and seed is not None:
        key = jax.random.fold_in(
            jax.random.PRNGKey(jnp.asarray(seed, jnp.int32)), 1
        )
        x = jnp.where(jax.random.bernoulli(key, 1.0 - dropout, x.shape),
                      x / (1.0 - dropout), 0.0)
    return gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask=mask,
                                    gated=gated, dropout=dropout, seed=seed)


def fused_trunk_attention_pool(h, wf, bf, wa, ba, wb, bb, wc, bc, mask=None,
                               impl: str = "auto", gated: bool = True,
                               dropout: float = 0.0, seed=None,
                               input_grad: bool = True,
                               gate_math: str = "exact", mix=None):
    """CLAM trunk + gated attention pooling in ONE kernel.

    ``h``: raw patch features (B, N, Fin). Returns ``(M (B, L1), p, s)``
    where ``M`` pools the (dropout-applied) trunk output. Dropout uses the
    on-chip PRNG (three masks: trunk, gate a, gate b), regenerated exactly
    in the backward. Reference semantics: ``clam.py:69-77,144,170``.

    ``input_grad=False`` skips the backward kernel's ``dh`` matmul and its
    (B, N, Fin) HBM write — a custom-call output XLA cannot dead-code
    eliminate — and returns exact zeros for the ``h`` cotangent. Use when
    ``h`` is data (the training engines differentiate parameters only).

    ``gate_math='approx'``: relaxed-ulp rational tanh/sigmoid gates in the
    kernels (see :func:`fast_tanh`; abs err <= ~1e-3, invisible after the
    bf16 activation cast). The XLA golden always computes exactly.

    ``mix=(perm, lam)`` fuses bag-level mixup into the kernel: bag ``i``
    becomes ``lam[i]*h[i] + (1-lam[i])*h[perm[i]]`` before the trunk, the
    partner block-gathered via scalar prefetch — the mixed (B, N, Fin)
    tensor never exists in HBM (reference mixup on selected sub-bags,
    ``train_MuRCL.py:239,268``; numerics identical to
    :func:`murcl_tpu.ops.compact_pallas.mixup_rows` then this op).
    Requires ``input_grad=False`` (bags are data). Non-pallas paths apply
    the same mix expression explicitly, then proceed.
    """
    if mask is None:
        mask = jnp.ones(h.shape[:2], dtype=bool)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if mix is not None and (impl != "pallas" or input_grad):
        if input_grad and impl == "pallas":
            raise ValueError("mix requires input_grad=False")
        # explicit mix, mixup_rows-identical numerics (shared helper)
        from murcl_tpu.ops.mixup import apply_mix

        h = apply_mix(h, *mix)
        mix = None
    if impl == "pallas":
        key = (gated, float(dropout), bool(input_grad), gate_math,
               mix is not None)
        if key not in _FUSED_TRUNK_OPS:
            _FUSED_TRUNK_OPS[key] = _make_fused_trunk_op(
                gated, float(dropout), bool(input_grad), gate_math,
                mixed=mix is not None)
        if seed is None:
            seed = jnp.zeros((), jnp.int32)
        if mix is not None:
            perm, lam = mix
            return _FUSED_TRUNK_OPS[key](
                h, perm, lam, wf, bf, wa, ba, wb, bb, wc,
                jnp.asarray(bc, jnp.float32).reshape(()), mask,
                jnp.asarray(seed, jnp.int32),
            )
        return _FUSED_TRUNK_OPS[key](
            h, wf, bf, wa, ba, wb, bb, wc,
            jnp.asarray(bc, jnp.float32).reshape(()), mask,
            jnp.asarray(seed, jnp.int32),
        )
    return fused_trunk_attention_pool_xla(h, wf, bf, wa, ba, wb, bb, wc, bc,
                                          mask=mask, gated=gated,
                                          dropout=dropout, seed=seed)


# ---------------------------------------------------------------------------
# Tiled kernel for bags too large for VMEM (full-slide heatmap attention)
# ---------------------------------------------------------------------------
def _make_tiled_fwd_kernel(gated: bool, n_tiles: int,
                           gate_math: str = "exact"):
    """Single-sweep online-softmax attention pool over ``grid=(B, n_tiles)``.

    The bag streams through Pallas' own block pipeline (double-buffered HBM
    fetches of ``(tile, F)`` slabs, no in-kernel DMA loop); the pooled
    output block ``(1, 1, F)`` is *revisited* across the tile dimension and
    holds the running weighted sum, rescaled flash-attention-style whenever
    a new masked maximum appears. Raw scores land in per-tile output blocks
    (static stores — dynamic lane-slice stores lower poorly on Mosaic); the
    softmax weights are recovered outside the kernel from the scores
    (an O(B·N) elementwise pass, free next to the O(B·N·F·D) kernel).
    """

    tanh_fn, sigmoid_fn = _gate_fns(gate_math)

    def kernel(x_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
               mask_ref, m_ref, s_ref, mx_ref, l_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            m_ref[:] = jnp.zeros_like(m_ref)
            mx_ref[0, 0] = _NEG_INF
            l_ref[0, 0] = 0.0

        x = x_ref[0]  # (tile, F)
        a = tanh_fn(
            jnp.dot(x, wa_ref[:].astype(x.dtype),
                    preferred_element_type=jnp.float32) + ba_ref[0]
        )
        if gated:
            a = a * sigmoid_fn(
                jnp.dot(x, wb_ref[:].astype(x.dtype),
                        preferred_element_type=jnp.float32) + bb_ref[0]
            )
        s = jnp.dot(a, wc_ref[:], preferred_element_type=jnp.float32)[:, 0] + bc_ref[0, 0]
        s_ref[0, 0] = s

        mask = mask_ref[0, 0]  # (tile,)
        masked = jnp.where(mask, s, _NEG_INF)
        mx_old = mx_ref[0, 0]
        mx_new = jnp.maximum(mx_old, jnp.max(masked))
        corr = jnp.exp(mx_old - mx_new)
        e = jnp.where(mask, jnp.exp(masked - mx_new), 0.0)
        l_ref[0, 0] = l_ref[0, 0] * corr + jnp.sum(e)
        m_ref[0, 0] = m_ref[0, 0] * corr + jnp.dot(
            e.reshape(1, -1).astype(x.dtype), x,
            preferred_element_type=jnp.float32,
        )[0]
        mx_ref[0, 0] = mx_new

        @pl.when(t == n_tiles - 1)
        def _():
            m_ref[0, 0] = m_ref[0, 0] / l_ref[0, 0]

    return kernel


def _fwd_tiled_pallas(x, wa, ba, wb, bb, wc, bc, mask, gated: bool,
                      tile: int = 2048, gate_math: str = "exact"):
    b, n, f = x.shape
    d = wa.shape[1]
    assert n % tile == 0, f"bag length {n} must be a multiple of tile {tile}"
    n_tiles = n // tile
    m, s = pl.pallas_call(
        _make_tiled_fwd_kernel(gated, n_tiles, gate_math),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, f), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # revisited across t: the running (then final) pooled embedding
            pl.BlockSpec((1, 1, f), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),  # running masked max
            pltpu.SMEM((1, 1), jnp.float32),  # running sum(exp)
        ],
    )(x, wa, ba.reshape(1, -1), wb, bb.reshape(1, -1), wc.reshape(-1, 1),
      bc.reshape(1, 1), mask.reshape(b, 1, n))
    s = s[:, 0]
    # softmax weights from the raw scores: one fused elementwise XLA pass
    p = jax.nn.softmax(jnp.where(mask, s, _NEG_INF), axis=-1)
    return m[:, 0], p, s


def _make_tiled_op(gated: bool, tile: int, gate_math: str = "exact"):
    """Tiled forward with an XLA backward (the fwd is the hot path —
    heatmaps/eval; training bags fit the resident kernel)."""

    @jax.custom_vjp
    def op(x, wa, ba, wb, bb, wc, bc, mask):
        return _fwd_tiled_pallas(x, wa, ba, wb, bb, wc, bc, mask, gated,
                                 tile, gate_math)

    def fwd(x, wa, ba, wb, bb, wc, bc, mask):
        out = _fwd_tiled_pallas(x, wa, ba, wb, bb, wc, bc, mask, gated,
                                tile, gate_math)
        return out, (x, wa, ba, wb, bb, wc, bc, mask)

    def bwd(res, cot):
        x, wa, ba, wb, bb, wc, bc, mask = res
        _, vjp = jax.vjp(
            lambda *a: gated_attention_pool_xla(*a, mask=mask, gated=gated),
            x, wa, ba, wb, bb, wc, bc,
        )
        return vjp(cot) + (None,)

    op.defvjp(fwd, bwd)
    return op


_TILED_OPS: dict = {}


def attention_pool_tiled(x, wa, ba, wb, bb, wc, bc, mask=None,
                         gated: bool = True, tile: int = 2048,
                         gate_math: str = "exact"):
    """Streaming attention pool for bags too large for VMEM residency.

    Online-softmax over ``grid=(B, n_tiles)`` with accumulator revisiting —
    one pass over the bag at HBM speed. Bags whose length is not a tile
    multiple are zero-padded with a False mask (one extra tile at most);
    outputs are sliced back to the true length.
    """
    if mask is None:
        mask = jnp.ones(x.shape[:2], dtype=bool)
    b, n, f = x.shape
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    key = (gated, tile, gate_math)
    if key not in _TILED_OPS:
        _TILED_OPS[key] = _make_tiled_op(gated, tile, gate_math)
    m, p, s = _TILED_OPS[key](
        x, wa, ba, wb, bb, wc, jnp.asarray(bc, jnp.float32).reshape(()), mask
    )
    if pad:
        p, s = p[:, :n], s[:, :n]
    return m, p, s
