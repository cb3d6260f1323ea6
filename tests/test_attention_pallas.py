"""Fused attention-pooling kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import murcl_tpu.ops.attention_pallas as gap

B, N, F, D = 3, 16, 8, 4


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gap.pl, "pallas_call", interp)


@pytest.fixture()
def inputs(rng):
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32) * 0.3)
    ba = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32) * 0.3)
    bb = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.3)
    bc = jnp.float32(0.05)
    mask = jnp.asarray(np.arange(N)[None, :] < np.array([16, 10, 5])[:, None])
    return x, wa, ba, wb, bb, wc, bc, mask


@pytest.mark.parametrize("gated", [True, False])
def test_forward_matches_xla(inputs, gated):
    x, wa, ba, wb, bb, wc, bc, mask = inputs
    want = gap.gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask, gated=gated)
    got = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, mask,
                                   impl="pallas", gated=gated)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


@pytest.mark.parametrize("gated", [True, False])
def test_grads_match_xla(inputs, gated):
    x, wa, ba, wb, bb, wc, bc, mask = inputs

    def loss(impl):
        def f(x, wa, ba, wb, bb, wc, bc):
            m, p, s = gap.gated_attention_pool(
                x, wa, ba, wb, bb, wc, bc, mask, impl=impl, gated=gated
            )
            # exercise all three cotangents
            return jnp.sum(m * m) + jnp.sum(jnp.sin(p)) + 0.1 * jnp.sum(jnp.cos(s))

        return f

    args = (x, wa, ba, wb, bb, wc, bc)
    g_xla = jax.grad(loss("xla"), argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(loss("pallas"), argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x", "wa", "ba", "wb", "bb", "wc", "bc"], g_xla, g_pal):
        np.testing.assert_allclose(
            np.asarray(b).reshape(np.asarray(a).shape), np.asarray(a),
            atol=2e-5, err_msg=name,
        )


def test_full_mask_equals_no_mask(inputs):
    x, wa, ba, wb, bb, wc, bc, _ = inputs
    got = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, impl="pallas")
    want = gap.gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)


# --------------------------------------------------------- in-kernel dropout --
# pltpu.prng_seed has no CPU interpret rule; these run on real TPU only
# (exercised by scripts/tpu_smoke.py and the TPU bench path)
@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU PRNG")
def test_dropout_deterministic_per_seed(inputs):
    x, wa, ba, wb, bb, wc, bc, mask = inputs
    kw = dict(mask=mask, impl="pallas", gated=True, dropout=0.25)
    m1, p1, s1 = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, seed=7, **kw)
    m2, p2, s2 = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, seed=7, **kw)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    m3, _, _ = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, seed=8, **kw)
    assert not np.allclose(np.asarray(m1), np.asarray(m3))
    # dropout actually fires: differs from the no-dropout output
    m0, _, _ = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, mask=mask,
                                        impl="pallas", gated=True, dropout=0.0)
    assert not np.allclose(np.asarray(m1), np.asarray(m0))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU PRNG")
def test_dropout_grads_finite(inputs):
    """Dropout-path VJP runs and is finite; the exact-mask gradient
    comparison (grads match an XLA model using the kernel's own masks to
    <1% relative) lives in scripts/tpu_smoke.py — finite differences are
    too noisy through the softmax at f32."""
    x, wa, ba, wb, bb, wc, bc, mask = inputs

    def loss(wc_):
        m, p, s = gap.gated_attention_pool(
            x, wa, ba, wb, bb, wc_, bc, mask=mask, impl="pallas",
            gated=True, dropout=0.25, seed=3,
        )
        return jnp.sum(m * m)

    g = np.asarray(jax.grad(loss)(wc))
    assert np.isfinite(g).all() and np.abs(g).max() > 0


# ------------------------------------------------------ fused trunk kernel --
@pytest.fixture()
def trunk_inputs(rng):
    fin, l1, d = 8, 16, 4
    h = jnp.asarray(rng.normal(size=(B, N, fin)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(fin, l1)).astype(np.float32) * 0.3)
    bf = jnp.asarray(rng.normal(size=(l1,)).astype(np.float32) * 0.1)
    wa = jnp.asarray(rng.normal(size=(l1, d)).astype(np.float32) * 0.3)
    ba = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.normal(size=(l1, d)).astype(np.float32) * 0.3)
    bb = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.3)
    bc = jnp.float32(0.05)
    mask = jnp.asarray(np.arange(N)[None, :] < np.array([16, 10, 5])[:, None])
    return h, wf, bf, wa, ba, wb, bb, wc, bc, mask


@pytest.mark.parametrize("gated", [True, False])
def test_fused_trunk_matches_xla(trunk_inputs, gated):
    h, wf, bf, wa, ba, wb, bb, wc, bc, mask = trunk_inputs
    want = gap.fused_trunk_attention_pool_xla(
        h, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, gated=gated)
    got = gap.fused_trunk_attention_pool(
        h, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, impl="pallas",
        gated=gated)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_fused_trunk_grads_match_xla(trunk_inputs):
    h, wf, bf, wa, ba, wb, bb, wc, bc, mask = trunk_inputs
    args = (h, wf, bf, wa, ba, wb, bb, wc, bc)

    def loss(impl):
        def f(*a):
            m, p, s = gap.fused_trunk_attention_pool(
                *a, mask=mask, impl=impl, gated=True)
            return jnp.sum(m * m) + jnp.sum(jnp.sin(p)) + 0.1 * jnp.sum(jnp.cos(s))
        return f

    g_xla = jax.grad(loss("xla"), argnums=tuple(range(9)))(*args)
    g_pal = jax.grad(loss("pallas"), argnums=tuple(range(9)))(*args)
    names = ["h", "wf", "bf", "wa", "ba", "wb", "bb", "wc", "bc"]
    for name, a, b in zip(names, g_xla, g_pal):
        np.testing.assert_allclose(
            np.asarray(b).reshape(np.asarray(a).shape), np.asarray(a),
            atol=3e-5, err_msg=name,
        )


def test_fused_trunk_input_grad_off(trunk_inputs):
    """``input_grad=False`` returns identical parameter gradients and an
    exactly-zero ``h`` cotangent (the engines differentiate params only)."""
    h, wf, bf, wa, ba, wb, bb, wc, bc, mask = trunk_inputs
    args = (h, wf, bf, wa, ba, wb, bb, wc, bc)

    def loss(input_grad):
        def f(*a):
            m, p, s = gap.fused_trunk_attention_pool(
                *a, mask=mask, impl="pallas", gated=True,
                input_grad=input_grad)
            return jnp.sum(m * m) + jnp.sum(jnp.sin(p))
        return f

    g_on = jax.grad(loss(True), argnums=tuple(range(9)))(*args)
    g_off = jax.grad(loss(False), argnums=tuple(range(9)))(*args)
    assert np.abs(np.asarray(g_off[0])).max() == 0.0  # dh is exact zeros
    for name, a, b in zip(["wf", "bf", "wa", "ba", "wb", "bb", "wc", "bc"],
                          g_on[1:], g_off[1:]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6,
                                   err_msg=name)


def test_clam_fused_path_matches_unfused(rng):
    """CLAM with the fused trunk route == the unfused XLA trunk route."""
    from murcl_tpu.models import CLAM_SB

    fin = 8
    h = jnp.asarray(rng.normal(size=(2, N, fin)).astype(np.float32))
    m_fused = CLAM_SB(in_dim=fin, k_sample=4, n_classes=2, attn_impl="pallas",
                      attn_gate_math="exact")
    m_xla = CLAM_SB(in_dim=fin, k_sample=4, n_classes=2, attn_impl="xla")
    params = m_xla.init(jax.random.PRNGKey(0), h)
    got, aux_g = m_fused.apply(params, h)
    want, aux_w = m_xla.apply(params, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_g["attention"]),
                               np.asarray(aux_w["attention"]), atol=1e-5)


def test_clam_approx_gate_math_close(rng):
    """CLAM's opt-in approx-gate Pallas path (--attn_gate_math approx) stays
    within the sub-bf16-ulp error bound of the exact XLA route. (Measured
    perf-neutral on TPU, so 'exact' is the default — PARITY.md.)"""
    from murcl_tpu.models import CLAM_SB

    fin = 8
    h = jnp.asarray(rng.normal(size=(2, N, fin)).astype(np.float32))
    m_fused = CLAM_SB(in_dim=fin, k_sample=4, n_classes=2, attn_impl="pallas",
                      attn_gate_math="approx")
    m_xla = CLAM_SB(in_dim=fin, k_sample=4, n_classes=2, attn_impl="xla")
    params = m_xla.init(jax.random.PRNGKey(0), h)
    got, aux_g = m_fused.apply(params, h)
    want, aux_w = m_xla.apply(params, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)
    np.testing.assert_allclose(np.asarray(aux_g["attention"]),
                               np.asarray(aux_w["attention"]), atol=5e-3)


# ------------------------------------------------------------- tiled kernel --
def test_tiled_forward_matches_xla(rng):
    """Streaming online-softmax kernel == XLA reference on a multi-tile bag."""
    B2, N2, F2, D2 = 2, 32, 8, 4
    x = jnp.asarray(rng.normal(size=(B2, N2, F2)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.3)
    ba = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.3)
    bb = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.3)
    bc = jnp.float32(0.02)
    mask = jnp.asarray(np.arange(N2)[None, :] < np.array([32, 20])[:, None])

    got = gap.attention_pool_tiled(x, wa, ba, wb, bb, wc, bc, mask=mask,
                                   gated=True, tile=8)
    want = gap.gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask=mask)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)

    # XLA-backed backward works through the custom_vjp
    grad = jax.grad(lambda x_: jnp.sum(gap.attention_pool_tiled(
        x_, wa, ba, wb, bb, wc, bc, mask=mask, gated=True, tile=8)[0] ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(grad),
        np.asarray(jax.grad(lambda x_: jnp.sum(gap.gated_attention_pool_xla(
            x_, wa, ba, wb, bb, wc, bc, mask=mask)[0] ** 2))(x)),
        atol=2e-5,
    )


def test_tiled_pads_non_multiple_bags(rng):
    """N not a tile multiple: zero-pad + False mask, outputs sliced back."""
    B2, N2, F2, D2 = 2, 29, 8, 4
    x = jnp.asarray(rng.normal(size=(B2, N2, F2)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.3)
    ba = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.3)
    bb = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.3)
    bc = jnp.float32(0.02)
    mask = jnp.asarray(np.arange(N2)[None, :] < np.array([29, 17])[:, None])

    got = gap.attention_pool_tiled(x, wa, ba, wb, bb, wc, bc, mask=mask,
                                   gated=True, tile=8)
    want = gap.gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask=mask)
    assert got[1].shape == (B2, N2) and got[2].shape == (B2, N2)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_large_bag_routes_to_tiled(rng, monkeypatch):
    """gated_attention_pool streams oversized dropout-free bags through the
    tiled kernel (the full-bag heatmap path, create_heatmaps.py:160-162)."""
    calls = {}
    orig = gap.attention_pool_tiled

    def spy(*a, **k):
        calls["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gap, "attention_pool_tiled", spy)
    # force the pallas route on CPU; 2048 * 1024 f32 > 6 MB threshold
    B2, N2, F2, D2 = 1, 2048, 1024, 4
    x = jnp.asarray(rng.normal(size=(B2, N2, F2)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.1)
    ba = jnp.zeros((D2,))
    wb = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.1)
    bb = jnp.zeros((D2,))
    wc = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.1)
    bc = jnp.float32(0.0)
    got = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, impl="pallas")
    assert calls.get("hit"), "oversized bag did not route to the tiled kernel"
    want = gap.gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-4)


# --------------------------------------------- relaxed-ulp gate transcendentals --
def test_fast_tanh_sigmoid_error_bounds():
    """The (2,2) rational tanh and the shared sigmoid stay an order of
    magnitude under bf16 visibility (eps/2 ~= 2e-3) across the full range,
    including the saturation clamp region."""
    x = jnp.asarray(np.linspace(-20.0, 20.0, 400001).astype(np.float32))
    err_t = np.max(np.abs(np.asarray(gap.fast_tanh(x) - jnp.tanh(x))))
    err_s = np.max(np.abs(np.asarray(gap.fast_sigmoid(x) - jax.nn.sigmoid(x))))
    assert err_t <= 6e-4, err_t
    assert err_s <= 4e-4, err_s
    # odd/even symmetry and range sanity
    np.testing.assert_allclose(np.asarray(gap.fast_tanh(-x)),
                               -np.asarray(gap.fast_tanh(x)), atol=1e-7)
    t = np.asarray(gap.fast_tanh(x))
    s = np.asarray(gap.fast_sigmoid(x))
    assert np.all(np.abs(t) <= 1.0 + 1e-6) and np.all((s >= -1e-6) & (s <= 1 + 1e-6))


@pytest.mark.parametrize("gated", [True, False])
def test_approx_gate_math_forward(inputs, gated):
    x, wa, ba, wb, bb, wc, bc, mask = inputs
    want = gap.gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask, gated=gated)
    got = gap.gated_attention_pool(x, wa, ba, wb, bb, wc, bc, mask,
                                   impl="pallas", gated=gated,
                                   gate_math="approx")
    for name, w, g in zip(["m", "p", "s"], want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-3,
                                   err_msg=name)


def test_approx_gate_math_grads(inputs):
    """Approx-gate gradients track the exact ones closely (the backward
    re-derives a/g with the same rational, so the VJP is self-consistent)."""
    x, wa, ba, wb, bb, wc, bc, mask = inputs

    def loss(gate_math):
        def f(x, wa, ba, wb, bb, wc, bc):
            m, p, s = gap.gated_attention_pool(
                x, wa, ba, wb, bb, wc, bc, mask, impl="pallas", gated=True,
                gate_math=gate_math,
            )
            return jnp.sum(m * m)
        return f

    args = (x, wa, ba, wb, bb, wc, bc)
    g_exact = jax.grad(loss("exact"), argnums=tuple(range(7)))(*args)
    g_apx = jax.grad(loss("approx"), argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x", "wa", "ba", "wb", "bb", "wc", "bc"],
                          g_exact, g_apx):
        a, b = np.asarray(a), np.asarray(b).reshape(np.asarray(a).shape)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=2e-2 * scale, err_msg=name)


def test_fused_trunk_approx_gate_math(trunk_inputs):
    h, wf, bf, wa, ba, wb, bb, wc, bc, mask = trunk_inputs
    want = gap.fused_trunk_attention_pool_xla(
        h, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, gated=True)
    got = gap.fused_trunk_attention_pool(
        h, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, impl="pallas",
        gated=True, gate_math="approx")
    for name, w, g in zip(["m", "p", "s"], want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-3,
                                   err_msg=name)

    def loss(gate_math):
        def f(*a):
            m, p, s = gap.fused_trunk_attention_pool(
                *a, mask=mask, impl="pallas", gated=True, gate_math=gate_math)
            return jnp.sum(m * m)
        return f

    args = (h, wf, bf, wa, ba, wb, bb, wc, bc)
    g_exact = jax.grad(loss("exact"), argnums=tuple(range(9)))(*args)
    g_apx = jax.grad(loss("approx"), argnums=tuple(range(9)))(*args)
    names = ["h", "wf", "bf", "wa", "ba", "wb", "bb", "wc", "bc"]
    for name, a, b in zip(names, g_exact, g_apx):
        a, b = np.asarray(a), np.asarray(b).reshape(np.asarray(a).shape)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=2e-2 * scale, err_msg=name)


def test_tiled_approx_gate_math(rng):
    B2, N2, F2, D2 = 2, 32, 8, 4
    x = jnp.asarray(rng.normal(size=(B2, N2, F2)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.3)
    ba = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.normal(size=(F2, D2)).astype(np.float32) * 0.3)
    bb = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.normal(size=(D2,)).astype(np.float32) * 0.3)
    bc = jnp.float32(0.02)
    mask = jnp.asarray(np.arange(N2)[None, :] < np.array([32, 20])[:, None])
    got = gap.attention_pool_tiled(x, wa, ba, wb, bb, wc, bc, mask=mask,
                                   gated=True, tile=8, gate_math="approx")
    want = gap.gated_attention_pool_xla(x, wa, ba, wb, bb, wc, bc, mask=mask)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-3)


# ----------------------------------------------------- in-kernel mixup fusion --
def test_fused_trunk_mix_matches_premixed(trunk_inputs, rng):
    """mix=(perm, lam) inside the fused kernel == mixup_rows then the plain
    fused kernel — bitwise (same mix formula), fwd and parameter grads."""
    from murcl_tpu.ops.compact_pallas import mixup_rows

    h, wf, bf, wa, ba, wb, bb, wc, bc, mask = trunk_inputs
    perm = jnp.asarray([2, 0, 1], jnp.int32)
    lam = jnp.asarray(rng.uniform(0.9, 1.0, size=(B,)).astype(np.float32))

    premixed = mixup_rows(h, perm, lam, interpret=True)
    want = gap.fused_trunk_attention_pool(
        premixed, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, impl="pallas",
        gated=True, input_grad=False)
    got = gap.fused_trunk_attention_pool(
        h, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, impl="pallas",
        gated=True, input_grad=False, mix=(perm, lam))
    for name, w, g in zip(["m", "p", "s"], want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=name)

    def loss(use_mix):
        def f(wf_, wa_, wb_, wc_):
            hh = h if use_mix else premixed
            m, p, s = gap.fused_trunk_attention_pool(
                hh, wf_, bf, wa_, ba, wb_, bb, wc_, bc, mask=mask,
                impl="pallas", gated=True, input_grad=False,
                mix=(perm, lam) if use_mix else None)
            return jnp.sum(m * m) + jnp.sum(jnp.sin(p))
        return f

    g_pre = jax.grad(loss(False), argnums=(0, 1, 2, 3))(wf, wa, wb, wc)
    g_mix = jax.grad(loss(True), argnums=(0, 1, 2, 3))(wf, wa, wb, wc)
    for name, a, b in zip(["wf", "wa", "wb", "wc"], g_pre, g_mix):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6,
                                   err_msg=name)


def test_fused_trunk_mix_xla_path_matches(trunk_inputs, rng):
    """The non-pallas route applies the identical explicit mix expression."""
    from murcl_tpu.ops.compact_pallas import mixup_rows

    h, wf, bf, wa, ba, wb, bb, wc, bc, mask = trunk_inputs
    perm = jnp.asarray([1, 2, 0], jnp.int32)
    lam = jnp.asarray(rng.uniform(0.9, 1.0, size=(B,)).astype(np.float32))
    premixed = mixup_rows(h, perm, lam, interpret=True)
    want = gap.fused_trunk_attention_pool_xla(
        premixed, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, gated=True)
    got = gap.fused_trunk_attention_pool(
        h, wf, bf, wa, ba, wb, bb, wc, bc, mask=mask, impl="xla",
        gated=True, mix=(perm, lam))
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_lean_mask_fold_is_value_identical():
    """The {0, scale} folded masks are value-identical to the unfolded
    max/cast/keep/scale chains the kernels used before (the lean
    formulation the production kernels now compute — see
    ``_scaled_keep_masks_trunk``). Pure-jnp property check; the PRNG
    stream itself is pinned by the TPU-only determinism tests."""
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.normal(size=(2048,)) * 2, jnp.float32)
    bits = jnp.asarray(rng.integers(0, 2**32, size=2048, dtype=np.uint32))
    thresh = jnp.uint32(int(0.25 * 2**32))
    for dt in (jnp.bfloat16, jnp.float32):
        scale_c = jnp.asarray(1.0 / 0.75, jnp.float32).astype(dt)
        zero = jnp.asarray(0.0, dt)
        keep01 = (bits >= thresh).astype(dt)
        kx = jnp.where(bits >= thresh, scale_c, zero)
        # trunk chain: relu + keep + scale vs one folded mask
        unfolded = jnp.maximum(z, 0.0).astype(dt) * keep01 * scale_c
        folded = z.astype(dt) * jnp.where(z > 0, kx, zero)
        assert bool(jnp.all(unfolded == folded)), dt
        # gate chain: v * keep * scale vs v * kmask
        v = jnp.asarray(rng.normal(size=(2048,)), jnp.float32).astype(dt)
        assert bool(jnp.all(v * keep01 * scale_c == v * kx)), dt
        # f32 where-formulation of the plain kernels vs folded
        if dt == jnp.float32:
            keep_bool = bits >= thresh
            scale = 1.0 / 0.75
            assert bool(jnp.all(jnp.where(keep_bool, v * scale, 0.0)
                                == v * kx))
