"""Unit tests for mixup, NT-Xent, and metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from murcl_tpu.ops.metrics import accuracy_topk, get_metrics, get_score
from murcl_tpu.ops.mixup import mixup
from murcl_tpu.ops.ntxent import nt_xent


# ---------------------------------------------------------------- mixup ----
def test_mixup_convex_combination():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 10, 4)).astype(np.float32))
    mixed, lam, perm = mixup(rng, x, 0.9)
    lam = np.asarray(lam)
    perm = np.asarray(perm)
    assert (lam >= 0.9).all() and (lam <= 1.0).all()
    want = lam[:, :, None] * np.asarray(x) + (1 - lam[:, :, None]) * np.asarray(x)[perm]
    np.testing.assert_allclose(np.asarray(mixed), want, rtol=1e-6)


def test_mixup_alpha_one_is_identity():
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((4, 5, 3))
    mixed, lam, _ = mixup(rng, x, 1.0)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(x), rtol=1e-6)


# --------------------------------------------------------------- nt_xent ----
def _ntxent_oracle(z_i, z_j, temperature):
    """Direct transcription of the reference NT_Xent (utils/losses.py:5-41)."""
    z = np.concatenate([z_i, z_j], axis=0).astype(np.float64)
    n = z.shape[0]
    b = n // 2
    norm = np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-8)
    zn = z / norm
    sim = zn @ zn.T / temperature
    total = 0.0
    for i in range(n):
        partner = (i + b) % n
        logits = [sim[i, partner]] + [sim[i, j] for j in range(n) if j != i and j != partner]
        logits = np.array(logits)
        total += -logits[0] + np.log(np.exp(logits).sum())
    return total / n


@pytest.mark.parametrize("temperature", [0.5, 1.0])
@pytest.mark.parametrize("b", [4, 16])
def test_ntxent_matches_reference_math(temperature, b):
    rng = np.random.default_rng(0)
    z_i = rng.normal(size=(b, 8)).astype(np.float32)
    z_j = rng.normal(size=(b, 8)).astype(np.float32)
    got = float(nt_xent(jnp.asarray(z_i), jnp.asarray(z_j), temperature))
    want = _ntxent_oracle(z_i, z_j, temperature)
    # implementation runs in float32; the oracle accumulates in float64
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_ntxent_identical_views_lower_than_random():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(8, 16)).astype(np.float32)
    z2 = rng.normal(size=(8, 16)).astype(np.float32)
    same = float(nt_xent(jnp.asarray(z), jnp.asarray(z), 0.5))
    diff = float(nt_xent(jnp.asarray(z), jnp.asarray(z2), 0.5))
    assert same < diff


def test_ntxent_grad_finite():
    rng = np.random.default_rng(2)
    z_i = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    z_j = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    g = jax.grad(lambda a, b: nt_xent(a, b, 1.0))(z_i, z_j)
    assert np.isfinite(np.asarray(g)).all()


# --------------------------------------------------------------- metrics ----
def test_accuracy_topk():
    outputs = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7], [0.6, 0.4]])
    targets = np.array([1, 0, 0, 0])
    (top1,) = accuracy_topk(outputs, targets, topk=(1,))
    assert top1 == 75.0


def test_get_metrics_binary_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(40, 2))
    targets = rng.integers(0, 2, size=40)
    acc, auc, p, r, f1 = get_metrics(logits, targets)
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    assert abs(auc - roc_auc_score(targets, probs[:, 1])) < 1e-9
    assert 0 <= acc <= 1 and 0 <= f1 <= 1


def test_get_metrics_multiclass():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(60, 3))
    targets = rng.integers(0, 3, size=60)
    acc, auc, p, r, f1 = get_metrics(logits, targets)
    assert 0 <= auc <= 1


def test_get_score_weights():
    assert abs(get_score(1, 1, 1, 1, 1) - 1.0) < 1e-12
    assert abs(get_score(1, 0, 0, 0, 0) - 0.3) < 1e-12
