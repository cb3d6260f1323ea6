"""NT-Xent Pallas kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import murcl_tpu.ops.ntxent_pallas as ntp
from murcl_tpu.ops.ntxent import nt_xent


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ntp.pl, "pallas_call", interp)


@pytest.mark.parametrize("b,d,temp", [(4, 8, 0.5), (16, 32, 1.0)])
def test_forward_matches(b, d, temp):
    rng = np.random.default_rng(0)
    z_i = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    z_j = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    want = float(nt_xent(z_i, z_j, temp))
    got = float(ntp.nt_xent_pallas(z_i, z_j, temp))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_grads_match():
    rng = np.random.default_rng(1)
    z_i = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    z_j = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))

    g_ref = jax.grad(lambda a, b: nt_xent(a, b, 0.5), argnums=(0, 1))(z_i, z_j)
    g_pal = jax.grad(lambda a, b: ntp.nt_xent_pallas(a, b, 0.5), argnums=(0, 1))(z_i, z_j)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)


def test_grad_scaling():
    """Upstream cotangent scales linearly through the custom VJP."""
    rng = np.random.default_rng(2)
    z_i = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    z_j = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    g1 = jax.grad(lambda a: ntp.nt_xent_pallas(a, z_j, 1.0))(z_i)
    g3 = jax.grad(lambda a: 3.0 * ntp.nt_xent_pallas(a, z_j, 1.0))(z_i)
    np.testing.assert_allclose(np.asarray(g3), 3 * np.asarray(g1), rtol=1e-5)
