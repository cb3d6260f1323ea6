"""Shared building blocks with torch-parity initialization.

The reference models rely on PyTorch's default initializers (``nn.Linear``:
kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias; ``nn.GRU``: U(-1/sqrt(H), 1/sqrt(H)) everywhere) and on
CLAM's xavier-normal + zero-bias scheme (``models/clam.py:7-15``).
Training-dynamics parity starts at init parity, so these modules reproduce
the distributions exactly while staying idiomatic flax.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_in(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_normal() -> Callable:
    """Xavier/Glorot normal on an (fan_in, fan_out) kernel (CLAM init)."""
    return jax.nn.initializers.glorot_normal(in_axis=0, out_axis=1)


class TorchLinear(nn.Module):
    """Dense layer initialized like ``torch.nn.Linear``'s default.

    Kernel and bias are U(-1/sqrt(fan_in), +1/sqrt(fan_in)); the kernel is
    stored as ``(fan_in, features)`` (jax convention, transposed vs torch).
    ``kernel_init``/``bias_init`` override the default (e.g. CLAM's
    xavier-normal + zeros).
    """

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kinit = self.kernel_init or _uniform_in(bound)
        kernel = self.param("kernel", kinit, (fan_in, self.features))
        y = jnp.dot(x, kernel.astype(x.dtype), precision=None)
        if self.use_bias:
            binit = self.bias_init or _uniform_in(bound)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class MLP(nn.Module):
    """Stack of TorchLinear -> activation (+ optional dropout) blocks."""

    features: Sequence[int]
    dropout: float = 0.0
    activation: Callable = nn.relu
    final_activation: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.features)
        for i, width in enumerate(self.features):
            x = TorchLinear(width, name=f"dense_{i}")(x)
            if i < n - 1 or self.final_activation:
                x = self.activation(x)
            if self.dropout > 0.0 and (i < n - 1 or self.final_activation):
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class TorchGRUCell(nn.Module):
    """GRU cell with torch's exact parametrization and gate equations.

    Weight layout matches ``torch.nn.GRU`` (gates ordered r, z, n; separate
    input/hidden biases; ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``)
    so reference checkpoints round-trip without math drift. Init is
    U(-1/sqrt(H), 1/sqrt(H)) like torch RNNs.
    """

    hidden_features: int

    @nn.compact
    def __call__(self, h, x):
        hf = self.hidden_features
        bound = 1.0 / math.sqrt(hf)
        init = _uniform_in(bound)
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * hf))
        w_hh = self.param("w_hh", init, (hf, 3 * hf))
        b_ih = self.param("b_ih", init, (3 * hf,))
        b_hh = self.param("b_hh", init, (3 * hf,))

        gi = jnp.dot(x, w_ih) + b_ih
        gh = jnp.dot(h, w_hh) + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)

        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    @staticmethod
    def zero_state(batch: int, hidden: int, dtype=jnp.float32):
        return jnp.zeros((batch, hidden), dtype=dtype)
