"""Contrastive dual-view wrapper (reference ``models/cl.py``).

The reference ``CL`` module owns an ``encoder`` and maps it over a list of
two augmented views, returning the outputs plus detached copies used as RL
states (``cl.py:12-15``); despite storing ``projection_dim``/``n_features``
it creates no projection head (``:9-10``) — projection happens via the
aggregator output + ``Full_layer``. In JAX "detached" is just
``stop_gradient`` at the use site, so the wrapper only needs to preserve
the ``encoder.*`` parameter nesting (the downstream weight-surgery loaders
strip an ``encoder.`` prefix, ``train_RLMIL.py:124-135``).
"""

from __future__ import annotations

from typing import Any, Sequence

from flax import linen as nn


class CL(nn.Module):
    """Applies ``encoder`` to each view; returns a list of its outputs."""

    encoder: nn.Module
    projection_dim: int = 128  # stored-but-unused, like the reference
    n_features: int = 512

    @nn.compact
    def __call__(self, x_views: Sequence[Any], train: bool = False):
        return [self.encoder(x, train=train) for x in x_views]
