"""Data-parallel scaling over a ``jax.sharding.Mesh``.

The reference's only multi-device construct is single-process
``torch.nn.DataParallel`` (``train_MuRCL.py:145``; ``train_RLMIL.py:238``)
— replicate the module, scatter the batch, gather outputs. The TPU-native
equivalent is *placement, not code*: the engines' jitted programs are
global-view, so sharding the batch axis over a ``('data',)`` mesh and
replicating parameters makes XLA partition every op along the batch and
insert the gradient ``psum`` / NT-Xent ``all_gather`` collectives over ICI
automatically. No engine code changes; scaling is a data-placement
decision.

For the model sizes involved (512-dim MLPs) tensor/pipeline parallelism is
pure overhead — DP over bags is the right and only axis (SURVEY §2.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D ``('data',)`` mesh over the first ``n_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def place_replicated(mesh: Mesh, tree):
    """Replicate a pytree (params, optimizer state, bank) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def place_batch(mesh: Mesh, tree):
    """Shard leading (batch) axes across the ``data`` mesh axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(tree, sharding)


def shard_engine_inputs(mesh: Mesh, agg_state, ppo_state, bank, slide_ids,
                        labels=None, valid=None):
    """Place one engine step's inputs for data-parallel execution.

    Parameters/optimizer state and the feature bank are replicated (the
    bank is read-only and every shard gathers arbitrary rows from it);
    the per-sample arrays are sharded along ``data``. Returns the placed
    values in the same order.
    """
    agg_state = place_replicated(mesh, agg_state)
    ppo_state = place_replicated(mesh, ppo_state) if ppo_state is not None else None
    bank = place_replicated(mesh, bank)
    slide_ids = place_batch(mesh, slide_ids)
    out = [agg_state, ppo_state, bank, slide_ids]
    if labels is not None:
        out.append(place_batch(mesh, labels))
    if valid is not None:
        out.append(place_batch(mesh, valid))
    return tuple(out)
