"""Multi-chip scaling utilities."""

from murcl_tpu.parallel.mesh import (
    data_mesh,
    place_batch,
    place_replicated,
    shard_engine_inputs,
)

__all__ = [
    "data_mesh",
    "place_batch",
    "place_replicated",
    "shard_engine_inputs",
]
