"""Uniform batch-source interface over resident and streaming banks.

Drivers talk to a :class:`SplitSource`: ``batch(ids)`` yields
``(BankArrays, slide_ids, labels)`` ready for a jitted engine step,
regardless of whether the split lives in HBM (:class:`ResidentSource`,
Camelyon16 scale) or streams from host RAM (:class:`StreamingSource`,
TCGA scale).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from murcl_tpu.data.bank import FeatureBank, build_bank, harmonize_banks
from murcl_tpu.data.streaming import StreamingBank


class ResidentSource:
    """Whole split resident in HBM; batches are just id vectors."""

    PREFETCH = 0  # nothing to stage

    def __init__(self, bank: FeatureBank):
        from murcl_tpu.engine.supervised import BankArrays

        self.bank = bank
        self._arrays = BankArrays.from_bank(bank)
        self.labels = np.asarray(bank.labels)
        self.case_ids = bank.case_ids
        self.num_slides = bank.num_slides
        self.num_clusters = bank.num_clusters
        self.patch_dim = bank.patch_dim
        self.max_patches = bank.max_patches

    def batch(self, ids: np.ndarray):
        import jax.numpy as jnp

        ids = np.asarray(ids, dtype=np.int32)
        return self._arrays, jnp.asarray(ids), jnp.asarray(self.labels[ids])

    def iter_batches(self, id_list):
        for ids in id_list:
            yield self.batch(ids)


class StreamingSource:
    """Host-resident split; each batch staged as a mini-bank."""

    def __init__(self, stream: StreamingBank, max_patches: Optional[int] = None):
        self.stream = stream
        self.labels = np.asarray(stream.labels)
        self.case_ids = stream.case_ids
        self.num_slides = stream.num_slides
        self.num_clusters = stream.num_clusters
        self.patch_dim = stream.patch_dim
        self.max_patches = max_patches or stream.max_patches

    def batch(self, ids: np.ndarray):
        return self.stream.stage(np.asarray(ids, dtype=np.int32))

    def iter_batches(self, id_list):
        """Prefetching iterator: the next batch stages on a background
        thread while the device computes on the current one."""
        return self.stream.iter_epoch(list(id_list), prefetch=1)


def build_sources(data_csv, split_indices: dict, streaming: bool = False,
                  feats_dtype=None):
    """Build one source per split with shared static shapes.

    ``feats_dtype`` stores the resident bank's features in that dtype
    (e.g. bfloat16 when the engines compute in bfloat16 — halves the
    selection kernels' HBM traffic; the engines cast sub-bags to the
    compute dtype right after selection either way, and gather-then-cast
    equals cast-then-gather).
    """
    if feats_dtype is not None and isinstance(feats_dtype, str):
        import jax.numpy as jnp

        supported = {"bfloat16": jnp.bfloat16, "float32": None}
        if feats_dtype not in supported:
            raise ValueError(
                f"feats_dtype must be one of {sorted(supported)} (got "
                f"{feats_dtype!r})"
            )
        feats_dtype = supported[feats_dtype]
    if not streaming:
        banks = harmonize_banks({
            name: build_bank(data_csv, indices=idx)
            for name, idx in split_indices.items()
        })
        return {name: ResidentSource(b.device(dtype=feats_dtype))
                for name, b in banks.items()}
    streams = {
        name: StreamingBank(data_csv, indices=idx)
        for name, idx in split_indices.items()
    }
    n_max = max(s.max_patches for s in streams.values())
    return {name: StreamingSource(s, max_patches=n_max) for name, s in streams.items()}
