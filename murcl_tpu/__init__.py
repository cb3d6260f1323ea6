"""murcl_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of MuRCL.

MuRCL (reference: /root/reference, wwu98934/MuRCL) is a whole-slide-image
classification pipeline: WSI tiling -> per-patch CNN features -> k-means
clusters -> a PPO agent picks cluster-window sub-bags -> a MIL aggregator
(ABMIL / CLAM_SB / DSMIL) pools them -> a GRU head accumulates a T-step
rollout -> trained contrastively (NT-Xent) or supervised (CE).

This package is a from-scratch re-design for TPU:

- everything fixed-shape; the cluster-window selection (reference
  ``utils/datasets.py:274-308``) is a pure on-device gather against a
  device-resident feature bank (``murcl_tpu.data.bank``),
- the T-step rollout is a single ``jax.lax.scan`` inside one jitted train
  step (``murcl_tpu.engine``),
- models are functional flax modules batched by ``vmap``
  (``murcl_tpu.models``), the PPO policy carries its GRU state explicitly,
- data-parallel scaling is a ``jax.sharding.Mesh`` over the batch axis
  (``murcl_tpu.parallel``), not DataParallel,
- the on-disk csv/npz/json data contract of the reference is preserved
  bit-for-bit (``murcl_tpu.data.contract``).
"""

__version__ = "0.1.0"

from murcl_tpu.ops import (  # noqa: E402
    accuracy_topk,
    get_metrics,
    get_score,
    mixup,
    nt_xent,
    select_feats,
    select_feats_oracle,
    select_indices,
)

__all__ = [
    "accuracy_topk",
    "get_metrics",
    "get_score",
    "mixup",
    "nt_xent",
    "select_feats",
    "select_feats_oracle",
    "select_indices",
]
