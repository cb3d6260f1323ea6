"""Static configuration for the jitted training programs.

Everything here is a trace-time constant: changing a field recompiles,
which is exactly the XLA contract. Field names track the reference CLI
flags (``train_RLMIL.py:1060-1153``, ``train_MuRCL.py:386-475``) so the
drivers translate 1:1.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RolloutConfig:
    """Shape + schedule of the T-step cluster-window rollout."""

    arch: str  # ABMIL | CLAM_SB | DSMIL
    T: int = 6
    feat_size: int = 1024
    num_clusters: int = 10
    max_patches: int = 0  # static Nmax of the feature bank
    train_stage: int = 1  # 1 | 2 | 3
    num_classes: int = 2

    # arch-specific loss knobs
    bag_weight: float = 0.7  # CLAM (train_RLMIL.py:1134)
    train_model_prime: bool = True  # ABMIL t=0 gradient gate (:719-725)

    # aggregator compute dtype; losses/softmax/GRU head stay float32.
    # bfloat16 feeds the MXU at full rate (f32 runs at ~1/4 peak on v5e)
    compute_dtype: str = "float32"  # float32 | bfloat16

    # rollout-step rematerialization. "save_subbag": recompute each step's
    # aggregator activations in the backward, keeping only the selected
    # sub-bag (needed when XLA materializes the (B, N, 512) trunk/gate
    # tensors — unfused paths OOM 16 GB HBM at the canonical shape).
    # "none": save everything — correct choice for CLAM's fused
    # trunk+attention kernel, whose custom VJP keeps no big XLA
    # intermediates; skips one full forward replay per rollout step.
    remat: str = "save_subbag"  # save_subbag | none

    # stage-1 rollout layout. Stage 1 draws every action uniformly at
    # random (train_MuRCL.py:235-236,256-258; train_RLMIL.py:347), so no
    # step's selection depends on an earlier step: "batched" folds all T
    # steps' selection + mixup + aggregator forwards into ONE (T*2B, N, D)
    # program (one big kernel grid instead of T sequential launches; only
    # the GRU head scans). "sequential" keeps the stage-2/3 scan shape.
    # Stages with a policy are always sequential (actions depend on the
    # previous step's encoder state).
    stage1_layout: str = "batched"  # batched | sequential

    # sub-bag materialization in the batched layout. "auto": on TPU, the
    # compaction-matmul Pallas kernel (ops/compact_pallas.py) replaces the
    # rank scatter + row gather + mask pass; elsewhere (and with "xla")
    # the select_feats gather path runs. Identical outputs either way.
    select_impl: str = "auto"  # auto | xla

    @property
    def uses_policy(self) -> bool:
        return self.train_stage != 1


@dataclass(frozen=True)
class PretrainConfig(RolloutConfig):
    """MuRCL contrastive pretraining extras (``train_MuRCL.py``)."""

    alpha: float = 0.9  # mixup lower bound (:415)
    temperature: float = 0.5  # NT-Xent tau (:414)
    batch_size: int = 128
