"""Model zoo: MIL aggregators, contrastive wrapper, recurrent head, PPO.

Registry + factory mirroring the reference's module-level ``MODELS`` dict
(``train_RLMIL.py:1165-1178``, ``train_MuRCL.py:487``) with the reference
constructor knobs (arch setting sizes, dropout, k_sample, subtyping).
"""

from __future__ import annotations

from typing import Optional

from murcl_tpu.models.abmil import ABMIL, masked_attention_pool
from murcl_tpu.models.cl import CL
from murcl_tpu.models.clam import CLAM_SB, AttentionPool
from murcl_tpu.models.dsmil import MILNet
from murcl_tpu.models.layers import MLP, TorchGRUCell, TorchLinear, xavier_normal
from murcl_tpu.models.rlmil import (
    PPO,
    ActorCritic,
    FullLayer,
    PolicyStep,
    PPOTrainState,
    Rollout,
    act,
    evaluate,
)


def build_aggregator(
    arch: str,
    dim_in: int,
    num_classes: int = 2,
    arch_setting: Optional[dict] = None,
):
    """Instantiate a MIL aggregator by name (``ABMIL | CLAM_SB | DSMIL``).

    ``arch_setting`` carries the per-arch knobs the reference exposes:
    ABMIL ``{L, D, dropout, dim_out}`` (abmil.py:8), CLAM ``{gate, size_arg,
    dropout, k_sample, subtyping}`` (clam.py:64-65), DSMIL ``{dropout_v}``
    (dsmil.py:53). Returns ``(module, feature_dim)`` where ``feature_dim``
    is the aggregator's bag-embedding width (what ``FullLayer`` consumes).
    """
    s = dict(arch_setting or {})
    if arch == "ABMIL":
        model = ABMIL(
            dim_in=dim_in,
            L=s.get("L", 512),
            D=s.get("D", 128),
            K=s.get("K", 1),
            dim_out=s.get("dim_out", num_classes),
            dropout=s.get("dropout", 0.0),
            attn_gate_math=s.get("attn_gate_math", "exact"),
        )
        return model, model.L
    if arch == "CLAM_SB":
        model = CLAM_SB(
            in_dim=dim_in,
            gate=s.get("gate", True),
            size_arg=s.get("size_arg", "small"),
            dropout=s.get("dropout", 0.0),
            k_sample=s.get("k_sample", 8),
            n_classes=num_classes,
            subtyping=s.get("subtyping", False),
            attn_gate_math=s.get("attn_gate_math", "exact"),
        )
        return model, 512
    if arch == "DSMIL":
        model = MILNet(
            dim_feat=dim_in,
            num_classes=num_classes,
            dropout_v=s.get("dropout_v", 0.0),
        )
        return model, dim_in
    raise ValueError(f"unknown arch {arch!r}; expected ABMIL | CLAM_SB | DSMIL")


MODELS = {"ABMIL": ABMIL, "CLAM_SB": CLAM_SB, "DSMIL": MILNet}

__all__ = [
    "ABMIL",
    "ActorCritic",
    "AttentionPool",
    "CL",
    "CLAM_SB",
    "FullLayer",
    "MILNet",
    "MLP",
    "MODELS",
    "PPO",
    "PPOTrainState",
    "PolicyStep",
    "Rollout",
    "TorchGRUCell",
    "TorchLinear",
    "act",
    "build_aggregator",
    "evaluate",
    "masked_attention_pool",
    "xavier_normal",
]
