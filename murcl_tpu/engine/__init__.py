"""Training engines: jitted T-step rollout programs + checkpointing."""

from murcl_tpu.engine.config import PretrainConfig, RolloutConfig
from murcl_tpu.engine.contrastive import ContrastiveEngine, PretrainStats
from murcl_tpu.engine.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    stage_chain_path,
    transfer_params,
)
from murcl_tpu.engine.losses import (
    cosine_similarity,
    cross_entropy,
    label_confidence,
    masked_mean,
)
from murcl_tpu.engine.supervised import (
    AggTrainState,
    BankArrays,
    StepStats,
    SupervisedEngine,
)

__all__ = [
    "AggTrainState",
    "BankArrays",
    "ContrastiveEngine",
    "PretrainConfig",
    "PretrainStats",
    "RolloutConfig",
    "StepStats",
    "SupervisedEngine",
    "cosine_similarity",
    "cross_entropy",
    "label_confidence",
    "load_checkpoint",
    "masked_mean",
    "save_checkpoint",
    "stage_chain_path",
    "transfer_params",
]
