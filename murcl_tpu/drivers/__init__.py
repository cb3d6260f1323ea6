"""Training drivers: MuRCL pretraining and downstream supervised RLMIL."""

from murcl_tpu.drivers import murcl, rlmil
from murcl_tpu.drivers.common import (
    EpochOutputs,
    epoch_batches,
    murcl_save_dir,
    rlmil_save_dir,
)

__all__ = [
    "EpochOutputs",
    "epoch_batches",
    "murcl",
    "murcl_save_dir",
    "rlmil",
    "rlmil_save_dir",
]
