from murcl_tpu.ops.select import select_indices, select_feats, select_feats_oracle
from murcl_tpu.ops.mixup import mixup
from murcl_tpu.ops.ntxent import nt_xent
from murcl_tpu.ops.metrics import accuracy_topk, get_metrics, get_score

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
