from murcl_tpu.utils.general import (
    AverageMeter,
    BestVariable,
    CSVWriter,
    EarlyStop,
    dump_json,
    increment_path,
    init_seeds,
    load_json,
    load_yaml,
    save_checkpoint,
)

__all__ = [
    "AverageMeter",
    "BestVariable",
    "CSVWriter",
    "EarlyStop",
    "dump_json",
    "increment_path",
    "init_seeds",
    "load_json",
    "load_yaml",
    "save_checkpoint",
]
