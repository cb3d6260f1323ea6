"""Checkpoint save/load with the reference's file layout and chaining rules.

Reference behavior (``utils/general.py:207-211``; ``train_MuRCL.py:322-329``;
``train_RLMIL.py:930-941``): every epoch writes ``checkpoint.pth.tar`` —
a dict ``{epoch, model_state_dict, fc, optimizer, ppo_optimizer, policy}``
— and copies it to ``model_best.pth.tar`` on improvement. Stage N+1
auto-loads ``../stage_N/model_best.pth.tar`` (``train_MuRCL.py:108-109``;
``train_RLMIL.py:147-232``); the pretrain->downstream transfer strips the
``encoder.`` prefix and drops projection heads with ``strict=False``
(``train_RLMIL.py:124-135``).

Here the states are JAX pytrees, pickled as numpy with the same top-level
keys and file names, so the reference's directory/chaining conventions work
unchanged. Because pretraining stores the *aggregator* tree directly (the
CL wrapper adds no parameters), the reference's key surgery reduces to
selecting the ``model`` subtree and skipping shape-mismatched leaves.
"""

from __future__ import annotations

import os
import pickle
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    save_dir,
    epoch: int,
    agg_state,
    ppo_state=None,
    is_best: bool = False,
    filename: str = "checkpoint.pth.tar",
    extra: Optional[dict] = None,
) -> str:
    """Write the epoch checkpoint (+ ``model_best.pth.tar`` copy on best)."""
    state = {
        "epoch": epoch,
        "model_state_dict": _to_numpy(agg_state.params["model"]),
        "fc": _to_numpy(agg_state.params["fc"]),
        "optimizer": _to_numpy(agg_state.opt_state) if agg_state.opt_state is not None else None,
        "ppo_optimizer": _to_numpy(ppo_state.opt_state) if ppo_state is not None else None,
        "policy": _to_numpy(ppo_state.params) if ppo_state is not None else None,
        "format": "murcl_tpu/v1",
    }
    if extra:
        state.update(extra)
    path = os.path.join(str(save_dir), filename)
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fp:
        pickle.dump(state, fp)
    if is_best:
        shutil.copyfile(path, os.path.join(str(save_dir), "model_best.pth.tar"))
    return path


def load_checkpoint(path, arch: Optional[str] = None) -> dict:
    """Load a checkpoint; native pickles and reference torch ``.pth.tar``
    files are both accepted (torch zip archives start with ``PK``; the
    import needs ``arch`` to pick the key mapping)."""
    with open(path, "rb") as fp:
        magic = fp.read(2)
    if magic == b"PK":
        from murcl_tpu.engine.torch_import import import_reference_checkpoint

        if arch is None:
            raise ValueError(
                f"{path} is a torch checkpoint; pass arch= to convert it"
            )
        return import_reference_checkpoint(path, arch)
    with open(path, "rb") as fp:
        return pickle.load(fp)


def _tree_transfer(target, source, skipped: list, path=""):
    """Copy leaves from ``source`` into ``target`` where names+shapes match.

    The ``strict=False`` analogue of the reference's weight surgery
    (``train_RLMIL.py:124-135``): missing keys keep their fresh init,
    shape-mismatched heads are skipped and reported.
    """
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(source, dict) and k in source:
                out[k] = _tree_transfer(v, source[k], skipped, f"{path}/{k}")
            else:
                skipped.append(f"{path}/{k} (missing in source)")
                out[k] = v
        return out
    src = np.asarray(source)
    if np.shape(target) != src.shape:
        skipped.append(f"{path} (shape {np.shape(target)} != {src.shape})")
        return target
    return src


def transfer_params(fresh_params: Any, ckpt_tree: Any, verbose: bool = True):
    """Load ``ckpt_tree`` into a freshly initialized param tree, skipping
    missing / mismatched leaves (projection heads, class-count changes)."""
    skipped: list = []
    out = _tree_transfer(fresh_params, ckpt_tree, skipped)
    if verbose and skipped:
        print(f"transfer_params: kept fresh init for {len(skipped)} leaves:")
        for s in skipped[:20]:
            print(f"  - {s}")
    return out


def stage_chain_path(save_dir, train_stage: int) -> Optional[str]:
    """``<save_dir>/../stage_{N-1}/model_best.pth.tar`` if it exists."""
    if train_stage <= 1:
        return None
    p = Path(save_dir).parent / f"stage_{train_stage - 1}" / "model_best.pth.tar"
    return str(p) if p.exists() else None
