"""Shared driver plumbing: save-dir schemes, batch iteration, epoch metrics.

The save-dir naming encodes hyperparameters exactly like the reference
(``train_MuRCL.py:18-55``; ``train_RLMIL.py:20-57``) because the stage
chaining looks for ``../stage_N/model_best.pth.tar`` inside that layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np


def murcl_save_dir(args) -> str:
    """MuRCL pretraining run dir (``train_MuRCL.py:18-55``)."""
    murcl = f"T{args.T}_pd{args.projection_dim}_as{args.action_std}_pg{args.ppo_gamma}_tau{args.temperature}_alpha{args.alpha}"
    if args.arch == "ABMIL":
        arch_setting = f"L{args.model_dim}_D{args.D}_dpt{args.dropout}"
    elif args.arch == "CLAM_SB":
        arch_setting = f"size_{args.size_arg}_ks_{args.k_sample}"
    else:
        raise ValueError(args.arch)
    exp = "exp" if args.save_dir_flag is None else f"exp_{args.save_dir_flag}"
    return str(
        Path(args.base_save_dir)
        / f"{args.dataset}_np_{args.feat_size}" / "MuRCL" / murcl / args.arch
        / arch_setting / exp / f"seed{args.seed}" / f"stage_{args.train_stage}"
    )


def rlmil_save_dir(args) -> str:
    """Downstream RLMIL run dir (``train_RLMIL.py:20-57``)."""
    rl = f"T{args.T}_as{args.action_std}_pg{args.ppo_gamma}_phd{args.policy_hidden_dim}_fhd{args.fc_hidden_dim}"
    if args.arch == "ABMIL":
        arch_setting = f"L{args.L}_D{args.D}_dpt{args.dropout}"
    elif args.arch == "DSMIL":
        arch_setting = "default"
    elif args.arch == "CLAM_SB":
        arch_setting = f"size_{args.size_arg}_ks_{args.k_sample}_bw_{args.bag_weight}"
    else:
        raise ValueError(args.arch)
    exp = "exp" if args.save_dir_flag is None else f"exp_{args.save_dir_flag}"
    return str(
        Path(args.base_save_dir)
        / f"{args.dataset}_np_{args.feat_size}" / "RLMIL" / rl / args.arch
        / arch_setting / args.train_method / exp / f"seed{args.seed}"
        / f"stage_{args.train_stage}"
    )


def epoch_batches(
    num_slides: int,
    num_data: int,
    batch_size: int,
    rng: np.random.Generator,
    drop_partial: bool,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(slide_ids (B,), valid (B,))`` per batch for one epoch.

    Mirrors the reference's per-epoch shuffle + modulo indexing
    (``train_MuRCL.py:211,224``; ``train_RLMIL.py:293,314``): one shuffled
    order consumed ``num_data`` times with wraparound. ``drop_partial``
    matches MuRCL (fires only on full batches, ``train_MuRCL.py:233``);
    RLMIL also fires the final partial batch (``:323``), which we pad to
    ``batch_size`` with a valid mask to keep shapes static.
    """
    order = rng.permutation(num_slides)
    seq = order[np.arange(num_data) % num_slides]
    n_full = num_data // batch_size
    for i in range(n_full):
        ids = seq[i * batch_size : (i + 1) * batch_size]
        yield ids.astype(np.int32), np.ones(batch_size, dtype=bool)
    rem = num_data - n_full * batch_size
    if rem and not drop_partial:
        tail = seq[n_full * batch_size :]
        pad = np.full(batch_size - rem, tail[-1])
        valid = np.arange(batch_size) < rem
        yield np.concatenate([tail, pad]).astype(np.int32), valid


def dp_mesh(args):
    """Build the SPMD data mesh from ``--dp_devices`` (0/1 = off).

    Returns ``None`` (global-view jit, the single-chip default) or a
    ``Mesh((n,), ('data',))`` to pass as the engines' ``mesh=``, which
    turns the train/eval step into a per-shard shard_map program — the
    dp-scaling route for the Pallas kernels (the reference's only
    multi-device construct is ``torch.nn.DataParallel``,
    ``train_MuRCL.py:145`` / ``train_RLMIL.py:238``; PARITY.md §spmd).
    """
    n = int(getattr(args, "dp_devices", 0) or 0)
    if n <= 1:
        return None
    import jax

    from murcl_tpu.parallel import data_mesh

    avail = len(jax.devices())
    if avail < n:
        raise ValueError(
            f"--dp_devices {n} but only {avail} device(s) visible")
    if args.batch_size % n:
        raise ValueError(
            f"--batch_size {args.batch_size} must be divisible by "
            f"--dp_devices {n} (the batch shards over the data mesh)")
    return data_mesh(n)


def make_tb_writer(save_dir, enabled: bool):
    """TensorBoard writer parity (``--use_tensorboard``); gated import."""
    if not enabled:
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(str(save_dir))
    except Exception as e:  # tensorboard not installed
        print(f"tensorboard unavailable ({type(e).__name__}: {e}); logging disabled")
        return None


class ProfilerHook:
    """``jax.profiler`` trace over the first N steps of an epoch.

    The reference has no profiling at all (SURVEY §5.1); this writes a
    TensorBoard-viewable XLA trace into ``<save_dir>/profile`` when
    ``--profile N`` is set.
    """

    def __init__(self, save_dir, num_steps: int = 0):
        self.dir = str(save_dir)
        self.remaining = int(num_steps)
        self._active = False

    def step(self):
        import jax

        if self.remaining > 0 and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif self.remaining == 0 and self._active:
            jax.profiler.stop_trace()
            self._active = False
        if self.remaining > 0:
            self.remaining -= 1

    def close(self):
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class EpochOutputs:
    """Accumulates final-step logits/labels across batches for epoch metrics."""

    def __init__(self):
        self.logits: List[np.ndarray] = []
        self.labels: List[np.ndarray] = []

    def update(self, logits, labels, valid: Optional[np.ndarray] = None):
        logits = np.asarray(logits)
        labels = np.asarray(labels)
        if valid is not None:
            logits, labels = logits[valid], labels[valid]
        self.logits.append(logits)
        self.labels.append(labels)

    def metrics(self):
        from murcl_tpu.ops.metrics import get_metrics

        logits = np.concatenate(self.logits)
        labels = np.concatenate(self.labels)
        return get_metrics(logits, labels), logits, labels
