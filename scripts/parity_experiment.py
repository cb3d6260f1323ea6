#!/usr/bin/env python
"""End-to-end AUC parity: our trainer vs the ACTUAL reference trainer.

Generates one synthetic dataset through the shared data contract, then
trains ABMIL-from-scratch (stage 1) with BOTH implementations — the
reference's ``train_RLMIL.run`` imported read-only from /root/reference
(its hardcoded ``.cuda()`` / ``DataParallel`` patched to CPU no-ops) and
our ``murcl_tpu.drivers.rlmil.run`` — and compares the final test metrics.

Training trajectories cannot be bit-identical across frameworks (RNG
streams); parity is judged on both implementations solving the same task
to similar quality. Run: ``python scripts/parity_experiment.py``.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SLIDES, DIM, K, FEAT, T, EPOCHS = 40, 32, 5, 32, 2, 40
LR = 1e-3


def make_dataset(root, dim=DIM, num_clusters=K, min_patches=60,
                 max_patches=160, num_slides=SLIDES):
    from murcl_tpu.data.synthetic import generate_synthetic_dataset

    return generate_synthetic_dataset(
        root, num_slides=num_slides, dim=dim, num_clusters=num_clusters,
        seed=985, min_patches=min_patches, max_patches=max_patches,
        signal=8.0,
    )


def run_ours(ds, root, overrides=None) -> pd.DataFrame:
    from murcl_tpu.drivers import rlmil

    args = rlmil.default_args(
        dataset="parity", data_csv=ds["data_csv"],
        data_split_json=ds["data_split_json"], feat_size=FEAT, T=T,
        train_method="scratch", train_stage=1, epochs=EPOCHS, batch_size=2,
        backbone_lr=LR, fc_lr=LR,
        arch="ABMIL", L=32, D=8, fc_hidden_dim=32,
        base_save_dir=str(Path(root) / "ours"), exist_ok=True, device="cpu",
    )
    for k, v in (overrides or {}).items():
        setattr(args, k, v)
    out = rlmil.run(args)
    return pd.read_csv(Path(out["save_dir"]) / "final_res.csv", index_col=0)


def _patch_reference_torch():
    """Neutralize the reference's hardcoded CUDA usage on CPU-only torch.

    ``.cuda()`` / ``Module.cuda()`` become no-ops, ``DataParallel`` a
    transparent wrapper, and ``tensor.to(0)`` (the RL-state device pin,
    ``train_MuRCL.py:262-265``, ``train_RLMIL.py:350``) an identity when
    the target is an integer cuda ordinal.
    """
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not getattr(torch.Tensor, "_murcl_to_patched", False):
        _orig_to = torch.Tensor.to

        def _to(self, *a, **k):
            if a and isinstance(a[0], int):
                return self
            return _orig_to(self, *a, **k)

        torch.Tensor.to = _to
        torch.Tensor._murcl_to_patched = True

    class _DP(torch.nn.Module):  # DataParallel stand-in: same .module surface
        def __init__(self, module, **kw):
            super().__init__()
            self.module = module

        def forward(self, *a, **kw):
            return self.module(*a, **kw)

    torch.nn.DataParallel = _DP


def run_reference(ds, root, overrides=None) -> pd.DataFrame:
    _patch_reference_torch()
    sys.path.insert(0, "/root/reference")
    try:
        import train_RLMIL as ref

        # the reference defines these registries under __main__ only
        # (train_RLMIL.py:1169-1178)
        ref.TRAIN = {"ABMIL": ref.train_ABMIL, "DSMIL": ref.train_DSMIL,
                     "CLAM_SB": ref.train_CLAM}
        ref.TEST = {"ABMIL": ref.test_ABMIL, "DSMIL": ref.test_DSMIL,
                    "CLAM_SB": ref.test_CLAM}

        args = SimpleNamespace(
            dataset="parity", data_csv=ds["data_csv"],
            data_split_json=ds["data_split_json"], train_data="train",
            preload=True, feat_size=FEAT,
            train_method="scratch", train_stage=1, T=T,
            checkpoint_stage=None, checkpoint_pretrained=None,
            optimizer="Adam", scheduler=None, batch_size=2, epochs=EPOCHS,
            ppo_epochs=1, backbone_lr=LR, fc_lr=LR, momentum=0.9,
            nesterov=True, beta1=0.9, beta2=0.999, warmup=0, wdecay=1e-5,
            picked_method="score", patience=None,
            arch="ABMIL", num_classes=2, model_dim=32,
            policy_hidden_dim=32, policy_conv=False, action_std=0.5,
            ppo_lr=1e-5, ppo_gamma=0.1, K_epochs=3,
            feature_num=32, fc_hidden_dim=32, fc_rnn=True, load_fc=False,
            L=32, D=8, dropout=0.0, train_model_prime=True,
            size_arg="small", k_sample=8, bag_weight=0.7,
            loss="CrossEntropyLoss", use_tensorboard=False,
            base_save_dir=str(Path(root) / "reference"), save_dir=None,
            save_dir_flag=None, exist_ok=True, save_model=False,
            device="cpu", seed=985,
        )
        for k, v in (overrides or {}).items():
            if k != "device":  # the reference side always runs CPU torch
                setattr(args, k, v)
        ref.run(args)
        save_dir = Path(args.save_dir)
        return pd.read_csv(save_dir / "final_res.csv", index_col=0)
    finally:
        sys.path.remove("/root/reference")


# --------------------------------------------------------------------------
# Full-pipeline chain: MuRCL pretrain stages 1-3 -> RLMIL finetune stages 1-3
# (runs/pretrain.sh -> runs/finetune.sh semantics), both implementations.
# --------------------------------------------------------------------------
PRE_EPOCHS, FT_EPOCHS, PPO_EPOCHS, PRE_BATCH = 6, 20, 4, 4


def _chain_scale(real_dims: bool, **overrides) -> dict:
    """Epoch/batch/lr budget for a chain run, trimmed for CPU hosts.

    The toy scale reproduces the original --full-chain regime exactly. The
    real-dims scale keeps every reference *dimension* (dim=512,
    feat_size=1024, T=6, K=10, L=512/D=128/fc_hidden=1024) and the
    runs/pretrain.sh -> runs/finetune.sh lr schedule — stages 1-2 at
    1e-4/5e-5, stage 3 at 5e-5/1e-5, CosineAnnealingLR
    (``runs/pretrain.sh:16-17,34-35``; ``runs/finetune.sh:20-21,39-40``) —
    but trims epochs/batch IDENTICALLY on both sides so a seed-pair fits a
    1-vCPU budget (the reference's 100+40-epoch batch-128 recipe is a
    GPU-week, not a parity experiment).
    """
    if real_dims:
        s = dict(pre_epochs=3, ft_epochs=5, ppo_epochs=2, pre_batch=4,
                 data_repeat=1, scheduler="CosineAnnealingLR",
                 stage_lrs={1: (1e-4, 5e-5), 2: (1e-4, 5e-5),
                            3: (5e-5, 1e-5)})
    else:
        s = dict(pre_epochs=PRE_EPOCHS, ft_epochs=FT_EPOCHS,
                 ppo_epochs=PPO_EPOCHS, pre_batch=PRE_BATCH, data_repeat=2,
                 scheduler=None,
                 stage_lrs={1: (LR, LR), 2: (LR, LR), 3: (LR, LR)})
    for k, v in overrides.items():
        if v is not None:
            s[k] = v
    return s


def _chain_hparams(seed: int = 985, real_dims: bool = False):
    if real_dims:
        # reference-scale widths; PPO at the reference CLI defaults
        # (train_MuRCL.py:446-449) and mixup alpha/temperature defaults
        # (:422,:440) — pretrain.sh overrides none of them.
        return dict(
            dataset="parity_rd", feat_size=1024, T=6, device="cpu",
            exist_ok=True, seed=seed,
            fc_hidden_dim=1024, policy_hidden_dim=512, D=128,
            ppo_lr=1e-5, K_epochs=3, action_std=0.5, ppo_gamma=0.1,
        )
    return dict(
        dataset="parity", feat_size=FEAT, T=T, device="cpu",
        exist_ok=True, seed=seed,
        # tiny-arch sizes shared by pretrain and finetune
        fc_hidden_dim=32, policy_hidden_dim=32, D=8,
        ppo_lr=1e-4, K_epochs=2, action_std=0.5, ppo_gamma=0.1,
    )


def _chain_arch(arch: str, real_dims: bool = False) -> dict:
    """Per-arch chain settings (VERDICT r3 item 7: chains beyond ABMIL).

    - Pretraining supports only {ABMIL, CLAM_SB} (``train_MuRCL.py:487``);
      a DSMIL chain pretrains ABMIL with L == dim_patch so the transferred
      PPO policy's state width matches DSMIL's states (the bag embedding B
      is ``dim_patch``-wide: ``models/dsmil.py:79-80``,
      ``train_RLMIL.py:515-516``).
    - The CLAM chain needs ``dim_patch == 512``: the reference builds
      ``Full_layer(feature_num=dim_patch)`` for CLAM
      (``train_RLMIL.py:102-115``) but feeds it the 512-wide bag feature M
      — consistent only in the resnet18 regime the paper ran (PARITY.md
      §feature-width quirk). ``model_dim`` (the PPO state width,
      ``train_RLMIL.py:160``) must also be 512 there.
    - The DSMIL and CLAM chains must finetune at ``batch_size=1`` (the
      reference CLI default): with a batched feats tensor both models'
      ``batch_forward`` return Python lists — DSMIL crashes at
      ``torch.max(outputs_ins, 0)`` (``train_RLMIL.py:516``,
      ``models/dsmil.py:18-36``) and CLAM at
      ``result_dict['instance_loss']`` (``train_RLMIL.py:336``,
      ``models/clam.py:184-196`` returns a list of dicts). Ours is batched
      for any size; parity runs both sides at 1.
    - Batch 1 also forces ``T=3``: the reference's PPO update normalizes a
      ``((T-1)*B,)`` reward vector with torch's UNBIASED std
      (``models/rlmil.py:162``) — one element gives std=NaN and the policy
      NaNs on the next ``select_action`` (measured). The paper regime
      (T=6, batch 1) never hits it; ours uses jnp.std (population, 0 for
      one element) and trains fine either way (PARITY.md).
    """
    if real_dims:
        # At reference dims every width is 512, so all three archs share one
        # dataset and the CLAM feature-width quirk is consistent by
        # construction. Finetune at batch 1 = the runs/finetune.sh regime
        # (also the only batch the reference's CLAM/DSMIL train paths
        # survive); T=6 is safe at batch 1 — the PPO reward-std NaN needs
        # (T-1)*batch == 1 (models/rlmil.py:162), i.e. T=2.
        pre = "CLAM_SB" if arch == "CLAM_SB" else "ABMIL"
        return dict(dim=512, pre_arch=pre, model_dim=512, feature_num=512,
                    L=512, ft_batch=1, T=6)
    if arch == "ABMIL":
        return dict(dim=DIM, pre_arch="ABMIL", model_dim=32, feature_num=32,
                    L=32, ft_batch=2, T=T)
    if arch == "CLAM_SB":
        return dict(dim=512, pre_arch="CLAM_SB", model_dim=512,
                    feature_num=512, L=32, ft_batch=1, T=3)
    if arch == "DSMIL":
        return dict(dim=DIM, pre_arch="ABMIL", model_dim=32, feature_num=32,
                    L=32, ft_batch=1, T=3)
    raise ValueError(arch)


def run_ours_chain(ds, root, arch: str = "ABMIL",
                   dp_devices: int = 0, seed: int = 985,
                   real_dims: bool = False,
                   scale: dict | None = None) -> pd.DataFrame:
    from murcl_tpu.drivers import murcl, rlmil

    hp = _chain_hparams(seed, real_dims)
    ac = _chain_arch(arch, real_dims)
    sc = scale or _chain_scale(real_dims)
    hp["T"] = ac["T"]
    if dp_devices:
        # SPMD shard_map mode through the whole chain (PARITY.md §spmd)
        hp["dp_devices"] = dp_devices
    proj = 128 if real_dims else 16
    temp = 1.0 if real_dims else 0.5
    out = None
    for stage in (1, 2, 3):
        blr, flr = sc["stage_lrs"][stage]
        args = murcl.default_args(
            data_csv=ds["data_csv"], data_split_json=ds["data_split_json"],
            train_stage=stage, epochs=sc["pre_epochs"],
            ppo_epochs=sc["ppo_epochs"],
            data_repeat=sc["data_repeat"], batch_size=sc["pre_batch"],
            arch=ac["pre_arch"],
            model_dim=ac["model_dim"], projection_dim=proj, temperature=temp,
            backbone_lr=blr, fc_lr=flr, scheduler=sc["scheduler"],
            base_save_dir=str(Path(root) / "ours_pretrain"), **hp,
        )
        out = murcl.run(args)
    pretrained = str(Path(out["save_dir"]) / "model_best.pth.tar")

    res = None
    for stage in (1, 2, 3):
        blr, flr = sc["stage_lrs"][stage]
        args = rlmil.default_args(
            data_csv=ds["data_csv"], data_split_json=ds["data_split_json"],
            train_method="finetune", train_stage=stage,
            epochs=sc["ft_epochs"],
            ppo_epochs=sc["ppo_epochs"], batch_size=ac["ft_batch"], arch=arch,
            L=ac["L"],
            model_dim=ac["model_dim"],
            backbone_lr=blr, fc_lr=flr, scheduler=sc["scheduler"],
            checkpoint_pretrained=pretrained,
            checkpoint_stage=None, save_model=True,
            base_save_dir=str(Path(root) / "ours_finetune"), **hp,
        )
        res = rlmil.run(args)
    return pd.read_csv(Path(res["save_dir"]) / "final_res.csv", index_col=0)


def run_reference_chain(ds, root, arch: str = "ABMIL",
                        seed: int = 985, real_dims: bool = False,
                        scale: dict | None = None) -> pd.DataFrame:
    _patch_reference_torch()
    hp = _chain_hparams(seed, real_dims)
    ac = _chain_arch(arch, real_dims)
    sc = scale or _chain_scale(real_dims)
    hp["T"] = ac["T"]
    proj = 128 if real_dims else 16
    temp = 1.0 if real_dims else 0.5
    sys.path.insert(0, "/root/reference")
    try:
        import train_MuRCL as refm
        import train_RLMIL as refr

        refr.TRAIN = {"ABMIL": refr.train_ABMIL, "DSMIL": refr.train_DSMIL,
                      "CLAM_SB": refr.train_CLAM}
        refr.TEST = {"ABMIL": refr.test_ABMIL, "DSMIL": refr.test_DSMIL,
                     "CLAM_SB": refr.test_CLAM}

        common = dict(
            data_csv=ds["data_csv"], data_split_json=ds["data_split_json"],
            preload=True, optimizer="Adam", scheduler=sc["scheduler"],
            momentum=0.9, nesterov=True, beta1=0.9, beta2=0.999,
            warmup=0, wdecay=1e-5, patience=None,
            policy_conv=False, fc_rnn=True, dropout=0.0,
            size_arg="small", k_sample=8, use_tensorboard=False,
            save_dir=None, save_dir_flag=None, save_model=True,
            **hp,
        )
        pre_dir = None
        for stage in (1, 2, 3):
            blr, flr = sc["stage_lrs"][stage]
            args = SimpleNamespace(
                train_stage=stage, epochs=sc["pre_epochs"],
                ppo_epochs=sc["ppo_epochs"],
                data_repeat=sc["data_repeat"], batch_size=sc["pre_batch"],
                checkpoint=None,
                backbone_lr=blr, fc_lr=flr, temperature=temp, alpha=0.9,
                projection_dim=proj, arch=ac["pre_arch"],
                model_dim=ac["model_dim"], feature_num=ac["feature_num"],
                base_save_dir=str(Path(root) / "reference_pretrain"),
                **common,
            )
            refm.run(args)
            pre_dir = Path(args.save_dir)
        pretrained = str(pre_dir / "model_best.pth.tar")

        ft_dir = None
        for stage in (1, 2, 3):
            blr, flr = sc["stage_lrs"][stage]
            args = SimpleNamespace(
                train_data="train", train_method="finetune",
                train_stage=stage, epochs=sc["ft_epochs"],
                ppo_epochs=sc["ppo_epochs"],
                batch_size=ac["ft_batch"], checkpoint_stage=None,
                checkpoint_pretrained=pretrained, backbone_lr=blr, fc_lr=flr,
                picked_method="score", num_classes=2, arch=arch,
                model_dim=ac["model_dim"],
                feature_num=ac["feature_num"], load_fc=False, L=ac["L"],
                train_model_prime=True, bag_weight=0.7,
                loss="CrossEntropyLoss",
                base_save_dir=str(Path(root) / "reference_finetune"),
                **common,
            )
            refr.run(args)
            ft_dir = Path(args.save_dir)
        return pd.read_csv(ft_dir / "final_res.csv", index_col=0)
    finally:
        sys.path.remove("/root/reference")


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--real-data", action="store_true", default=False,
                        help="run on a mounted real dataset (Camelyon16/TCGA) "
                             "instead of the synthetic fixture; requires "
                             "--data_csv/--data_split_json")
    parser.add_argument("--real-dims", action="store_true", default=False,
                        help="scratch-stage-1 parity at REFERENCE dimensions "
                             "(dim=512 features, feat_size=1024, T=6, L=512, "
                             "D=128, fc_hidden=1024 — runs/scratch.sh scale) "
                             "on a heavier synthetic set; the closest "
                             "rehearsal of the Camelyon16 target without "
                             "mounted data. CLAM/DSMIL run at batch 1 "
                             "(reference batched-train crash, PARITY.md)")
    parser.add_argument("--full-chain", action="store_true", default=False,
                        help="run the FULL MuRCL pipeline both-implementations "
                             "on the synthetic fixture: 3-stage pretrain -> "
                             "3-stage finetune (runs/pretrain.sh -> "
                             "runs/finetune.sh semantics), compare final AUC. "
                             "Composes with --real-dims (dim=512, "
                             "feat_size=1024, T=6, K=10, stage-3 lr drop) "
                             "and --seeds for the multi-seed study")
    parser.add_argument("--data_csv", type=str, default=None)
    parser.add_argument("--data_split_json", type=str, default=None)
    parser.add_argument("--arch", type=str, default="ABMIL",
                        choices=["ABMIL", "CLAM_SB", "DSMIL"])
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--feat_size", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--device", type=str, default="cpu",
                        help="ours runs on this backend; the reference is CPU torch")
    parser.add_argument("--seed", type=int, default=985,
                        help="training seed for BOTH implementations (the "
                             "synthetic dataset's generation seed stays "
                             "fixed, so different seeds train on identical "
                             "data — for run-to-run variance studies)")
    parser.add_argument("--slides", type=int, default=None,
                        help="synthetic-slide count (default 40 -> 10-slide "
                             "test split at the 50/25/25 split; 160 gives a "
                             "40-slide test set, 4x finer AUC resolution "
                             "for the seed-variance study)")
    parser.add_argument("--spmd", type=int, default=0,
                        help="with --full-chain: run OUR chain in SPMD "
                             "shard_map mode (--dp_devices) over this many "
                             "virtual CPU devices")
    parser.add_argument("--seeds", type=str, default=None,
                        help="comma-separated list of training seeds; runs "
                             "the chosen experiment once per seed and prints "
                             "a per-seed + mean/sd summary (overrides "
                             "--seed). Results stream to --out as each "
                             "seed-pair finishes")
    parser.add_argument("--out", type=str, default=None,
                        help="JSON file to append per-seed reports to "
                             "(written incrementally, survives kills)")
    parser.add_argument("--pre_epochs", type=int, default=None,
                        help="with --full-chain: pretrain epochs per stage")
    parser.add_argument("--ft_epochs", type=int, default=None,
                        help="with --full-chain: finetune epochs per stage")
    parser.add_argument("--ppo_epochs", type=int, default=None,
                        help="with --full-chain: stage-2 PPO epochs")
    parser.add_argument("--pre_batch", type=int, default=None,
                        help="with --full-chain: pretrain batch size")
    parser.add_argument("--data_repeat", type=int, default=None,
                        help="with --full-chain: pretrain data_repeat")
    cli = parser.parse_args()

    if cli.spmd and cli.spmd > 1:
        # must land before anything imports jax (nothing above does)
        import os

        assert "jax" not in sys.modules, "--spmd needs XLA_FLAGS set pre-jax"
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={cli.spmd}")
        os.environ["XLA_FLAGS"] = " ".join(flags)

    root = tempfile.mkdtemp(prefix="parity_")
    seeds = ([int(s) for s in cli.seeds.split(",")] if cli.seeds
             else [cli.seed])

    if cli.full_chain:
        ac = _chain_arch(cli.arch, cli.real_dims)
        scale = _chain_scale(cli.real_dims, pre_epochs=cli.pre_epochs,
                             ft_epochs=cli.ft_epochs,
                             ppo_epochs=cli.ppo_epochs,
                             pre_batch=cli.pre_batch,
                             data_repeat=cli.data_repeat)
        if cli.real_dims:
            slides = cli.slides or SLIDES
            ds = make_dataset(root, dim=512, num_clusters=10,
                              min_patches=1050, max_patches=1500,
                              num_slides=slides)
            regime = (f"REFERENCE dims ({slides} slides, dim=512, K=10, "
                      f"1050-1500 patches, feat_size=1024, L=512, D=128, "
                      f"fc_hidden=1024, CosineAnnealingLR w/ stage-3 lr "
                      f"drop)")
        else:
            slides = SLIDES
            ds = make_dataset(root, dim=ac["dim"])
            regime = f"{SLIDES} synthetic slides, dim={ac['dim']}, K={K}, " \
                     f"feat_size={FEAT}"

        def run_one(seed):
            ours = run_ours_chain(ds, root, arch=cli.arch,
                                  dp_devices=cli.spmd, seed=seed,
                                  real_dims=cli.real_dims, scale=scale)
            theirs = run_reference_chain(ds, root, arch=cli.arch, seed=seed,
                                         real_dims=cli.real_dims, scale=scale)
            return ours, theirs

        desc = (f"FULL chain (pretrain 1-3 [{ac['pre_arch']}] -> finetune 1-3 "
                f"[{cli.arch}]): {regime}, T={ac['T']}, "
                f"{scale['pre_epochs']}+{scale['ft_epochs']} epochs, "
                f"ppo {scale['ppo_epochs']}, pre_batch {scale['pre_batch']}"
                + (f", ours in SPMD mode over {cli.spmd} devices"
                   if cli.spmd and cli.spmd > 1 else ""))
    elif cli.real_dims:
        # Reference-scale rehearsal on synthetic data (runs/scratch.sh
        # hyperparameters): dim=512 patch features, >=1024 patches/slide so
        # the reference's get_feats never hits its feat_size>num_patch
        # padding path (utils/datasets.py:285-303), K=10 clusters, T=6,
        # L=512/D=128/fc_hidden=1024, CosineAnnealingLR, lr 1e-4/5e-5.
        # CLAM_SB/DSMIL train at batch 1 (reference batched-train crash,
        # PARITY.md); ABMIL batches fine. ~1 GFLOP/bag forward — expect
        # tens of minutes per side on a 1-vCPU host at default epochs.
        batch = cli.batch_size or (2 if cli.arch == "ABMIL" else 1)
        slides = cli.slides or SLIDES
        ds = make_dataset(root, dim=512, num_clusters=10,
                          min_patches=1050, max_patches=1500,
                          num_slides=slides)
        overrides = {
            "dataset": "real_dims", "arch": cli.arch, "device": cli.device,
            "feat_size": cli.feat_size or 1024, "T": cli.T or 6,
            "epochs": cli.epochs or 10, "batch_size": batch,
            "backbone_lr": 1e-4, "fc_lr": 5e-5,
            "scheduler": "CosineAnnealingLR",
            "L": 512, "D": 128, "fc_hidden_dim": 1024,
            "model_dim": 512, "feature_num": 512, "policy_hidden_dim": 512,
        }

        def run_one(seed):
            ov = dict(overrides, seed=seed)
            return run_ours(ds, root, ov), run_reference(ds, root, ov)

        desc = (f"reference-dims scratch stage 1 ({cli.arch}): {slides} "
                f"synthetic slides, dim=512, K=10, 1050-1500 patches/slide, "
                f"feat_size={overrides['feat_size']}, T={overrides['T']}, "
                f"L=512, D=128, fc_hidden=1024, batch={batch}, "
                f"{overrides['epochs']} epochs, CosineAnnealingLR")
    elif cli.real_data:
        assert cli.data_csv and cli.data_split_json, \
            "--real-data requires --data_csv and --data_split_json"
        ds = {"data_csv": cli.data_csv, "data_split_json": cli.data_split_json}
        # reference-paper defaults at real scale (BASELINE.md north star)
        overrides = {
            "dataset": "real", "arch": cli.arch, "device": cli.device,
            "feat_size": cli.feat_size or 1024, "T": cli.T or 6,
            "epochs": cli.epochs or 40, "batch_size": cli.batch_size or 64,
            "backbone_lr": 1e-4, "fc_lr": 1e-4, "L": 512, "D": 128,
            "fc_hidden_dim": 1024,
        }

        def run_one(seed):
            ov = dict(overrides, seed=seed)
            return run_ours(ds, root, ov), run_reference(ds, root, ov)

        desc = f"real data: {cli.data_csv} ({cli.arch})"
    else:
        slides = cli.slides or SLIDES
        # per-arch toy settings mirror _chain_arch: CLAM_SB needs
        # dim_patch=512 (the reference feature-width quirk, PARITY.md) and
        # CLAM/DSMIL train at batch 1 (reference batched-train crash);
        # scratch stage 1 has no PPO so batch 1 + T=2 is NaN-safe
        if cli.arch == "CLAM_SB":
            dim = 512
            extra = {"arch": cli.arch, "batch_size": 1,
                     "model_dim": 512, "feature_num": 512,
                     "policy_hidden_dim": 512}
        elif cli.arch == "DSMIL":
            dim = DIM
            extra = {"arch": cli.arch, "batch_size": 1}
        else:
            dim, extra = DIM, {}
        ds = make_dataset(root, dim=dim, num_slides=slides)

        def run_one(seed):
            ov = dict(extra, seed=seed)
            return run_ours(ds, root, ov), run_reference(ds, root, ov)

        desc = (f"{slides} synthetic slides ({cli.arch}), dim={dim}, K={K}, "
                f"feat_size={FEAT}, T={T}, {EPOCHS} epochs")

    import time

    reports = []
    for seed in seeds:
        t0 = time.time()
        ours, theirs = run_one(seed)
        report = {
            "dataset": desc, "arch": cli.arch, "seed": seed,
            "minutes": round((time.time() - t0) / 60, 1),
            "ours": {c: float(ours.iloc[0][c]) for c in ours.columns},
            "reference": {c: float(theirs.iloc[0][c])
                          for c in theirs.columns},
            "auc_gap": abs(float(ours.iloc[0]["auc"])
                           - float(theirs.iloc[0]["auc"])),
            "auc_gap_signed": float(ours.iloc[0]["auc"])
                              - float(theirs.iloc[0]["auc"]),
        }
        reports.append(report)
        print(json.dumps(report, indent=2), flush=True)
        if cli.out:
            Path(cli.out).write_text(json.dumps(reports, indent=2))

    if len(reports) > 1:
        gaps = np.array([r["auc_gap_signed"] for r in reports])
        summary = {
            "seeds": seeds, "arch": cli.arch,
            "auc_gap_signed_mean": float(gaps.mean()),
            "auc_gap_signed_sd": float(gaps.std(ddof=1)),
            "auc_gap_abs_mean": float(np.abs(gaps).mean()),
            "ours_wins": int((gaps > 0).sum()),
            "reference_wins": int((gaps < 0).sum()),
            "ties": int((gaps == 0).sum()),
        }
        print("SUMMARY " + json.dumps(summary), flush=True)
        if cli.out:
            Path(cli.out).write_text(
                json.dumps({"runs": reports, "summary": summary}, indent=2))
        return summary
    return reports[0]


if __name__ == "__main__":
    main()
