"""MuRCL self-supervised pretraining driver (the reference ``train_MuRCL.py``).

Three-stage schedule over the train split only: stage 1 warms the
aggregator + GRU projection head with random sub-bags, stage 2 trains the
PPO selector against the frozen aggregator, stage 3 fine-tunes the
aggregator under the fixed policy. Best = minimum train loss
(``train_MuRCL.py:192,321``); a checkpoint is written every epoch with a
``model_best`` copy, and stage N+1 auto-loads stage N's best
(``:108-109,125-126``).
"""

from __future__ import annotations

import time
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from murcl_tpu.data.sources import build_sources
from murcl_tpu.engine import (
    ContrastiveEngine,
    PretrainConfig,
    load_checkpoint,
    save_checkpoint,
    transfer_params,
)
from murcl_tpu.engine.optim import lr_schedule_factory, make_optimizer, set_learning_rates
from murcl_tpu.drivers.common import (
    ProfilerHook,
    dp_mesh,
    epoch_batches,
    make_tb_writer,
    murcl_save_dir,
)
from murcl_tpu.models import FullLayer, PPO, build_aggregator
from murcl_tpu.utils.general import (
    AverageMeter,
    BestVariable,
    CSVWriter,
    EarlyStop,
    increment_path,
    init_seeds,
    load_json,
)


def _arch_setting(args) -> dict:
    # --attn_gate_math approx selects the relaxed-ulp rational gates in the
    # TPU kernels (PARITY.md) — measured perf-neutral, default stays exact
    gm = getattr(args, "attn_gate_math", "exact")
    if args.arch == "ABMIL":
        # MuRCL sizes ABMIL with L=model_dim and projection-dim output head
        # (train_MuRCL.py:74-80)
        return {"L": args.model_dim, "D": args.D, "dropout": args.dropout,
                "dim_out": args.projection_dim, "attn_gate_math": gm}
    if args.arch == "CLAM_SB":
        # gate/dropout(0.25)/subtyping hardcoded (train_MuRCL.py:82-91)
        return {"gate": True, "size_arg": args.size_arg, "dropout": 0.25,
                "k_sample": args.k_sample, "subtyping": True,
                "attn_gate_math": gm}
    raise ValueError(args.arch)


def run(args) -> dict:
    init_seeds(args.seed)
    if getattr(args, "rng_impl", "threefry") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    if str(getattr(args, "device", "")) == "cpu":
        # reference --device cpu parity; config beats the env var (the axon
        # sitecustomize registers the TPU backend programmatically)
        jax.config.update("jax_platforms", "cpu")

    if args.save_dir is None:
        args.save_dir = murcl_save_dir(args)
    else:
        args.save_dir = str(Path(args.base_save_dir) / args.save_dir)
    args.save_dir = increment_path(Path(args.save_dir), exist_ok=args.exist_ok, sep="_")
    Path(args.save_dir).mkdir(parents=True, exist_ok=True)
    print(f"save_dir: {args.save_dir}")

    indices = load_json(args.data_split_json)["train"]
    src = build_sources(
        args.data_csv, {"train": indices},
        streaming=getattr(args, "streaming", False),
        feats_dtype=("bfloat16"
                     if getattr(args, "compute_dtype", "float32") == "bfloat16"
                     else None),
    )["train"]
    args.num_clusters = src.num_clusters
    dim_patch = src.patch_dim
    args.num_data = src.num_slides * args.data_repeat
    args.eval_step = int(args.num_data / args.batch_size)
    print(f"train_length: {src.num_slides}, epoch_step: {args.num_data}, eval_step: {args.eval_step}")

    # ---- model / fc / ppo --------------------------------------------------
    model, feature_num = build_aggregator(
        args.arch, dim_in=dim_patch, num_classes=args.projection_dim,
        arch_setting=_arch_setting(args),
    )
    fc = FullLayer(
        feature_num=feature_num, hidden_state_dim=args.fc_hidden_dim,
        fc_rnn=args.fc_rnn, class_num=args.projection_dim,
    )
    ppo = None
    if args.train_stage != 1:
        ppo = PPO(
            state_dim=feature_num, hidden_state_dim=args.policy_hidden_dim,
            policy_conv=args.policy_conv, action_std=args.action_std,
            lr=args.ppo_lr, gamma=args.ppo_gamma, K_epochs=args.K_epochs,
            action_size=args.num_clusters, feature_dim=dim_patch,
        )

    if args.train_stage == 2:
        args.epochs = args.ppo_epochs
        tx = None
    else:
        tx = make_optimizer(
            optimizer=args.optimizer, backbone_lr=args.backbone_lr,
            fc_lr=args.fc_lr, beta1=args.beta1, beta2=args.beta2,
            momentum=args.momentum, nesterov=args.nesterov, wdecay=args.wdecay,
        )

    cfg = PretrainConfig(
        arch=args.arch, T=args.T, feat_size=args.feat_size,
        num_clusters=args.num_clusters, max_patches=src.max_patches,
        train_stage=args.train_stage, num_classes=args.projection_dim,
        alpha=args.alpha, temperature=args.temperature, batch_size=args.batch_size,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        remat=getattr(args, "remat", "save_subbag"),
        stage1_layout=getattr(args, "stage1_layout", "batched"),
        select_impl=getattr(args, "select_impl", "auto"),
    )
    engine = ContrastiveEngine(cfg, model, fc, ppo=ppo, tx=tx,
                               mesh=dp_mesh(args))

    rng = jax.random.PRNGKey(args.seed)
    rng, r_init, r_ppo = jax.random.split(rng, 3)
    example = jnp.zeros((args.batch_size, args.feat_size, dim_patch), jnp.float32)
    params = engine.init_params(r_init, example)
    ppo_state = ppo.init(r_ppo, jnp.zeros((args.batch_size, feature_num))) if ppo else None

    # ---- stage chaining (train_MuRCL.py:104-141) ----------------------------
    if args.train_stage >= 2:
        if args.checkpoint is None:
            prev = args.train_stage - 1
            args.checkpoint = str(
                Path(args.save_dir).parent / f"stage_{prev}" / "model_best.pth.tar"
            )
        assert Path(args.checkpoint).exists(), f"{args.checkpoint} does not exist!"
        ckpt = load_checkpoint(args.checkpoint, arch=args.arch)
        params["model"] = transfer_params(params["model"], ckpt["model_state_dict"])
        params["fc"] = transfer_params(params["fc"], ckpt["fc"])
        if args.train_stage == 3 and ckpt.get("policy") is not None:
            pol = transfer_params(ppo_state.params, ckpt["policy"])
            ppo_state = ppo_state._replace(params=pol, old_params=pol)

    start_epoch = 0
    resume_path = Path(args.save_dir) / "checkpoint.pth.tar"
    if getattr(args, "resume", False) and resume_path.exists():
        # crash/preemption resume (absent from the reference, SURVEY §5.3):
        # restores params, optimizer moments, PPO state, and the epoch count
        ckpt = load_checkpoint(resume_path)
        params["model"] = transfer_params(params["model"], ckpt["model_state_dict"])
        params["fc"] = transfer_params(params["fc"], ckpt["fc"])
        if ppo_state is not None and ckpt.get("policy") is not None:
            pol = transfer_params(ppo_state.params, ckpt["policy"])
            opt = ckpt.get("ppo_optimizer")
            ppo_state = ppo_state._replace(
                params=pol, old_params=pol,
                opt_state=opt if opt is not None else ppo_state.opt_state,
            )
        start_epoch = int(ckpt.get("epoch", 0))
        print(f"resumed from {resume_path} at epoch {start_epoch}")

    agg_state = engine.init_state(params)
    if start_epoch and agg_state.opt_state is not None:
        ckpt_opt = load_checkpoint(resume_path).get("optimizer")
        if ckpt_opt is not None:
            agg_state = agg_state._replace(opt_state=ckpt_opt)

    with open(Path(args.save_dir) / "args.yaml", "w") as fp:
        yaml.dump({k: v for k, v in vars(args).items()}, fp, sort_keys=False)

    # ---- training loop -------------------------------------------------------
    save_dir = Path(args.save_dir)
    best_train_loss = BestVariable(order="min")
    losses_csv = CSVWriter(save_dir / "losses.csv",
                           header=["epoch", "train", "best_epoch", "best_train"])
    results_csv = CSVWriter(save_dir / "results.csv",
                            header=["epoch", "final_epoch", "final_loss"])
    early_stop = EarlyStop(args.patience) if args.patience is not None else None
    tb_writer = make_tb_writer(save_dir, args.use_tensorboard)
    profiler = ProfilerHook(save_dir / "profile", getattr(args, "profile", 0))

    np_rng = np.random.default_rng(args.seed)
    backbone_lr_fn = lr_schedule_factory(args.scheduler, args.backbone_lr, args.epochs, int(args.warmup))
    fc_lr_fn = lr_schedule_factory(args.scheduler, args.fc_lr, args.epochs, int(args.warmup))

    steps_per_sec = None
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        if args.train_stage != 2 and args.scheduler is not None:
            agg_state = agg_state._replace(
                opt_state=set_learning_rates(
                    agg_state.opt_state, backbone_lr_fn(epoch), fc_lr_fn(epoch)
                )
            )
        loss_meter = AverageMeter()
        # keep per-step losses as device arrays; converting inside the loop
        # would force a host sync per step and stall the dispatch pipeline
        step_losses, step_counts = [], []
        n_steps = 0
        batches = list(epoch_batches(
            src.num_slides, args.num_data, args.batch_size, np_rng,
            drop_partial=True,  # MuRCL fires only on full batches (:233)
        ))
        staged = src.iter_batches([ids for ids, _ in batches])
        for (ids, _valid), (bank_arrays, slide_ids, _labels) in zip(batches, staged):
            rng, r_step = jax.random.split(rng)
            profiler.step()
            agg_state, ppo_state, stats = engine.train_step(
                agg_state, ppo_state, bank_arrays, slide_ids, r_step
            )
            step_losses.append(stats.step_losses[-1])
            step_counts.append(len(ids))
            n_steps += 1
        for loss_arr, cnt in zip(step_losses, step_counts):
            loss_meter.update(float(loss_arr), cnt)
        train_loss = loss_meter.avg
        dt = time.time() - t0
        steps_per_sec = n_steps / dt if dt > 0 else None

        if tb_writer is not None:
            tb_writer.add_scalar("train/1.train_loss", train_loss, epoch)
        is_best = best_train_loss.compare(train_loss, epoch + 1, inplace=True)
        save_checkpoint(save_dir, epoch + 1, agg_state, ppo_state, is_best=is_best)
        losses_csv.write_row([epoch + 1, train_loss, best_train_loss.epoch, best_train_loss.best])
        results_csv.write_row([epoch + 1, best_train_loss.epoch, best_train_loss.best])
        print(
            f"Epoch {epoch + 1}/{args.epochs} [{dt:.1f}s, {steps_per_sec:.2f} steps/s] "
            f"Loss: {train_loss:.4f}, Best: {best_train_loss.best:.4f} @ {best_train_loss.epoch}"
        )

        if early_stop is not None:
            early_stop.update(best_train_loss.best)
            if early_stop.is_stop():
                break

    profiler.close()
    if tb_writer is not None:
        tb_writer.close()
    return {
        "save_dir": args.save_dir,
        "best_loss": best_train_loss.best,
        "best_epoch": best_train_loss.epoch,
        "steps_per_sec": steps_per_sec,
    }


def default_args(**overrides) -> SimpleNamespace:
    """Programmatic args with the reference CLI defaults (``train_MuRCL.py:386-475``)."""
    ns = SimpleNamespace(
        dataset="Camelyon16", data_csv="", data_split_json="", preload=False,
        data_repeat=10, feat_size=1024,
        train_stage=1, T=6, optimizer="Adam", scheduler=None,
        batch_size=128, epochs=100, ppo_epochs=30,
        backbone_lr=1e-4, fc_lr=1e-4, temperature=1.0,
        momentum=0.9, nesterov=True, beta1=0.9, beta2=0.999,
        warmup=0, wdecay=1e-5, patience=None,
        checkpoint=None, arch="CLAM_SB", alpha=0.9,
        projection_dim=128, model_dim=512,
        policy_hidden_dim=512, policy_conv=False, action_std=0.5,
        ppo_lr=1e-5, ppo_gamma=0.1, K_epochs=3,
        feature_num=512, fc_hidden_dim=1024, fc_rnn=True,
        D=128, dropout=0.0, size_arg="small", k_sample=8,
        use_tensorboard=False, profile=0,
        base_save_dir="./results", save_dir=None, save_dir_flag=None,
        exist_ok=False, device="0", seed=985, compute_dtype="float32", rng_impl="threefry", resume=False,
        remat="save_subbag", stage1_layout="batched", select_impl="auto",
        attn_gate_math="exact", dp_devices=0,
        streaming=False,
    )
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns
