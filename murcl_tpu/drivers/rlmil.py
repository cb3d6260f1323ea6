"""Downstream supervised RLMIL driver (the reference ``train_RLMIL.py``).

Covers ``train_method in {scratch, finetune, linear}`` x ``train_stage in
{1,2,3}`` x ``arch in {ABMIL, CLAM_SB, DSMIL}`` with the reference's
checkpoint chaining, weight surgery, model selection by ``picked_method``
on the valid split, csv logging, and final ``pred.csv`` / ``final_res.csv``
artifacts (``train_RLMIL.py:858-1057``).

TPU redesign vs the reference: datasets become device-resident feature
banks shared across splits at one static shape; the per-epoch loop calls
one jitted rollout program per batch; evaluation runs whole splits as
single padded batches (``:417-424`` semantics).
"""

from __future__ import annotations

import time
from pathlib import Path
from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import yaml

from murcl_tpu.data.sources import build_sources
from murcl_tpu.engine import (
    AggTrainState,
    BankArrays,
    RolloutConfig,
    SupervisedEngine,
    load_checkpoint,
    save_checkpoint,
    transfer_params,
)
from murcl_tpu.engine.optim import (
    linear_eval_frozen_paths,
    lr_schedule_factory,
    make_optimizer,
    set_learning_rates,
)
from murcl_tpu.drivers.common import (
    EpochOutputs,
    ProfilerHook,
    dp_mesh,
    epoch_batches,
    make_tb_writer,
    rlmil_save_dir,
)
from murcl_tpu.models import FullLayer, PPO, build_aggregator
from murcl_tpu.ops.metrics import get_metrics, get_score
from murcl_tpu.utils.general import (
    BestVariable,
    CSVWriter,
    EarlyStop,
    increment_path,
    init_seeds,
    load_json,
)


def _build_sources(args):
    indices = load_json(args.data_split_json)
    return build_sources(
        args.data_csv,
        {
            "train": indices[args.train_data],
            "valid": indices["valid"],
            "test": indices["test"],
        },
        feats_dtype=("bfloat16"
                     if getattr(args, "compute_dtype", "float32") == "bfloat16"
                     else None),
        streaming=getattr(args, "streaming", False),
    )


def _arch_setting(args) -> dict:
    # --attn_gate_math approx selects the relaxed-ulp rational gates in the
    # TPU kernels (PARITY.md) — measured perf-neutral, default stays exact
    gm = getattr(args, "attn_gate_math", "exact")
    if args.arch == "ABMIL":
        return {"L": args.L, "D": args.D, "dropout": args.dropout,
                "dim_out": args.num_classes, "attn_gate_math": gm}
    if args.arch == "CLAM_SB":
        # reference hardcodes gate/dropout(0.25)/subtyping for downstream
        # CLAM (train_RLMIL.py:104-112)
        return {"gate": True, "size_arg": args.size_arg, "dropout": 0.25,
                "k_sample": args.k_sample, "subtyping": True,
                "attn_gate_math": gm}
    return {}


def _load_stage_checkpoint(args, fresh_params, expect: Optional[str] = None):
    """Stage-chained strict load of model+fc (``train_RLMIL.py:147-232``)."""
    if args.checkpoint_stage is None:
        prev = args.train_stage - 1
        args.checkpoint_stage = str(
            Path(args.save_dir).parent / f"stage_{prev}" / "model_best.pth.tar"
        )
    assert Path(args.checkpoint_stage).exists(), f"{args.checkpoint_stage} does not exist!"
    ckpt = load_checkpoint(args.checkpoint_stage, arch=args.arch)
    params = dict(fresh_params)
    params["model"] = transfer_params(fresh_params["model"], ckpt["model_state_dict"])
    params["fc"] = transfer_params(fresh_params["fc"], ckpt["fc"])
    return params, ckpt


def run(args) -> dict:
    init_seeds(args.seed)
    if getattr(args, "rng_impl", "threefry") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    if str(getattr(args, "device", "")) == "cpu":
        # reference --device cpu parity; config beats the env var (the axon
        # sitecustomize registers the TPU backend programmatically)
        jax.config.update("jax_platforms", "cpu")

    if args.save_dir is None:
        args.save_dir = rlmil_save_dir(args)
    else:
        args.save_dir = str(Path(args.base_save_dir) / args.save_dir)
    args.save_dir = increment_path(Path(args.save_dir), exist_ok=args.exist_ok, sep="_")
    Path(args.save_dir).mkdir(parents=True, exist_ok=True)
    print(f"save_dir: {args.save_dir}")

    sources = _build_sources(args)
    args.num_clusters = sources["train"].num_clusters
    dim_patch = sources["train"].patch_dim
    train_length = sources["train"].num_slides
    args.num_data = train_length
    args.eval_step = max(1, int(args.num_data / args.batch_size))
    print(f"train_length: {train_length}, epoch_step: {args.num_data}, eval_step: {args.eval_step}")

    # ---- model / fc / ppo -------------------------------------------------
    model, feature_num = build_aggregator(
        args.arch, dim_in=dim_patch, num_classes=args.num_classes,
        arch_setting=_arch_setting(args),
    )
    args.feature_num = feature_num
    fc = FullLayer(
        feature_num=feature_num, hidden_state_dim=args.fc_hidden_dim,
        fc_rnn=args.fc_rnn, class_num=args.num_classes,
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
        frozen = linear_eval_frozen_paths(args.arch) if args.train_method == "linear" else None
        tx = make_optimizer(
            optimizer=args.optimizer, backbone_lr=args.backbone_lr,
            fc_lr=args.fc_lr, beta1=args.beta1, beta2=args.beta2,
            momentum=args.momentum, nesterov=args.nesterov,
            wdecay=args.wdecay, frozen_model_paths=frozen,
        )

    cfg = RolloutConfig(
        arch=args.arch, T=args.T, feat_size=args.feat_size,
        num_clusters=args.num_clusters, max_patches=sources["train"].max_patches,
        train_stage=args.train_stage, num_classes=args.num_classes,
        bag_weight=args.bag_weight, train_model_prime=args.train_model_prime,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        remat=getattr(args, "remat", "save_subbag"),
        stage1_layout=getattr(args, "stage1_layout", "batched"),
        select_impl=getattr(args, "select_impl", "auto"),
    )
    engine = SupervisedEngine(cfg, model, fc, ppo=ppo, tx=tx,
                              mesh=dp_mesh(args))

    # ---- init + checkpoint surgery ---------------------------------------
    rng = jax.random.PRNGKey(args.seed)
    rng, r_init, r_ppo = jax.random.split(rng, 3)
    example = jnp.zeros((args.batch_size, args.feat_size, dim_patch), jnp.float32)
    example_labels = jnp.zeros((args.batch_size,), jnp.int32)
    params = engine.init_params(r_init, example, example_labels)
    ppo_state = ppo.init(r_ppo, jnp.zeros((args.batch_size, feature_num))) if ppo else None

    if args.train_method in ("finetune", "linear"):
        if args.train_stage == 1:
            # pretrained MuRCL encoder -> aggregator, skipping projection
            # heads (train_RLMIL.py:124-135)
            assert args.checkpoint_pretrained and Path(args.checkpoint_pretrained).exists(), \
                f"{args.checkpoint_pretrained} does not exist!"
            ckpt = load_checkpoint(args.checkpoint_pretrained, arch=args.arch)
            params["model"] = transfer_params(params["model"], ckpt["model_state_dict"])
        else:
            params, _ = _load_stage_checkpoint(args, params)
            if args.train_stage == 2:
                # the PPO policy comes from the *pretrained MuRCL* checkpoint
                # (train_RLMIL.py:155-166)
                assert args.checkpoint_pretrained and Path(args.checkpoint_pretrained).exists(), \
                    f"{args.checkpoint_pretrained} does not exist!"
                pckpt = load_checkpoint(args.checkpoint_pretrained, arch=args.arch)
                if pckpt.get("policy") is not None:
                    pol = transfer_params(ppo_state.params, pckpt["policy"])
                    ppo_state = ppo_state._replace(params=pol, old_params=pol)
            elif args.train_stage == 3:
                _, ckpt = _load_stage_checkpoint(args, params)
                if ckpt.get("policy") is not None:
                    pol = transfer_params(ppo_state.params, ckpt["policy"])
                    ppo_state = ppo_state._replace(params=pol, old_params=pol)
    elif args.train_method == "scratch":
        if args.train_stage >= 2:
            params, ckpt = _load_stage_checkpoint(args, params)
            if args.train_stage == 3 and ckpt.get("policy") is not None:
                pol = transfer_params(ppo_state.params, ckpt["policy"])
                ppo_state = ppo_state._replace(params=pol, old_params=pol)
    else:
        raise ValueError(args.train_method)

    resume_path = Path(args.save_dir) / "checkpoint.pth.tar"
    if getattr(args, "resume", False) and resume_path.exists():
        # resume from the last saved state (reference cannot restart at all)
        ckpt = load_checkpoint(resume_path, arch=args.arch)
        params["model"] = transfer_params(params["model"], ckpt["model_state_dict"])
        params["fc"] = transfer_params(params["fc"], ckpt["fc"])
        if ppo_state is not None and ckpt.get("policy") is not None:
            pol = transfer_params(ppo_state.params, ckpt["policy"])
            ppo_state = ppo_state._replace(params=pol, old_params=pol)
        print(f"resumed model/fc/policy from {resume_path}")

    agg_state = engine.init_state(params)

    with open(Path(args.save_dir) / "args.yaml", "w") as fp:
        yaml.dump({k: v for k, v in vars(args).items()}, fp, sort_keys=False)

    # ---- training loop ----------------------------------------------------
    result = _train_loop(args, engine, agg_state, ppo_state, sources, rng)

    # ---- final test on the best model -------------------------------------
    agg_state = AggTrainState(params=result["best_params"], opt_state=agg_state.opt_state)
    if ppo_state is not None and result.get("best_policy") is not None:
        ppo_state = ppo_state._replace(
            params=result["best_policy"], old_params=result["best_policy"]
        )
    loss, metrics, preds = _evaluate(
        args, engine, agg_state, ppo_state, sources["test"], jax.random.PRNGKey(args.seed + 1),
        collect_preds=True,
    )
    preds.to_csv(str(Path(args.save_dir) / "pred.csv"))
    acc, auc, precision, recall, f1 = metrics
    final = pd.DataFrame(columns=["loss", "acc", "auc", "precision", "recall", "f1_score"])
    final.loc[f"seed{args.seed}"] = [loss, acc, auc, precision, recall, f1]
    final.to_csv(str(Path(args.save_dir) / "final_res.csv"))
    print(f"{final}\nPredicted Ending.\n")
    return {"final": final, "save_dir": args.save_dir}


def _evaluate(args, engine, agg_state, ppo_state, src, rng, collect_preds=False):
    """Whole split as one padded batch (``train_RLMIL.py:417-424``)."""
    n = src.num_slides
    ids = np.arange(n, dtype=np.int32)
    # in SPMD mode the padded eval batch must also divide over the data
    # mesh (the invalid tail rows are masked out of every metric)
    bucket = max(1, args.eval_batch_pad)
    dp = int(getattr(args, "dp_devices", 0) or 0)
    if dp > 1:
        from math import gcd

        bucket = bucket * dp // gcd(bucket, dp)
    pad = (-n) % bucket
    if pad:
        ids = np.concatenate([ids, np.full(pad, n - 1, dtype=np.int32)])
    valid = np.arange(ids.shape[0]) < n
    bank_arrays, slide_ids, labels = src.batch(ids)
    stats = engine.eval_step(
        agg_state, ppo_state, bank_arrays,
        slide_ids, labels, rng, valid=jnp.asarray(valid),
    )
    logits = np.asarray(stats.logits)[valid]
    metrics = get_metrics(logits, np.asarray(src.labels))
    loss = float(stats.step_losses[-1])
    if not collect_preds:
        return loss, metrics
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = probs / probs.sum(axis=1, keepdims=True)
    pred = probs.argmax(axis=1)
    preds = pd.DataFrame(
        columns=["label", "pred", "correct", *[f"prob{i}" for i in range(probs.shape[1])]]
    )
    for i, case_id in enumerate(src.case_ids):
        preds.loc[case_id] = [
            int(src.labels[i]), int(pred[i]), bool(src.labels[i] == pred[i]),
            *[float(probs[i, j]) for j in range(probs.shape[1])],
        ]
    preds.index.rename("case_id", inplace=True)
    return loss, metrics, preds


def _train_loop(args, engine, agg_state, ppo_state, sources, rng):
    save_dir = Path(args.save_dir)
    bests = {
        f"{split}_{m}": BestVariable(order="min" if m == "loss" else "max")
        for split in ("train", "valid", "test") for m in ("loss", "acc", "auc")
    }
    best_score = BestVariable(order="max")
    final = dict(epoch=0, loss=0.0, acc=0.0, auc=0.0, precision=0.0, recall=0.0, f1=0.0)
    header = ["epoch", "train", "valid", "test", "best_train", "best_valid", "best_test"]
    losses_csv = CSVWriter(save_dir / "losses.csv", header=header)
    accs_csv = CSVWriter(save_dir / "accs.csv", header=header)
    aucs_csv = CSVWriter(save_dir / "aucs.csv", header=header)
    results_csv = CSVWriter(
        save_dir / "results.csv",
        header=["epoch", "final_epoch", "final_loss", "final_acc", "final_auc",
                "final_precision", "final_recall", "final_f1_score"],
    )
    early_stop = EarlyStop(args.patience) if args.patience is not None else None
    tb_writer = make_tb_writer(save_dir, args.use_tensorboard)
    profiler = ProfilerHook(save_dir / "profile", getattr(args, "profile", 0))

    best_params = jax.tree_util.tree_map(lambda x: x, agg_state.params)
    best_policy = ppo_state.params if ppo_state is not None else None
    np_rng = np.random.default_rng(args.seed)
    backbone_lr_fn = lr_schedule_factory(args.scheduler, args.backbone_lr, args.epochs, int(args.warmup))
    fc_lr_fn = lr_schedule_factory(args.scheduler, args.fc_lr, args.epochs, int(args.warmup))

    for epoch in range(args.epochs):
        t0 = time.time()
        if args.train_stage != 2 and args.scheduler is not None:
            agg_state = agg_state._replace(
                opt_state=set_learning_rates(
                    agg_state.opt_state, backbone_lr_fn(epoch), fc_lr_fn(epoch)
                )
            )
        # --- train epoch ----------------------------------------------------
        outputs = EpochOutputs()
        # defer host syncs to epoch end: converting per step would stall the
        # device dispatch pipeline
        pending = []
        train_src = sources["train"]
        batches = list(epoch_batches(
            train_src.num_slides, args.num_data, args.batch_size, np_rng,
            drop_partial=False,
        ))
        staged = train_src.iter_batches([ids for ids, _ in batches])
        for (ids, valid), (bank_arrays, slide_ids, labels) in zip(batches, staged):
            rng, r_step = jax.random.split(rng)
            profiler.step()
            agg_state, ppo_state, stats = engine.train_step(
                agg_state, ppo_state, bank_arrays,
                slide_ids, labels, r_step, valid=jnp.asarray(valid),
            )
            pending.append((stats.logits, np.asarray(train_src.labels)[ids], valid,
                            stats.step_losses[-1]))
        last_loss, n_batches = 0.0, 0
        for logits, labels, valid, loss_arr in pending:
            outputs.update(logits, labels, valid)
            last_loss += float(loss_arr)
            n_batches += 1
        (train_metrics, _, _) = outputs.metrics()
        train_loss = last_loss / max(1, n_batches)
        train_acc, train_auc, train_p, train_r, train_f1 = train_metrics

        # --- valid / test ---------------------------------------------------
        rng, r_v, r_t = jax.random.split(rng, 3)
        valid_loss, valid_metrics = _evaluate(args, engine, agg_state, ppo_state, sources["valid"], r_v)
        test_loss, test_metrics = _evaluate(args, engine, agg_state, ppo_state, sources["test"], r_t)
        valid_acc, valid_auc, valid_p, valid_r, valid_f1 = valid_metrics
        test_acc, test_auc, test_p, test_r, test_f1 = test_metrics

        if tb_writer is not None:
            tb_writer.add_scalar("train/1.train_loss", train_loss, epoch)
            tb_writer.add_scalar("test/2.test_loss", valid_loss, epoch)

        # --- model selection (train_RLMIL.py:902-917) -----------------------
        if args.picked_method == "acc":
            is_best = bests["valid_acc"].compare(valid_acc)
        elif args.picked_method == "loss":
            is_best = bests["valid_loss"].compare(valid_loss)
        elif args.picked_method == "auc":
            is_best = bests["valid_auc"].compare(valid_auc)
        elif args.picked_method == "score":
            score = get_score(valid_acc, valid_auc, valid_p, valid_r, valid_f1)
            is_best = best_score.compare(score, epoch + 1, inplace=True)
        else:
            raise ValueError("picked_method error.")
        if is_best:
            final.update(epoch=epoch + 1, loss=test_loss, acc=test_acc, auc=test_auc,
                         precision=test_p, recall=test_r, f1=test_f1)
            best_params = jax.tree_util.tree_map(lambda x: np.asarray(x), agg_state.params)
            best_policy = (
                jax.tree_util.tree_map(lambda x: np.asarray(x), ppo_state.params)
                if ppo_state is not None else None
            )
            if args.save_model:
                save_checkpoint(save_dir, epoch + 1, agg_state, ppo_state, is_best=True)

        for split, (l, a, u) in zip(
            ("train", "valid", "test"),
            ((train_loss, train_acc, train_auc), (valid_loss, valid_acc, valid_auc),
             (test_loss, test_acc, test_auc)),
        ):
            bests[f"{split}_loss"].compare(l, epoch + 1, inplace=True)
            bests[f"{split}_acc"].compare(a, epoch + 1, inplace=True)
            bests[f"{split}_auc"].compare(u, epoch + 1, inplace=True)

        losses_csv.write_row([epoch + 1, train_loss, valid_loss, test_loss,
                              (bests["train_loss"].best, bests["train_loss"].epoch),
                              (bests["valid_loss"].best, bests["valid_loss"].epoch),
                              (bests["test_loss"].best, bests["test_loss"].epoch)])
        accs_csv.write_row([epoch + 1, train_acc, valid_acc, test_acc,
                            (bests["train_acc"].best, bests["train_acc"].epoch),
                            (bests["valid_acc"].best, bests["valid_acc"].epoch),
                            (bests["test_acc"].best, bests["test_acc"].epoch)])
        aucs_csv.write_row([epoch + 1, train_auc, valid_auc, test_auc,
                            (bests["train_auc"].best, bests["train_auc"].epoch),
                            (bests["valid_auc"].best, bests["valid_auc"].epoch),
                            (bests["test_auc"].best, bests["test_auc"].epoch)])
        results_csv.write_row([epoch + 1, final["epoch"], test_loss, test_acc, test_auc,
                               test_p, test_r, test_f1])

        print(
            f"Epoch {epoch + 1}/{args.epochs} [{time.time() - t0:.1f}s] "
            f"Train acc {train_acc:.4f} auc {train_auc:.4f} loss {train_loss:.4f} | "
            f"Valid acc {valid_acc:.4f} auc {valid_auc:.4f} loss {valid_loss:.4f} | "
            f"Test acc {test_acc:.4f} auc {test_auc:.4f} loss {test_loss:.4f} | "
            f"Final epoch {final['epoch']} acc {final['acc']:.4f} auc {final['auc']:.4f}"
        )

        if early_stop is not None:
            early_stop.update((bests["valid_loss"].best, bests["valid_acc"].best,
                               bests["valid_auc"].best))
            if early_stop.is_stop():
                break

    profiler.close()
    if tb_writer is not None:
        tb_writer.close()
    return {"best_params": best_params, "best_policy": best_policy, "final": final}


def default_args(**overrides) -> SimpleNamespace:
    """Programmatic args with the reference CLI defaults (``train_RLMIL.py:1060-1153``)."""
    ns = SimpleNamespace(
        dataset="Camelyon16", data_csv="", data_split_json="", train_data="train",
        preload=False, feat_size=1024,
        train_method="scratch", train_stage=1, T=6,
        checkpoint_stage=None, checkpoint_pretrained=None,
        optimizer="Adam", scheduler=None, batch_size=1, epochs=40, ppo_epochs=10,
        backbone_lr=1e-4, fc_lr=1e-4, momentum=0.9, nesterov=True,
        beta1=0.9, beta2=0.999, warmup=0, wdecay=1e-5,
        picked_method="score", patience=None,
        arch="CLAM_SB", num_classes=2, model_dim=512,
        policy_hidden_dim=512, policy_conv=False, action_std=0.5,
        ppo_lr=1e-5, ppo_gamma=0.1, K_epochs=3,
        feature_num=512, fc_hidden_dim=1024, fc_rnn=True, load_fc=False,
        L=512, D=128, dropout=0.0,
        size_arg="small", k_sample=8, bag_weight=0.7,
        loss="CrossEntropyLoss", use_tensorboard=False,
        base_save_dir="./results", save_dir=None, save_dir_flag=None,
        exist_ok=False, save_model=False, device="0", seed=985,
        train_model_prime=True, eval_batch_pad=1, streaming=False,
        compute_dtype="float32", profile=0, rng_impl="threefry", resume=False,
        remat="save_subbag", stage1_layout="batched", select_impl="auto",
        attn_gate_math="exact", dp_devices=0,
    )
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns
