"""Driver integration tests: full training runs on the synthetic dataset.

Exercises the programmatic API (``default_args``) end-to-end: MuRCL
pretraining stages with checkpoint chaining, downstream finetune with
pretrained-weight surgery, artifact layout, and torch-checkpoint export.
Small shapes keep each run to a few seconds on CPU.
"""

from pathlib import Path

import numpy as np
import pytest

from murcl_tpu.drivers import murcl, rlmil


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from murcl_tpu.data.synthetic import generate_synthetic_dataset

    root = tmp_path_factory.mktemp("drv")
    return generate_synthetic_dataset(root, num_slides=10, dim=16,
                                      num_clusters=4, seed=985)


def _murcl_args(synth, tmp, stage, **kw):
    base = dict(
        dataset="synt", data_csv=synth["data_csv"],
        data_split_json=synth["data_split_json"], feat_size=16, T=2,
        train_stage=stage, epochs=1, ppo_epochs=1, batch_size=2,
        data_repeat=1, projection_dim=8, model_dim=16, fc_hidden_dim=16,
        policy_hidden_dim=16, arch="ABMIL", D=4,
        base_save_dir=str(tmp), exist_ok=True, device="cpu",
    )
    base.update(kw)
    return murcl.default_args(**base)


def _rlmil_args(synth, tmp, stage, method, **kw):
    base = dict(
        dataset="synt", data_csv=synth["data_csv"],
        data_split_json=synth["data_split_json"], feat_size=16, T=2,
        train_method=method, train_stage=stage, epochs=1, ppo_epochs=1,
        batch_size=2, arch="ABMIL", L=16, D=4, fc_hidden_dim=16,
        policy_hidden_dim=16, base_save_dir=str(tmp), exist_ok=True,
        save_model=True, device="cpu",
    )
    base.update(kw)
    return rlmil.default_args(**base)


def test_murcl_three_stages_then_finetune(synth, tmp_path):
    # --- pretraining stages 1 -> 2 -> 3 with automatic chaining -----------
    out1 = murcl.run(_murcl_args(synth, tmp_path, 1))
    assert Path(out1["save_dir"], "model_best.pth.tar").exists()
    assert Path(out1["save_dir"], "losses.csv").exists()
    assert Path(out1["save_dir"], "args.yaml").exists()
    assert np.isfinite(out1["best_loss"])

    out2 = murcl.run(_murcl_args(synth, tmp_path, 2))
    assert Path(out2["save_dir"]).name == "stage_2"
    out3 = murcl.run(_murcl_args(synth, tmp_path, 3))
    pretrained = str(Path(out3["save_dir"], "model_best.pth.tar"))

    # --- downstream finetune stage 1 from the pretrained checkpoint -------
    res = rlmil.run(_rlmil_args(synth, tmp_path, 1, "finetune",
                                checkpoint_pretrained=pretrained))
    save_dir = Path(res["save_dir"])
    for artifact in ("pred.csv", "final_res.csv", "losses.csv", "accs.csv",
                     "aucs.csv", "results.csv", "args.yaml",
                     "model_best.pth.tar"):
        assert (save_dir / artifact).exists(), artifact

    import pandas as pd

    preds = pd.read_csv(save_dir / "pred.csv", index_col="case_id")
    assert set(preds.columns) == {"label", "pred", "correct", "prob0", "prob1"}
    assert len(preds) == 3  # test split size

    # --- finetune stage 2 takes the policy from the pretrained ckpt -------
    res2 = rlmil.run(_rlmil_args(synth, tmp_path, 2, "finetune",
                                 checkpoint_pretrained=pretrained))
    assert Path(res2["save_dir"]).name == "stage_2"


def test_rlmil_linear_eval_freezes_backbone(synth, tmp_path):
    from murcl_tpu.engine.checkpoint import load_checkpoint

    out1 = murcl.run(_murcl_args(synth, tmp_path, 1))
    pretrained = str(Path(out1["save_dir"], "model_best.pth.tar"))
    res = rlmil.run(_rlmil_args(synth, tmp_path, 1, "linear",
                                checkpoint_pretrained=pretrained))
    ckpt = load_checkpoint(Path(res["save_dir"]) / "model_best.pth.tar")
    pre = load_checkpoint(pretrained)
    # frozen backbone: encoder weights identical to the pretrained ones
    got = ckpt["model_state_dict"]["params"]["encoder"]["dense_0"]["kernel"]
    want = pre["model_state_dict"]["params"]["encoder"]["dense_0"]["kernel"]
    np.testing.assert_array_equal(got, want)

    # the FullLayer head (trainable under linear eval) must have MOVED from
    # its fresh initialization. Reconstruct the driver's exact init (same
    # seed -> same PRNGKey split, drivers/rlmil.py:163-167) and compare.
    import jax
    import jax.numpy as jnp
    import optax

    from murcl_tpu.engine import RolloutConfig, SupervisedEngine
    from murcl_tpu.models import FullLayer, build_aggregator

    model, feature_num = build_aggregator(
        "ABMIL", dim_in=16, num_classes=2,
        arch_setting={"L": 16, "D": 4, "dropout": 0.0, "dim_out": 2},
    )
    fc = FullLayer(feature_num=feature_num, hidden_state_dim=16,
                   fc_rnn=True, class_num=2)
    cfg = RolloutConfig(arch="ABMIL", T=2, feat_size=16, num_clusters=4,
                        max_patches=1, train_stage=1, num_classes=2)
    fresh_engine = SupervisedEngine(cfg, model, fc, tx=optax.adam(1e-4))
    rng = jax.random.PRNGKey(985)
    _, r_init, _ = jax.random.split(rng, 3)
    fresh = fresh_engine.init_params(
        r_init, jnp.zeros((2, 16, 16), jnp.float32), jnp.zeros((2,), jnp.int32)
    )
    trained_leaves = jax.tree_util.tree_leaves(ckpt["fc"])
    fresh_leaves = jax.tree_util.tree_leaves(fresh["fc"])
    assert len(trained_leaves) == len(fresh_leaves)
    assert all(np.asarray(a).shape == np.asarray(b).shape
               for a, b in zip(trained_leaves, fresh_leaves))
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(trained_leaves, fresh_leaves)), \
        "linear-eval head did not train"


def test_clam_murcl_pretrain_chain_then_finetune(synth, tmp_path):
    """CLAM_SB (the flagship bench arch) through the FULL drivers: 3-stage
    MuRCL pretrain chain, then downstream finetune stages 1 and 2 — the
    per-arch driver quirks of ``train_RLMIL.py:290-464``/``train_MuRCL.py``."""
    import pandas as pd

    out = None
    for stage in (1, 2, 3):
        out = murcl.run(_murcl_args(synth, tmp_path, stage, arch="CLAM_SB",
                                    k_sample=2))
        assert Path(out["save_dir"], "model_best.pth.tar").exists()
        if stage > 1:
            assert Path(out["save_dir"]).name == f"stage_{stage}"
        assert np.isfinite(out["best_loss"])
    pretrained = str(Path(out["save_dir"], "model_best.pth.tar"))

    res = rlmil.run(_rlmil_args(synth, tmp_path, 1, "finetune", arch="CLAM_SB",
                                k_sample=2, checkpoint_pretrained=pretrained))
    save_dir = Path(res["save_dir"])
    for artifact in ("pred.csv", "final_res.csv", "losses.csv", "accs.csv",
                     "aucs.csv", "results.csv", "args.yaml",
                     "model_best.pth.tar"):
        assert (save_dir / artifact).exists(), artifact
    final = pd.read_csv(save_dir / "final_res.csv", index_col=0)
    assert np.isfinite(final.to_numpy(dtype=float)).all()

    # stage 2 chains from stage_1 and takes the policy from the pretrained
    res2 = rlmil.run(_rlmil_args(synth, tmp_path, 2, "finetune",
                                 arch="CLAM_SB", k_sample=2,
                                 checkpoint_pretrained=pretrained))
    assert Path(res2["save_dir"]).name == "stage_2"
    assert Path(res2["save_dir"], "final_res.csv").exists()


def test_dsmil_scratch_stages(synth, tmp_path):
    """DSMIL through the full scratch driver: stage 1, then stage-2 chaining
    (the DSMIL dispatch of ``train_RLMIL.py:471-607``)."""
    import pandas as pd

    res = rlmil.run(_rlmil_args(synth, tmp_path, 1, "scratch", arch="DSMIL"))
    save_dir = Path(res["save_dir"])
    for artifact in ("pred.csv", "final_res.csv", "losses.csv",
                     "model_best.pth.tar"):
        assert (save_dir / artifact).exists(), artifact
    final = pd.read_csv(save_dir / "final_res.csv", index_col=0)
    assert np.isfinite(final.to_numpy(dtype=float)).all()

    res2 = rlmil.run(_rlmil_args(synth, tmp_path, 2, "scratch", arch="DSMIL"))
    assert Path(res2["save_dir"]).name == "stage_2"
    assert Path(res2["save_dir"], "final_res.csv").exists()


def test_dsmil_finetune_from_abmil_pretrain(synth, tmp_path):
    """The DSMIL chain's surgery path: MuRCL pretraining supports only
    {ABMIL, CLAM_SB} (``train_MuRCL.py:487``), so the reference's DSMIL
    route finetunes from an ABMIL pretrain whose L equals DSMIL's
    ``dim_patch``-wide states (``train_RLMIL.py:515-516`` — the policy
    checkpoint transfers only when the state widths match). Stage 1 loads
    the pretrained encoder with strict=False semantics (no DSMIL key
    matches an ABMIL encoder -> model keeps fresh init, like the
    reference's ``load_state_dict(..., strict=False)``,
    ``train_RLMIL.py:134``); stage 2 must still transfer the policy."""
    import jax
    import jax.numpy as jnp

    from murcl_tpu.engine.checkpoint import load_checkpoint

    out = None
    for stage in (1, 2, 3):
        out = murcl.run(_murcl_args(synth, tmp_path, stage))
    pretrained = str(Path(out["save_dir"], "model_best.pth.tar"))

    res = rlmil.run(_rlmil_args(synth, tmp_path, 1, "finetune", arch="DSMIL",
                                checkpoint_pretrained=pretrained))
    assert Path(res["save_dir"], "final_res.csv").exists()

    res2 = rlmil.run(_rlmil_args(synth, tmp_path, 2, "finetune", arch="DSMIL",
                                 checkpoint_pretrained=pretrained))
    assert Path(res2["save_dir"]).name == "stage_2"

    # the stage-2 run consumed the PRETRAIN policy: its saved policy must
    # differ from a fresh init at the driver's seed (widths match: ABMIL
    # L=16 == dim_patch=16), i.e. the transfer was not silently skipped
    from murcl_tpu.models import PPO

    ck = load_checkpoint(Path(res2["save_dir"]) / "model_best.pth.tar")
    assert ck.get("policy") is not None
    ppo = PPO(state_dim=16, hidden_state_dim=16, action_size=4,
              action_std=0.5)
    rng = jax.random.PRNGKey(985)
    _, _, r_ppo = jax.random.split(rng, 3)
    fresh = ppo.init(r_ppo, jnp.zeros((2, 16)))
    saved = jax.tree_util.tree_leaves(ck["policy"])
    fresh_leaves = jax.tree_util.tree_leaves(fresh.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(saved, fresh_leaves)), \
        "stage-2 DSMIL finetune ran with a fresh policy (transfer skipped)"


def test_stage2_policy_feeds_stage3_and_changes_behavior(synth, tmp_path):
    """The stage-2 driver's learned policy is consumed by stage 3 and is
    not inert: stage-2 training moves the policy away from its stage-1
    value, stage 3 starts from exactly the stage-2 checkpoint, and eval
    rollouts under the learned vs a fresh policy differ (VERDICT round-1
    weak item 7; reference flow train_MuRCL.py:296-298 + stage chaining)."""
    import jax
    import jax.numpy as jnp

    from murcl_tpu.engine.checkpoint import load_checkpoint

    murcl.run(_murcl_args(synth, tmp_path, 1))
    out2 = murcl.run(_murcl_args(synth, tmp_path, 2, ppo_epochs=2))
    ck2 = load_checkpoint(Path(out2["save_dir"]) / "model_best.pth.tar")
    assert ck2.get("policy") is not None

    # stage-2 PPO updates moved the policy (vs a fresh init at this seed)
    from murcl_tpu.models import PPO

    feature_num = 16
    ppo = PPO(state_dim=feature_num, hidden_state_dim=16, action_size=4,
              action_std=0.5)
    rng = jax.random.PRNGKey(985)
    _, _, r_ppo = jax.random.split(rng, 3)
    fresh = ppo.init(r_ppo, jnp.zeros((2, feature_num)))
    trained_leaves = jax.tree_util.tree_leaves(ck2["policy"])
    fresh_leaves = jax.tree_util.tree_leaves(fresh.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(trained_leaves, fresh_leaves)), \
        "stage-2 training left the policy at its initialization"

    # stage 3 consumes the stage-2 policy checkpoint bit-true
    out3 = murcl.run(_murcl_args(synth, tmp_path, 3))
    import yaml

    args3 = yaml.safe_load((Path(out3["save_dir"]) / "args.yaml").read_text())
    assert Path(args3["checkpoint"]).parent.name == "stage_2"

    # behavioral difference: identical aggregator + rng, learned vs fresh
    # policy -> different rollout outputs
    from murcl_tpu.data.sources import build_sources
    from murcl_tpu.engine import AggTrainState, RolloutConfig, SupervisedEngine
    from murcl_tpu.engine import transfer_params
    from murcl_tpu.models import FullLayer, build_aggregator
    from murcl_tpu.utils.general import load_json

    indices = load_json(synth["data_split_json"])
    src = build_sources(synth["data_csv"], {"train": indices["train"]})["train"]
    model, fn = build_aggregator("ABMIL", dim_in=16,
                                 arch_setting={"L": 16, "D": 4, "dim_out": 2})
    fc = FullLayer(feature_num=fn, hidden_state_dim=16, class_num=2)
    eng_ppo = PPO(state_dim=fn, hidden_state_dim=16, action_size=4,
                  action_std=0.5)
    cfg = RolloutConfig(arch="ABMIL", T=3, feat_size=16, num_clusters=4,
                        max_patches=src.max_patches, train_stage=3)
    import optax

    eng = SupervisedEngine(cfg, model, fc, ppo=eng_ppo, tx=optax.adam(1e-4))
    params = eng.init_params(jax.random.PRNGKey(0),
                             jnp.zeros((4, 16, 16)), jnp.zeros((4,), jnp.int32))
    agg = AggTrainState(params=params, opt_state=None)
    st_fresh = eng_ppo.init(jax.random.PRNGKey(3), jnp.zeros((4, fn)))
    learned = transfer_params(st_fresh.params, ck2["policy"], verbose=False)
    st_learned = st_fresh._replace(params=learned, old_params=learned)
    bank, ids, labels = src.batch(np.arange(4, dtype=np.int32))
    r = jax.random.PRNGKey(42)
    stats_fresh = eng.eval_step(agg, st_fresh, bank, ids, labels, r)
    stats_learned = eng.eval_step(agg, st_learned, bank, ids, labels, r)
    assert not np.allclose(np.asarray(stats_fresh.logits),
                           np.asarray(stats_learned.logits)), \
        "learned policy produced identical rollouts to a fresh policy"


def test_torch_checkpoint_roundtrip_through_driver(synth, tmp_path):
    """Export a trained model as a torch .pth.tar and load it back as the
    pretrained checkpoint of a finetune run."""
    torch = pytest.importorskip("torch")

    from murcl_tpu.engine import AggTrainState
    from murcl_tpu.engine.checkpoint import load_checkpoint
    from murcl_tpu.engine.torch_import import export_reference_checkpoint

    out1 = murcl.run(_murcl_args(synth, tmp_path, 1))
    ckpt = load_checkpoint(Path(out1["save_dir"]) / "model_best.pth.tar")
    agg = AggTrainState(
        params={"model": ckpt["model_state_dict"], "fc": ckpt["fc"]},
        opt_state=None,
    )
    torch_path = tmp_path / "exported.pth.tar"
    export_reference_checkpoint(torch_path, "ABMIL", agg)

    res = rlmil.run(_rlmil_args(synth, tmp_path, 1, "finetune",
                                checkpoint_pretrained=str(torch_path)))
    assert Path(res["save_dir"], "final_res.csv").exists()


def test_dp_devices_spmd_drivers(synth, tmp_path):
    """--dp_devices runs both trainers through the SPMD shard_map engine
    mode on the virtual CPU mesh: full artifact layout, finite losses, and
    the eval batch padded up to a mesh-divisible size."""
    out = murcl.run(_murcl_args(synth, tmp_path, 1, dp_devices=2))
    assert Path(out["save_dir"], "model_best.pth.tar").exists()
    assert np.isfinite(out["best_loss"])

    res = rlmil.run(_rlmil_args(synth, tmp_path, 1, "scratch", dp_devices=2))
    save_dir = Path(res["save_dir"])
    for artifact in ("pred.csv", "final_res.csv", "losses.csv", "args.yaml"):
        assert (save_dir / artifact).exists(), artifact
    final = res["final"]
    assert np.isfinite(final["loss"].iloc[0])

    # misuse fails loudly before any compile
    with pytest.raises(ValueError, match="divisible"):
        murcl.run(_murcl_args(synth, tmp_path, 1, dp_devices=2, batch_size=3,
                              exist_ok=True))
