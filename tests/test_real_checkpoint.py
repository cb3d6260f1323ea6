"""Import fidelity on checkpoints produced by the REFERENCE'S OWN code.

Round 1 only tested the torch bridge against self-exported checkpoints.
Here the checkpoint is synthesized by the reference's actual modules at
reference dims (512-d patches, CLAM small [512, 512, 256], 128-d
projection head) and saved in the exact layout ``train_MuRCL.py:322-329``
writes — including the ``module.`` (DataParallel) and ``module.encoder.``
variants that ``create_heatmaps.py:42-56`` must unwrap — then loaded
through our ``engine.torch_import`` path and checked BIT-TRUE against the
torch tensors, plus end-to-end through the downstream surgery
(``train_RLMIL.py:124-135``: encoder transfers, dead heads stay fresh).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")  # read-only import of reference modules

import jax
import jax.numpy as jnp

from murcl_tpu.engine import load_checkpoint, transfer_params
from murcl_tpu.models import build_aggregator

DIM, PROJ = 512, 128


def _no_cuda():
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    return orig


@pytest.fixture(scope="module")
def reference_checkpoint(tmp_path_factory):
    """A stage-3 MuRCL pretrain checkpoint written by reference code."""
    from models import clam, cl, rlmil

    torch.manual_seed(985)
    encoder = clam.CLAM_SB(gate=True, size_arg="small", dropout=True,
                           k_sample=8, n_classes=PROJ, subtyping=True,
                           in_dim=DIM)
    model = cl.CL(encoder, projection_dim=PROJ, n_features=512)
    fc = rlmil.Full_layer(512, 1024, True, PROJ)
    orig = _no_cuda()
    try:
        ppo = rlmil.PPO(feature_dim=DIM, state_dim=512, hidden_state_dim=512,
                        policy_conv=False, action_std=0.5, lr=1e-5,
                        gamma=0.1, K_epochs=3, action_size=10)
    finally:
        torch.Tensor.cuda = orig

    tmp = tmp_path_factory.mktemp("refckpt")
    # exactly the save layout of train_MuRCL.py:322-329 (model unwrapped
    # from DataParallel via .module before state_dict())
    state = {
        "epoch": 7,
        "model_state_dict": model.state_dict(),  # keys: encoder.*
        "fc": fc.state_dict(),
        "optimizer": None,
        "ppo_optimizer": None,
        "policy": ppo.policy.state_dict(),
    }
    path = tmp / "model_best.pth.tar"
    torch.save(state, str(path))

    # the in-the-wild variant create_heatmaps.py:42-47 handles: the whole
    # DataParallel-wrapped CL saved WITHOUT .module -> module.encoder.* keys
    dp_state = dict(state)
    dp_state["model_state_dict"] = torch.nn.DataParallel(model).state_dict()
    assert all(k.startswith("module.encoder.")
               for k in dp_state["model_state_dict"])
    dp_path = tmp / "model_best_dataparallel.pth.tar"
    torch.save(dp_state, str(dp_path))

    return {"path": str(path), "dp_path": str(dp_path), "encoder": encoder,
            "fc": fc, "policy": ppo.policy}


def _t(sd, key):
    return sd[key].detach().numpy()


def test_import_is_bit_true(reference_checkpoint):
    ck = load_checkpoint(reference_checkpoint["path"], arch="CLAM_SB")
    assert ck["epoch"] == 7
    sd = reference_checkpoint["encoder"].state_dict()
    p = ck["model_state_dict"]["params"]
    # trunk + gated attention (dropout=True -> attention_net.3.*)
    np.testing.assert_array_equal(p["fc"]["kernel"],
                                  _t(sd, "attention_net.0.weight").T)
    np.testing.assert_array_equal(p["fc"]["bias"],
                                  _t(sd, "attention_net.0.bias"))
    np.testing.assert_array_equal(p["attn"]["wa"],
                                  _t(sd, "attention_net.3.attention_a.0.weight").T)
    np.testing.assert_array_equal(p["attn"]["ba"],
                                  _t(sd, "attention_net.3.attention_a.0.bias"))
    np.testing.assert_array_equal(p["attn"]["wb"],
                                  _t(sd, "attention_net.3.attention_b.0.weight").T)
    np.testing.assert_array_equal(p["attn"]["wc"],
                                  _t(sd, "attention_net.3.attention_c.weight").T)
    # dead classifiers head + stacked instance classifiers
    np.testing.assert_array_equal(p["classifiers"]["kernel"],
                                  _t(sd, "classifiers.weight").T)
    n_inst = p["instance_kernel"].shape[0]
    assert n_inst == PROJ  # subtyping: one per class
    for i in (0, 1, n_inst - 1):
        np.testing.assert_array_equal(
            p["instance_kernel"][i], _t(sd, f"instance_classifiers.{i}.weight").T)
        np.testing.assert_array_equal(
            p["instance_bias"][i], _t(sd, f"instance_classifiers.{i}.bias"))

    # Full_layer GRU + head
    fsd = reference_checkpoint["fc"].state_dict()
    fp = ck["fc"]["params"]
    np.testing.assert_array_equal(fp["rnn"]["w_ih"], _t(fsd, "rnn.weight_ih_l0").T)
    np.testing.assert_array_equal(fp["rnn"]["w_hh"], _t(fsd, "rnn.weight_hh_l0").T)
    np.testing.assert_array_equal(fp["rnn"]["b_ih"], _t(fsd, "rnn.bias_ih_l0"))
    np.testing.assert_array_equal(fp["fc"]["kernel"], _t(fsd, "fc.weight").T)

    # PPO ActorCritic
    psd = reference_checkpoint["policy"].state_dict()
    pp = ck["policy"]["params"]
    np.testing.assert_array_equal(pp["enc_hidden"]["kernel"],
                                  _t(psd, "state_encoder.0.weight").T)
    np.testing.assert_array_equal(pp["gru"]["w_ih"], _t(psd, "gru.weight_ih_l0").T)
    np.testing.assert_array_equal(pp["actor"]["kernel"], _t(psd, "actor.0.weight").T)
    np.testing.assert_array_equal(pp["critic"]["kernel"], _t(psd, "critic.0.weight").T)


def test_module_encoder_variant_loads_identically(reference_checkpoint):
    """``module.encoder.*`` keys (DataParallel saved un-unwrapped) unwrap to
    the same tree — the create_heatmaps.py:42-47 path."""
    a = load_checkpoint(reference_checkpoint["path"], arch="CLAM_SB")
    b = load_checkpoint(reference_checkpoint["dp_path"], arch="CLAM_SB")
    leaves_a = jax.tree_util.tree_leaves_with_path(a["model_state_dict"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b["model_state_dict"]))
    assert len(leaves_a) == len(flat_b) and len(leaves_a) > 5
    for path, leaf in leaves_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))


def test_downstream_surgery_from_reference_checkpoint(reference_checkpoint):
    """The finetune surgery (train_RLMIL.py:124-135): encoder weights
    transfer bit-true into a fresh downstream model (n_classes=2); the
    pretrain-sized heads (classifiers 128-way, instance stack) are skipped
    on shape mismatch and keep their fresh init."""
    ck = load_checkpoint(reference_checkpoint["path"], arch="CLAM_SB")
    model, _ = build_aggregator(
        "CLAM_SB", dim_in=DIM, num_classes=2,
        arch_setting={"gate": True, "size_arg": "small", "dropout": 0.25,
                      "k_sample": 8, "subtyping": True},
    )
    fresh = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, DIM)),
                       jnp.zeros((1,), jnp.int32), True)
    merged = transfer_params(fresh, ck["model_state_dict"], verbose=False)

    sd = reference_checkpoint["encoder"].state_dict()
    mp = merged["params"]
    np.testing.assert_array_equal(mp["fc"]["kernel"],
                                  _t(sd, "attention_net.0.weight").T)
    np.testing.assert_array_equal(mp["attn"]["wa"],
                                  _t(sd, "attention_net.3.attention_a.0.weight").T)
    # heads re-initialized (128-way pretrain vs 2-way downstream)
    np.testing.assert_array_equal(mp["classifiers"]["kernel"],
                                  fresh["params"]["classifiers"]["kernel"])
    np.testing.assert_array_equal(mp["instance_kernel"],
                                  fresh["params"]["instance_kernel"])


def test_forward_parity_at_reference_dims(reference_checkpoint):
    """Imported weights drive our flax CLAM to the torch module's outputs
    at the real 512-d/CLAM-small shapes (eval mode, no dropout)."""
    from murcl_tpu.models import CLAM_SB

    encoder = reference_checkpoint["encoder"].eval()
    ck = load_checkpoint(reference_checkpoint["path"], arch="CLAM_SB")
    fm = CLAM_SB(in_dim=DIM, gate=True, size_arg="small", dropout=0.25,
                 k_sample=8, n_classes=PROJ, subtyping=True)
    x = np.random.default_rng(0).normal(size=(1, 64, DIM)).astype(np.float32)
    with torch.no_grad():
        want, _ = encoder(torch.from_numpy(x))
    got, _ = fm.apply(ck["model_state_dict"], jnp.asarray(x))  # train=False
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)
