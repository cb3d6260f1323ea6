"""Exact-step supervised (RLMIL) parity vs the reference's own modules.

Fixed actions + bridged weights, batch_size=1 (the reference's supervised
batch path): the per-step losses of our arch adapters must match the
reference's train-loop formulas —

- CLAM:  ``bw*CE + (1-bw)*instance_loss`` (``train_RLMIL.py:336``)
- DSMIL: ``0.5*CE(fc(mean(B,1))) + 0.5*CE(max-pooled instance logits)``
  (``:514-529``)
- ABMIL: ``CE(fc(out))`` (``:727``)

including the GRU-head carry across the T steps.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from murcl_tpu.data.bank import bank_from_arrays
from murcl_tpu.engine.losses import cross_entropy
from murcl_tpu.engine.torch_import import FULL_LAYER_MAP, export_model_state, flax_to_torch
from murcl_tpu.models import ABMIL, CLAM_SB, FullLayer, MILNet
from murcl_tpu.ops.select import select_feats

DIM, K, FEAT, T = 16, 3, 12, 3
BW = 0.7


@pytest.fixture(scope="module")
def bag_and_actions():
    rng = np.random.default_rng(0)
    n = 70
    f = rng.normal(size=(n, DIM)).astype(np.float32)
    a = rng.integers(0, K, size=n)
    clusters = [[int(j) for j in np.where(a == c)[0]] for c in range(K)]
    bank = bank_from_arrays([f], [clusters], [1])
    actions = rng.random((T, 1, K)).astype(np.float32)
    return f, clusters, bank, actions


def _select(bank, actions_t):
    return select_feats(
        bank.feats, jnp.zeros((1,), jnp.int32), jnp.asarray(bank.offsets),
        jnp.asarray(bank.num_patches), jnp.asarray(bank.cluster_tables),
        jnp.asarray(bank.cluster_sizes), jnp.asarray(actions_t),
        feat_size=FEAT, max_patches=bank.max_patches,
    )


def _ref_env():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")


def _ref_done():
    sys.path.remove("/root/reference")


def test_clam_step_losses_match(bag_and_actions):
    f, clusters, bank, actions = bag_and_actions
    label = jnp.asarray([1])

    # dropout=0.25 like the reference (inactive in eval; export maps the
    # dropout=True Sequential layout)
    model = CLAM_SB(in_dim=DIM, k_sample=4, n_classes=2, subtyping=True, dropout=0.25)
    fc = FullLayer(feature_num=512, hidden_state_dim=16, class_num=2)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, FEAT, DIM)), label, True)
    fcp = fc.init(jax.random.PRNGKey(1), jnp.zeros((1, 512)), None)

    ours, carry = [], None
    for t in range(T):
        m, aux = model.apply(mp, _select(bank, actions[t]), label, True)
        logits, carry = fc.apply(fcp, m, None if t == 0 else carry)
        loss = BW * cross_entropy(logits, label) + (1 - BW) * jnp.mean(aux["instance_loss"])
        ours.append(float(loss))

    _ref_env()
    try:
        from models.clam import CLAM_SB as RefCLAM
        from models.rlmil import Full_layer as RefFullLayer
        from utils.datasets import get_feats as ref_get_feats

        rm = RefCLAM(gate=True, size_arg="small", dropout=True, k_sample=4,
                     n_classes=2, subtyping=True, in_dim=DIM).eval()
        rm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in export_model_state(mp, "CLAM_SB").items()})
        rfc = RefFullLayer(512, 16, True, 2).eval()
        rfc.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                             for k, v in flax_to_torch(fcp, FULL_LAYER_MAP).items()})
        crit = torch.nn.CrossEntropyLoss()
        tl = torch.tensor([1])
        feat_list = [torch.from_numpy(f).unsqueeze(0)]
        want = []
        with torch.no_grad():
            for t in range(T):
                feats = ref_get_feats(feat_list, [clusters],
                                      torch.from_numpy(actions[t]), FEAT)
                out, _, rd = rm(feats, label=tl, instance_eval=True)
                out = rfc(out, restart=(t == 0))
                loss = BW * crit(out, tl) + (1 - BW) * rd["instance_loss"]
                want.append(float(loss))
    finally:
        _ref_done()

    np.testing.assert_allclose(ours, want, rtol=2e-4)


def test_dsmil_step_losses_match(bag_and_actions):
    f, clusters, bank, actions = bag_and_actions
    label = jnp.asarray([1])

    model = MILNet(dim_feat=DIM, num_classes=2)
    fc = FullLayer(feature_num=DIM, hidden_state_dim=16, class_num=2)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, FEAT, DIM)))
    fcp = fc.init(jax.random.PRNGKey(1), jnp.zeros((1, DIM)), None)

    ours, carry = [], None
    for t in range(T):
        inst, bag_rep, _ = model.apply(mp, _select(bank, actions[t]))
        fc_in = jnp.mean(bag_rep, axis=1)
        logits, carry = fc.apply(fcp, fc_in, None if t == 0 else carry)
        loss = 0.5 * cross_entropy(logits, label) + 0.5 * cross_entropy(
            jnp.max(inst, axis=1), label)
        ours.append(float(loss))

    _ref_env()
    try:
        from models.dsmil import BClassifier, FCLayer, MILNet as RefMILNet
        from models.rlmil import Full_layer as RefFullLayer
        from utils.datasets import get_feats as ref_get_feats

        rm = RefMILNet(FCLayer(DIM, 2), BClassifier(DIM, 2)).eval()
        rm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in export_model_state(mp, "DSMIL").items()},
                           strict=False)
        rfc = RefFullLayer(DIM, 16, True, 2).eval()
        rfc.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                             for k, v in flax_to_torch(fcp, FULL_LAYER_MAP).items()})
        crit = torch.nn.CrossEntropyLoss()
        tl = torch.tensor([1])
        feat_list = [torch.from_numpy(f).unsqueeze(0)]
        want = []
        with torch.no_grad():
            for t in range(T):
                feats = ref_get_feats(feat_list, [clusters],
                                      torch.from_numpy(actions[t]), FEAT)
                # reference train_DSMIL body (:514-529)
                outputs_ins, outputs, states = rm(feats)
                outputs_max, _ = torch.max(outputs_ins, 0, keepdim=True)
                outputs = torch.mean(outputs, dim=1)
                outputs = rfc(outputs, restart=(t == 0))
                loss = 0.5 * crit(outputs, tl) + 0.5 * crit(outputs_max, tl)
                want.append(float(loss))
    finally:
        _ref_done()

    np.testing.assert_allclose(ours, want, rtol=2e-4)


def test_abmil_step_losses_match(bag_and_actions):
    f, clusters, bank, actions = bag_and_actions
    label = jnp.asarray([0])

    model = ABMIL(dim_in=DIM, L=16, D=4, dim_out=2)
    fc = FullLayer(feature_num=16, hidden_state_dim=16, class_num=2)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, FEAT, DIM)))
    fcp = fc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16)), None)

    ours, carry = [], None
    for t in range(T):
        out, _ = model.apply(mp, _select(bank, actions[t]))
        logits, carry = fc.apply(fcp, out, None if t == 0 else carry)
        ours.append(float(cross_entropy(logits, label)))

    _ref_env()
    try:
        from models.abmil import ABMIL as RefABMIL
        from models.rlmil import Full_layer as RefFullLayer
        from utils.datasets import get_feats as ref_get_feats

        rm = RefABMIL(dim_in=DIM, L=16, D=4, dim_out=2).eval()
        rm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in export_model_state(mp, "ABMIL").items()})
        rfc = RefFullLayer(16, 16, True, 2).eval()
        rfc.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                             for k, v in flax_to_torch(fcp, FULL_LAYER_MAP).items()})
        crit = torch.nn.CrossEntropyLoss()
        tl = torch.tensor([0])
        feat_list = [torch.from_numpy(f).unsqueeze(0)]
        want = []
        with torch.no_grad():
            for t in range(T):
                feats = ref_get_feats(feat_list, [clusters],
                                      torch.from_numpy(actions[t]), FEAT)
                out, _ = rm(feats)
                out = rfc(out, restart=(t == 0))
                want.append(float(crit(out, tl)))
    finally:
        _ref_done()

    np.testing.assert_allclose(ours, want, rtol=2e-4)
