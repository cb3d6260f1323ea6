"""Exact-step MuRCL pretraining parity vs the reference's own modules.

Same weights (through the torch bridge), same fixed action sequences, and
identity mixup (alpha=1) — the per-step NT-Xent losses of our rollout math
must match the reference train loop (``train_MuRCL.py:233-288``) run with
its own modules (CL + ABMIL + Full_layer + NT_Xent + get_feats), including
the cross-view GRU-hidden interleave quirk.

Our side mirrors the engine's ``pair_forward`` order exactly (select ->
encode both views -> fc view0 then view1 on a shared carry).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from murcl_tpu.data.bank import bank_from_arrays
from murcl_tpu.engine.torch_import import export_model_state, flax_to_torch
from murcl_tpu.engine.torch_import import FULL_LAYER_MAP
from murcl_tpu.models import ABMIL, FullLayer
from murcl_tpu.ops.ntxent import nt_xent
from murcl_tpu.ops.select import select_feats

B, DIM, K, FEAT, T = 4, 16, 3, 12, 3


def test_exact_step_losses_match_reference():
    rng = np.random.default_rng(0)
    feats, clusters, labels = [], [], []
    for _ in range(B):
        n = int(rng.integers(40, 90))
        f = rng.normal(size=(n, DIM)).astype(np.float32)
        a = rng.integers(0, K, size=n)
        clusters.append([[int(j) for j in np.where(a == c)[0]] for c in range(K)])
        feats.append(f)
        labels.append(0)
    bank = bank_from_arrays(feats, clusters, labels)
    actions = rng.random((T, 2, B, K)).astype(np.float32)
    temperature = 0.5

    # ---- our side: engine math with fixed actions -------------------------
    model = ABMIL(dim_in=DIM, L=16, D=4, dim_out=8)
    fc = FullLayer(feature_num=16, hidden_state_dim=16, class_num=8)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((B, FEAT, DIM)))
    fcp = fc.init(jax.random.PRNGKey(1), jnp.zeros((B, 16)), None)

    ids = jnp.arange(B, dtype=jnp.int32)

    def select(a):
        return select_feats(
            bank.feats, ids, jnp.asarray(bank.offsets),
            jnp.asarray(bank.num_patches), jnp.asarray(bank.cluster_tables),
            jnp.asarray(bank.cluster_sizes), jnp.asarray(a),
            feat_size=FEAT, max_patches=bank.max_patches,
        )

    our_losses = []
    fc_carry = None
    for t in range(T):
        emb_a, _ = model.apply(mp, select(actions[t, 0]))
        emb_b, _ = model.apply(mp, select(actions[t, 1]))
        if t == 0:
            proj_a, _ = fc.apply(fcp, emb_a, None)
            proj_b, fc_carry = fc.apply(fcp, emb_b, None)
        else:
            proj_a, fc_carry = fc.apply(fcp, emb_a, fc_carry)
            proj_b, fc_carry = fc.apply(fcp, emb_b, fc_carry)
        our_losses.append(float(nt_xent(proj_a, proj_b, temperature)))

    # ---- reference side: its own modules, same weights + actions ----------
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    try:
        from models.abmil import ABMIL as RefABMIL
        from models.cl import CL as RefCL
        from models.rlmil import Full_layer as RefFullLayer
        from utils.datasets import get_feats as ref_get_feats
        from utils.datasets import mixup as ref_mixup
        from utils.losses import NT_Xent as RefNTXent

        rmodel = RefABMIL(dim_in=DIM, L=16, D=4, dim_out=8)
        rmodel.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_model_state(mp, "ABMIL").items()}
        )
        rcl = RefCL(rmodel, projection_dim=8, n_features=16).eval()
        rfc = RefFullLayer(16, 16, True, 8).eval()
        rfc.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in flax_to_torch(fcp, FULL_LAYER_MAP).items()}
        )
        criterion = RefNTXent(B, temperature)

        feat_list = [torch.from_numpy(f).unsqueeze(0) for f in feats]
        ref_losses = []
        with torch.no_grad():
            for t in range(T):
                x_views = [
                    ref_get_feats(feat_list, clusters,
                                  torch.from_numpy(actions[t, v]), FEAT)
                    for v in range(2)
                ]
                # alpha=1 -> identity mixup (train_MuRCL.py:239)
                x_views = [ref_mixup(x, 1.0)[0] for x in x_views]
                outputs, _ = rcl(x_views)
                outputs = [rfc(o, restart=(t == 0)) for o in outputs]
                ref_losses.append(float(criterion(outputs[0], outputs[1])))
    finally:
        sys.path.remove("/root/reference")

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4)
