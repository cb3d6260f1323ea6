"""Bidirectional bridge to reference (PyTorch) checkpoints.

Users of the reference hold ``.pth.tar`` files whose ``model_state_dict`` /
``fc`` / ``policy`` entries are torch state_dicts (``train_MuRCL.py:322-329``).
This module maps them onto our flax parameter trees (and back), so
pretrained reference models transfer into the TPU stack and TPU-trained
models can be consumed by reference tooling.

Mapping is declarative: per architecture, a table of
``(torch_prefix, flax_path, kind)`` where ``kind`` decides the tensor
transform (torch ``Linear.weight`` is ``(out, in)`` -> flax kernel
``(in, out)``; GRU weights transpose likewise; conv1d ``fcc`` keeps its
``(C, C, D)`` layout).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

LINEAR, GRU, RAW = "linear", "gru", "raw"

# torch Sequential index maps derive from the reference module definitions:
# ABMIL (models/abmil.py:12-33), CLAM_SB (models/clam.py:37-80),
# DSMIL (models/dsmil.py:6-62), Full_layer/ActorCritic (models/rlmil.py).
ATTN = "attn"  # torch Linear -> flat (w.T, b) pair under given leaf names

ABMIL_MAP: List[Tuple[str, Tuple[str, ...], str]] = [
    ("encoder.0", ("encoder", "dense_0"), LINEAR),
    ("encoder.3", ("encoder", "dense_1"), LINEAR),
    ("encoder.6", ("encoder", "dense_2"), LINEAR),
    ("attention.0", ("attn", "wa", "ba"), ATTN),
    ("attention.2", ("attn", "wc", "bc"), ATTN),
    ("decoder.0", ("decoder",), LINEAR),
    ("fc", ("fc",), LINEAR),
]


def clam_map(dropout: bool = True) -> list:
    attn = "attention_net.3" if dropout else "attention_net.2"
    return [
        ("attention_net.0", ("fc",), LINEAR),
        (f"{attn}.attention_a.0", ("attn", "wa", "ba"), ATTN),
        (f"{attn}.attention_b.0", ("attn", "wb", "bb"), ATTN),
        (f"{attn}.attention_c", ("attn", "wc", "bc"), ATTN),
        ("classifiers", ("classifiers",), LINEAR),
    ]


DSMIL_MAP = [
    ("i_classifier.fc.0", ("i_classifier",), LINEAR),
    ("b_classifier.q", ("q",), LINEAR),
    ("b_classifier.v.1", ("v",), LINEAR),
]

FULL_LAYER_MAP = [
    ("rnn", ("rnn",), GRU),
    ("fc", ("fc",), LINEAR),
]

ACTOR_CRITIC_MAP = [
    ("state_encoder.0", ("enc_hidden",), LINEAR),
    ("state_encoder.2", ("enc_out",), LINEAR),
    ("gru", ("gru",), GRU),
    ("actor.0", ("actor",), LINEAR),
    ("critic.0", ("critic",), LINEAR),
]


def _strip_prefixes(sd: dict) -> dict:
    """Unwrap DataParallel/CL nesting: ``module.`` and ``encoder.`` prefixes
    (the reference's own surgery, ``train_RLMIL.py:124-135``).

    ``encoder.`` is only a wrapper prefix when EVERY key carries it (the CL
    wrapper nests the whole aggregator under ``encoder``); a bare ABMIL
    state_dict legitimately has its own ``encoder.*`` submodule keys that
    must survive.
    """
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.numpy() if hasattr(v, "numpy") else v)
    if out and all(k.startswith("encoder.") for k in out):
        out = {k[len("encoder."):]: v for k, v in out.items()}
    return out


def _set_path(tree: dict, path: Tuple[str, ...], leaf_name: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def _get_path(tree: dict, path: Tuple[str, ...]) -> dict:
    node = tree
    for p in path:
        node = node[p]
    return node


def torch_to_flax(sd: dict, mapping: list) -> dict:
    """Build a ``{'params': ...}`` tree from a torch state_dict."""
    sd = _strip_prefixes(sd)
    params: dict = {}
    for tprefix, fpath, kind in mapping:
        if kind == LINEAR:
            if f"{tprefix}.weight" not in sd:
                continue
            _set_path(params, fpath[:-1] if len(fpath) > 1 else (),
                      fpath[-1], {
                          "kernel": sd[f"{tprefix}.weight"].T.copy(),
                          **({"bias": sd[f"{tprefix}.bias"]}
                             if f"{tprefix}.bias" in sd else {}),
                      })
        elif kind == ATTN:
            # fpath = (module, weight_leaf, bias_leaf); torch (out,in) -> (in,out)
            if f"{tprefix}.weight" not in sd:
                continue
            module_path, w_name, b_name = fpath[:-2], fpath[-2], fpath[-1]
            w = sd[f"{tprefix}.weight"].T.copy()
            _set_path(params, module_path, w_name, w)
            if f"{tprefix}.bias" in sd:
                _set_path(params, module_path, b_name, sd[f"{tprefix}.bias"])
        elif kind == GRU:
            if f"{tprefix}.weight_ih_l0" not in sd:
                continue
            _set_path(params, fpath[:-1] if len(fpath) > 1 else (),
                      fpath[-1], {
                          "w_ih": sd[f"{tprefix}.weight_ih_l0"].T.copy(),
                          "w_hh": sd[f"{tprefix}.weight_hh_l0"].T.copy(),
                          "b_ih": sd[f"{tprefix}.bias_ih_l0"],
                          "b_hh": sd[f"{tprefix}.bias_hh_l0"],
                      })
    return {"params": params}


def import_model_state(sd: dict, arch: str) -> dict:
    """Reference aggregator state_dict -> flax param tree for ``arch``."""
    sd = _strip_prefixes(sd)
    if arch == "ABMIL":
        return torch_to_flax(sd, ABMIL_MAP)
    if arch == "CLAM_SB":
        dropout = any(k.startswith("attention_net.3") for k in sd)
        tree = torch_to_flax(sd, clam_map(dropout))
        # stacked instance classifiers
        idx = 0
        kernels, biases = [], []
        while f"instance_classifiers.{idx}.weight" in sd:
            kernels.append(sd[f"instance_classifiers.{idx}.weight"].T)
            biases.append(sd[f"instance_classifiers.{idx}.bias"])
            idx += 1
        if kernels:
            tree["params"]["instance_kernel"] = np.stack(kernels)
            tree["params"]["instance_bias"] = np.stack(biases)
        return tree
    if arch == "DSMIL":
        tree = torch_to_flax(sd, DSMIL_MAP)
        if "b_classifier.fcc.weight" in sd:
            tree["params"]["fcc_kernel"] = sd["b_classifier.fcc.weight"]
            tree["params"]["fcc_bias"] = sd["b_classifier.fcc.bias"]
        return tree
    raise ValueError(arch)


def import_fc_state(sd: dict) -> dict:
    sd = _strip_prefixes(sd)
    tree = torch_to_flax(sd, FULL_LAYER_MAP)
    for t in range(2, 6):  # cascaded heads, if present
        if f"fc_{t}.weight" in sd:
            tree["params"][f"fc_{t}"] = {
                "kernel": sd[f"fc_{t}.weight"].T.copy(),
                "bias": sd[f"fc_{t}.bias"],
            }
    return tree


def import_policy_state(sd: dict) -> dict:
    return torch_to_flax(_strip_prefixes(sd), ACTOR_CRITIC_MAP)


def import_reference_checkpoint(path, arch: str) -> dict:
    """Load a torch ``.pth.tar`` and convert every entry we understand.

    Returns the same top-level layout as our native checkpoints:
    ``{epoch, model_state_dict, fc, policy}`` with flax trees.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {"epoch": ckpt.get("epoch"), "format": "imported-torch"}
    if ckpt.get("model_state_dict") is not None:
        out["model_state_dict"] = import_model_state(ckpt["model_state_dict"], arch)
    if ckpt.get("fc") is not None:
        out["fc"] = import_fc_state(ckpt["fc"])
    if ckpt.get("policy") is not None:
        out["policy"] = import_policy_state(ckpt["policy"])
    return out


# ---------------------------------------------------------------------------
# Export: flax trees -> torch state_dicts (reference-consumable)
# ---------------------------------------------------------------------------
def _np(x):
    return np.asarray(x)


def flax_to_torch(params: dict, mapping: list) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    tree = params["params"] if "params" in params else params
    for tprefix, fpath, kind in mapping:
        try:
            node = _get_path(tree, fpath[:-2] if kind == ATTN else fpath)
        except KeyError:
            continue
        if kind == LINEAR:
            sd[f"{tprefix}.weight"] = _np(node["kernel"]).T.copy()
            if "bias" in node:
                sd[f"{tprefix}.bias"] = _np(node["bias"])
        elif kind == ATTN:
            w_name, b_name = fpath[-2], fpath[-1]
            if w_name not in node:
                continue
            sd[f"{tprefix}.weight"] = _np(node[w_name]).T.copy()
            if b_name in node:
                sd[f"{tprefix}.bias"] = _np(node[b_name])
        elif kind == GRU:
            sd[f"{tprefix}.weight_ih_l0"] = _np(node["w_ih"]).T.copy()
            sd[f"{tprefix}.weight_hh_l0"] = _np(node["w_hh"]).T.copy()
            sd[f"{tprefix}.bias_ih_l0"] = _np(node["b_ih"])
            sd[f"{tprefix}.bias_hh_l0"] = _np(node["b_hh"])
    return sd


def export_model_state(params: dict, arch: str) -> Dict[str, np.ndarray]:
    tree = params["params"] if "params" in params else params
    if arch == "ABMIL":
        return flax_to_torch(params, ABMIL_MAP)
    if arch == "CLAM_SB":
        sd = flax_to_torch(params, clam_map(dropout=True))
        if "instance_kernel" in tree:
            for i in range(_np(tree["instance_kernel"]).shape[0]):
                sd[f"instance_classifiers.{i}.weight"] = _np(tree["instance_kernel"])[i].T.copy()
                sd[f"instance_classifiers.{i}.bias"] = _np(tree["instance_bias"])[i]
        return sd
    if arch == "DSMIL":
        sd = flax_to_torch(params, DSMIL_MAP)
        if "fcc_kernel" in tree:
            sd["b_classifier.fcc.weight"] = _np(tree["fcc_kernel"])
            sd["b_classifier.fcc.bias"] = _np(tree["fcc_bias"])
        return sd
    raise ValueError(arch)


def export_reference_checkpoint(path, arch: str, agg_state, ppo_state=None,
                                epoch: int = 0) -> None:
    """Write a torch ``.pth.tar`` the reference can load directly."""
    import torch

    state = {
        "epoch": epoch,
        "model_state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_model_state(agg_state.params["model"], arch).items()
        },
        "fc": {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flax_to_torch(agg_state.params["fc"], FULL_LAYER_MAP).items()
        },
        "optimizer": None,
        "ppo_optimizer": None,
        "policy": None if ppo_state is None else {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flax_to_torch(ppo_state.params, ACTOR_CRITIC_MAP).items()
        },
    }
    torch.save(state, path)
