"""Optimizers with torch-parity semantics for the reference's training knobs.

The reference uses two param groups (aggregator at ``backbone_lr``, GRU head
at ``fc_lr``; ``train_RLMIL.py:262-276``), torch ``Adam``/``SGD`` whose
weight decay is classic L2 *added to the gradient before* the moment update
(not AdamW), and epoch-level ``StepLR(7, 0.1)`` / ``CosineAnnealingLR``
schedulers that only start stepping after ``--warmup`` epochs
(``train_RLMIL.py:278-286,797``). Linear evaluation freezes everything but
heads named ``fc`` / ``classifiers`` / ``instance_classifiers``
(``train_RLMIL.py:139-144``).

Implementation: one optax chain per group via ``optax.multi_transform`` on
the ``{'model','fc'}`` tree, lr injected as a hyperparameter so the host
can set it per epoch (exactly torch's epoch-boundary scheduler semantics);
freezing is an ``optax.set_to_zero`` group.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import optax


def _torch_adam(lr, beta1, beta2, wdecay):
    return optax.chain(
        optax.add_decayed_weights(wdecay) if wdecay else optax.identity(),
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8),
        optax.scale_by_learning_rate(lr),
    )


def _torch_sgd(lr, momentum, nesterov, wdecay):
    return optax.chain(
        optax.add_decayed_weights(wdecay) if wdecay else optax.identity(),
        optax.trace(decay=momentum, nesterov=nesterov) if momentum else optax.identity(),
        optax.scale_by_learning_rate(lr),
    )


def make_optimizer(
    optimizer: str = "Adam",
    backbone_lr: float = 1e-4,
    fc_lr: float = 1e-4,
    beta1: float = 0.9,
    beta2: float = 0.999,
    momentum: float = 0.9,
    nesterov: bool = True,
    wdecay: float = 1e-5,
    frozen_model_paths: Optional[Callable] = None,
):
    """Two-group optimizer over the ``{'model': ..., 'fc': ...}`` param tree.

    ``frozen_model_paths(path_tuple) -> bool`` marks model leaves to freeze
    (linear eval). Returns an ``optax.GradientTransformation`` whose state
    exposes injected ``learning_rate`` hyperparams per group (see
    :func:`set_learning_rates`).
    """

    def group_of_model_leaf(path):
        if frozen_model_paths is not None and frozen_model_paths(path):
            return "frozen"
        return "model"

    def label_tree(params):
        def label_model(tree, path=()):
            if isinstance(tree, dict):
                return {k: label_model(v, path + (k,)) for k, v in tree.items()}
            return group_of_model_leaf(path)

        return {"model": label_model(params["model"]), "fc": jax.tree_util.tree_map(lambda _: "fc", params["fc"])}

    # only lr is injected (schedulable); everything else stays a static
    # python value so `if wdecay` etc. never sees a tracer
    if optimizer == "Adam":
        def _make(lr):
            return _torch_adam(lr, beta1, beta2, wdecay)
    elif optimizer == "SGD":
        def _make(lr):
            return _torch_sgd(lr, momentum, nesterov, wdecay)
    else:
        raise NotImplementedError(f"optimizer {optimizer!r}")

    mk = lambda lr: optax.inject_hyperparams(_make)(lr=lr)

    return optax.multi_transform(
        {"model": mk(backbone_lr), "fc": mk(fc_lr), "frozen": optax.set_to_zero()},
        label_tree,
    )


def set_learning_rates(opt_state, backbone_lr: float, fc_lr: float):
    """Return a new opt_state with per-group lrs replaced (host-side, per epoch)."""
    inner = dict(opt_state.inner_states)
    for group, lr in (("model", backbone_lr), ("fc", fc_lr)):
        st = inner[group]
        hp = dict(st.inner_state.hyperparams)
        hp["lr"] = jax.numpy.asarray(lr, dtype=hp["lr"].dtype) if hasattr(hp["lr"], "dtype") else lr
        new_inner = st.inner_state._replace(hyperparams=hp)
        inner[group] = st._replace(inner_state=new_inner)
    return opt_state._replace(inner_states=inner)


def lr_schedule_factory(
    scheduler: Optional[str],
    base_lr: float,
    epochs: int,
    warmup: int = 0,
    step_size: int = 7,
    step_gamma: float = 0.1,
    eta_min: float = 1e-6,
):
    """Epoch -> lr function replicating the torch schedulers used.

    ``scheduler.step()`` fires once per epoch but only when
    ``epoch >= warmup`` (``train_MuRCL.py:312``; ``train_RLMIL.py:797``), so
    the lr used *during* epoch ``e`` reflects ``max(0, e - warmup)``
    completed steps.
    """
    if scheduler is None:
        return lambda epoch: base_lr

    def steps_done(epoch: int) -> int:
        return max(0, epoch - warmup)

    if scheduler == "StepLR":
        return lambda epoch: base_lr * (step_gamma ** (steps_done(epoch) // step_size))
    if scheduler == "CosineAnnealingLR":
        t_max = max(1, epochs - warmup)

        def cosine(epoch: int) -> float:
            t = steps_done(epoch)
            return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t / t_max)) / 2

        return cosine
    raise ValueError(f"scheduler {scheduler!r}")


def linear_eval_frozen_paths(arch: str) -> Callable:
    """Predicate over model-param paths: True = frozen under linear eval.

    Reference (``train_RLMIL.py:139-144``): only params named ``fc* /
    classifiers* / instance_classifiers*`` stay trainable. Our trees name
    them ``fc`` (ABMIL), ``classifiers`` / ``instance_kernel`` /
    ``instance_bias`` (CLAM); DSMIL has no such heads, so its aggregator is
    fully frozen (matching the reference's name test).
    """
    trainable_heads = {"fc", "classifiers", "instance_kernel", "instance_bias"}

    def frozen(path) -> bool:
        return not any(p in trainable_heads for p in path)

    return frozen
