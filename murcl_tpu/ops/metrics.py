"""Classification metrics with reference parity (``utils/general.py:157-204``).

``get_metrics`` returns ``(acc, auc, precision, recall, f1)`` computed the
same way as the reference: softmax probabilities, sklearn ROC-AUC (binary
on ``probs[:, 1]``, multiclass one-vs-rest), precision/recall/F1 binary or
macro. ``get_score`` is the composite ``0.3 acc + 0.3 auc + 0.1 p + 0.1 r
+ 0.2 f1``. Inputs are numpy or jax arrays of logits/labels.
"""

from __future__ import annotations

import numpy as np


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def accuracy_topk(outputs, targets, topk=(1,)):
    """Top-k accuracy in percent, matching the reference ``accuracy``."""
    outputs = np.asarray(outputs)
    targets = np.asarray(targets).reshape(-1)
    maxk = max(topk)
    batch_size = targets.shape[0]
    pred = np.argsort(-outputs, axis=1)[:, :maxk]  # (B, maxk)
    correct = pred == targets[:, None]
    return [100.0 * correct[:, :k].any(axis=1).sum() / batch_size for k in topk]


def get_metrics(outputs, targets):
    """``(acc, auc, precision, recall, f1)`` from logits and integer labels."""
    from sklearn.metrics import precision_recall_fscore_support, roc_auc_score

    outputs = np.asarray(outputs, dtype=np.float64)
    targets = np.asarray(targets, dtype=np.int64).reshape(-1)
    assert outputs.shape[0] == targets.shape[0]
    num_class = outputs.shape[1]
    multi_class = num_class > 2

    preds = outputs.argmax(axis=1)
    acc = float((preds == targets).sum() / targets.shape[0])

    probs = _softmax(outputs)
    if multi_class:
        auc = roc_auc_score(targets, probs, multi_class="ovr")
    else:
        auc = roc_auc_score(targets, probs[:, 1])

    average = "macro" if multi_class else "binary"
    precision, recall, f1, _ = precision_recall_fscore_support(
        targets, preds, average=average, zero_division=0
    )
    return acc, float(auc), float(precision), float(recall), float(f1)


def get_score(acc, auc, precision, recall, f1_score):
    return 0.3 * acc + 0.3 * auc + 0.1 * precision + 0.1 * recall + 0.2 * f1_score
