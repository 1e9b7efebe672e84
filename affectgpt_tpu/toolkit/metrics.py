"""MERBench-style metrics for the traditional fusion baselines.

Parity with the reference metric helpers (reference:
toolkit/utils/metric.py:1-100): weighted-average F1 / accuracy for
discrete emotions, MSE + Pearson correlation for valence, and the
combined MER metric used to pick checkpoints.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def emotion_metrics(labels: np.ndarray, logits: np.ndarray) -> Dict[str, float]:
    from sklearn.metrics import accuracy_score, f1_score

    preds = np.asarray(logits).argmax(-1)
    labels = np.asarray(labels)
    return {
        "emo_accuracy": float(accuracy_score(labels, preds)),
        "emo_waf1": float(f1_score(labels, preds, average="weighted")),
    }


def valence_metrics(labels: np.ndarray, preds: np.ndarray) -> Dict[str, float]:
    labels = np.asarray(labels).reshape(-1)
    preds = np.asarray(preds).reshape(-1)
    mse = float(np.mean((labels - preds) ** 2))
    if labels.std() > 0 and preds.std() > 0:
        pcc = float(np.corrcoef(labels, preds)[0, 1])
    else:
        pcc = 0.0
    return {"val_mse": mse, "val_pcc": pcc}


def combined_metric(emo_waf1: float, val_mse: float) -> float:
    """The reference's checkpoint-selection combination (higher is better):
    f1 - mse/4 (toolkit overall_metric convention)."""
    return emo_waf1 - val_mse / 4.0
