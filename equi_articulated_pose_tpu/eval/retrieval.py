"""Retrieval metrics (ref ``SPConvNets/datasets/evaluation/retrieval.py``):
feature-space nearest-neighbour precision (ModelNet-style retrieval mAP)."""
from __future__ import annotations

import numpy as np


def retrieval_precision(feats: np.ndarray, labels: np.ndarray, n: int = 1) -> float:
    """Mean precision@n of nearest-neighbour retrieval in feature space
    (self excluded).  feats [K, D], labels [K] -> percentage."""
    feats = np.asarray(feats, dtype=np.float64)
    labels = np.asarray(labels)
    d2 = ((feats[:, None] - feats[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ids = np.argsort(d2, axis=1)[:, :n]
    match = labels[:, None] == labels[ids]
    return 100.0 * float(match.mean())
