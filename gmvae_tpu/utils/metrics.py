"""Clustering metrics: ACC via Hungarian matching, NMI.

These run on HOST numpy/scipy by design — they are the only deliberately
host-side compute in the framework (SURVEY.md §3.4): the device produces
``argmax_k q(k|x)`` assignments; matching a K-way clustering onto class labels
is a tiny combinatorial problem.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def contingency(labels_true: np.ndarray, labels_pred: np.ndarray) -> np.ndarray:
    """[n_true_classes, n_pred_clusters] count matrix."""
    labels_true = np.asarray(labels_true).astype(np.int64).ravel()
    labels_pred = np.asarray(labels_pred).astype(np.int64).ravel()
    n_true = int(labels_true.max()) + 1
    n_pred = int(labels_pred.max()) + 1
    cm = np.zeros((n_true, n_pred), dtype=np.int64)
    np.add.at(cm, (labels_true, labels_pred), 1)
    return cm


def cluster_acc(labels_true: np.ndarray, labels_pred: np.ndarray) -> float:
    """Unsupervised clustering accuracy: best one-to-one cluster->class map.

    Standard evaluation for GMVAE-style clustering (SURVEY.md §2.1): build the
    class-by-cluster contingency table and solve the assignment problem that
    maximizes matched counts (Hungarian algorithm / Kuhn-Munkres).
    """
    cm = contingency(labels_true, labels_pred)
    row, col = linear_sum_assignment(-cm)
    return float(cm[row, col].sum()) / float(cm.sum())


def nmi(labels_true: np.ndarray, labels_pred: np.ndarray) -> float:
    """Normalized mutual information with arithmetic-mean normalization.

    NMI = 2 * I(Y; C) / (H(Y) + H(C)), computed from the contingency table in
    plain numpy (no sklearn dependency).
    """
    cm = contingency(labels_true, labels_pred).astype(np.float64)
    n = cm.sum()
    pij = cm / n
    pi = pij.sum(axis=1, keepdims=True)
    pj = pij.sum(axis=0, keepdims=True)
    nz = pij > 0
    mi = float(np.sum(pij[nz] * (np.log(pij[nz]) - np.log((pi @ pj)[nz]))))
    h_true = -float(np.sum(pi[pi > 0] * np.log(pi[pi > 0])))
    h_pred = -float(np.sum(pj[pj > 0] * np.log(pj[pj > 0])))
    denom = h_true + h_pred
    if denom <= 0.0:
        return 1.0 if mi == 0.0 else 0.0
    return 2.0 * mi / denom
