"""Clustering metric tests (SURVEY.md §4.2)."""

import numpy as np

from gmvae_tpu.utils import metrics


def test_cluster_acc_perfect_under_relabeling():
    y = np.array([0, 0, 1, 1, 2, 2])
    yhat = np.array([2, 2, 0, 0, 1, 1])  # same partition, permuted ids
    assert metrics.cluster_acc(y, yhat) == 1.0
    assert metrics.nmi(y, yhat) == 1.0


def test_cluster_acc_partial():
    y = np.array([0, 0, 0, 1, 1, 1])
    yhat = np.array([0, 0, 1, 1, 1, 1])  # one mistake
    np.testing.assert_allclose(metrics.cluster_acc(y, yhat), 5 / 6)


def test_cluster_acc_more_clusters_than_classes():
    y = np.array([0, 0, 1, 1])
    yhat = np.array([0, 1, 2, 3])  # K=4 clusters over 2 classes
    # best matching maps two clusters onto the two classes: 2/4 correct
    np.testing.assert_allclose(metrics.cluster_acc(y, yhat), 0.5)


def test_nmi_independent_labels_near_zero():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 4, size=20_000)
    yhat = rng.integers(0, 4, size=20_000)
    assert metrics.nmi(y, yhat) < 0.01


def test_nmi_matches_sklearn_formula_small_case():
    y = np.array([0, 0, 1, 1, 1, 2])
    yhat = np.array([0, 1, 1, 1, 2, 2])
    got = metrics.nmi(y, yhat)
    # independent check via direct entropy computation
    cm = metrics.contingency(y, yhat).astype(float)
    pij = cm / cm.sum()
    pi, pj = pij.sum(1), pij.sum(0)
    mi = sum(pij[i, j] * np.log(pij[i, j] / (pi[i] * pj[j]))
             for i in range(3) for j in range(3) if pij[i, j] > 0)
    h = lambda p: -sum(x * np.log(x) for x in p if x > 0)
    np.testing.assert_allclose(got, 2 * mi / (h(pi) + h(pj)), rtol=1e-10)
