"""Graph-operator semantics: the distributed integer PageRank must agree
bit-for-bit with a pure-Python reference on the same aggregated graph
(the golden-vector discipline of test_assignment.py), and the PCA
projection must behave like an isometry on its leading components."""

from __future__ import annotations

import numpy as np

from kinesumer_spark.operators.graph import (
    _PR_ITERS,
    _PR_T,
    _trade_edges,
    graph_pagerank_trade,
)
from kinesumer_spark.operators.similarity import pca_fit, pca_project

from .conftest import SF_SMALL


def _reference_pagerank(edges, nodes):
    """Pure-Python integer PageRank, same formulation as the operator."""
    out = {}
    for s, d, w in edges:
        out[s] = out.get(s, 0) + w
    n = len(nodes)
    base = (3 * _PR_T) // (20 * n)
    r = {v: _PR_T // n for v in nodes}
    for _ in range(_PR_ITERS):
        inc = {v: 0 for v in nodes}
        for s, d, w in edges:
            inc[d] += (r[s] * w) // out[s]
        r = {v: base + (17 * inc[v]) // 20 for v in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    edges = [
        (row["src"], row["dst"], row["w"])
        for row in _trade_edges(spark, SF_SMALL).collect()
    ]
    got = {
        row["n_nationkey"]: row["rank_units"]
        for row in graph_pagerank_trade(spark, SF_SMALL).collect()
    }
    want = _reference_pagerank(edges, sorted(got))
    assert got == want


def test_pagerank_mass_is_bounded(spark):
    ranks = [
        row["rank_units"]
        for row in graph_pagerank_trade(spark, SF_SMALL).collect()
    ]
    n = len(ranks)
    base = (3 * _PR_T) // (20 * n)
    assert all(r >= base for r in ranks)
    # truncating division only loses mass; total can never exceed T
    assert sum(ranks) <= _PR_T


def test_pca_project_shapes_and_variance_order(spark):
    k = 8
    z = np.stack(
        pca_project(spark, SF_SMALL, k=k).toPandas()["z"].to_numpy()
    )
    assert z.shape[1] == k
    assert np.isfinite(z).all()
    var = z.var(axis=0)
    # eigh orders components by explained variance (descending)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(k - 1))
    _, _, cov, evals, _ = pca_fit(spark, SF_SMALL)
    assert abs(float(evals[:k].sum()) - float(var.sum())) < 1e-6 * max(
        float(var.sum()), 1.0
    )
