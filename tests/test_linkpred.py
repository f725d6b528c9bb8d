"""Link-prediction features (graph.link_prediction_features): python-model
equality, Adamic-Adar/jaccard math, exclusion semantics, the hub guard,
and the triangle identity."""

from __future__ import annotations

import itertools
import math

import pytest

from yelp_business_data_pipeline_spark.operators.graph import (
    link_prediction_features,
    triangle_count,
)


def _model(edges, min_common=1, exclude_existing=True):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((max(s, d), min(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        cn = adj[u] & adj[v]
        if len(cn) < min_common:
            continue
        if exclude_existing and (max(u, v), min(u, v)) in und:
            continue
        aa = sum(1.0 / math.log(len(adj[w])) for w in cn)
        jac = len(cn) / len(adj[u] | adj[v])
        out[(u, v)] = (len(cn), round(aa, 6), round(jac, 6))
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.u, r.v): (r.common_neighbors, r.adamic_adar, r.jaccard)
        for r in link_prediction_features(df, **kw).collect()
    }


def test_small_graph_matches_model(spark):
    # square 1-2-3-4-1 plus a chord hub 5 connected to 1,2,3
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1), (5, 2), (5, 3)]
    got = _run(spark, edges)
    assert got == _model(edges)
    # 1 and 3 share neighbors {2, 4, 5} and are not connected
    assert got[(1, 3)][0] == 3


def test_include_existing_edges(spark):
    edges = [(1, 2), (2, 3), (1, 3)]  # triangle: every pair shares one
    got = _run(spark, edges, exclude_existing=False)
    assert got == _model(edges, exclude_existing=False)
    assert all(v[0] == 1 for v in got.values()) and len(got) == 3
    assert _run(spark, edges) == {}  # all pairs are existing edges


def test_random_graph_matches_model(spark):
    import random

    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(80)]
    for excl in (True, False):
        assert _run(spark, edges, exclude_existing=excl) == _model(
            edges, exclude_existing=excl
        )


def test_min_common_prunes(spark):
    edges = [(1, 2), (2, 3), (1, 4), (4, 3), (1, 5), (5, 9)]
    got = _run(spark, edges, min_common=2)
    assert got == _model(edges, min_common=2)
    assert (1, 3) in got and got[(1, 3)][0] == 2


def test_hub_guard_raises(spark):
    edges = [(0, i) for i in range(1, 40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(Exception, match="max_center_degree"):
        link_prediction_features(df, max_center_degree=8).collect()
    assert (
        link_prediction_features(df, max_center_degree=64).count() > 0
    )


def test_triangle_identity(spark):
    # sum of common_neighbors over EXISTING edges == 3 * triangle count
    import random

    rng = random.Random(5)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    feats = _run(spark, edges, exclude_existing=False)
    model_edges = {(max(s, d), min(s, d)) for s, d in edges if s != d}
    cn_on_edges = sum(
        v[0] for (u, w), v in feats.items() if (max(u, w), min(u, w)) in model_edges
    )
    n_tri = triangle_count(df).collect()[0].n_triangles
    assert cn_on_edges == 3 * n_tri
