"""Multi-source BFS (operators/bfs.py): python-model equality on random
graphs, chain/star/disconnected shapes, directedness, the loud depth
cap, and plan hygiene."""

from __future__ import annotations

from collections import deque

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.bfs import bfs_distances


def _model(edges, seeds):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return {r.id: r.dist for r in bfs_distances(e, s, **kw).collect()}


def test_chain_distances(spark):
    edges = [(i, i + 1) for i in range(10)]
    got = _run(spark, edges, [0])
    assert got == {i: i for i in range(11)}


def test_multi_source_takes_minimum(spark):
    edges = [(i, i + 1) for i in range(10)]
    got = _run(spark, edges, [0, 8])
    assert got == _model(edges, [0, 8])
    assert got[9] == 1 and got[10] == 2 and got[4] == 4


def test_directed_semantics_and_unreachable_absent(spark):
    edges = [(1, 2), (2, 3), (5, 4)]  # 4, 5 unreachable from 1
    got = _run(spark, edges, [1])
    assert got == {1: 0, 2: 1, 3: 2}


def test_undirected_via_symmetrized_edges(spark):
    fwd = [(1, 2), (2, 3)]
    sym = fwd + [(d, s) for s, d in fwd]
    assert _run(spark, sym, [3]) == {3: 0, 2: 1, 1: 2}


def test_random_graphs_match_python_model(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(90)
        ]
        seeds = rng.sample(range(n), 3)
        assert _run(spark, edges, seeds) == _model(edges, seeds)


def test_cycle_terminates(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    assert _run(spark, edges, [0]) == {0: 0, 1: 1, 2: 2}


def test_max_depth_raises_loudly(spark):
    edges = [(i, i + 1) for i in range(8)]
    with pytest.raises(RuntimeError, match="max_depth"):
        _run(spark, edges, [0], max_depth=3)


def test_null_edges_ignored_and_dupe_seeds(spark):
    edges = [(1, 2), (None, 3), (2, None)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(1,), (1,)], "id long")
    got = {r.id: r.dist for r in bfs_distances(e, s).collect()}
    assert got == {1: 0, 2: 1}


def test_plan_no_cartesian(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "id long")
    df = bfs_distances(e, s, checkpoint=False, max_depth=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_undirected_flag_matches_general_path_on_random_graphs(spark):
    # undirected=True dedups against the last two frontiers only — the
    # result must be IDENTICAL to the general visited-set path and the
    # python model on any symmetrized graph (multi-seed included)
    import random

    rng = random.Random(13)
    for _ in range(3):
        n = 30
        fwd = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
        sym = fwd + [(d, s) for s, d in fwd]
        seeds = rng.sample(range(n), 2)
        fast = _run(spark, sym, seeds, undirected=True)
        assert fast == _run(spark, sym, seeds)
        assert fast == _model(sym, seeds)


def test_partition_edges_regime_matches_default(spark):
    # partition_edges=True (Pregel layout for beyond-broadcast frontiers)
    # is physical only — distances must be identical to the default
    # broadcast-frontier regime and the python model, incl. combined with
    # the undirected two-frontier dedup
    import random

    rng = random.Random(21)
    fwd = [(rng.randrange(25), rng.randrange(25)) for _ in range(50)]
    seeds = [fwd[0][0]]
    assert _run(spark, fwd, seeds, partition_edges=True) == _model(fwd, seeds)
    sym = fwd + [(d, s) for s, d in fwd]
    assert _run(spark, sym, seeds, partition_edges=True, undirected=True) == _model(
        sym, seeds
    )


def test_partition_edges_without_checkpoint_raises(spark):
    """The Pregel layout rides the retained-partitioning checkpoints;
    requesting it with checkpoint=False must fail loudly, not silently
    run the default regime (pagerank enforces the same contract)."""
    from yelp_business_data_pipeline_spark.operators.pagerank import pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="partition_edges=True requires"):
        bfs_distances(e, s, partition_edges=True, checkpoint=False)
    with pytest.raises(ValueError, match="partition_edges=True requires"):
        pagerank(e, partition_edges=True, checkpoint=False)


def test_undirected_flag_chain_and_adjacent_seeds(spark):
    fwd = [(i, i + 1) for i in range(8)]
    sym = fwd + [(d, s) for s, d in fwd]
    # adjacent seeds: candidates at depth 1 hit the other seed (dist 0) —
    # the two-frontier window must still suppress the re-discovery
    got = _run(spark, sym, [3, 4], undirected=True)
    assert got == _model(sym, [3, 4])


def test_exact_max_depth_on_undirected_graph_returns_not_raises(spark):
    # Regression: a symmetrized chain fully explored at exactly max_depth
    # has back-edges from the final frontier into the visited set — that
    # must NOT trip the depth-cap error (the cap is about unvisited
    # vertices, not any outgoing edge).
    fwd = [(0, 1), (1, 2), (2, 3)]
    sym = fwd + [(d, s) for s, d in fwd]
    got = _run(spark, sym, [0], max_depth=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
