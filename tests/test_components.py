"""Connected components + entity resolution: algorithmic properties on
known graphs, then the end-to-end pipeline (blocking -> verify -> cluster
-> canonical) on the customer table against a Python union-find oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.components import (
    connected_components,
    resolve_entities,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r.id: r.comp for r in connected_components(df).collect()}


def test_known_graph_shapes(spark):
    # chain 1-2-3-4 and separate triangle 10-11-12, plus pair 20-21
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # star with high center id: min label must still win
    got = _cc(spark, [(100, 7), (100, 8), (100, 9)])
    assert got == {100: 7, 7: 7, 8: 7, 9: 7}


def test_long_path_converges(spark):
    # path of length 12: needs ~diameter rounds, well under max_iter
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0} and len(got) == 13


def _union_find_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_entity_resolution_end_to_end_on_customers(spark):
    """The full pipeline: deletion-neighborhood blocking -> levenshtein
    verify -> connected components -> canonical pick, vs a Python
    union-find over the same verified pairs."""
    from yelp_business_data_pipeline_spark.operators.dedup import (
        deletion_neighborhood_candidates,
    )

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey", "c_name"
    )
    cand = deletion_neighborhood_candidates(c, "c_custkey", "c_name")
    an = c.select(F.col("c_custkey").alias("doc_a"), F.col("c_name").alias("_na"))
    bn = c.select(F.col("c_custkey").alias("doc_b"), F.col("c_name").alias("_nb"))
    verified = (
        cand.join(an, "doc_a").join(bn, "doc_b")
        .filter(F.levenshtein("_na", "_nb") <= 1)
        .select("doc_a", "doc_b")
    )
    pair_list = [(r.doc_a, r.doc_b) for r in verified.collect()]
    assert pair_list, "expected verified pairs at sf0.001"

    resolved = resolve_entities(c, verified, "c_custkey")
    got = {r.c_custkey: r.entity_id for r in resolved.collect()}

    oracle = _union_find_oracle(pair_list)
    for k, v in got.items():
        assert v == oracle.get(k, k), (k, v, oracle.get(k, k))

    # exactly one canonical row per entity, and it is the min member
    canon = resolved.filter("is_canonical").groupBy("entity_id").count().collect()
    assert all(r["count"] == 1 for r in canon)
    assert all(
        r.entity_id == r.c_custkey for r in resolved.filter("is_canonical").collect()
    )
