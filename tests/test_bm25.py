"""BM25 retrieval scoring (operators/bm25.py): exact DuckDB twin on the
real corpus, a from-scratch python model, retrieval semantics (only
matching docs return), rank determinism, the TakeOrdered plan shape,
and layout invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.bm25 import bm25_scores, bm25_topk

TERMS = ["data", "hash", "merge", "window"]


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


FIXTURE = [
    "data data hash table scan",
    "merge window merge data",
    "nothing relevant here at all",
    "window",
    "hash hash hash hash hash hash",
]


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    toks = [[w for w in t.split(" ") if w] for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    dfreq = {t: sum(1 for ws in toks if t in ws) for t in terms}
    out = {}
    for i, ws in enumerate(toks):
        score, hits = 0.0, 0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            score += idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(ws) / avgdl)))
        if hits:
            out[i] = (hits, round(score, 6))
    return out


def test_scores_match_python_model(spark):
    d = _docs(spark, FIXTURE)
    got = {
        r.doc_id: (r.n_hit_terms, r.score)
        for r in bm25_scores(d, TERMS).collect()
    }
    want = _py_bm25(FIXTURE, TERMS)
    assert set(got) == set(want)  # doc 2 (no hits) absent: retrieval semantics
    for i, (hits, score) in want.items():
        assert got[i][0] == hits, i
        assert got[i][1] == pytest.approx(score, abs=2e-6), i


def test_repeated_terms_and_empty_query(spark):
    d = _docs(spark, FIXTURE)
    a = sorted(tuple(r) for r in bm25_scores(d, TERMS).collect())
    dup = sorted(tuple(r) for r in bm25_scores(d, TERMS + ["data", "data"]).collect())
    assert a == dup  # query is a SET of terms
    with pytest.raises(ValueError, match="empty query"):
        bm25_scores(d, [])


def test_topk_rank_is_deterministic_and_plan_is_takeordered(spark):
    d = _docs(spark, FIXTURE)
    out = bm25_topk(d, TERMS, k=3).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    scores = [r.score for r in sorted(out, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
    plan = bm25_topk(d, TERMS, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # the global cut never
    # single-partitions the full scored frame


def test_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con

    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import BM25_TOPK_ORACLE

    got = sorted(
        tuple(r) for r in QUERIES["bm25_topk_panel"].spark(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in duck_con(sf_dir).execute(BM25_TOPK_ORACLE).fetchall()
    )
    assert len(got) > 0 and got == want


def test_null_text_docs_count_consistently_in_both_corpus_stats(spark):
    # NULL text must contribute dl=0 to BOTH n_docs and avgdl (the two
    # corpus statistics must cover the same doc population) — i.e. the
    # scores must equal a corpus where the NULL doc is ''-text.
    with_null = spark.createDataFrame(
        [(0, "data data hash"), (1, None), (2, "merge window")],
        "doc_id long, text string",
    )
    with_empty = _docs(spark, ["data data hash", "", "merge window"])
    a = sorted(tuple(r) for r in bm25_scores(with_null, TERMS).collect())
    b = sorted(tuple(r) for r in bm25_scores(with_empty, TERMS).collect())
    assert a == b and len(a) == 2
    # and the python model over the ''-normalized corpus agrees exactly
    want = _py_bm25(["data data hash", "", "merge window"], TERMS)
    got = {r[0]: (r[1], r[2]) for r in a}
    for i, (hits, score) in want.items():
        assert got[i][0] == hits and got[i][1] == pytest.approx(score, abs=2e-6)


def test_layout_invariance(spark):
    d = _docs(spark, FIXTURE * 4)  # 20 docs
    s1 = sorted(tuple(r) for r in bm25_scores(d, TERMS).collect())
    s2 = sorted(tuple(r) for r in bm25_scores(d.repartition(7), TERMS).collect())
    assert s1 == s2


# ---------------------------------------------------------------------------
# persisted inverted index (build once / query many)
# ---------------------------------------------------------------------------


def _corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_index_path_equals_direct_path_exactly(spark, sf_dir):
    """The amortization contract: scoring from (postings, stats) must be
    row-identical to scoring from the corpus — df folds off the fetched
    postings, stats cover the same doc population (incl. NULL text)."""
    from yelp_business_data_pipeline_spark.operators.bm25 import (
        bm25_scores_from_index,
        bm25_topk_from_index,
        build_bm25_index,
    )

    d = _corpus(spark, sf_dir).unionByName(
        spark.createDataFrame([(10**9, None, "zz", "zz", 0)], _corpus(spark, sf_dir).schema)
    )
    postings, stats = build_bm25_index(d)
    direct = sorted(map(tuple, bm25_scores(d, TERMS).collect()))
    via = sorted(map(tuple, bm25_scores_from_index(postings, stats, TERMS).collect()))
    assert direct == via and len(direct) > 0
    dk = sorted(map(tuple, bm25_topk(d, TERMS, k=15).collect()))
    vk = sorted(map(tuple, bm25_topk_from_index(postings, stats, TERMS, k=15).collect()))
    assert dk == vk


def test_index_save_load_roundtrip_and_partition_pruning(spark, sf_dir, tmp_path):
    from yelp_business_data_pipeline_spark.operators.bm25 import (
        _term_bucket_py,
        bm25_topk,
        bm25_topk_from_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    d = _corpus(spark, sf_dir)
    postings, stats = build_bm25_index(d)
    path = str(tmp_path / "bm25idx")
    save_bm25_index(postings, stats, path, n_buckets=16)
    p2, s2, nb = load_bm25_index(spark, path)
    assert nb == 16
    # every stored _pt equals the python bucket twin — the pruning list
    # and the stored partitioning can never disagree
    for r in p2.select("term", "_pt").distinct().collect():
        assert r["_pt"] == _term_bucket_py(r["term"], 16)
    # queries over the loaded index equal the direct path
    direct = sorted(map(tuple, bm25_topk(d, TERMS, k=15).collect()))
    via = sorted(
        map(tuple, bm25_topk_from_index(p2, s2, TERMS, k=15, n_buckets=16).collect())
    )
    assert direct == via
    # and the bucket filter reaches the SCAN as a partition filter: the
    # inverted-index access path reads <= |terms| bucket directories
    plan = (
        bm25_topk_from_index(p2, s2, TERMS, k=15, n_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "_pt" in plan.split("PartitionFilters", 1)[1][:400]


def test_index_guards(spark, sf_dir):
    from yelp_business_data_pipeline_spark.operators.bm25 import (
        bm25_scores_from_index,
        build_bm25_index,
        save_bm25_index,
    )

    postings, stats = build_bm25_index(_corpus(spark, sf_dir))
    with pytest.raises(ValueError, match="empty query"):
        bm25_scores_from_index(postings, stats, [])
    # n_buckets given but the frame has no _pt: loud, never silent
    # mispruning
    with pytest.raises(ValueError, match="_pt"):
        bm25_scores_from_index(postings, stats, TERMS, n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets"):
        save_bm25_index(postings, stats, "/tmp/never-written", n_buckets=0)


def test_index_tracker_equals_gate_panel(spark, sf_dir):
    """bm25_index_topk (rows-only tracker) is DEFINED as equal to the
    driver-gated bm25_topk_panel — so BM25_TOPK_ORACLE covers both."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    a = sorted(map(tuple, QUERIES["bm25_topk_panel"].spark(spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["bm25_index_topk"].spark(spark, sf_dir).collect()))
    assert a == b and len(a) > 0
    assert list(QUERIES).index("bm25_index_topk") >= 50
    assert QUERIES["bm25_index_topk"].oracle is None
