"""Exact-substring decontamination (decontam.exact_substring_hits):
python-model equality, overlapping-occurrence semantics, a DuckDB
position-enumeration twin, and the driver-bound guards."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.decontam import (
    _build_aho,
    exact_substring_hits,
)


def _count_overlapping(text, pat):
    n, pos, start = 0, -1, 0
    first = None
    while True:
        pos = text.find(pat, start)
        if pos < 0:
            return n, (first + 1 if first is not None else None)
        if first is None:
            first = pos
        n += 1
        start = pos + 1


def _model(docs, bench, min_len):
    out = {}
    for did, text in docs:
        for bid, pat in bench:
            if len(pat) < max(min_len, 1):
                continue
            c, fp = _count_overlapping(text or "", pat)
            if c:
                out[(did, bid)] = (c, fp)
    return out


def _run(spark, docs, bench, **kw):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    b = spark.createDataFrame(bench, "doc_id long, text string")
    return {
        (r.doc_id, r.bench_id): (r.n_occurrences, r.first_pos)
        for r in exact_substring_hits(d, b, **kw).collect()
    }


def test_basic_hits_and_overlaps(spark):
    docs = [
        (1, "the evaluation answer is exactly forty two units"),
        (2, "aaaaaa"),  # overlapping matches of "aaa": 4
        (3, "clean document with nothing shared"),
        (4, None),
    ]
    bench = [
        (10, "answer is exactly forty two"),
        (11, "aaa"),
        (12, "absent string never found"),
    ]
    got = _run(spark, docs, bench, min_len=3)
    assert got == _model(docs, bench, 3)
    assert got[(2, 11)] == (4, 1)  # overlap counting, 1-based first_pos
    assert (1, 10) in got and (3, 10) not in got


def test_matches_model_on_random_soup(spark):
    rng = random.Random(9)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(40))) for i in range(30)
    ]
    bench = [
        (100 + j, " ".join(rng.choice(vocab) for _ in range(3))) for j in range(8)
    ]
    got = _run(spark, docs, bench, min_len=5)
    assert got == _model(docs, bench, 5)
    assert got  # the tiny vocab guarantees collisions


def test_nested_and_shared_patterns(spark):
    # one pattern a suffix of another, plus two bench ids sharing a text:
    # the automaton's suffix-output flattening and the id fan-out both fire
    docs = [(1, "xx abcde yy abcde zz cde")]
    bench = [(7, "abcde"), (8, "cde"), (9, "abcde")]
    got = _run(spark, docs, bench, min_len=3)
    assert got == _model(docs, bench, 3)
    assert got[(1, 7)] == got[(1, 9)] == (2, 4)
    assert got[(1, 8)] == (3, 6)


def test_duckdb_position_twin_on_documents(spark):
    """Hits over the real documents table vs an independent DuckDB
    position-enumeration construction (counts OVERLAPPING occurrences)."""
    duckdb = pytest.importorskip("duckdb")
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    # benchmark strings harvested from the corpus itself so hits exist:
    # the first 30 chars of three docs
    bench_rows = [
        (int(r.doc_id) + 1000, r.text[:30])
        for r in d.orderBy("doc_id").limit(3).collect()
    ]
    b = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.bench_id): (r.n_occurrences, r.first_pos)
        for r in exact_substring_hits(d, b, min_len=10).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = {}
    for bid, pat in bench_rows:
        lit = pat.replace("'", "''")
        for did, cnt, fp in con.execute(
            f"""
            SELECT doc_id,
                   len(list_filter(range(1, length(text) - length('{lit}') + 2),
                       i -> text[i : i + length('{lit}') - 1] = '{lit}')) AS c,
                   list_min(list_filter(range(1, length(text) - length('{lit}') + 2),
                       i -> text[i : i + length('{lit}') - 1] = '{lit}'))
            FROM documents
            """
        ).fetchall():
            if cnt:
                want[(did, bid)] = (cnt, fp)
    assert got == want
    assert len(got) >= 3  # each harvested prefix hits its own doc at least


def test_guards(spark):
    d = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, "pattern string long enough here")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_patterns"):
        exact_substring_hits(d, b, min_len=5, max_patterns=0)
    with pytest.raises(ValueError, match="max_pattern_bytes"):
        exact_substring_hits(d, b, min_len=5, max_pattern_bytes=4)
    # empty pattern can never register, even at min_len=0
    b2 = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert exact_substring_hits(d, b2, min_len=0).count() == 0


def test_automaton_construction_props():
    goto, fail, out = _build_aho(["he", "she", "his", "hers"])
    # classic AC example: state for "she" must also output "he"
    s = 0
    for ch in "she":
        s = goto[s][ch]
    assert sorted(out[s]) == [0, 1]  # "he" and "she"


def test_worker_automaton_cache_bounded_and_correct(spark):
    """The automaton travels as a pattern list and is built+cached on the
    worker (and here, in-process): the cache returns the same structure
    for the same fingerprint and never holds more than two entries."""
    from yelp_business_data_pipeline_spark.operators.decontam import (
        _AHO_CACHE,
        _worker_aho,
    )

    _AHO_CACHE.clear()
    a1 = _worker_aho("k1", ["abc", "bcd"])
    assert _worker_aho("k1", ["abc", "bcd"]) is a1  # cache hit
    _worker_aho("k2", ["xyz"])
    _worker_aho("k3", ["pqr"])
    assert len(_AHO_CACHE) <= 2 and "k3" in _AHO_CACHE
    # eviction is LRU, not insertion-order: a hit refreshes recency, so a
    # worker alternating A,B,A,C keeps the hot A automaton and evicts B
    _AHO_CACHE.clear()
    aa = _worker_aho("A", ["aaa"])
    _worker_aho("B", ["bbb"])
    assert _worker_aho("A", ["aaa"]) is aa  # hit moves A to MRU
    _worker_aho("C", ["ccc"])
    assert set(_AHO_CACHE) == {"A", "C"} and _AHO_CACHE["A"] is aa
    # end to end: repeated operator calls (same bench) reuse the key and
    # still produce model-equal hits
    docs = [(1, "abcd abc"), (2, "zzbcdzz")]
    bench = [(9, "abc"), (10, "bcd")]
    got = _run(spark, docs, bench, min_len=3)
    assert got == _model(docs, bench, 3)
    got2 = _run(spark, docs, bench, min_len=3)
    assert got2 == got
