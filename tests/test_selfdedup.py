"""Within-corpus duplicate-span detection (operators/selfdedup.py):
exact DuckDB twin on the real corpus, a planted-duplicate model with
known boundaries, interval-union vs a brute-force python model, scope
semantics, and the span-removal transform."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.selfdedup import (
    duplicate_span_stats,
    duplicate_spans,
    remove_duplicate_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# Exact DuckDB twin on the real corpus
# ---------------------------------------------------------------------------


def _duck(sf_dir, sql):
    from tests.oracle_harness import duck_con

    return duck_con(sf_dir).execute(sql).fetchall()


def test_stats_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        DUPLICATE_SPANS_STATS_ORACLE,
    )

    got = sorted(
        tuple(r)
        for r in QUERIES["duplicate_spans_panel"].spark(spark, sf_dir).collect()
    )
    want = sorted(tuple(r) for r in _duck(sf_dir, DUPLICATE_SPANS_STATS_ORACLE))
    assert len(got) > 0 and got == want
    # non-vacuous: the synthetic corpus has template near-dups
    assert any(r[2] > 0 for r in got), "no duplicated spans found at all"


def test_raw_spans_match_duckdb_twin_exactly(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans.extensions import (
        DUPLICATE_SPANS_ORACLE,
    )
    from yelp_business_data_pipeline_spark.plans.registry import tbl

    d = tbl(spark, sf_dir, "documents")
    got = sorted(tuple(r) for r in duplicate_spans(d).collect())
    want = sorted(tuple(r) for r in _duck(sf_dir, DUPLICATE_SPANS_ORACLE))
    assert len(got) > 0 and got == want


# ---------------------------------------------------------------------------
# Planted duplicates: exact boundaries
# ---------------------------------------------------------------------------


def test_planted_cross_doc_duplicate_has_exact_boundaries(spark):
    # 8-token run shared verbatim by docs 0 and 1 at different offsets;
    # k=5 -> gram starts cover [off, off+3], span = [off, off+8).
    run = "the quick brown fox jumps over lazy dogs"
    a = "alpha beta " + run + " gamma delta epsilon"
    b = run + " zeta eta theta iota kappa"
    c = "totally unrelated words in this clean document here now"
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens, r.n_grams)
        for r in duplicate_spans(_docs(spark, [a, b, c]), k=5).collect()
    }
    assert spans == {0: (2, 10, 8, 4), 1: (0, 8, 8, 4)}


def test_within_doc_repeat_counts_for_corpus_scope_only(spark):
    refrain = "row row row your boat gently down the stream"
    doc = refrain + " filler one two three " + refrain
    clean = "nothing here repeats at all in any way whatsoever"
    df = _docs(spark, [doc, clean])
    corpus = duplicate_spans(df, k=5, scope="corpus").collect()
    cross = duplicate_spans(df, k=5, scope="cross_doc").collect()
    assert {r.doc_id for r in corpus} == {0} and len(corpus) == 2
    assert cross == []


def test_scope_validation():
    with pytest.raises(ValueError, match="scope"):
        duplicate_spans(None, scope="bogus")


# ---------------------------------------------------------------------------
# Interval union vs brute-force python model
# ---------------------------------------------------------------------------


def _py_spans(texts, k=5, min_count=2):
    from collections import Counter

    grams = []  # (doc, pos, gram)
    for d, t in enumerate(texts):
        toks = t.split(" ")
        for p in range(len(toks) - k + 1):
            grams.append((d, p, " ".join(toks[p : p + k])))
    occ = Counter(g for _, _, g in grams)
    out = {}
    for d, p, g in grams:
        if occ[g] >= min_count:
            out.setdefault(d, set()).update(range(p, p + k))
    spans = []
    for d, covered in out.items():
        for pos in sorted(covered):
            if spans and spans[-1][0] == d and pos == spans[-1][2]:
                spans[-1][2] = pos + 1
            elif not spans or spans[-1][0] != d or pos >= spans[-1][2]:
                spans.append([d, pos, pos + 1])
    return sorted((d, s, e) for d, s, e in spans)


def test_interval_union_matches_python_model_on_overlapping_runs(spark):
    # Two overlapping duplicated runs inside one doc must merge into ONE
    # span; a gap of >= 1 uncovered token must split.
    shared1 = "one two three four five six"  # 6 tokens
    shared2 = "five six seven eight nine ten"  # overlaps shared1's tail
    far = "aa bb cc dd ee"
    texts = [
        shared1 + " " + "x y z " + far,  # doc 0: run + gap + far
        "p q " + shared1,  # doc 1
        shared2 + " r s t u v",  # doc 2
        shared2 + " w " + far,  # doc 3
    ]
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(_docs(spark, texts), k=5).collect()
    )
    assert got == _py_spans(texts, k=5)


# ---------------------------------------------------------------------------
# Stats + removal
# ---------------------------------------------------------------------------


def test_stats_zero_fill_and_token_accounting(spark):
    run = "the quick brown fox jumps over lazy dogs"
    texts = ["pre " + run, run + " post", "clean words only here now ok"]
    stats = {
        r.doc_id: (r.n_tokens, r.n_spans, r.dup_tokens)
        for r in duplicate_span_stats(_docs(spark, texts), k=5).collect()
    }
    assert stats == {0: (9, 1, 8), 1: (9, 1, 8), 2: (6, 0, 0)}


def test_remove_duplicate_spans_cuts_exactly_the_spans(spark):
    run = "the quick brown fox jumps over lazy dogs"
    texts = ["pre " + run + " tail", run + " post", "clean words only here now ok"]
    out = {
        r.doc_id: r.text
        for r in remove_duplicate_spans(_docs(spark, texts), k=5).collect()
    }
    assert out == {0: "pre tail", 1: "post", 2: texts[2]}


def test_remove_preserves_schema_and_row_count(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans.registry import tbl

    d = tbl(spark, sf_dir, "documents")
    cleaned = remove_duplicate_spans(d)
    assert cleaned.columns == d.columns
    assert cleaned.count() == d.count()
    # the duplicated mass actually shrank
    before = d.agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    after = cleaned.agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert after < before
