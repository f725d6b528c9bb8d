"""Corpus composition operators: deterministic sampling/mixing, token-budget
selection, sequence packing, and benchmark decontamination — unit semantics
on constructed frames plus determinism/scale-shape properties on the
testdata corpus."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.decontam import (
    decontaminate,
    ngram_contamination,
)
from yelp_business_data_pipeline_spark.operators.packing import (
    next_fit_reference,
    pack_concat_split,
    pack_next_fit,
)
from yelp_business_data_pipeline_spark.operators.sampling import (
    hash_sample,
    hash_unit,
    select_to_token_budget,
    stratified_sample,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# hash sampling
# ---------------------------------------------------------------------------


def test_hash_unit_matches_md5_definition(spark):
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    got = {r.k: r.u for r in df.select("k", hash_unit("k", "s:").alias("u")).collect()}
    for k, u in got.items():
        want = int(hashlib.md5(f"s:{k}".encode()).hexdigest()[:8], 16) / 2**32
        assert u == want, k
    assert all(0.0 <= u < 1.0 for u in got.values())


def test_hash_sample_deterministic_and_nested(spark, sf_dir):
    d = _docs(spark, sf_dir)
    s30 = set(r.doc_id for r in hash_sample(d, "doc_id", 0.3).select("doc_id").collect())
    s30b = set(r.doc_id for r in hash_sample(d, "doc_id", 0.3).select("doc_id").collect())
    s60 = set(r.doc_id for r in hash_sample(d, "doc_id", 0.6).select("doc_id").collect())
    assert s30 == s30b  # rerun-stable
    assert s30 <= s60  # threshold sampling nests: a 30% sample is inside the 60%
    n = d.count()
    assert 0.2 * n < len(s30) < 0.4 * n  # roughly calibrated


def test_stratified_rates_respected(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = stratified_sample(df, "doc_id", {"a": 0.8, "b": 0.1})
    by = {r.source: r.n for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert 0.7 * 1000 < by["a"] < 0.9 * 1000
    assert 0.05 * 1000 < by["b"] < 0.15 * 1000
    # unlisted stratum drops to zero
    df2 = df.withColumn("source", F.lit("zz"))
    assert stratified_sample(df2, "doc_id", {"a": 0.8}).count() == 0


def test_token_budget_selection_exact(spark):
    # one stratum, tokens 50,40,30,20,10 -> budget 100 keeps rows starting
    # under 100: 50 (start 0), 40 (start 50), 30 (start 90) but not 20 (120)
    rows = [(i, "s", t) for i, t in enumerate([10, 20, 30, 40, 50])]
    df = spark.createDataFrame(rows, "doc_id long, source string, tok long")
    got = select_to_token_budget(
        df, "tok", 100, order_by=[F.desc("tok"), F.col("doc_id")]
    )
    toks = sorted(r.tok for r in got.collect())
    assert toks == [30, 40, 50]
    # budget larger than total keeps everything
    assert select_to_token_budget(df, "tok", 10_000).count() == 5


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_next_fit_reference_semantics():
    assert next_fit_reference([3, 3, 3], 6) == [0, 0, 1]
    assert next_fit_reference([5, 5, 5], 4) == [0, 1, 2]  # oversized: own bins
    assert next_fit_reference([2, 5, 2], 6) == [0, 1, 2]
    assert next_fit_reference([2, 4, 2], 6) == [0, 0, 1]
    assert next_fit_reference([], 6) == []


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=40), max_size=60), st.integers(16, 64))
def test_next_fit_invariants(tokens, capacity):
    bins = next_fit_reference(tokens, capacity)
    assert len(bins) == len(tokens)
    # bin ids are dense and non-decreasing (order preserved)
    assert bins == sorted(bins)
    fills: dict[int, int] = {}
    for b, t in zip(bins, tokens):
        fills[b] = fills.get(b, 0) + t
    for b, fill in fills.items():
        items = [t for bb, t in zip(bins, tokens) if bb == b]
        assert fill <= capacity or len(items) == 1  # overflow only for a lone oversized item


def test_pack_next_fit_matches_reference(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("tok", F.size(F.split("text", " ")))
    got = pack_next_fit(d, "doc_id", "tok", 256).collect()
    by_src: dict[str, list] = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    plain = {
        (r.source, r.doc_id): r.tok
        for r in d.select("source", "doc_id", "tok").filter(F.col("tok") > 0).collect()
    }
    assert len(got) == len(plain)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.doc_id)
        want = next_fit_reference([r.tok for r in rows], 256)
        assert [r.bin_id for r in rows] == want, src


def test_pack_concat_split_offsets(spark):
    rows = [(i, "s", t) for i, t in enumerate([100, 100, 100, 400, 56])]
    df = spark.createDataFrame(rows, "doc_id long, source string, tok long")
    got = {
        r.doc_id: (r.start_offset, r.bin_start, r.bin_end, r.n_bins_spanned)
        for r in pack_concat_split(df, "tok", 256).collect()
    }
    assert got[0] == (0, 0, 0, 1)
    assert got[1] == (100, 0, 0, 1)  # ends exactly at 200
    assert got[2] == (200, 0, 1, 2)  # straddles the 256 cut
    assert got[3] == (300, 1, 2, 2)  # 400-token doc spans two bins
    assert got[4] == (700, 2, 2, 1)  # ends exactly at 756... (755 div 256 = 2)
    # zero-token rows are dropped
    df0 = df.withColumn("tok", F.when(F.col("doc_id") == 0, 0).otherwise(F.col("tok")))
    assert pack_concat_split(df0, "tok", 256).filter(F.col("doc_id") == 0).count() == 0


def test_pack_concat_split_bin_capacity_conservation(spark, sf_dir):
    # every bin except a stream's last must be exactly full under concat-split
    d = _docs(spark, sf_dir).withColumn("tok", F.size(F.split("text", " ")))
    placed = pack_concat_split(d, "tok", 256)
    per_stream = placed.groupBy("source").agg(
        F.sum("tok").alias("total"), F.max("bin_end").alias("last_bin")
    )
    for r in per_stream.collect():
        assert r.last_bin == (r.total - 1) // 256  # ceil(total/cap) bins, dense


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_detects_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(1000, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "clean document about completely unrelated shipping topics"),
            (2, "we note the secret benchmark answer is forty two exactly here"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r for r in ngram_contamination(train, bench, n=5).collect()}
    assert set(hits) == {2}
    assert hits[2].n_shared_shingles >= 4  # 8-token overlap -> 4+ distinct 5-grams
    assert hits[2].n_bench_docs == 1
    clean = sorted(r.doc_id for r in decontaminate(train, bench, n=5).collect())
    assert clean == [1, 3]


def test_contamination_no_false_positives_on_disjoint_vocab(spark):
    bench = spark.createDataFrame([(9, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "one two three four five six seven eight")], "doc_id long, text string"
    )
    assert ngram_contamination(train, bench, n=5).count() == 0


def test_contamination_plan_broadcasts_bench(spark, sf_dir):
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 19 == 0)
    train = d.filter(F.col("doc_id") % 19 != 0)
    plan = ngram_contamination(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the corpus side must not shuffle for the join


# ---------------------------------------------------------------------------
# repetition quality signal
# ---------------------------------------------------------------------------


def test_repetition_ratio_semantics(spark):
    from yelp_business_data_pipeline_spark.operators.text import repetition_ratio

    rows = [
        (1, "spam spam spam spam spam spam"),          # one distinct 3-gram
        (2, "the quick brown fox jumps over lazily"),  # all distinct
        (3, "a b"),                                    # shorter than n -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.rep for r in df.select(
        "doc_id", repetition_ratio(F.col("text"), 3).alias("rep")).collect()}
    assert got[3] == 0.0
    assert got[2] == 0.0            # no repeated 3-gram
    assert got[1] == round(1 - 1 / 4, 6)  # 4 shingles, 1 distinct
    # duckdb twin agreement on the corpus formula
    import duckdb
    con = duckdb.connect()
    want = con.execute("""
      WITH t AS (SELECT 'x y x y x y x y' AS text)
      SELECT round(1 - len(list_distinct(g))::DOUBLE / len(g), 6) FROM (
        SELECT list_transform(range(1, len(th) - 1),
               i -> (((th[i]) * 1000003 + th[i+1]) % 4294967296 * 1000003 + th[i+2]) % 4294967296) AS g
        FROM (SELECT list_transform(string_split(text, ' '),
                     tok -> ('0x' || substr(md5('mh:' || tok), 1, 8))::BIGINT) AS th FROM t)
      )
    """).fetchone()[0]
    got2 = spark.createDataFrame([("x y x y x y x y",)], "text string").select(
        repetition_ratio(F.col("text"), 3).alias("rep")).first().rep
    assert got2 == want
