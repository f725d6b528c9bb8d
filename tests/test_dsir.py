"""DSIR importance resampling (operators/dsir.py): exact DuckDB twin for
the hashed-feature layer, a from-scratch python model for weights and
Gumbel top-k, selection-pressure sanity, and layout invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.dsir import (
    dsir_select,
    fit_bucket_distribution,
    hashed_ngram_buckets,
    importance_weights,
)

B = 64  # small bucket count so tests exercise collisions too


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# python model (independent construction)
# ---------------------------------------------------------------------------


def _py_hash(s: str, salt: str) -> int:
    import hashlib

    return int(hashlib.md5((salt + s).encode()).hexdigest()[:8], 16)


def _py_buckets(text: str, buckets: int) -> dict[int, int]:
    toks = [t for t in text.split(" ") if t]  # empties dropped, like the engine
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out: dict[int, int] = {}
    for g in grams:
        b = _py_hash(g, "dsir:") % buckets
        out[b] = out.get(b, 0) + 1
    return out


def _py_weights(corpus, target, buckets, smoothing=1.0):
    t_cnt: dict[int, int] = {}
    for _, t in target:
        for b, c in _py_buckets(t, buckets).items():
            t_cnt[b] = t_cnt.get(b, 0) + c
    r_cnt: dict[int, int] = {}
    for _, t in corpus:
        for b, c in _py_buckets(t, buckets).items():
            r_cnt[b] = r_cnt.get(b, 0) + c
    tt, rt = sum(t_cnt.values()), sum(r_cnt.values())
    a = smoothing

    def lr(b):
        return math.log((t_cnt.get(b, 0) + a) / (tt + a * buckets)) - math.log(
            (r_cnt.get(b, 0) + a) / (rt + a * buckets)
        )

    return {
        d: sum(c * lr(b) for b, c in _py_buckets(t, buckets).items())
        for d, t in corpus
    }


def _py_gumbel_key(doc_id: int, lw: float) -> float:
    u = (_py_hash(str(doc_id), "dsir-g:") + 0.5) / float(1 << 32)
    return lw - math.log(-math.log(u))


# ---------------------------------------------------------------------------
# hashed-feature layer: exact DuckDB twin on the real corpus
# ---------------------------------------------------------------------------


def test_bucket_counts_match_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con

    from yelp_business_data_pipeline_spark.plans.registry import tbl

    d = tbl(spark, sf_dir, "documents")
    got = sorted(tuple(r) for r in hashed_ngram_buckets(d, buckets=B).collect())
    sql = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(
        t || CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ELSE []::VARCHAR[] END) AS g
      FROM toks
    )
    SELECT doc_id,
           (('0x' || substr(md5('dsir:' || g), 1, 8))::BIGINT % {B}) AS bucket,
           count(*)::BIGINT AS cnt
    FROM grams GROUP BY 1, 2
    """
    want = sorted(tuple(r) for r in duck_con(sf_dir).execute(sql).fetchall())
    assert len(got) > 0 and got == want


def test_global_distribution_is_bucket_rollup(spark):
    texts = ["a b c a", "b c d", "e"]
    df = _docs(spark, texts)
    per_doc = hashed_ngram_buckets(df, buckets=B)
    fitted = {
        (r.bucket): r.cnt for r in fit_bucket_distribution(df, buckets=B).collect()
    }
    rolled = {
        r.bucket: r.cnt
        for r in per_doc.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert fitted == rolled
    # model equality
    want: dict[int, int] = {}
    for t in texts:
        for b, c in _py_buckets(t, B).items():
            want[b] = want.get(b, 0) + c
    assert fitted == want


# ---------------------------------------------------------------------------
# weights + selection vs the python model
# ---------------------------------------------------------------------------


def _corpora(spark):
    sci = [
        "the experiment measured quantum decoherence rates",
        "we observe gravitational lensing in the survey data",
        "the reaction yields increase with catalyst loading",
    ]
    chat = [
        "lol that movie was so bad honestly",
        "omg did you see the game last night",
        "haha yeah i totally forgot about that",
    ]
    corpus_rows = [(i, t) for i, t in enumerate(sci + chat)]
    target_rows = [
        (100, "quantum decoherence in the gravitational survey experiment"),
        (101, "catalyst loading and reaction rates in the data"),
    ]
    return corpus_rows, target_rows


def test_weights_match_python_model(spark):
    corpus_rows, target_rows = _corpora(spark)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    got = {
        r.doc_id: r.log_weight
        for r in importance_weights(
            corpus,
            fit_bucket_distribution(target, buckets=B),
            fit_bucket_distribution(corpus, buckets=B),
            buckets=B,
        ).collect()
    }
    want = _py_weights(corpus_rows, target_rows, B)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_selection_prefers_target_like_docs_and_matches_model(spark):
    corpus_rows, target_rows = _corpora(spark)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    picked = dsir_select(corpus, target, k=3, buckets=B)
    got_ids = {r.doc_id for r in picked.collect()}
    # python model: same weights, same deterministic gumbel keys
    w = _py_weights(corpus_rows, target_rows, B)
    keys = sorted(
        ((_py_gumbel_key(d, lw), -d) for d, lw in w.items()), reverse=True
    )
    want_ids = {-nd for _, nd in keys[:3]}
    assert got_ids == want_ids
    # pressure: science docs (0-2) dominate the selection over chat (3-5)
    assert len(got_ids & {0, 1, 2}) > len(got_ids & {3, 4, 5})


def test_selection_is_layout_invariant(spark):
    corpus_rows, target_rows = _corpora(spark)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    a = {r.doc_id for r in dsir_select(corpus, target, k=3, buckets=B).collect()}
    b = {
        r.doc_id
        for r in dsir_select(
            corpus.repartition(7, "text"), target.coalesce(1), k=3, buckets=B
        ).collect()
    }
    assert a == b


def test_empty_text_gets_zero_weight_and_smoothing_guard(spark):
    corpus = _docs(spark, ["", "a b"])
    target = _docs(spark, ["a b"], start=10)
    w = {
        r.doc_id: r.log_weight
        for r in importance_weights(
            corpus,
            fit_bucket_distribution(target, buckets=B),
            fit_bucket_distribution(corpus, buckets=B),
            buckets=B,
        ).collect()
    }
    # empty string now yields NO grams -> the documented 0.0 weight
    assert set(w) == {0, 1}
    assert w[0] == 0.0
    with pytest.raises(ValueError, match="smoothing"):
        from yelp_business_data_pipeline_spark.operators.dsir import bucket_log_ratios

        bucket_log_ratios(target, corpus, buckets=B, smoothing=0.0)


def test_flagged_single_pass_selects_same_set_as_two_frame_path(spark):
    corpus_rows, _ = _corpora(spark)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    flag = F.col("doc_id") < 3  # the science docs ARE the target domain
    target = corpus.filter(flag)
    two_frame = {
        r.doc_id for r in dsir_select(corpus, target, k=3, buckets=B).collect()
    }
    from yelp_business_data_pipeline_spark.operators.dsir import dsir_select_flagged

    flagged = {
        r.doc_id
        for r in dsir_select_flagged(corpus, flag, k=3, buckets=B).collect()
    }
    assert flagged == two_frame


def test_flagged_weights_match_python_model(spark):
    corpus_rows, _ = _corpora(spark)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    from yelp_business_data_pipeline_spark.operators.dsir import (
        importance_weights_flagged,
    )

    got = {
        r.doc_id: r.log_weight
        for r in importance_weights_flagged(
            corpus, F.col("doc_id") < 3, buckets=B
        ).collect()
    }
    target_rows = [(d, t) for d, t in corpus_rows if d < 3]
    want = _py_weights(corpus_rows, target_rows, B)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_empty_target_means_uniform_not_null_weights(spark):
    # review finding: an empty target distribution used to produce NULL
    # totals -> NULL ratios -> every weight coalesced to 0.0 (silent
    # uniform-random selection). Now empty == the smoothed-uniform
    # target, matching what the flagged path computes for an all-false
    # flag — and weights must be real numbers, not all identical zeros
    # by accident of coalescing.
    corpus = _docs(spark, ["a a a a", "b c d e"])
    empty_target = _docs(spark, []).filter("doc_id < 0")
    from yelp_business_data_pipeline_spark.operators.dsir import (
        importance_weights_flagged,
    )

    two = {
        r.doc_id: r.log_weight
        for r in importance_weights(
            corpus,
            fit_bucket_distribution(empty_target, buckets=B),
            fit_bucket_distribution(corpus, buckets=B),
            buckets=B,
        ).collect()
    }
    flg = {
        r.doc_id: r.log_weight
        for r in importance_weights_flagged(
            corpus, F.lit(False), buckets=B
        ).collect()
    }
    assert set(two) == set(flg) == {0, 1}
    for d in two:
        assert two[d] == pytest.approx(flg[d], rel=1e-9)
    # uniform-target weights penalize concentrated docs vs diverse ones —
    # they are NOT all zero
    assert any(abs(v) > 1e-9 for v in two.values())


def test_carry_path_matches_joinback_and_scans_corpus_once(spark, sf_dir):
    """carry=() and carry=(cols) must pick the same docs with the same
    weights (carry only changes the physical plan), and the registered
    panel's executed plan must read the documents table EXACTLY once —
    the r8 redesign's whole point (sentinel rows + _tflag-as-grouping-key
    exchange reuse + carry columns instead of a corpus rejoin)."""
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.dsir import dsir_select_flagged
    from yelp_business_data_pipeline_spark.plans import QUERIES

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flag = F.col("lang") == "en"
    plain = {
        (r.doc_id, round(r.log_weight, 9))
        for r in dsir_select_flagged(d, flag, k=25, buckets=512).collect()
    }
    carried = dsir_select_flagged(
        d, flag, k=25, buckets=512, carry=("source", "lang")
    )
    assert set(carried.columns) == {"doc_id", "source", "lang", "log_weight"}
    got = {(r.doc_id, round(r.log_weight, 9)) for r in carried.collect()}
    assert got == plain

    panel = QUERIES["dsir_selection_panel"].spark(spark, sf_dir)
    panel.collect()
    final = (
        panel._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("documents.parquet") == 1, final
