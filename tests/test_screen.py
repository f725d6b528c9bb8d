"""Composed pretraining screen (operators/screen.py): panel vs a
from-scratch recombination of the standalone legs, per-doc conjunction
semantics, layout invariance, and the carry/by contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.ppl import (
    fit_bigram_lm,
    perplexity_threshold_buckets,
    score_perplexity,
)
from yelp_business_data_pipeline_spark.operators.qualityclf import (
    score_quality,
    train_quality_classifier,
)
from yelp_business_data_pipeline_spark.operators.screen import pretrain_screen


def _model_and_lm(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = train_quality_classifier(
        d, F.col("lang") == "en", buckets=4096, n_train=512
    )
    return d, model, fit_bigram_lm(d)


def test_panel_equals_leg_recombination(spark, sf_dir):
    """The composition pin (the quality_gate_panel precedent): the
    registered panel's per-lang counts must equal a recombination built
    here from the STANDALONE legs — any drift in the screen's wiring
    (join grain, threshold direction, bucket-to-keep mapping) breaks
    this, independent of each leg's own pins."""
    from yelp_business_data_pipeline_spark.operators.text import (
        c4_doc_flags,
        gopher_quality_flags,
        gopher_repetition_flags,
        gopher_repetition_metrics,
    )
    from yelp_business_data_pipeline_spark.plans import QUERIES

    d, model, lm = _model_and_lm(spark, sf_dir)
    rules = (
        gopher_repetition_metrics(d, carry=("text",))
        .withColumn("rep_ok", gopher_repetition_flags())
        .withColumn(
            "qual_ok",
            gopher_quality_flags(F.col("text"), min_words=20, min_stopword_hits=1)[
                "passes_gopher_quality"
            ],
        )
        .withColumn("c4_ok", c4_doc_flags(F.col("text"), min_kept_lines=1)["passes_c4"])
        .select(
            "doc_id",
            (F.col("rep_ok") & F.col("qual_ok") & F.col("c4_ok")).alias("rules_ok"),
        )
    )
    clf = score_quality(d, model).select(
        "doc_id", (F.col("quality_score") >= 0.5).alias("clf_ok")
    )
    buck = perplexity_threshold_buckets(
        score_perplexity(d, lm, carry=("lang",)), by="lang"
    ).select("doc_id", "lang", (F.col("bucket_name") != "tail").alias("ppl_ok"))
    recomb = (
        buck.join(rules, "doc_id")
        .join(clf, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("rules_ok").cast("long")).alias("n_pass_rules"),
            F.sum(F.col("clf_ok").cast("long")).alias("n_pass_clf"),
            F.sum(F.col("ppl_ok").cast("long")).alias("n_pass_ppl"),
            F.sum(
                (F.col("rules_ok") & F.col("clf_ok") & F.col("ppl_ok")).cast("long")
            ).alias("n_keep"),
        )
    )
    got = sorted(
        tuple(r)
        for r in QUERIES["pretrain_screen_panel"].spark(spark, sf_dir).collect()
    )
    want = sorted(tuple(r) for r in recomb.collect())
    assert got == want and len(got) >= 2
    # non-vacuous: at least one leg passes docs on this corpus
    assert any(r[3] > 0 for r in got)  # n_pass_clf or later columns


def test_keep_is_the_per_doc_conjunction_and_grain_holds(spark, sf_dir):
    d, model, lm = _model_and_lm(spark, sf_dir)
    v = pretrain_screen(d, model, lm, carry=("lang",), min_words=20,
                        min_stopword_hits=1, min_kept_lines=1)
    rows = v.collect()
    assert len(rows) == d.count()  # one verdict per doc, no multiplication
    for r in rows:
        assert r.keep == (r.rules_ok and r.clf_ok and r.ppl_ok), r
        assert r.ppl_ok == (r.ppl_bucket != "tail"), r
        assert r.rules_ok == (r.rep_ok and r.qual_ok and r.c4_ok), r


def test_layout_invariance(spark, sf_dir):
    d, model, lm = _model_and_lm(spark, sf_dir)
    v1 = pretrain_screen(d, model, lm, carry=("lang",), min_words=20,
                         min_stopword_hits=1, min_kept_lines=1)
    d7 = d.repartition(7)
    v2 = pretrain_screen(d7, model, lm, carry=("lang",), min_words=20,
                         min_stopword_hits=1, min_kept_lines=1)
    k1 = sorted((r.doc_id, r.keep, r.ppl_bucket) for r in v1.collect())
    k2 = sorted((r.doc_id, r.keep, r.ppl_bucket) for r in v2.collect())
    assert k1 == k2


def test_by_must_be_carried(spark, sf_dir):
    d, model, lm = _model_and_lm(spark, sf_dir)
    with pytest.raises(ValueError, match="must be carried"):
        pretrain_screen(d, model, lm, carry=())
