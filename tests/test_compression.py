"""DEFLATE compressibility signal (operators/text.py:compression_signal)
— python-model exactness (the verification class for non-SQL-expressible
kernels), NULL/empty policy, layout invariance, zero-shuffle plan pin,
and the registered rows-only panel's from-scratch recompute."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.text import compression_signal


def test_compression_signal_matches_python_model(spark, sf_dir):
    """Every (utf8_bytes, deflate_bytes, ratio) triple recomputed from
    scratch driver-side — bit-exact, including the raw float division."""
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    got = {
        r.doc_id: (r.utf8_bytes, r.deflate_bytes, r.compress_ratio)
        for r in compression_signal(d, "doc_id", "text").collect()
    }
    texts = {r.doc_id: r.text for r in d.collect()}
    assert set(got) == set(texts)
    for doc_id, t in texts.items():
        raw = t.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        want = (len(raw), comp, comp / len(raw) if raw else None)
        assert got[doc_id] == want


def test_compression_signal_null_and_empty_policy(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in compression_signal(df, "doc_id", "text").collect()}
    # NULL text: all three outputs NULL, row survives
    assert (rows[1].utf8_bytes, rows[1].deflate_bytes, rows[1].compress_ratio) == (None, None, None)
    # empty text: real byte counts, NULL ratio (0/0 is absence, not inf)
    assert rows[2].utf8_bytes == 0 and rows[2].deflate_bytes > 0
    assert rows[2].compress_ratio is None
    # repetitive text compresses well
    assert rows[3].compress_ratio < 0.5


def test_compression_signal_layout_invariance_and_guard(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i % 3} tok{i % 3} filler words here {i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    a = sorted(map(tuple, compression_signal(df, "doc_id", "text").collect()))
    b = sorted(map(tuple, compression_signal(df.repartition(7), "doc_id", "text").collect()))
    assert a == b
    with pytest.raises(ValueError, match="level"):
        compression_signal(df, "doc_id", "text", level=11)
    # reserved-name clash: carry (or id) colliding with an output column
    # would build a duplicate-field schema — loud, not silent
    df2 = df.withColumn("utf8_bytes", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        compression_signal(df2, "doc_id", "text", carry=("utf8_bytes",))
    df3 = df.withColumnRenamed("doc_id", "compress_ratio")
    with pytest.raises(ValueError, match="collide"):
        compression_signal(df3, "compress_ratio", "text")


def test_compression_panel_empty_text_in_neither_tail(spark, tmp_path):
    """ADVICE r11: empty docs (utf8_bytes=0, deflate_bytes≈8) must not be
    counted incompressible — empty text is absence, per the kernel's
    NULL-ratio policy."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    p = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "", "en", "s1"), (2, "", "en", "s1"), (3, "a b c d e f g h", "en", "s1")],
        "doc_id bigint, text string, lang string, source string",
    ).write.parquet(f"{p}/documents.parquet")
    rows = {r.lang: r for r in QUERIES["compression_quality_panel"].spark(spark, p).collect()}
    r = rows["en"]
    assert r.n_docs == 3
    # the two empty docs land in NEITHER tail bucket
    assert r.n_too_compressible + r.n_incompressible <= 1
    # corpus_ratio still defined (non-empty doc contributes bytes)
    assert r.corpus_ratio is not None


def test_compression_signal_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = (
        compression_signal(df, "doc_id", "text", carry=("doc_id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_compression_quality_panel_model_recompute(spark, sf_dir):
    """The rows-only panel re-derived from scratch: exact integer sums,
    integer-cross-product tail buckets, one division."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    got = {
        r.lang: r for r in QUERIES["compression_quality_panel"].spark(spark, sf_dir).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("lang", "text")
        .collect()
    )
    model: dict = {}
    for r in docs:
        raw = r.text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        m = model.setdefault(r.lang, [0, 0, 0, 0, 0])
        m[0] += 1
        m[1] += len(raw)
        m[2] += comp
        m[3] += 1 if len(raw) > 0 and comp * 100 < len(raw) * 45 else 0
        m[4] += 1 if len(raw) > 0 and comp * 100 > len(raw) * 85 else 0
    assert set(got) == set(model)
    for lang, (n, ub, db, lo, hi) in model.items():
        r = got[lang]
        assert (r.n_docs, r.utf8_bytes, r.deflate_bytes) == (n, ub, db)
        assert (r.n_too_compressible, r.n_incompressible) == (lo, hi)
        assert r.corpus_ratio == db / ub
    # both tail buckets are LIVE on the corpus (thresholds chosen from the
    # measured sf0.01 distribution, not decorative)
    assert sum(r.n_too_compressible for r in got.values()) > 0
    assert sum(r.n_incompressible for r in got.values()) > 0


def test_compression_panel_registry_rows_only_by_design():
    from yelp_business_data_pipeline_spark.plans import QUERIES

    assert QUERIES["compression_quality_panel"].oracle is None
