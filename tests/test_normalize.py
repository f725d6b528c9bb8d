"""Unicode normalization: planted-fixture semantics (the testdata corpus is
ASCII, so coverage comes from constructed non-ASCII rows) plus composition
with the dedup fingerprints that motivate normalization."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.normalize import (
    clean_control_chars,
    fold_accents,
    normalize_unicode,
)

NFC_CAFE = "café"  # é composed
NFD_CAFE = "café"  # e + combining acute


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("out")).first().out


def test_nfc_unifies_composed_and_decomposed(spark):
    assert _one(spark, NFD_CAFE, normalize_unicode(F.col("text"), "NFC")) == NFC_CAFE
    assert _one(spark, NFC_CAFE, normalize_unicode(F.col("text"), "NFC")) == NFC_CAFE
    # NFD goes the other way
    assert _one(spark, NFC_CAFE, normalize_unicode(F.col("text"), "NFD")) == NFD_CAFE


def test_nfkc_folds_compatibility_variants(spark):
    # fullwidth latin + ligature + superscript
    assert _one(spark, "Ｈｉ", normalize_unicode(F.col("text"), "NFKC")) == "Hi"
    assert _one(spark, "ﬁle", normalize_unicode(F.col("text"), "NFKC")) == "file"
    assert _one(spark, "x²", normalize_unicode(F.col("text"), "NFKC")) == "x2"


def test_normalize_matches_python_unicodedata(spark):
    rows = [(s,) for s in [NFD_CAFE, "ﬁle", "Å", "１２", "plain"]]
    df = spark.createDataFrame(rows, "text string")
    for form in ("NFC", "NFKC", "NFKD"):
        got = df.select("text", normalize_unicode(F.col("text"), form).alias("n")).collect()
        for r in got:
            assert r.n == unicodedata.normalize(form, r.text)


def test_normalize_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("a",)], "text string")
    got = df.select(normalize_unicode(F.col("text"), "NFC").alias("n")).collect()
    assert sorted([r.n for r in got], key=lambda x: (x is None, x)) == ["a", None]


def test_clean_control_chars(spark):
    raw = "a\x00b​c﻿d  e\t\nf\x1f"
    assert _one(spark, raw, clean_control_chars(F.col("text"))) == "abcd e f"
    # preserving whitespace shape when collapse disabled (controls still go)
    assert _one(spark, "a\x00  b", clean_control_chars(F.col("text"), collapse_ws=False)) == "a  b"


def test_fold_accents(spark):
    assert _one(spark, "Núñez", fold_accents(F.col("text"))) == "Nunez"
    assert _one(spark, "búsqueda", fold_accents(F.col("text"))) == "busqueda"
    assert _one(spark, "plain", fold_accents(F.col("text"))) == "plain"


def test_normalization_unifies_dedup_fingerprints(spark):
    # the motivating property: NFC/NFD twins of one doc must collide after
    # normalization (and not before)
    from yelp_business_data_pipeline_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(1, f"{NFC_CAFE} menu"), (2, f"{NFD_CAFE} menu")], "doc_id long, text string"
    )
    raw_fps = df.select(fingerprint(F.col("text"), 2).alias("fp")).distinct().count()
    norm_fps = (
        df.withColumn("text", normalize_unicode(F.col("text"), "NFC"))
        .select(fingerprint(F.col("text"), 2).alias("fp"))
        .distinct()
        .count()
    )
    assert raw_fps == 2 and norm_fps == 1


def test_separator_controls_become_spaces_not_deleted(spark):
    # CR-only line endings and form feeds encode word boundaries: deleting
    # them merged the words ('foo\rbar' -> 'foobar'); they must map to
    # spaces before the collapse.
    assert _one(spark, "foo\rbar", clean_control_chars(F.col("text"))) == "foo bar"
    assert _one(spark, "page1\x0cpage2", clean_control_chars(F.col("text"))) == "page1 page2"
    assert _one(spark, "a\x0bb", clean_control_chars(F.col("text"))) == "a b"
    # non-separator controls still delete outright
    assert _one(spark, "a\x00b", clean_control_chars(F.col("text"))) == "ab"
