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



# ---------------------------------------------------------------------------
# mojibake repair (normalize.fix_mojibake)
# ---------------------------------------------------------------------------


MOJI_ORIGINALS = [
    "caf\u00e9",
    "don\u2019t",
    "ASCII only stays",
    "na\u00efve r\u00e9sum\u00e9",
    "emoji: \U0001f600",
    "mixed \u00fc and \u201cquotes\u201d and \u2014 dash",
]


def _garble(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def test_mojibake_python_model_matrix():
    from yelp_business_data_pipeline_spark.operators.normalize import (
        _fix_mojibake_str,
    )

    for o in MOJI_ORIGINALS:
        assert _fix_mojibake_str(_garble(o)) == o, o
        # clean text is a fixed point
        assert _fix_mojibake_str(o) == o, o
    # double-encoded repairs in one call; the op is idempotent
    d = _garble(_garble("caf\u00e9 \u2014 ok"))
    assert _fix_mojibake_str(d) == "caf\u00e9 \u2014 ok"
    assert _fix_mojibake_str(_fix_mojibake_str(d)) == _fix_mojibake_str(d)
    # strict-roundtrip boundary: a telltale that is NOT valid re-encoded
    # UTF-8 survives byte-for-byte (never replacement chars)
    dangling = "\u00c3 literally dangling"
    assert _fix_mojibake_str(dangling) == dangling
    assert _fix_mojibake_str(None) is None


def test_mojibake_spark_column_matches_model(spark):
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.normalize import (
        _fix_mojibake_str,
        fix_mojibake,
    )

    rows = [(i, _garble(o)) for i, o in enumerate(MOJI_ORIGINALS)] + [
        (99, None),
        (100, "\u00c3 literally dangling"),
    ]
    df = spark.createDataFrame(rows, "i long, g string")
    got = {
        r["i"]: r["f"]
        for r in df.select("i", fix_mojibake(F.col("g")).alias("f")).collect()
    }
    for i, g in rows:
        assert got[i] == _fix_mojibake_str(g), (i, g)


def test_mojibake_corpus_roundtrip_and_idempotency(spark, sf_dir):
    """Garble the whole documents table in-plan (Spark's unvalidated
    decode/encode — synthesis only), repair, compare to the original
    bytes; a second repair pass changes nothing."""
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.normalize import fix_mojibake

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" na\u00efve caf\u00e9 \u2014")).alias("orig"),
    )
    g = d.withColumn(
        "garbled", F.decode(F.encode(F.col("orig"), "UTF-8"), "ISO-8859-1")
    )
    r = g.withColumn("fixed", fix_mojibake(F.col("garbled")))
    assert r.filter(F.col("fixed") != F.col("orig")).count() == 0
    r2 = r.withColumn("fixed2", fix_mojibake(F.col("fixed")))
    assert r2.filter(F.col("fixed2") != F.col("fixed")).count() == 0


def test_mojibake_panel_live_invariants_and_registry(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["mojibake_repair_panel"].spark(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_repaired_to_original"] == r["n_docs"]
    assert r["n_changed_by_garble"] >= r["n_injected"] > 0
    assert r["telltales_before"] > r["telltales_after"] == r["telltales_orig"]
    names = list(QUERIES)
    assert names.index("mojibake_repair_panel") >= 50
    assert QUERIES["mojibake_repair_panel"].oracle is None



def test_mojibake_nonlatin_scripts_and_pass_budget():
    """The telltale class covers EVERY UTF-8 lead byte (0xC2-0xF4 under
    cp1252/latin-1), so CJK/Cyrillic/Hebrew/Arabic mojibake repairs too;
    and the pass budget refuses partial fixes via a roundtrip
    FIXED-POINT test (the regex can't answer it — clean e-acute IS a
    telltale char)."""
    from yelp_business_data_pipeline_spark.operators.normalize import (
        _fix_mojibake_str,
    )

    for o in ["\u4e2d\u6587", "\u010cesko", "\u05e9\u05dc\u05d5\u05dd",
              "\u06a9\u062a\u0627\u0628", "\u041f\u0440\u0438\u0432\u0435\u0442"]:
        assert _fix_mojibake_str(_garble(o)) == o, o
        assert _fix_mojibake_str(o) == o, o  # clean forms are fixed points
    # exactly max_passes levels repair fully...
    x3 = _garble(_garble(_garble("caf\u00e9")))
    assert _fix_mojibake_str(x3) == "caf\u00e9"
    # ...one more level exceeds the budget: ORIGINAL comes back (never a
    # partially-unwrapped intermediate), and the op stays idempotent
    x4 = _garble(x3)
    assert _fix_mojibake_str(x4) == x4
    assert _fix_mojibake_str(_fix_mojibake_str(x4)) == _fix_mojibake_str(x4)
