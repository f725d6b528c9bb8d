"""Unicode script profiling (text.script_counts / dominant_script):
handwritten count matrix, tie/none semantics, NULL handling, the
registered panel's exact DuckDB twin, and JVM-only plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.text import (
    SCRIPT_ORDER,
    SCRIPT_RANGES,
    dominant_script,
    script_counts,
)


def test_script_counts_matrix(spark):
    cases = [
        ("hello мир", {"latin": 5, "cyrillic": 3}),
        ("γειά 你好 שלום", {"greek": 4, "cjk": 2, "hebrew": 4}),
        ("مرحبا", {"arabic": 5}),
        ("नमस्ते", {"devanagari": 6}),
        ("안녕", {"hangul": 2}),
        ("こんにちは", {"cjk": 5}),  # kana rides the cjk class
        ("éàß Ω", {"latin": 3, "greek": 1}),  # Latin-1 supplement + Greek
        ("1234 .,;", {}),  # no script chars at all
        ("", {}),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
    )
    got = {
        r.i: r.c.asDict()
        for r in df.select("i", script_counts(F.col("t")).alias("c")).collect()
    }
    for i, (t, want) in enumerate(cases):
        for name in SCRIPT_ORDER:
            assert got[i][f"n_{name}"] == want.get(name, 0), (t, name)


def test_dominant_script_ties_none_and_null(spark):
    cases = [
        ("hello мир", "latin"),          # 5 > 3
        ("hi мир", "cyrillic"),          # 2 < 3
        ("ab мп", "latin"),              # 2 == 2: SCRIPT_ORDER tie -> latin
        ("你好 γγ", "greek"),             # 2 == 2: greek precedes cjk
        ("1234 .,;", "none"),            # no script chars
        ("", "none"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
    )
    got = {
        r.i: r.d
        for r in df.select("i", dominant_script(F.col("t")).alias("d")).collect()
    }
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, (t, got[i], want)
    assert tuple(SCRIPT_RANGES) == SCRIPT_ORDER  # tie order IS dict order


def test_script_mix_panel_matches_duckdb_twin(spark, sf_dir):
    """Rotation-queue twin pin: Spark's regexp_count + when-chain argmax
    vs DuckDB's regexp_extract_all + CASE re-derivation over the same
    portable \\x{...} classes and the same literal-UTF-8 suffixes."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        SCRIPT_MIX_ORACLE,
    )

    from .oracle_harness import duck_con

    srows = sorted(
        tuple(r) for r in QUERIES["script_mix_panel"].spark(spark, sf_dir).collect()
    )
    drows = sorted(duck_con(sf_dir).execute(SCRIPT_MIX_ORACLE).fetchall())
    assert srows == drows and len(srows) >= 4  # latin + 3+ injected scripts
    doms = {r[0] for r in srows}
    assert {"cyrillic", "greek", "cjk", "hebrew"} <= doms  # suffixes dominate
    # the injected suffixes are short vs the latin body for %5==4 docs
    assert "latin" in doms


def test_script_profile_is_jvm_only(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans import QUERIES

    plan = (
        QUERIES["script_mix_panel"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
