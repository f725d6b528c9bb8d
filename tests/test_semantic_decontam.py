"""Embedding-space decontamination (operators/decontam.py:
semantic_contamination): exact DuckDB twin on the real embeddings, a
planted-paraphrase case with known geometry, tie-break determinism, and
the anti-join drop."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.decontam import (
    semantic_contamination,
    semantic_decontaminate,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_report_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con

    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        SEMANTIC_DECONTAM_ORACLE,
    )

    got = sorted(
        tuple(r)
        for r in QUERIES["semantic_decontam_report"].spark(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in duck_con(sf_dir).execute(SEMANTIC_DECONTAM_ORACLE).fetchall()
    )
    assert got == want
    # non-vacuous at sf0.01 (threshold tuned to the isotropic corpus);
    # sf0.001 may be empty — both engines must agree either way
    if sf_dir.endswith("0.01"):
        assert len(got) > 0


def test_planted_paraphrase_geometry(spark):
    # bench doc at e1; train doc A nearly parallel (cos ~0.9962), train
    # doc B orthogonal; threshold 0.9 catches exactly A
    bench = _vecs(spark, [(100, [1.0, 0.0, 0.0])])
    train = _vecs(spark, [(1, [0.9, 0.0785, 0.0]), (2, [0.0, 1.0, 0.0])])
    rep = semantic_contamination(train, bench, threshold=0.9).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.vec_id == 1 and r.nearest_bench_id == 100 and r.n_bench_hits == 1
    assert 0.99 < r.max_cosine <= 1.0


def test_nearest_tie_breaks_to_smallest_bench_id(spark):
    # two bench vectors IDENTICAL -> equal cosine; nearest must be the
    # smaller id
    bench = _vecs(spark, [(200, [1.0, 0.0]), (101, [1.0, 0.0])])
    train = _vecs(spark, [(1, [1.0, 0.1])])
    rep = semantic_contamination(train, bench, threshold=0.5).collect()
    assert len(rep) == 1
    assert rep[0].nearest_bench_id == 101 and rep[0].n_bench_hits == 2


def test_zero_norm_vector_is_never_contaminated(spark):
    bench = _vecs(spark, [(100, [1.0, 0.0])])
    train = _vecs(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0])])
    rep = semantic_contamination(train, bench, threshold=0.5).collect()
    assert {r.vec_id for r in rep} == {2}


def test_decontaminate_drops_exactly_the_report(spark):
    bench = _vecs(spark, [(100, [1.0, 0.0, 0.0])])
    train = _vecs(
        spark,
        [(1, [0.99, 0.01, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])],
    )
    rep = semantic_contamination(train, bench, threshold=0.9)
    kept = semantic_decontaminate(train, rep)
    assert {r.vec_id for r in kept.collect()} == {2, 3}


def test_unbounded_bench_side_raises(spark):
    rows = [(i, [1.0, float(i)]) for i in range(50)]
    e = _vecs(spark, rows)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bench_rows"):
        semantic_contamination(e, e, max_bench_rows=10)


def test_bench_guard_is_impl_invariant_under_null_vectors(spark):
    """Null bench vectors don't count against max_bench_rows in EITHER
    impl: 8 real + 5 null rows passes a bound of 8 under both, and the
    same frame raises under both with a bound of 7."""
    import pytest as _pytest

    rows = [(i, [1.0, float(i)]) for i in range(8)] + [
        (100 + i, None) for i in range(5)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for impl in ("jvm", "arrow"):
        got = semantic_contamination(
            e, e, vec_col="embedding", threshold=1.0, max_bench_rows=8, impl=impl
        )
        assert got.count() == 8, impl  # every real vector matches itself
        with _pytest.raises(ValueError, match="max_bench_rows"):
            semantic_contamination(
                e, e, vec_col="embedding", max_bench_rows=7, impl=impl
            )


def test_arrow_impl_equals_jvm_on_real_corpus(spark, sf_dir):
    import yelp_business_data_pipeline_spark.operators.similarity as sim

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", sim.as_double_vec(F.col("embedding")).alias("v"))
    )
    bench = e.filter((F.col("vec_id") % 19 == 0) & (F.col("vec_id") < 2000))
    train = e.filter((F.col("vec_id") % 19 != 0) | (F.col("vec_id") >= 2000))
    jvm = sorted(
        tuple(r)
        for r in semantic_contamination(train, bench, threshold=0.40).collect()
    )
    arrow = sorted(
        tuple(r)
        for r in semantic_contamination(
            train, bench, threshold=0.40, impl="arrow"
        ).collect()
    )
    assert jvm == arrow


def test_arrow_impl_tie_break_and_zero_norm(spark):
    bench = _vecs(spark, [(200, [1.0, 0.0]), (101, [1.0, 0.0])])
    train = _vecs(spark, [(1, [1.0, 0.1]), (2, [0.0, 0.0])])
    rep = semantic_contamination(train, bench, threshold=0.5, impl="arrow").collect()
    assert len(rep) == 1
    assert rep[0].vec_id == 1 and rep[0].nearest_bench_id == 101
    assert rep[0].n_bench_hits == 2


def test_jvm_tie_break_works_for_string_ids(spark):
    # review finding: the old (-bench_id) ordering cast string ids to
    # NULL, making nearest nondeterministic; min_by over (-cosine, id)
    # must pick the lexicographically smallest id on ties — same promise
    # as the arrow impl
    bench = spark.createDataFrame(
        [("mmlu_2", [1.0, 0.0]), ("mmlu_1", [1.0, 0.0])],
        "vec_id string, v array<double>",
    )
    train = spark.createDataFrame(
        [("doc_a", [1.0, 0.1])], "vec_id string, v array<double>"
    )
    for impl in ("jvm", "arrow"):
        rep = semantic_contamination(
            train, bench, threshold=0.5, impl=impl
        ).collect()
        assert len(rep) == 1, impl
        assert rep[0].nearest_bench_id == "mmlu_1", impl
        assert rep[0].n_bench_hits == 2, impl
