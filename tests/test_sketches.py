"""Re-aggregatable HLL sketches: merge-of-parts == whole (within HLL
error), surviving a parquet round-trip — the rollup-table contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.sketches import (
    grouped_distinct_sketches,
    merge_distinct_estimate,
)


def test_sketch_merge_matches_global(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]

    # Build per-priority sketches (the rollup grain) and PERSIST them —
    # binary sketch columns must survive parquet.
    rollup_path = str(tmp_path / "rollup")
    grouped_distinct_sketches(o, ["o_orderpriority"], "o_custkey").write.parquet(rollup_path)
    rollup = spark.read.parquet(rollup_path)

    # Merge months later without raw data: estimate within HLL error.
    est = merge_distinct_estimate(rollup).collect()[0].distinct_estimate
    assert abs(est - exact) / exact <= 0.05, (est, exact)

    # Re-grouping to a coarser grain also works (here: everything into one
    # bucket via a constant) and rows reconcile.
    rows = merge_distinct_estimate(
        rollup.withColumn("all", F.lit(1)), ["all"]
    ).collect()
    assert rows[0].n_rows == o.count()

    # Estimates are order/partitioning-insensitive: shuffled input, same
    # sketch union result.
    est2 = merge_distinct_estimate(
        grouped_distinct_sketches(o.repartition(13), ["o_orderpriority"], "o_custkey")
    ).collect()[0].distinct_estimate
    assert est2 == est


def test_heavy_hitters_superset_guarantee(spark, sf_dir):
    from yelp_business_data_pipeline_spark.operators.sketches import (
        frequent_tokens,
        verified_heavy_hitters,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    total = toks.count()
    exact = {
        r.tok
        for r in toks.groupBy("tok").count().filter(F.col("count") > 0.01 * total).collect()
    }
    assert exact, "expected some >1% tokens in the corpus"
    approx = set(frequent_tokens(d, "text", 0.01))
    assert exact <= approx  # freqItems guarantee: superset of true heavy hitters

    verified = {r.tok for r in verified_heavy_hitters(d, "text", 0.01).collect()}
    assert verified == exact  # candidates + exact count = exact answer


class TestQuantileSketches:
    @staticmethod
    def _ops():
        from yelp_business_data_pipeline_spark.operators.sketches import (
            grouped_quantile_sketches,
            merge_quantile_sketches,
            quantile_from_sketch,
        )

        return grouped_quantile_sketches, merge_quantile_sketches, quantile_from_sketch

    def test_merge_equals_global_and_error_bound(self, spark, sf_dir):
        import pyspark.sql.functions as F

        build, merge, est = self._ops()
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        edges = o.approxQuantile("o_totalprice", [i / 16 for i in range(1, 16)], 0.01)
        # per-priority sketches (the rollup rows), merged back to global
        per = build(o, ["o_orderpriority"], "o_totalprice", edges)
        merged = merge(per, edges)
        for q in (0.1, 0.5, 0.9):
            got = merged.select(est(edges, q).alias("e")).collect()[0].e
            exact = o.selectExpr(f"percentile(o_totalprice, {q}) AS p").collect()[0].p
            # error bound: the width of the bin holding the quantile; with
            # ~equi-depth edges each bin holds ~1/16 of mass — assert
            # against the generous global bound max_gap
            import numpy as np
            lo, hi = (
                o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
            )
            all_edges = [lo] + list(edges) + [hi]
            max_gap = max(b - a for a, b in zip(all_edges, all_edges[1:]))
            assert abs(got - exact) <= max_gap, (q, got, exact, max_gap)

    def test_merge_is_partitioning_invariant(self, spark, sf_dir):
        build, merge, est = self._ops()
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        edges = o.approxQuantile("o_totalprice", [0.25, 0.5, 0.75], 0.01)
        # two different groupings of the same rows must merge to the SAME
        # sketch (integer bin sums are exact aggregation)
        a = merge(build(o, ["o_orderpriority"], "o_totalprice", edges), edges)
        b = merge(build(o, ["o_orderstatus"], "o_totalprice", edges), edges)
        ra, rb = a.collect()[0], b.collect()[0]
        assert list(ra.bin_counts) == list(rb.bin_counts)
        assert (ra.v_min, ra.v_max, ra.n_vals) == (rb.v_min, rb.v_max, rb.n_vals)

    def test_parquet_roundtrip_and_coarser_regroup(self, spark, sf_dir, tmp_path):
        import pyspark.sql.functions as F

        build, merge, est = self._ops()
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
            "yr", F.year("o_orderdate")
        )
        edges = o.approxQuantile("o_totalprice", [0.2, 0.4, 0.6, 0.8], 0.01)
        rollup = build(o, ["yr", "o_orderpriority"], "o_totalprice", edges)
        p = str(tmp_path / "rollup")
        rollup.write.parquet(p)  # store now ...
        stored = spark.read.parquet(p)  # ... merge months later
        per_year = merge(stored, edges, ["yr"])
        med = per_year.select("yr", est(edges, 0.5).alias("m")).collect()
        exact = {
            r.yr: r.m
            for r in o.groupBy("yr").agg(
                F.expr("percentile(o_totalprice, 0.5)").alias("m")
            ).collect()
        }
        for r in med:
            assert abs(r.m - exact[r.yr]) / exact[r.yr] < 0.35, (r.yr, r.m, exact[r.yr])

    def test_validation(self, spark):
        build, merge, est = self._ops()
        df = spark.createDataFrame([(1, 1.0)], "g long, v double")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="strictly increasing"):
            build(df, ["g"], "v", [1.0, 1.0, 2.0])
        with _pytest.raises(ValueError, match="q must be"):
            est([1.0], 1.5)

    def test_nan_values_ignored_and_width_guard(self, spark):
        import pytest as _pytest

        build, merge, est = self._ops()
        df = spark.createDataFrame(
            [(1, 1.0), (1, 2.0), (1, float("nan")), (1, 3.0)], "g long, v double"
        )
        sk = build(df, ["g"], "v", [1.5, 2.5]).collect()[0]
        assert sk.n_vals == 3 and sk.v_max == 3.0  # NaN dropped, not poisoning
        # mismatched edges must fail loudly, not interpolate silently
        built = build(df, ["g"], "v", [1.5, 2.5])
        with _pytest.raises(Exception, match="width"):
            merge(built, [1.0, 2.0, 3.0]).collect()
        with _pytest.raises(Exception, match="width"):
            merge(built, [1.5, 2.5]).select(est([1.5], 0.5).alias("e")).collect()


def test_quantile_from_sketch_all_zero_counts_is_null(spark):
    """ADVICE r4: an all-zero bin_counts row (n=0 — hand-built, not
    producible by the builders) left the fold index at -1 and hit
    element_at(..., 0), which Spark always rejects. It must yield a NULL
    estimate, not a crash."""
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.sketches import (
        quantile_from_sketch,
    )

    edges = [0.0, 1.0, 2.0]
    row = spark.createDataFrame(
        [([0, 0, 0, 0], 0.0, 0.0, 0)],
        "bin_counts array<long>, v_min double, v_max double, n_vals long",
    )
    got = row.select(quantile_from_sketch(edges, 0.5).alias("q")).first()
    assert got.q is None


class TestFrequentItemSketches:
    """Mergeable Misra-Gries heavy-hitter rollups: containment bounds,
    guaranteed-presence, layout invariance OF THE BOUNDS, exactness when
    m exceeds the vocabulary, coarser-grain remerge, parquet roundtrip."""

    def _fi(self):
        from yelp_business_data_pipeline_spark.operators.sketches import (
            frequent_items_from_sketch,
            grouped_frequent_sketches,
            merge_frequent_sketches,
        )

        return grouped_frequent_sketches, merge_frequent_sketches, frequent_items_from_sketch

    def _zipf_rows(self):
        # deterministic skew: item_i appears ~N/i times, two groups
        rows = []
        for g in ("a", "b"):
            for i in range(1, 30):
                rows += [(g, f"item{i}")] * (240 // i)
        return rows

    def test_exact_when_capacity_exceeds_vocab(self, spark):
        build, _, explode = self._fi()
        rows = self._zipf_rows()
        df = spark.createDataFrame(rows, "g string, item string")
        sk = build(df, ["g"], "item", m=64)  # vocab is 29 per group
        got = {
            (r.g, r.item): (r.count_lower, r.count_upper)
            for r in explode(sk).collect()
        }
        exact = {}
        for g, it in rows:
            exact[(g, it)] = exact.get((g, it), 0) + 1
        for k, n in exact.items():
            assert got[k] == (n, n), k  # err == 0: counts exact

    def test_bounds_contain_exact_across_layouts(self, spark):
        build, _, explode = self._fi()
        rows = self._zipf_rows()
        exact = {}
        for g, it in rows:
            exact[(g, it)] = exact.get((g, it), 0) + 1
        df = spark.createDataFrame(rows, "g string, item string")
        for n_parts in (1, 3, 13):
            sk = build(df.repartition(n_parts), ["g"], "item", m=8)
            ex = {(r.g, r.item): r for r in explode(sk).collect()}
            for (g, it), r in ex.items():
                true = exact.get((g, it), 0)
                assert r.count_lower <= true <= r.count_upper, (n_parts, g, it)
            # guaranteed presence: any item with true count > mg_err of its
            # group's sketch must appear
            errs = {r.g: r.mg_err for r in sk.collect()}
            for (g, it), true in exact.items():
                if true > errs[g]:
                    assert (g, it) in ex, (n_parts, g, it, true, errs[g])

    def test_merge_to_coarser_grain_keeps_bounds(self, spark):
        build, merge, explode = self._fi()
        rows = self._zipf_rows()
        df = spark.createDataFrame(rows, "g string, item string")
        per_group = build(df.repartition(5), ["g"], "item", m=8)
        merged = merge(per_group, group_cols=None, m=8)  # global grain
        exact: dict = {}
        for _, it in rows:
            exact[it] = exact.get(it, 0) + 1
        got = {r.item: r for r in explode(merged).collect()}
        for it, r in got.items():
            assert r.count_lower <= exact.get(it, 0) <= r.count_upper, it
        assert merged.collect()[0].n_rows == len(rows)
        # the #1 heavy item is far above any achievable err: must survive
        assert "item1" in got and got["item1"].count_lower > 0

    def test_parquet_roundtrip_and_remerge(self, spark, tmp_path):
        build, merge, explode = self._fi()
        df = spark.createDataFrame(self._zipf_rows(), "g string, item string")
        path = str(tmp_path / "fi_sketches")
        build(df, ["g"], "item", m=16).write.parquet(path)
        stored = spark.read.parquet(path)
        merged = merge(stored, group_cols=None, m=16)
        got = {r.item: r.count_lower for r in explode(merged).collect()}
        assert got["item1"] >= 2 * (240 // 1) - merged.collect()[0].mg_err

    def test_capacity_validation_and_null_items(self, spark):
        import pytest as _pytest

        build, merge, _ = self._fi()
        df = spark.createDataFrame(
            [("a", "x"), ("a", None), ("a", "x")], "g string, item string"
        )
        with _pytest.raises(ValueError, match="m must be"):
            build(df, ["g"], "item", m=0)
        sk = build(df, ["g"], "item", m=4).collect()
        assert sk[0].items == ["x"] and sk[0].counts == [2]  # NULLs uncounted
        assert sk[0].n_rows == 2
        with _pytest.raises(ValueError, match="m must be"):
            merge(spark.createDataFrame(sk), ["g"], m=0)


class TestKmvSketches:
    """KMV k-minimum-values sketches: exactness below capacity, the
    EXACT merge closure property, estimator accuracy, set-operation
    (Jaccard/intersection) estimates, parquet roundtrip."""

    def _mod(self):
        from yelp_business_data_pipeline_spark.operators import sketches as sk

        return sk

    def test_exact_below_capacity_and_estimate_above(self, spark):
        sk = self._mod()
        from pyspark.sql import functions as F

        # 40 distinct values, k=64: sketch never fills -> exact count
        df = spark.createDataFrame([(i % 40,) for i in range(400)], "v long")
        s = sk.grouped_kmv_sketches(df, [], "v", k=64)
        est = s.select(sk.kmv_distinct_estimate(F.col("kmin"), 64).alias("e")).first().e
        assert est == 40.0
        assert s.first().n_rows == 400
        # 5000 distinct, k=256: estimator within 15% (theory: ~1/sqrt(k))
        df2 = spark.createDataFrame([(i,) for i in range(5000)], "v long")
        s2 = sk.grouped_kmv_sketches(df2, [], "v", k=256)
        est2 = s2.select(sk.kmv_distinct_estimate(F.col("kmin"), 256).alias("e")).first().e
        assert abs(est2 - 5000) / 5000 < 0.15, est2

    def test_merge_closure_is_exact_equality(self, spark):
        """k smallest of a union of per-grain k-min arrays == the sketch
        built over the concatenated raw data — EXACT, not approximate."""
        sk = self._mod()
        rows = [(f"g{i % 3}", i * 17 % 1000) for i in range(3000)]
        df = spark.createDataFrame(rows, "g string, v long")
        per_group = sk.grouped_kmv_sketches(df.repartition(7), ["g"], "v", k=64)
        merged = sk.merge_kmv_sketches(per_group, group_cols=None, k=64)
        direct = sk.grouped_kmv_sketches(df, [], "v", k=64)
        assert merged.first().kmin == direct.first().kmin
        assert merged.first().n_rows == direct.first().n_rows == 3000

    def test_set_estimates_jaccard_and_intersection(self, spark):
        sk = self._mod()
        from pyspark.sql import functions as F

        # A = 0..3999, B = 2000..5999: |A∩B| = 2000, |A∪B| = 6000, J = 1/3
        rows = [("a", i) for i in range(4000)] + [("b", i) for i in range(2000, 6000)]
        df = spark.createDataFrame(rows, "s string, v long")
        sketches = sk.grouped_kmv_sketches(df, ["s"], "v", k=256)
        a = sketches.filter("s = 'a'").select(F.col("kmin").alias("ka"))
        b = sketches.filter("s = 'b'").select(F.col("kmin").alias("kb"))
        est = (
            a.crossJoin(b)
            .select(sk.kmv_set_estimates(F.col("ka"), F.col("kb"), 256).alias("e"))
            .first()
            .e
        )
        assert abs(est.jaccard - 1 / 3) < 0.1, est
        assert abs(est.union_est - 6000) / 6000 < 0.15, est
        assert abs(est.intersection_est - 2000) / 2000 < 0.35, est

    def test_parquet_roundtrip_and_regroup(self, spark, tmp_path):
        sk = self._mod()
        from pyspark.sql import functions as F

        rows = [(f"d{i % 5}", f"g{i % 2}", i % 700) for i in range(2000)]
        df = spark.createDataFrame(rows, "day string, g string, v long")
        path = str(tmp_path / "kmv")
        sk.grouped_kmv_sketches(df, ["day", "g"], "v", k=64).write.parquet(path)
        stored = spark.read.parquet(path)
        coarser = sk.merge_kmv_sketches(stored, ["g"], k=64)
        direct = sk.grouped_kmv_sketches(df, ["g"], "v", k=64)
        got = {r.g: (r.kmin, r.n_rows) for r in coarser.collect()}
        want = {r.g: (r.kmin, r.n_rows) for r in direct.collect()}
        assert got == want  # closure property survives storage + regroup

    def test_null_values_and_capacity_validation(self, spark):
        import pytest as _pytest

        sk = self._mod()
        df = spark.createDataFrame([("a", 1), ("a", None), ("a", 1)], "g string, v long")
        s = sk.grouped_kmv_sketches(df, ["g"], "v", k=8).collect()
        assert len(s[0].kmin) == 1 and s[0].n_rows == 2  # NULLs uncounted
        with _pytest.raises(ValueError, match="k must be"):
            sk.grouped_kmv_sketches(df, ["g"], "v", k=0)
        with _pytest.raises(ValueError, match="k must be"):
            sk.merge_kmv_sketches(spark.createDataFrame(s), ["g"], k=0)

    def test_null_group_keys_form_one_group(self, spark):
        sk = self._mod()
        df = spark.createDataFrame(
            [(None, 1), (None, 2), ("x", 1)], "g string, v long"
        )
        rows = {r.g: r for r in sk.grouped_kmv_sketches(df, ["g"], "v", k=8).collect()}
        assert set(rows) == {None, "x"}
        assert rows[None].n_rows == 2 and len(rows[None].kmin) == 2


class TestKmvReviewFindings:
    """Round-5 review regressions: timestamp group keys, k-mismatch
    guard, empty-input n_rows, empty-set estimates."""

    def _mod(self):
        from yelp_business_data_pipeline_spark.operators import sketches as sk

        return sk

    def test_timestamp_group_column_works(self, spark):
        """pandas groupby keys (pd.Timestamp) and numpy values
        (np.datetime64) hash differently — the dedup loop must key the
        state dict the same way the sizes loop does, or every timestamp
        group column crashes with KeyError (reproduced pre-fix)."""
        import datetime as dt

        sk = self._mod()
        rows = [
            (dt.datetime(2020, 1, 1 + (i % 3)), i % 50) for i in range(300)
        ]
        df = spark.createDataFrame(rows, "day timestamp, v long").repartition(3)
        got = {r.day.day: r for r in sk.grouped_kmv_sketches(df, ["day"], "v", k=32).collect()}
        assert set(got) == {1, 2, 3}
        assert all(r.n_rows == 100 for r in got.values())
        assert all(len(r.kmin) == 32 for r in got.values())

    def test_k_mismatch_fails_loudly(self, spark):
        import pytest as _pytest

        sk = self._mod()
        df = spark.createDataFrame([(i % 200,) for i in range(400)], "v long")
        built = sk.grouped_kmv_sketches(df, [], "v", k=64)
        with _pytest.raises(Exception, match="different k"):
            sk.merge_kmv_sketches(built, group_cols=None, k=256).collect()

    def test_empty_input_global_merge_n_rows_zero(self, spark):
        sk = self._mod()
        empty = spark.createDataFrame([], "v long")
        row = sk.grouped_kmv_sketches(empty, [], "v", k=8).first()
        assert row.kmin == [] and row.n_rows == 0 and row.k == 8

    def test_empty_set_estimates_are_zero_not_nan(self, spark):
        from pyspark.sql import functions as F

        sk = self._mod()
        df = spark.createDataFrame([([], [])], "ka array<long>, kb array<long>")
        est = df.select(sk.kmv_set_estimates(F.col("ka"), F.col("kb"), 8).alias("e")).first().e
        assert est.jaccard == 0.0 and est.union_est == 0.0 and est.intersection_est == 0.0


# ---------------------------------------------------------------------------
# Count-Min sketch (operators/cmsketch.py)
# ---------------------------------------------------------------------------


def _cm_cell_py(v, i, width, salt1="cm1:", salt2="cm2:"):
    import hashlib

    h1 = int(hashlib.md5((salt1 + v).encode()).hexdigest()[:8], 16)
    h2 = int(hashlib.md5((salt2 + v).encode()).hexdigest()[:8], 16)
    return (h1 + i * h2) % width


def _cm_model(values, width, depth):
    """From-scratch CM: build the full matrix, estimate = min over rows."""
    import collections

    cells = collections.Counter()
    for v in values:
        for i in range(depth):
            cells[(i, _cm_cell_py(v, i, width))] += 1
    return {
        v: min(cells[(i, _cm_cell_py(v, i, width))] for i in range(depth))
        for v in set(values)
    }


def test_cm_matches_python_model_and_never_underestimates(spark):
    import collections

    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.cmsketch import (
        build_cm_sketch,
        cm_estimate,
    )

    values = [f"k{i % 7}" for i in range(100)] + ["rare", "rare2"]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    w, d = 8, 3  # undersized on purpose: collisions live
    sk = build_cm_sketch(df, "v", w, d)
    est = {
        r["v"]: r["cm_count"]
        for r in cm_estimate(df.distinct(), sk, "v", w, d).collect()
    }
    assert est == _cm_model(values, w, d)
    true = collections.Counter(values)
    assert all(est[v] >= true[v] for v in true), "CM underestimated"


def test_cm_error_bound_at_designed_size(spark):
    """At (eps, delta) sizing the additive error stays within eps*N for
    at least 1-delta of keys — deterministic corpus, one-shot check with
    margin."""
    import collections

    from yelp_business_data_pipeline_spark.operators.cmsketch import (
        build_cm_sketch,
        cm_estimate,
        cm_params,
    )

    values = [f"tok{i % 97}" for i in range(3000)] + [f"u{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    w, d = cm_params(0.05, 0.1)
    sk = build_cm_sketch(df, "v", w, d)
    est = {
        r["v"]: r["cm_count"]
        for r in cm_estimate(df.distinct(), sk, "v", w, d).collect()
    }
    true = collections.Counter(values)
    n = len(values)
    within = sum(1 for v in true if est[v] - true[v] <= 0.05 * n)
    assert within / len(true) >= 0.9


def test_cm_merge_closure_is_exact_with_overlap(spark):
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.cmsketch import (
        build_cm_sketch,
        merge_cm_sketches,
    )

    df = spark.createDataFrame(
        [(f"k{i % 11}", i) for i in range(200)], "v string, i long"
    )
    # DETERMINISTIC split (an unordered limit() could pick different
    # rows in each plan); the halves SHARE key values k0..k5, so the
    # same cells accumulate from both parts
    a = df.filter("i % 2 = 0 OR v < 'k6'")
    w, d = 16, 3
    # counters are linear: merge over ANY decomposition whose parts sum
    # to the same multiset equals the direct build over that multiset
    m = merge_cm_sketches(
        [build_cm_sketch(a, "v", w, d), build_cm_sketch(df.exceptAll(a), "v", w, d)],
        w, d,
    )
    direct = build_cm_sketch(df, "v", w, d)
    assert m.exceptAll(direct).count() == 0
    assert direct.exceptAll(m).count() == 0


def test_cm_layout_invariance_and_null_policy(spark):
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.cmsketch import (
        build_cm_sketch,
        cm_estimate,
    )

    df = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "v string"
    )
    t1 = build_cm_sketch(df.repartition(5), "v", 8, 2)
    t2 = build_cm_sketch(df.coalesce(1), "v", 8, 2)
    assert t1.exceptAll(t2).count() == 0 and t2.exceptAll(t1).count() == 0
    rows = {
        r["v"]: r["cm_count"]
        for r in cm_estimate(df.distinct(), t1, "v", 8, 2).collect()
    }
    assert rows[None] == 0 and rows["a"] >= 2


def test_cm_geometry_guards(spark):
    import pytest
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.cmsketch import (
        build_cm_sketch,
        cm_estimate,
        cm_params,
        merge_cm_sketches,
    )

    df = spark.createDataFrame([("a",)], "v string")
    sk = build_cm_sketch(df, "v", 8, 2)
    with pytest.raises(Exception, match="merge_cm_sketches"):
        merge_cm_sketches([sk], 8, 3).collect()
    with pytest.raises(Exception, match="cm_estimate"):
        cm_estimate(df, sk, "v", 16, 2).collect()
    with pytest.raises(ValueError):
        build_cm_sketch(df, "v", 0, 2)
    with pytest.raises(ValueError):
        cm_params(2.0, 0.1)
    with pytest.raises(ValueError, match="already exists"):
        cm_estimate(df.withColumn("cm_count", F.lit(1)), sk, "v", 8, 2)


def test_cm_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import CM_SKETCH_ORACLE

    srows = [
        tuple(r)
        for r in QUERIES["cm_token_counts_panel"].spark(spark, sf_dir).collect()
    ]
    drows = [
        tuple(r) for r in duck_con(sf_dir).execute(CM_SKETCH_ORACLE).fetchall()
    ]
    assert srows == drows
    # never-underestimate shows in the panel itself
    assert all(cc >= tc for _t, tc, cc in srows)
    # promoted into the 50-slot gate in the r10 rotation (swap_gate_slot)
    names = list(QUERIES)
    assert names.index("cm_token_counts_panel") < 50
    assert QUERIES["cm_token_counts_panel"].oracle == CM_SKETCH_ORACLE


def test_cm_weighted_build_equals_raw_build(spark):
    """Linearity: building from pre-aggregated (value, count) rows is
    cell-identical to building from the raw multiset — what lets the
    panel explode the corpus once."""
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.cmsketch import (
        build_cm_sketch,
    )

    raw = spark.createDataFrame([(f"k{i % 9}",) for i in range(123)], "v string")
    agg = raw.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    a = build_cm_sketch(raw, "v", 16, 3)
    b = build_cm_sketch(agg, "v", 16, 3, count_col="n")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
