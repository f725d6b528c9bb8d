"""Z-order layout (sources/layout.py): interleave correctness vs a python
reference, and the pruning property — consecutive chunks of the z-order
have small per-dimension spans, so chunk min/max stats skip data on the
SECOND dimension too, which lexicographic sort cannot do."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.sources.layout import zorder_key


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_matches_python_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=4)).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton([x, y], 4), (x, y)
    # bijective on the grid
    assert len(set(got.values())) == len(rows)


def test_zorder_chunk_spans_prune_second_dimension(spark):
    """Simulated row groups (chunks of 64 over a 64x64 grid): under
    z-order, most chunks' [min,max] y-range excludes a thin y-band filter;
    under lexicographic (x, y) sort, chunks span narrow x but the
    y-pruning rate must be far lower for a filter crossing x values.
    This is the min/max-stat skipping parquet does per row group."""
    n, chunk = 64, 64
    pts = [(x, y) for x in range(n) for y in range(n)]

    def chunks_sorted_by(keyfn):
        s = sorted(pts, key=keyfn)
        return [s[i : i + chunk] for i in range(0, len(s), chunk)]

    def pruned_fraction(chks, y_lo, y_hi):
        pruned = sum(
            1
            for c in chks
            if max(y for _x, y in c) < y_lo or min(y for _x, y in c) > y_hi
        )
        return pruned / len(chks)

    z = chunks_sorted_by(lambda p: _py_morton([p[0], p[1]], 6))
    lex = chunks_sorted_by(lambda p: p)
    band = (24, 27)  # thin y-band, crosses every x
    z_rate = pruned_fraction(z, *band)
    lex_rate = pruned_fraction(lex, *band)
    assert z_rate >= 0.7, f"z-order chunks should mostly prune: {z_rate}"
    assert lex_rate == 0.0, "lexicographic chunks span full y — no pruning"

    # and the engine expression produces exactly this ordering
    df = spark.createDataFrame(pts, "x long, y long")
    ordered = (
        df.withColumn("z", zorder_key(["x", "y"], bits=6))
        .orderBy("z")
        .collect()
    )
    assert [(r.x, r.y) for r in ordered] == sorted(
        pts, key=lambda p: _py_morton([p[0], p[1]], 6)
    )


def test_zorder_input_validation(spark):
    df = spark.createDataFrame([(1, -1)], "x long, y long")
    with pytest.raises(Exception, match="out-of"):
        df.withColumn("z", zorder_key(["x", "y"], bits=4)).collect()
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])


def test_grid_surrogate_quantizes_clamps_and_feeds_zorder(spark):
    from yelp_business_data_pipeline_spark.sources.layout import grid_surrogate

    df = spark.createDataFrame(
        [(0.0,), (0.5,), (0.9999,), (1.0,), (-3.0,), (9.0,), (None,)], "x double"
    )
    got = [r.g for r in df.select(grid_surrogate("x", 0.0, 1.0, bits=4).alias("g")).collect()]
    # 16 cells over [0,1): 0.0->0, 0.5->8, 0.9999->15; hi and beyond clamp
    # to 15; below-lo clamps to 0; NULL stays NULL
    assert got == [0, 8, 15, 15, 0, 15, None]
    # composes with zorder_key after a null filter
    pts = spark.createDataFrame([(0.1, 0.9), (0.8, 0.2)], "x double, y double")
    z = pts.select(
        zorder_key(
            [grid_surrogate("x", 0.0, 1.0, 4), grid_surrogate("y", 0.0, 1.0, 4)], bits=4
        ).alias("z")
    ).collect()
    assert len({r.z for r in z}) == 2
    with pytest.raises(ValueError, match="hi > lo"):
        grid_surrogate("x", 1.0, 1.0)


def test_zorder_null_raises_and_grid_nan_stays_null(spark):
    from yelp_business_data_pipeline_spark.sources.layout import grid_surrogate

    nulls = spark.createDataFrame([(None, 1)], "x long, y long")
    with pytest.raises(Exception, match="NULL"):
        nulls.withColumn("z", zorder_key(["x", "y"], bits=4)).collect()
    nan = spark.createDataFrame([(float("nan"),), (0.0,)], "x double")
    got = [r.g for r in nan.select(grid_surrogate("x", 0.0, 1.0, 4).alias("g")).collect()]
    assert got == [None, 0]  # NaN must not alias onto the lo-edge cell


def test_quantile_grid_distributes_lognormal_where_static_bounds_collapse(spark):
    """On a log-normal column (heavy right tail), static-bounds cells dump
    ~90% of rows into one cell — the Z-curve degenerates. The
    approxQuantile-derived grid keeps cells near-uniform, is monotone in
    x, and keeps NULL/NaN as NULL."""
    import math
    import random
    from collections import Counter

    from yelp_business_data_pipeline_spark.sources.layout import (
        grid_surrogate,
        quantile_grid_surrogate,
    )

    rng = random.Random(42)
    vals = [math.exp(rng.gauss(0.0, 2.0)) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")

    bits = 4  # 16 cells
    static = [
        r.g
        for r in df.select(grid_surrogate("x", 0.0, max(vals), bits=bits).alias("g")).collect()
    ]
    top_static = Counter(static).most_common(1)[0][1] / len(static)
    assert top_static > 0.85, f"fixture lost its skew: {top_static}"

    qcell = quantile_grid_surrogate(df, "x", bits=bits, n_knots=65)
    got = df.select(F.col("x"), qcell.alias("g")).collect()
    counts = Counter(r.g for r in got)
    assert set(counts) == set(range(16)), counts  # every cell occupied
    top_q = counts.most_common(1)[0][1] / len(got)
    assert top_q < 0.15, f"quantile cells still skewed: {counts}"
    # monotone: sort by x, cells must be non-decreasing
    cells_by_x = [g for _, g in sorted((r.x, r.g) for r in got)]
    assert all(a <= b for a, b in zip(cells_by_x, cells_by_x[1:]))

    # NULL / NaN stay NULL (never alias onto a real cell)
    weird = spark.createDataFrame([(None,), (float("nan",),), (1.0,)], "x double")
    qc2 = quantile_grid_surrogate(df, "x", bits=bits, n_knots=17)
    wg = [r.g for r in weird.select(qc2.alias("g")).collect()]
    assert wg[0] is None and wg[1] is None and wg[2] is not None

    # out-of-range values clamp to edge cells; validation raises
    edge = spark.createDataFrame([(-1e9,), (1e9,)], "x double")
    eg = [r.g for r in edge.select(qc2.alias("g")).collect()]
    assert eg == [0, 15]
    with pytest.raises(ValueError, match="n_knots"):
        quantile_grid_surrogate(df, "x", n_knots=1)
