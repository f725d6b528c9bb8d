"""Distributed k-means (operators/kmeans.py): from-scratch python-model
equality (seeding replay + full-corpus Lloyd's), Lloyd monotonicity,
layout invariance of the integer outputs, empty-cluster policy, guards,
plan shape (the corpus pass shuffles nothing), and hand-checked
assignment/profile arithmetic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.kmeans import (
    MAX_K,
    _iteration_partials,
    assign_clusters,
    cluster_profile,
    kmeans_fit,
    kmeans_refine,
)

K, SEED_ITERS, REFINE_ITERS = 8, 5, 3


def _load(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r.embedding for r in rows], dtype=np.float64)


def _model(x, k, seed_iters, refine_iters, sample_cap):
    """From-scratch Lloyd's replicating the operator contract: lowest-id
    byte-capped sample seeds (train_ivf_centroids), then full-corpus
    refinement; empty clusters keep their centroid; inertia clamped at 0."""

    def rounds(data, cent, iters, record=None):
        for _ in range(iters):
            d = (
                (data * data).sum(1)[:, None]
                + (cent * cent).sum(1)[None, :]
                - 2.0 * (data @ cent.T)
            )
            a = d.argmin(1)
            if record is not None:
                record.append(np.maximum(d[np.arange(len(a)), a], 0.0).sum())
            new = cent.copy()
            for j in range(len(cent)):
                m = a == j
                if m.any():
                    new[j] = data[m].mean(0)
            cent = new
        return cent

    sample = x[:sample_cap]
    cent = rounds(sample, sample[:k].copy(), seed_iters)
    inertias: list = []
    cent = rounds(x, cent, refine_iters, record=inertias)
    d = (
        (x * x).sum(1)[:, None]
        + (cent * cent).sum(1)[None, :]
        - 2.0 * (x @ cent.T)
    )
    return cent, inertias, d.argmin(1)


def test_fit_matches_python_model(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = _load(spark, sf_dir)
    cent_df, hist = kmeans_fit(
        e, k=K, seed_iters=SEED_ITERS, refine_iters=REFINE_ITERS
    )
    # sf0.001 corpus (500 rows) is far under the k*256 sample cap, so the
    # model's sample IS the corpus — the seeding replay stays exact
    m_cent, m_inertias, m_assign = _model(x, K, SEED_ITERS, REFINE_ITERS, len(x))
    got = np.array(
        [r.cv for r in cent_df.orderBy("list_id").collect()], dtype=np.float64
    )
    assert np.allclose(got, m_cent, rtol=1e-9, atol=1e-12)
    assert [h["iter"] for h in hist] == list(range(REFINE_ITERS))
    for h, mi in zip(hist, m_inertias):
        assert h["inertia"] == pytest.approx(mi, rel=1e-9)
        assert h["n_assigned"] == len(x) and h["n_empty"] == 0
    a = assign_clusters(e, cent_df).orderBy("vec_id").select("cluster").collect()
    assert [r.cluster for r in a] == m_assign.tolist()


def test_inertia_is_monotone_nonincreasing(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, hist = kmeans_fit(e, k=K, refine_iters=4)
    inertias = [h["inertia"] for h in hist]
    assert all(a >= b - 1e-9 for a, b in zip(inertias, inertias[1:])), inertias


def test_layout_invariance_of_integer_outputs(spark, sf_dir):
    """Partial-sum merge order follows the layout, so centroids are only
    ~1e-12-stable — but assignments and sizes (integers) must not move."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent_a, hist_a = kmeans_fit(e, k=K, refine_iters=REFINE_ITERS)
    cent_b, hist_b = kmeans_fit(e.repartition(7), k=K, refine_iters=REFINE_ITERS)
    a = assign_clusters(e, cent_a).orderBy("vec_id").collect()
    b = assign_clusters(e, cent_b).orderBy("vec_id").collect()
    assert [r.cluster for r in a] == [r.cluster for r in b]
    assert [h["n_assigned"] for h in hist_a] == [h["n_assigned"] for h in hist_b]
    ca = np.array([r.cv for r in cent_a.orderBy("list_id").collect()])
    cb = np.array([r.cv for r in cent_b.orderBy("list_id").collect()])
    assert np.allclose(ca, cb, rtol=1e-9, atol=1e-12)


def test_empty_cluster_keeps_centroid(spark):
    pts = spark.createDataFrame(
        [(i, [float(i) / 100.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    far = [100.0, 100.0]
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, far)], "list_id bigint, cv array<double>"
    )
    out, hist = kmeans_refine(pts, cents, iters=2)
    rows = {r.list_id: r.cv for r in out.collect()}
    assert rows[1] == far  # never won a point, never moved
    assert all(h["n_empty"] == 1 and h["n_assigned"] == 5 for h in hist)
    assert rows[0] == pytest.approx([0.02, 0.0])  # mean of the 5 points


def test_null_vectors_excluded_everywhere(spark):
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "list_id bigint, cv array<double>"
    )
    _, hist = kmeans_refine(pts, cents, iters=1)
    assert hist[0]["n_assigned"] == 2
    assigned = assign_clusters(pts, cents)
    assert assigned.count() == 2  # the IVF kernel drops NULLs too


def test_max_k_guard(spark):
    cents = spark.range(MAX_K + 1).select(
        F.col("id").alias("list_id"), F.array(F.lit(0.0)).alias("cv")
    )
    pts = spark.createDataFrame([(0, [0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="MAX_K"):
        kmeans_refine(pts, cents, iters=1)


def test_corpus_pass_is_zero_shuffle(spark, sf_dir):
    """The per-iteration corpus scan (vectors attached) must not shuffle;
    only the skinny partial rows may hit an exchange downstream."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c = np.zeros((4, 64))
    plan = (
        _iteration_partials(e, "embedding", c, (c * c).sum(1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_assignment_and_profile_arithmetic(spark):
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 2.0]), (2, [10.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0])], "list_id bigint, cv array<double>"
    )
    prof = {
        r.cluster: (r.n, r.mean_sq_dist)
        for r in cluster_profile(assign_clusters(pts, cents), cents).collect()
    }
    assert prof == {0: (2, 2.0), 1: (1, 0.0)}


def test_tracker_registered_after_gate():
    from yelp_business_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    assert names.index("kmeans_clusters_panel") >= 50
    assert QUERIES["kmeans_clusters_panel"].oracle is None


def test_tracker_panel_shape(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["kmeans_clusters_panel"].spark(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert [r.cluster for r in rows] == sorted(r.cluster for r in rows)
    assert sum(r.n for r in rows) == n_vecs  # every vector lands somewhere
    assert all(r.mean_sq_dist >= 0 for r in rows)
