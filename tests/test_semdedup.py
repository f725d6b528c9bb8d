"""SemDeDup semantic dedup (operators/semdedup.py): greedy-prefix model
equality, keep-rule ordering, idempotency, and layout independence."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_stats,
)


def _cos(a, b):
    na = math.sqrt(sum(x * x for x in a)) or 1.0
    nb = math.sqrt(sum(x * x for x in b)) or 1.0
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


def _greedy_model(rows, threshold):
    """The greedy prefix rule over ONE cluster, visit order = ascending id."""
    kept = []
    out = {}
    for vid, vec in sorted(rows):
        best, best_id = -1.0, None
        for kid, kvec in kept:
            s = _cos(vec, kvec)
            if s > best:
                best, best_id = s, kid
        if best > threshold:
            out[vid] = (False, best_id)
        else:
            out[vid] = (True, None)
            kept.append((vid, vec))
    return out


def _rand_rows(rng, n, dim=8, n_base=6):
    """Clustered corpus: a few base directions plus small jitter so real
    near-dups exist at cosine ~0.99."""
    bases = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_base)]
    rows = []
    for i in range(n):
        b = bases[i % n_base]
        rows.append((i, [x + rng.gauss(0, 0.02) for x in b]))
    return rows


def test_single_cluster_matches_greedy_model(spark):
    rng = random.Random(11)
    rows = _rand_rows(rng, 40)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        r.vec_id: (r.keep, r.dup_of)
        for r in semantic_dedup(df, threshold=0.98, n_clusters=1).collect()
    }
    want = _greedy_model(rows, 0.98)
    assert got == want
    assert sum(1 for k, _ in got.values() if k) < len(rows)  # dups existed


def test_multi_cluster_applies_model_within_each_cluster(spark):
    from yelp_business_data_pipeline_spark.operators.ivf import (
        ivf_index,
        train_ivf_centroids,
    )

    rng = random.Random(23)
    rows = _rand_rows(rng, 60)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = train_ivf_centroids(df, "vec_id", "v", n_lists=4)
    by_cluster: dict = {}
    for r in ivf_index(df, cents, "vec_id", "v").collect():
        by_cluster.setdefault(r.list_id, []).append((r.vec_id, list(r.v)))
    got = {
        r.vec_id: (r.keep, r.dup_of, r.list_id)
        for r in semantic_dedup(df, threshold=0.98, centroids=cents).collect()
    }
    assert len(got) == len(rows)
    for lid, members in by_cluster.items():
        want = _greedy_model(members, 0.98)
        for vid, (k, d) in want.items():
            assert got[vid] == (k, d, lid), vid


def test_layout_independence_and_chunk_boundaries(spark):
    rng = random.Random(5)
    rows = _rand_rows(rng, 50)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    base = {
        r.vec_id: (r.keep, r.dup_of)
        for r in semantic_dedup(df, threshold=0.98, n_clusters=2).collect()
    }
    # repartitioned input and a tiny chunk (forces in-chunk shadowing and
    # many chunk boundaries) must not change a single verdict
    for variant in (
        semantic_dedup(df.repartition(7), threshold=0.98, n_clusters=2),
        semantic_dedup(df, threshold=0.98, n_clusters=2, chunk=3),
    ):
        got = {r.vec_id: (r.keep, r.dup_of) for r in variant.collect()}
        assert got == base


def test_far_from_centroid_keeps_outskirts(spark):
    # two exact duplicates: whichever is visited first survives. With
    # min_id the lower id wins; far_from_centroid ranks by distance from
    # the cluster centroid, so seed a third point that drags the centroid
    # toward id 1, making id 2 the farther (first-visited) twin.
    rows = [
        (1, [1.0, 0.0]),
        (2, [2.0, 0.0]),  # same direction as 1 (cosine 1.0), farther out
        (3, [0.5, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    by_id = {
        r.vec_id: r.keep
        for r in semantic_dedup(df, threshold=0.99, n_clusters=1).collect()
    }
    assert by_id == {1: True, 2: False, 3: True}
    far = {
        r.vec_id: r.keep
        for r in semantic_dedup(
            df, threshold=0.99, n_clusters=1, keep="far_from_centroid"
        ).collect()
    }
    assert far == {1: False, 2: True, 3: True}


def test_idempotent_on_kept_set(spark):
    rng = random.Random(31)
    rows = _rand_rows(rng, 40)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    first = semantic_dedup(df, threshold=0.98, n_clusters=2)
    kept_ids = [r.vec_id for r in first.filter("keep").collect()]
    kept_df = df.filter(F.col("vec_id").isin(kept_ids))
    second = semantic_dedup(kept_df, threshold=0.98, n_clusters=2)
    assert all(r.keep for r in second.collect())


def test_stats_and_validation(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    v = semantic_dedup(df, threshold=0.9, n_clusters=1)
    s = semantic_dedup_stats(v).collect()[0]
    assert (s.n_vectors, s.n_kept, s.n_dups) == (3, 2, 1)
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, threshold=0.0)
    with pytest.raises(ValueError, match="keep rule"):
        semantic_dedup(df, keep="random")


def test_calibrate_threshold_hits_target(spark):
    """The calibrated threshold must land the ACTUAL kept fraction within
    tol of the target (the paper tunes to kept fraction, not raw cosine),
    and the calibration must compose with semantic_dedup end to end."""
    from yelp_business_data_pipeline_spark.operators.semdedup import (
        calibrate_threshold,
    )

    # isotropic vectors: neighbor cosines spread continuously, so every
    # kept fraction is reachable (the tight-base corpus of the model tests
    # is a STEP function — whole near-dup groups collapse at once and
    # mid-gap targets are legitimately unreachable, see the floor test)
    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    for target in (0.3, 0.6):
        cal = calibrate_threshold(df, target, n_clusters=4, tol=0.02)
        assert abs(cal["kept_fraction"] - target) <= 0.02, cal
        # the returned threshold reproduces that fraction on the corpus
        v = semantic_dedup(df, threshold=cal["threshold"], n_clusters=4)
        kept = v.agg(F.sum(F.col("keep").cast("long"))).collect()[0][0]
        assert abs(kept / len(rows) - target) <= 0.02, (cal, kept)
        assert 0.0 < cal["threshold"] <= 1.0 and cal["probes"] >= 1


def test_calibrate_threshold_validation_and_unreachable(spark):
    from yelp_business_data_pipeline_spark.operators.semdedup import (
        calibrate_threshold,
    )

    rng = random.Random(5)
    rows = _rand_rows(rng, 40, n_base=2)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    with pytest.raises(ValueError, match="target_kept_fraction"):
        calibrate_threshold(df, 0.0)
    with pytest.raises(ValueError, match="keep rule"):
        calibrate_threshold(df, 0.5, keep="last_write_wins")
    # a target below the always-kept floor (>= one point per cluster) is
    # unreachable: 2 tight clusters of 40 points -> floor 2/40 = 0.05
    with pytest.raises(RuntimeError, match="unreachable|no threshold"):
        calibrate_threshold(df, 0.021, n_clusters=2, tol=0.001, max_refine=4)


def test_calibrate_threshold_target_one_and_sampling(spark):
    from yelp_business_data_pipeline_spark.operators.semdedup import (
        calibrate_threshold,
    )

    rng = random.Random(9)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cal = calibrate_threshold(df, 1.0, n_clusters=2)
    assert cal["kept_fraction"] >= 0.98
    # deterministic sampling path: same result both runs
    a = calibrate_threshold(df, 0.5, n_clusters=2, sample_fraction=0.7, tol=0.05)
    b = calibrate_threshold(df, 0.5, n_clusters=2, sample_fraction=0.7, tol=0.05)
    assert a == b
