"""Learned quality classifier (operators/qualityclf.py): trained weights
vs a from-scratch python model (bit equality), the distributed scoring
layer vs a DuckDB twin evaluating the same exported weights, the
deterministic Pareto keep rule vs its closed-form inverse-CDF, layout
invariance, the training-collect guard, and panel non-vacuousness."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.qualityclf import (
    QualityModel,
    pareto_keep,
    score_quality,
    train_quality_classifier,
)

B = 64  # small bucket count so tests exercise collisions too


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


FIXTURE = [
    (1, "en", "data row fast window data hash"),
    (2, "en", "window data data merge key"),
    (3, "en", "fast fast row row data"),
    (4, "de", "slow batch column table column"),
    (5, "de", "table batch slow slow key"),
    (6, "fr", "merge agg line query part"),
    (7, "fr", ""),  # gramless: scores sigmoid(bias)
    (8, "zh", "value merge agg column column line"),
]


# ---------------------------------------------------------------------------
# from-scratch python model (independent construction, dsir-test style)
# ---------------------------------------------------------------------------


def _py_hash(s: str, salt: str) -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:8], 16)


def _py_buckets(text: str | None, buckets: int, salt: str) -> dict[int, int]:
    toks = [t for t in (text or "").split(" ") if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out: dict[int, int] = {}
    for g in grams:
        b = _py_hash(g, salt) % buckets
        out[b] = out.get(b, 0) + 1
    return out


def _py_train(rows, buckets, salt, epochs, lr, l2):
    """Independent trainer: same spec (L1-normalized hashed grams,
    full-batch Adagrad, lowest-id order), separate code path."""
    rows = sorted(rows)  # (doc_id, y, text) in id order
    n = len(rows)
    X = np.zeros((n, buckets))
    y = np.zeros(n)
    for i, (_, yy, text) in enumerate(rows):
        y[i] = yy
        bb = _py_buckets(text, buckets, salt)
        tot = float(sum(bb.values()))
        for b, c in bb.items():
            X[i, b] = c / tot
    w = np.zeros(buckets)
    b = 0.0
    gw2 = np.zeros(buckets)
    gb2 = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        gw = (X.T @ g) / n + l2 * w
        gb = float(g.mean())
        gw2 += gw * gw
        gb2 += gb * gb
        w -= lr * gw / np.sqrt(gw2 + 1e-8)
        b -= lr * gb / (gb2 + 1e-8) ** 0.5
    return w, b


def _py_score(text, w, bias, buckets, salt):
    bb = _py_buckets(text, buckets, salt)
    n = sum(bb.values())
    z = bias + (sum(c * w[b] for b, c in bb.items()) / n if n else 0.0)
    return 1.0 / (1.0 + math.exp(-z))


def test_trained_weights_match_python_model_bit_exactly(spark):
    d = _docs(spark, FIXTURE)
    m = train_quality_classifier(
        d, F.col("lang") == "en", buckets=B, n_train=100, epochs=50, lr=1.0, l2=1e-4
    )
    w, bias = _py_train(
        [(i, int(lang == "en"), t) for i, lang, t in FIXTURE],
        B, "qclf:", epochs=50, lr=1.0, l2=1e-4,
    )
    assert m.bias == bias  # identical float ops in identical order
    assert np.array_equal(np.array(m.weights), w)
    assert m.n_train == len(FIXTURE)


def test_distributed_scores_match_python_and_duckdb_twin(spark):
    import duckdb

    d = _docs(spark, FIXTURE)
    m = train_quality_classifier(
        d, F.col("lang") == "en", buckets=B, n_train=100, epochs=50, lr=1.0, l2=1e-4
    )
    got = {r.doc_id: r.quality_score for r in score_quality(d, m).collect()}
    # python model
    for i, _, t in FIXTURE:
        assert got[i] == pytest.approx(
            _py_score(t, np.array(m.weights), m.bias, B, "qclf:"), rel=1e-9
        )
    # gramless doc scores exactly sigmoid(bias)
    assert got[7] == pytest.approx(1.0 / (1.0 + math.exp(-m.bias)), rel=1e-12)
    # DuckDB twin over the SAME exported weights (md5 features + sigmoid)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, t) for i, _, t in FIXTURE]
    )
    con.execute("CREATE TABLE wtab (bucket BIGINT, w DOUBLE)")
    con.executemany(
        "INSERT INTO wtab VALUES (?, ?)",
        [(b, v) for b, v in enumerate(m.weights) if v != 0.0],
    )
    twin = con.execute(f"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
          FROM docs
        ), grams AS (
          SELECT doc_id, unnest(
            t || CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                 ELSE []::VARCHAR[] END) AS g
          FROM toks
        ), hb AS (
          SELECT doc_id,
                 (('0x' || substr(md5('qclf:' || g), 1, 8))::BIGINT % {B}) AS bucket
          FROM grams
        ), dots AS (
          SELECT hb.doc_id, SUM(coalesce(wtab.w, 0)) AS dot, COUNT(*) AS n
          FROM hb LEFT JOIN wtab USING (bucket) GROUP BY 1
        )
        SELECT d.doc_id,
               1.0 / (1.0 + exp(-({m.bias} + coalesce(dot / n, 0)))) AS score
        FROM docs d LEFT JOIN dots USING (doc_id)
    """).fetchall()
    for doc_id, score in twin:
        assert got[doc_id] == pytest.approx(score, rel=1e-9), doc_id


def test_pareto_keep_matches_inverse_cdf_model(spark):
    d = _docs(spark, FIXTURE).select(
        "doc_id", (F.col("doc_id") / 10.0).alias("s")
    )
    got = {
        r.doc_id: r.keep
        for r in d.select(
            "doc_id", pareto_keep("s", "doc_id", alpha=9.0).alias("keep")
        ).collect()
    }
    for i, _, _ in FIXTURE:
        u = (_py_hash(str(i), "qclf-pareto:")) / float(1 << 32)
        draw = (1.0 - u) ** (-1.0 / 9.0) - 1.0
        assert got[i] == (i / 10.0 > 1.0 - draw), i


def test_training_and_scoring_are_layout_invariant(spark):
    d = _docs(spark, FIXTURE)
    kw = dict(buckets=B, n_train=100, epochs=50, lr=1.0, l2=1e-4)
    m1 = train_quality_classifier(d, F.col("lang") == "en", **kw)
    m2 = train_quality_classifier(d.repartition(7), F.col("lang") == "en", **kw)
    assert m1 == m2  # bit-identical weights regardless of layout
    s1 = sorted(tuple(r) for r in score_quality(d, m1).collect())
    s2 = sorted(tuple(r) for r in score_quality(d.repartition(5), m1).collect())
    assert s1 == s2


def test_train_collect_guard_raises_loudly(spark):
    d = _docs(spark, FIXTURE)
    with pytest.raises(ValueError, match="max_rows"):
        train_quality_classifier(
            d, F.col("lang") == "en", buckets=B, n_train=100, max_rows=3
        )
    with pytest.raises(ValueError, match="empty training sample"):
        train_quality_classifier(
            d.filter(F.lit(False)), F.col("lang") == "en", buckets=B
        )


def test_n_train_bounds_the_sample_deterministically(spark):
    d = _docs(spark, FIXTURE)
    kw = dict(buckets=B, epochs=50, lr=1.0, l2=1e-4)
    m3a = train_quality_classifier(d, F.col("lang") == "en", n_train=3, **kw)
    m3b = train_quality_classifier(
        d.repartition(4), F.col("lang") == "en", n_train=3, **kw
    )
    assert m3a.n_train == 3 and m3a == m3b  # same 3 docs whatever the layout


def test_panel_is_nonvacuous_and_separates_the_reference_slice(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["quality_classifier_panel"].spark(spark, sf_dir).collect()
    assert len(rows) > 0
    en = [r for r in rows if r.lang == "en"]
    rest = [r for r in rows if r.lang != "en"]
    en_avg = sum(r.avg_score * r.n_docs for r in en) / sum(r.n_docs for r in en)
    rest_avg = sum(r.avg_score * r.n_docs for r in rest) / sum(
        r.n_docs for r in rest
    )
    # the classifier must actually separate the reference slice
    assert en_avg > rest_avg + 0.3
    assert sum(r.n_kept for r in en) > sum(r.n_kept for r in rest)
    # and the keep rule keeps SOME docs without keeping everything
    kept = sum(r.n_kept for r in rows)
    total = sum(r.n_docs for r in rows)
    assert 0 < kept < total


def test_score_quality_requires_matching_model_config(spark):
    """Scoring replays the model's own buckets/salt — a model scored on
    a frame is self-consistent by construction (config rides the
    QualityModel, not the call site)."""
    d = _docs(spark, FIXTURE)
    m = QualityModel(weights=(0.5,) * B, bias=0.25, buckets=B, salt="qclf:")
    out = score_quality(d, m).collect()
    # every real-gram doc: dot/n == 0.5 exactly (all weights equal)
    for r in out:
        if r.doc_id != 7:
            assert r.quality_score == pytest.approx(
                1.0 / (1.0 + math.exp(-0.75)), rel=1e-12
            )


def test_scoring_plan_is_one_shuffle_with_broadcast_weights(spark):
    """The docstring's scale claim, pinned: scoring = broadcast weight
    join + exactly ONE shuffle exchange (the groupBy(doc))."""
    d = _docs(spark, FIXTURE)
    m = QualityModel(weights=(0.5,) * B, bias=0.0, buckets=B, salt="qclf:")
    plan = score_quality(d, m)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan


def test_null_predicate_labels_do_not_poison_training(spark):
    """lang IS NULL (routine in crawl data) must train as 'not the
    reference class', never as a NaN label — one NaN poisons every
    weight in epoch 1 and returns a silent all-NaN model."""
    rows = FIXTURE + [(9, None, "crawl page with unknown language here")]
    d = _docs(spark, rows)
    m = train_quality_classifier(
        d, F.col("lang") == "en", buckets=B, n_train=100, epochs=50, lr=1.0, l2=1e-4
    )
    assert all(np.isfinite(v) for v in m.weights) and np.isfinite(m.bias)
    # identical to training with the NULL row explicitly labeled 0
    w, bias = _py_train(
        [(i, int(lang == "en"), t) for i, lang, t in rows],
        B, "qclf:", epochs=50, lr=1.0, l2=1e-4,
    )
    assert m.bias == bias and np.array_equal(np.array(m.weights), w)


def test_model_json_roundtrip_is_exact(spark, tmp_path):
    d = _docs(spark, FIXTURE)
    m = train_quality_classifier(
        d, F.col("lang") == "en", buckets=B, n_train=100, epochs=50, lr=1.0, l2=1e-4
    )
    from yelp_business_data_pipeline_spark.operators.qualityclf import (
        load_quality_model,
        save_quality_model,
    )

    p = str(tmp_path / "clf.json")
    save_quality_model(m, p)
    m2 = load_quality_model(p)
    assert m2 == m  # bit-exact: shortest-round-trip float repr
    s1 = sorted(tuple(r) for r in score_quality(d, m).collect())
    s2 = sorted(tuple(r) for r in score_quality(d, m2).collect())
    assert s1 == s2


def test_persistence_is_atomic_and_validated(spark, tmp_path):
    import os

    from yelp_business_data_pipeline_spark.operators.qualityclf import (
        load_quality_model,
        save_quality_model,
    )

    m = QualityModel(weights=(0.5,) * B, bias=0.25, buckets=B, salt="qclf:")
    p = str(tmp_path / "clf.json")
    save_quality_model(m, p)
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]  # no debris
    # inconsistent model refuses to persist
    bad = QualityModel(weights=(0.5,) * (B - 1), bias=0.0, buckets=B, salt="q:")
    with pytest.raises(ValueError, match="refusing to persist"):
        save_quality_model(bad, str(tmp_path / "bad.json"))
    # NaN weights refuse strict JSON (loud, not non-RFC tokens)
    nan = QualityModel(weights=(float("nan"),) * B, bias=0.0, buckets=B, salt="q:")
    with pytest.raises(ValueError):
        save_quality_model(nan, str(tmp_path / "nan.json"))
    # a truncated/hand-edited artifact refuses to load
    import json as _json

    d = _json.load(open(p))
    d["weights"] = d["weights"][: B - 1]
    _json.dump(d, open(str(tmp_path / "trunc.json"), "w"))
    with pytest.raises(ValueError, match="refusing to score"):
        load_quality_model(str(tmp_path / "trunc.json"))
