"""N-gram LM perplexity filtering (operators/ppl.py): exact DuckDB twin
on the real corpus, a from-scratch Stupid Backoff python model, empty /
OOV document handling, tercile determinism, and layout invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.ppl import (
    BACKOFF_ALPHA,
    doc_token_stream,
    fit_bigram_lm,
    perplexity_terciles,
    score_perplexity,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


FIXTURE = [
    (1, "a b a b a"),
    (2, "a b c"),
    (3, "c c c c"),
    (4, "a q"),  # 'a q' bigram unseen elsewhere
    (5, ""),     # tokenless
    (6, None),   # NULL text
]


# ---------------------------------------------------------------------------
# from-scratch python model
# ---------------------------------------------------------------------------


def _py_ppl(texts, alpha=BACKOFF_ALPHA):
    toks = {i: [w for w in (t or "").split(" ") if w] for i, t in texts}
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = sum(uni.values())
    out = {}
    for i, ws in toks.items():
        if not ws:
            out[i] = None
            continue
        logs = []
        for pos, w in enumerate(ws):
            w1 = ws[pos - 1] if pos > 0 else None
            if w1 is not None and (w1, w) in bi:
                s = bi[(w1, w)] / uni[w1]
            else:
                s = (alpha if pos > 0 else 1.0) * uni.get(w, 1) / total
            logs.append(-math.log10(s))
        out[i] = round(10.0 ** (sum(logs) / len(logs)), 6)
    return out


def test_scores_match_python_model_exactly(spark):
    d = _docs(spark, FIXTURE)
    got = {
        r.doc_id: (r.n_scored, r.ppl)
        for r in score_perplexity(d, fit_bigram_lm(d)).collect()
    }
    want = _py_ppl(FIXTURE)
    for i, _ in FIXTURE:
        n_toks = len([w for w in (dict(FIXTURE)[i] or "").split(" ") if w])
        assert got[i][0] == n_toks, i
        if want[i] is None:
            assert got[i][1] is None, i  # tokenless docs survive, NULL ppl
        else:
            assert got[i][1] == pytest.approx(want[i], abs=2e-6), i


def test_oov_and_unseen_bigram_backoff(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "b c")])
    lm = fit_bigram_lm(train)
    # 'z' never trained (OOV -> 1/total floor); 'c a' bigram unseen
    test = _docs(spark, [(10, "z z"), (11, "c a")])
    got = {r.doc_id: r.ppl for r in score_perplexity(test, lm).collect()}
    total = 6  # a:2 b:3 c:1
    z = [-math.log10(1 / total), -math.log10(BACKOFF_ALPHA * 1 / total)]
    ca = [-math.log10(1 / total), -math.log10(BACKOFF_ALPHA * 2 / total)]
    assert got[10] == pytest.approx(round(10 ** (sum(z) / 2), 6), abs=2e-6)
    assert got[11] == pytest.approx(round(10 ** (sum(ca) / 2), 6), abs=2e-6)


def test_token_stream_shape_and_sentinel(spark):
    d = _docs(spark, [(1, "x y"), (2, "")])
    rows = sorted(
        (r.doc_id, r.pos, r.w1, r.w2) for r in doc_token_stream(d, "doc_id", "text").collect()
    )
    assert rows == [(1, 0, None, "x"), (1, 1, "x", "y"), (2, None, None, None)]


def test_terciles_are_deterministic_and_ordered(spark):
    scored = spark.createDataFrame(
        [(i, "en", float(100 - i)) for i in range(9)],
        "doc_id long, lang string, ppl double",
    )
    b = perplexity_terciles(scored).collect()
    by_bucket: dict[str, list] = {}
    for r in b:
        by_bucket.setdefault(r.bucket_name, []).append(r.ppl)
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3
    }
    assert max(by_bucket["head"]) < min(by_bucket["middle"])
    assert max(by_bucket["middle"]) < min(by_bucket["tail"])


def test_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con

    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        PERPLEXITY_BUCKET_ORACLE,
    )

    got = sorted(
        tuple(r)
        for r in QUERIES["perplexity_bucket_panel"].spark(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck_con(sf_dir).execute(PERPLEXITY_BUCKET_ORACLE).fetchall()
    )
    assert len(got) > 0 and got == want


def test_scoring_is_layout_invariant(spark):
    d = _docs(spark, FIXTURE)
    lm = fit_bigram_lm(d)
    s1 = sorted(tuple(r) for r in score_perplexity(d, lm).collect())
    d7 = d.repartition(7)
    s2 = sorted(tuple(r) for r in score_perplexity(d7, fit_bigram_lm(d7)).collect())
    assert s1 == s2


def test_terciles_rank_null_ppl_last_not_head(spark):
    """Tokenless docs (NULL ppl) must NEVER land in the 'head' tercile:
    Spark's default NULLS FIRST would rank garbage as the most fluent
    slice AND diverge from SQL ASC (NULLS LAST) — asc_nulls_last pinned."""
    scored = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(1, 7)] + [(99, "en", None)],
        "doc_id long, lang string, ppl double",
    )
    b = {r.doc_id: r.bucket_name for r in perplexity_terciles(scored).collect()}
    assert b[99] == "tail"
    assert b[1] == "head"


def test_threshold_buckets_agree_with_ntile_modulo_boundary_ties(spark, sf_dir):
    """The scale-safe threshold path (approx_percentile cuts + broadcast
    join — no per-lang global sort) must agree with the exact ntile path
    everywhere except boundary ties: ntile splits equal-COUNT, thresholds
    split by VALUE, so only docs whose rounded ppl equals one of the two
    per-lang cut values (or sits inside the sketch's rank-error window,
    zero here at accuracy=1e5 >> corpus size) may differ."""
    from yelp_business_data_pipeline_spark.operators.ppl import (
        perplexity_threshold_buckets,
        perplexity_thresholds,
    )
    from yelp_business_data_pipeline_spark.plans.registry import tbl

    d = tbl(spark, sf_dir, "documents")
    scored = score_perplexity(d, fit_bigram_lm(d), carry=("lang",)).filter(
        F.col("ppl").isNotNull()
    )
    nt = {r.doc_id: r.bucket_name for r in perplexity_terciles(scored).collect()}
    th = {
        r.doc_id: r.bucket_name
        for r in perplexity_threshold_buckets(scored).collect()
    }
    assert set(nt) == set(th) and len(nt) > 50
    cuts = {
        r.lang: {r.ppl_cut_1, r.ppl_cut_2}
        for r in perplexity_thresholds(scored).collect()
    }
    ppl = {r.doc_id: (r.lang, r.ppl) for r in scored.collect()}
    diff = [i for i in nt if nt[i] != th[i]]
    for i in diff:
        lang, p = ppl[i]
        assert p in cuts[lang], (
            f"doc {i} bucket differs ({nt[i]} vs {th[i]}) but its "
            f"ppl {p} is not a boundary value {cuts[lang]}"
        )
    # the disagreement set must be a small minority, not a third of a lang
    assert len(diff) <= max(3, len(nt) // 20), (len(diff), len(nt))


def test_threshold_buckets_plan_has_no_window_sort(spark, sf_dir):
    """The plan pin behind the 100-TB claim: the threshold path must
    contain NO Window operator (the ntile path's per-lang global sort)
    and must bucket via a broadcast join of the percentile aggregate."""
    from yelp_business_data_pipeline_spark.operators.ppl import (
        perplexity_threshold_buckets,
    )
    from yelp_business_data_pipeline_spark.plans.registry import tbl

    d = tbl(spark, sf_dir, "documents")
    scored = score_perplexity(d, fit_bigram_lm(d), carry=("lang",)).filter(
        F.col("ppl").isNotNull()
    )
    plan = (
        perplexity_threshold_buckets(scored)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan
    # approx_percentile is a TypedImperativeAggregate: ObjectHashAggregate,
    # partial-aggregated map-side (never SortAggregate — the countDistinct
    # mixing trap pinned in test_plans.py)
    assert "ObjectHashAggregate" in plan and "SortAggregate" not in plan


def test_threshold_buckets_null_ppl_and_tokenless_docs_land_in_tail(spark):
    from yelp_business_data_pipeline_spark.operators.ppl import (
        perplexity_threshold_buckets,
    )

    scored = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(1, 7)] + [(99, "en", None)],
        "doc_id long, lang string, ppl double",
    )
    b = {
        r.doc_id: r.bucket_name
        for r in perplexity_threshold_buckets(scored).collect()
    }
    assert b[99] == "tail" and b[1] == "head" and b[6] == "tail"


def test_threshold_buckets_null_group_key_is_its_own_group(spark):
    """Lang-ID failures (NULL group key) are routine on crawl data; they
    must bucket against THEIR OWN cut points (eqNullSafe join), exactly
    like the ntile path partitions them — not be silently forced into
    'tail' by a never-matching equi-join."""
    from yelp_business_data_pipeline_spark.operators.ppl import (
        perplexity_threshold_buckets,
    )

    scored = spark.createDataFrame(
        [(i, None, float(i)) for i in range(1, 10)]
        + [(100 + i, "en", float(i)) for i in range(1, 10)],
        "doc_id long, lang string, ppl double",
    )
    th = {r.doc_id: r.bucket_name for r in perplexity_threshold_buckets(scored).collect()}
    nt = {r.doc_id: r.bucket_name for r in perplexity_terciles(scored).collect()}
    assert th == nt  # unique ppls, exact cuts: full agreement incl. NULL lang
    assert {th[1], th[5], th[9]} == {"head", "middle", "tail"}


def test_frozen_cuts_unseen_group_is_no_cuts_never_silent_tail(spark):
    """Frozen-model regime: a language absent from the reference-corpus
    cuts frame must come back bucket 'no_cuts' — the screen has no
    opinion about a language it was not fit on; silently calling it
    'tail' would discard whole languages invisibly."""
    from yelp_business_data_pipeline_spark.operators.ppl import bucket_by_thresholds

    scored = spark.createDataFrame(
        [(1, "en", 2.0), (2, "de", 2.0), (3, "de", None)],
        "doc_id long, lang string, ppl double",
    )
    cuts = spark.createDataFrame(
        [("en", 1.5, 3.0)], "lang string, ppl_cut_1 double, ppl_cut_2 double"
    )
    b = {r.doc_id: r.bucket_name for r in bucket_by_thresholds(scored, cuts).collect()}
    # seen lang buckets normally; unseen lang with a REAL ppl is no_cuts;
    # tokenless (NULL ppl) stays tail regardless of cuts availability
    assert b == {1: "middle", 2: "no_cuts", 3: "tail"}
    # and the composed screen drops no_cuts docs VISIBLY (ppl_ok False
    # through membership, with ppl_bucket naming why) — checked where
    # pretrain_screen maps buckets (bucket_name.isin('head','middle'))
