"""Weighted sampling (sampling.weighted_sample): python-model equality,
determinism/repartition invariance, weight-proportionality, edge cases,
and the TakeOrdered global plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.sampling import weighted_sample


def _unit(key, salt="ws:"):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def _model(rows, k, stratum=False, salt="ws:"):
    """Independent A-ES recomputation: k smallest -ln(u)/w (per stratum)."""
    scored = []
    for r in rows:
        key, w = r[0], r[-1]
        s = r[1] if stratum else None
        if key is None or w is None or w <= 0:
            continue
        u = _unit(key, salt)
        race = math.inf if u == 0.0 else -math.log(u) / w
        scored.append((s, race, key))
    out = {}
    for s in {x[0] for x in scored}:
        grp = sorted((r, k2) for s2, r, k2 in scored if s2 == s)[:k]
        for i, (_, key) in enumerate(grp):
            out[key] = (s, i + 1)
    return out


def test_global_matches_python_model(spark):
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = {r.k: r.sample_rank for r in weighted_sample(df, "k", "w", 10).collect()}
    want = {k: rk for k, (_, rk) in _model(rows, 10).items()}
    assert got == want and len(got) == 10


def test_stratified_matches_python_model(spark):
    rows = [(i, "s" + str(i % 3), float(1 + i % 5)) for i in range(150)]
    df = spark.createDataFrame(rows, "k long, s string, w double")
    got = {
        r.k: (r.s, r.sample_rank)
        for r in weighted_sample(df, "k", "w", 7, stratum="s").collect()
    }
    assert got == _model(rows, 7, stratum=True)
    assert len(got) == 21


def test_repartition_invariance(spark):
    rows = [(i, float(1 + i % 11)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, w double")
    a = {r.k for r in weighted_sample(df, "k", "w", 25).collect()}
    b = {r.k for r in weighted_sample(df.repartition(17), "k", "w", 25).collect()}
    assert a == b


def test_weight_proportionality(spark):
    # one heavy item (weight 50) among 50 light items (weight 1): across
    # 40 independent salts, the heavy item must be drawn (k=1) in the
    # majority of draws — its inclusion probability is 50/100.
    rows = [(0, 50.0)] + [(i, 1.0) for i in range(1, 51)]
    df = spark.createDataFrame(rows, "k long, w double")
    hits = sum(
        weighted_sample(df, "k", "w", 1, salt=f"t{j}:").collect()[0].k == 0
        for j in range(40)
    )
    assert 10 <= hits <= 35  # E[hits]=20, P(outside [10,35]) < 1e-3


def test_edge_cases(spark):
    rows = [(1, 1.0), (2, 0.0), (3, -1.0), (4, None), (None, 5.0)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = {r.k for r in weighted_sample(df, "k", "w", 10).collect()}
    assert got == {1}  # zero/negative/NULL weights and NULL keys drop
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample(df, "k", "w", 0)


def test_global_plan_is_take_ordered(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = weighted_sample(o, "o_orderkey", "o_totalprice", 20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_zero_hash_draw_races_last_not_first(spark, monkeypatch):
    # Regression: Spark's ln(0) is NULL and NULLs sort FIRST ascending —
    # a zero draw must map to +inf (loses to every positive draw) per
    # the paper's u^(1/w) = 0 convention, not silently win rank 1.
    import yelp_business_data_pipeline_spark.operators.sampling as S

    real = S.hash_unit
    monkeypatch.setattr(
        S,
        "hash_unit",
        lambda key, salt="": F.when(F.col(key) == 0, F.lit(0.0)).otherwise(
            real(key, salt)
        ),
    )
    rows = [(i, 1.0) for i in range(6)]
    df = spark.createDataFrame(rows, "k long, w double")
    top3 = {r.k for r in S.weighted_sample(df, "k", "w", 3).collect()}
    assert 0 not in top3  # loses while >= k positive-draw rows exist
    all_ranks = {r.k: r.sample_rank for r in S.weighted_sample(df, "k", "w", 6).collect()}
    assert all_ranks[0] == 6  # selected only as the last resort, ranked last


# ---------------------------------------------------------------------------
# temperature mixing (sampling.temperature_mix_rates / temperature_sample)
# ---------------------------------------------------------------------------

TMIX_DOCS = [
    # (doc_id, domain, tok) — skewed 3-domain corpus
    *[(i, "big", 100) for i in range(40)],
    *[(i, "mid", 100) for i in range(40, 55)],
    *[(i, "small", 100) for i in range(55, 60)],
    (60, "empty", 0),  # zero-token domain
]


def _round9(x: float) -> float:
    """Spark/DuckDB ROUND (half away from zero; inputs here positive) —
    NOT python's banker's round."""
    return math.floor(x * 1e9 + 0.5) / 1e9


def _tmix_model(rows, alpha, budget, salt="tmix:"):
    tot = {}
    for _i, d, t in rows:
        tot[d] = tot.get(d, 0) + t
    z = sum(t**alpha for t in tot.values() if t > 0)
    rates = {}
    for d, t in tot.items():
        if t == 0:
            rates[d] = (t, 0.0, 0.0, 0.0)
        else:
            q = t**alpha / z
            raw = budget * q / t
            rates[d] = (t, _round9(q), _round9(min(1.0, raw)), _round9(raw))
    kept = {
        i
        for i, d, _t in rows
        if tot[d] > 0 and _unit(i, salt) < rates[d][2]
    }
    return rates, kept


def test_temperature_rates_match_python_model(spark):
    from yelp_business_data_pipeline_spark.operators.sampling import (
        temperature_mix_rates,
    )

    df = spark.createDataFrame(TMIX_DOCS, "doc_id long, domain string, tok long")
    got = {
        r["domain"]: (r["tokens"], r["share"], r["rate"], r["implied_epochs"])
        for r in temperature_mix_rates(df, "domain", "tok", 0.5, 3000).collect()
    }
    model, _ = _tmix_model(TMIX_DOCS, 0.5, 3000)
    assert got == model
    # the designed shape: cap marks up-sampling demand, never applied
    assert got["small"][2] == 1.0 and got["small"][3] > 1.0
    assert got["big"][2] < 1.0 and got["big"][2] == got["big"][3]
    # zero-token domain: rate 0.0, no NaN anywhere
    assert got["empty"] == (0, 0.0, 0.0, 0.0)
    # temperature flattens: small domain's share exceeds its natural p
    assert got["small"][1] > 500 / 6000


def test_temperature_sample_kept_set_is_exact_and_layout_free(spark):
    from yelp_business_data_pipeline_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(TMIX_DOCS, "doc_id long, domain string, tok long")
    _, kept_model = _tmix_model(TMIX_DOCS, 0.5, 3000)
    a = {
        r["doc_id"]
        for r in temperature_sample(df.repartition(7), "doc_id", "domain", "tok", 0.5, 3000).collect()
    }
    b = {
        r["doc_id"]
        for r in temperature_sample(df.coalesce(1), "doc_id", "domain", "tok", 0.5, 3000).collect()
    }
    assert a == b == kept_model
    # the capped domain keeps everything
    assert {i for i in a if 55 <= i < 60} == set(range(55, 60))


def test_temperature_guards(spark):
    from yelp_business_data_pipeline_spark.operators.sampling import (
        temperature_mix_rates,
    )

    df = spark.createDataFrame(TMIX_DOCS, "doc_id long, domain string, tok long")
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_rates(df, "domain", "tok", 0.0, 100)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_rates(df, "domain", "tok", 1.5, 100)
    with pytest.raises(ValueError, match="budget"):
        temperature_mix_rates(df, "domain", "tok", 0.5, 0)


def test_temperature_alpha_one_is_natural_mix(spark):
    """alpha=1 must reproduce natural shares: rate identical per domain
    (budget/T), so mixing changes nothing but global scale."""
    from yelp_business_data_pipeline_spark.operators.sampling import (
        temperature_mix_rates,
    )

    df = spark.createDataFrame(TMIX_DOCS, "doc_id long, domain string, tok long")
    rows = temperature_mix_rates(df, "domain", "tok", 1.0, 3000).collect()
    rates = {r["domain"]: r["rate"] for r in rows if r["tokens"] > 0}
    assert len(set(rates.values())) == 1
    assert abs(next(iter(rates.values())) - 3000 / 6000) < 1e-9


def test_temperature_mix_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        TEMPERATURE_MIX_ORACLE,
    )

    srows = [
        tuple(r)
        for r in QUERIES["temperature_mix_panel"].spark(spark, sf_dir).collect()
    ]
    drows = [
        tuple(r)
        for r in duck_con(sf_dir).execute(TEMPERATURE_MIX_ORACLE).fetchall()
    ]
    assert srows == drows
    # gated in the r10 rotation, demoted by the tenth r11 swap (the
    # like-for-like epoch_materialize_panel promotion) — the twin stays
    # exact here AND auto-stashed in DEMOTED_ORACLES for the mandatory
    # rotation-pin sweep
    from yelp_business_data_pipeline_spark.plans.registry import DEMOTED_ORACLES

    names = list(QUERIES)
    assert names.index("temperature_mix_panel") >= 50
    assert QUERIES["temperature_mix_panel"].oracle is None
    assert DEMOTED_ORACLES["temperature_mix_panel"] == TEMPERATURE_MIX_ORACLE


# ---------------------------------------------------------------------------
# UniMax allocation (sampling.unimax_mix_allocation)
# ---------------------------------------------------------------------------


def _unimax_model(tokens_by_domain, budget, e):
    """From-scratch waterfilling: sort caps asc, find the capped prefix,
    split the rest at the water level."""
    doms = sorted(tokens_by_domain.items(), key=lambda kv: (kv[1] * e, kv[0]))
    caps = [t * e for _, t in doms]
    n = len(doms)
    pfx = 0.0
    k, pk = 0, 0.0
    for j, c in enumerate(caps, 1):
        if pfx + c * (n - j + 1) <= budget:
            k, pk = j, pfx + c
        pfx += c
    u = (budget - pk) / (n - k) if k < n else None
    out = {}
    for j, (d, t) in enumerate(doms, 1):
        alloc = caps[j - 1] if j <= k else u
        out[d] = (
            t,
            _round9(caps[j - 1]),
            _round9(alloc),
            _round9(alloc / t) if t > 0 else 0.0,
            _round9(u) if u is not None else None,
        )
    return out


def _unimax_spark(spark, rows, budget, e):
    from yelp_business_data_pipeline_spark.operators.sampling import (
        unimax_mix_allocation,
    )

    df = spark.createDataFrame(rows, "doc_id long, domain string, tok long")
    return {
        r["domain"]: (
            r["tokens"], r["cap_tokens"], r["alloc_tokens"], r["epochs"],
            r["water_level"],
        )
        for r in unimax_mix_allocation(df, "domain", "tok", budget, e).collect()
    }


def test_unimax_matches_python_model_all_regimes(spark):
    tot = {"big": 4000, "mid": 1500, "small": 500, "empty": 0}
    for budget, e in [(3000, 2.0), (500, 1.0), (100000, 3.0), (5999, 1.0)]:
        got = _unimax_spark(spark, TMIX_DOCS, budget, e)
        assert got == _unimax_model(tot, budget, e), (budget, e)


def test_unimax_budget_conservation_and_cap(spark):
    got = _unimax_spark(spark, TMIX_DOCS, 3000, 2.0)
    # nobody's allocation exceeds its cap, and the budget is spent
    # exactly (some domain is uncapped at this budget)
    assert all(a <= c + 1e-6 for _t, c, a, _e, _u in got.values())
    assert abs(sum(a for _t, _c, a, _e, _u in got.values()) - 3000) < 1e-6
    # capped domains run at exactly max_epochs
    assert got["empty"][2] == 0.0 and got["empty"][3] == 0.0


def test_unimax_all_capped_leaves_budget_unspent_and_null_water(spark):
    got = _unimax_spark(spark, TMIX_DOCS, 100000, 3.0)
    assert all(u is None for *_x, u in got.values())
    for d, t in [("big", 4000), ("mid", 1500), ("small", 500)]:
        assert got[d][2] == t * 3.0 and got[d][3] == 3.0


def test_unimax_uniform_regime(spark):
    """Budget small enough that no cap binds: pure uniform split — the
    'fairer' end of UniMax."""
    got = _unimax_spark(spark, TMIX_DOCS, 500, 1.0)
    nonempty = [v for v in got.values() if v[0] > 0]
    # empty domain caps at 0 and exits; the rest split 500 three ways
    assert {v[2] for v in nonempty} == {_round9(500 / 3)}


def test_unimax_guards(spark):
    from yelp_business_data_pipeline_spark.operators.sampling import (
        unimax_mix_allocation,
    )

    df = spark.createDataFrame(TMIX_DOCS, "doc_id long, domain string, tok long")
    with pytest.raises(ValueError, match="budget"):
        unimax_mix_allocation(df, "domain", "tok", 0, 1.0)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_mix_allocation(df, "domain", "tok", 100, 0.0)


def test_unimax_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        UNIMAX_MIX_ORACLE,
    )

    srows = [
        tuple(r)
        for r in QUERIES["unimax_mix_panel"].spark(spark, sf_dir).collect()
    ]
    drows = [
        tuple(r) for r in duck_con(sf_dir).execute(UNIMAX_MIX_ORACLE).fetchall()
    ]
    assert srows == drows
    # promoted into the 50-slot gate in the r10 rotation (swap_gate_slot)
    names = list(QUERIES)
    assert names.index("unimax_mix_panel") < 50
    assert QUERIES["unimax_mix_panel"].oracle == UNIMAX_MIX_ORACLE


def test_temperature_sample_null_stratum_is_a_real_domain(spark):
    """lang-ID failure rows (NULL stratum) count in the normalizer AND
    get sampled at their own rate — a plain equi-join would silently
    drop them while still deflating every real domain's rate."""
    from yelp_business_data_pipeline_spark.operators.sampling import (
        temperature_mix_rates,
        temperature_sample,
    )

    rows = [(i, "en", 100) for i in range(20)] + [
        (i, None, 100) for i in range(20, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, tok long")
    rates = {
        r["domain"]: r["rate"]
        for r in temperature_mix_rates(df, "domain", "tok", 1.0, 2000).collect()
    }
    # equal-sized domains at alpha=1: both rates = 2000/4000 = 0.5
    assert rates == {"en": 0.5, None: 0.5}
    kept = temperature_sample(df, "doc_id", "domain", "tok", 1.0, 2000).collect()
    kept_null = [r for r in kept if r["domain"] is None]
    # the NULL domain is present in the sample, at its own rate's draws
    assert kept_null, "NULL-stratum rows were dropped by the rates join"
    expect = {
        i for i, d, _t in rows if d is None and _unit(i, "tmix:") < 0.5
    }
    assert {r["doc_id"] for r in kept_null} == expect


def test_temperature_sample_rates_join_is_broadcast(spark):
    """The corpus never shuffles for the rates join: the tiny domains
    frame broadcasts."""
    from yelp_business_data_pipeline_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(TMIX_DOCS, "doc_id long, domain string, tok long")
    plan = (
        temperature_sample(df, "doc_id", "domain", "tok", 0.5, 3000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_materialize_epochs_python_model(spark):
    """Exact copy counts recomputed from scratch (floor + replicated md5
    fractional draw); e<1 subsamples, e>1 up-samples, e==1 is identity;
    copy indexes are 1..n; layout-invariant."""
    import hashlib

    from yelp_business_data_pipeline_spark.operators.sampling import materialize_epochs

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "k bigint, s string")
    eps = {"a": 2.25, "b": 0.4, "c": 1.0}
    rates = spark.createDataFrame(list(eps.items()), "s string, epochs double")

    def draw(k):
        return int(hashlib.md5(f"ep:{k}".encode()).hexdigest()[:8], 16) / 2**32

    import math

    want = []
    for k, s in rows:
        e = eps[s]
        n = math.floor(e) + (1 if draw(k) < e - math.floor(e) else 0)
        want += [(k, s, c) for c in range(1, n + 1)]
    got = sorted(map(tuple, materialize_epochs(df, rates, "s", "k").collect()))
    assert got == sorted(want)
    # identity stratum: every row exactly once
    assert sum(1 for k, s, _ in got if s == "c") == sum(1 for _, s in rows if s == "c")
    # layout invariance
    again = sorted(
        map(tuple, materialize_epochs(df.repartition(7), rates, "s", "k").collect())
    )
    assert again == got


def test_materialize_epochs_guards(spark):
    import pytest

    from yelp_business_data_pipeline_spark.operators.sampling import materialize_epochs

    df = spark.createDataFrame([(1, "a"), (2, "zz")], "k bigint, s string")
    rates = spark.createDataFrame([("a", 1.5)], "s string, epochs double")
    # missing stratum raises IN-PLAN, loudly
    with pytest.raises(Exception, match="missing from the epochs frame|epochs outside"):
        materialize_epochs(df, rates, "s", "k").collect()
    ok = spark.createDataFrame([("a", 1.5), ("zz", 1.0)], "s string, epochs double")
    # fat-finger epoch cap
    big = spark.createDataFrame([("a", 500.0), ("zz", 1.0)], "s string, epochs double")
    with pytest.raises(Exception, match="epochs outside"):
        materialize_epochs(df, big, "s", "k").collect()
    # column collision + malformed rates frame
    with pytest.raises(ValueError, match="already exists"):
        materialize_epochs(
            materialize_epochs(df, ok, "s", "k"), ok, "s", "k"
        )
    with pytest.raises(ValueError, match="epochs frame needs"):
        materialize_epochs(df, ok.withColumnRenamed("epochs", "e"), "s", "k")


def test_materialize_epochs_zero_shuffle_plan(spark):
    from yelp_business_data_pipeline_spark.operators.sampling import materialize_epochs

    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    rates = spark.createDataFrame([("a", 1.5)], "s string, epochs double")
    plan = (
        materialize_epochs(df, rates, "s", "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_epoch_materialize_panel_matches_duckdb_twin(spark, sf_dir):
    """Rotation-queue twin pin: the registered panel must equal
    EPOCH_MATERIALIZE_ORACLE row-for-row — epoch table, floor +
    fractional md5 draw, and the per-lang audit re-derived in DuckDB;
    both sub- (fr 0.5) and up-sampling (es 3.0) strata are live."""
    from tests.oracle_harness import duck_con
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        EPOCH_MATERIALIZE_ORACLE,
    )

    srows = sorted(
        tuple(r) for r in QUERIES["epoch_materialize_panel"].spark(spark, sf_dir).collect()
    )
    drows = sorted(duck_con(sf_dir).execute(EPOCH_MATERIALIZE_ORACLE).fetchall())
    assert srows == drows and len(srows) == 5
    by_lang = {t[0]: t for t in srows}
    # de is the identity stratum; fr subsamples; es up-samples with max 3
    assert by_lang["de"][3] == by_lang["de"][1] and by_lang["de"][4] == 1
    assert by_lang["fr"][2] < by_lang["fr"][1]
    assert by_lang["es"][4] == 3 and by_lang["es"][3] == 3 * by_lang["es"][1]
    # gated by the tenth r11 swap (like-for-like mixing-family demotion
    # of temperature_mix_panel)
    names = list(QUERIES)
    assert names.index("epoch_materialize_panel") < 50
    assert QUERIES["epoch_materialize_panel"].oracle == EPOCH_MATERIALIZE_ORACLE
