"""Hypothesis property sweeps for the round-11 session-2 operators:
preference pairs and epoch materialization equal their python models for
ARBITRARY inputs and partition layouts; the bag fingerprint is invariant
under token permutation/duplication and separates distinct vocabularies."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # group
            st.floats(min_value=0, max_value=1, allow_nan=False) | st.none(),
        ),
        min_size=1,
        max_size=60,
    ),
    st.floats(min_value=0, max_value=0.5, allow_nan=False),
    st.integers(min_value=1, max_value=5),
)
def test_preference_pairs_model_for_any_input(spark, rows, min_margin, n_parts):
    from yelp_business_data_pipeline_spark.operators.preference import preference_pairs

    data = [(f"g{g}", i, s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "grp string, id bigint, score double"
    ).repartition(n_parts)
    got = sorted(
        tuple(r)
        for r in preference_pairs(df, ["grp"], "id", "score", min_margin=min_margin).collect()
    )
    groups: dict = {}
    for g, i, s in data:
        if s is not None:
            groups.setdefault(g, []).append((s, i))
    want = []
    for g, cand in groups.items():
        best, worst = max(cand), min(cand)
        margin = round(best[0] - worst[0], 9)
        if best[1] != worst[1] and margin >= min_margin:
            want.append((g, best[1], worst[1], best[0], worst[0], margin, len(cand)))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # stratum
            st.integers(min_value=0, max_value=10_000), # key
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.lists(
        st.floats(min_value=0, max_value=4, allow_nan=False),
        min_size=4,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_materialize_epochs_model_for_any_input(spark, rows, eps, n_parts):
    from yelp_business_data_pipeline_spark.operators.sampling import materialize_epochs

    df = spark.createDataFrame(
        [(k, f"s{g}") for g, k in rows], "k bigint, s string"
    ).repartition(n_parts)
    rates = spark.createDataFrame(
        [(f"s{i}", e) for i, e in enumerate(eps)], "s string, epochs double"
    )
    got = sorted(map(tuple, materialize_epochs(df, rates, "s", "k").collect()))

    def draw(k):
        return int(hashlib.md5(f"ep:{k}".encode()).hexdigest()[:8], 16) / 2**32

    want = []
    for g, k in rows:
        e = eps[g]
        n = math.floor(e) + (1 if draw(k) < e - math.floor(e) else 0)
        want += [(k, f"s{g}", c) for c in range(1, n + 1)]
    assert got == sorted(want)
    # conservation in expectation is exact per stratum at the copy level:
    # every key's copy count is floor(e) or floor(e)+1
    per_key: dict = {}
    for k, _, c in got:
        per_key[k] = max(per_key.get(k, 0), c)
    for g, k in rows:
        e = eps[g]
        if k in per_key:
            assert per_key[k] in (math.floor(e), math.floor(e) + 1)
        else:
            assert math.floor(e) == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4),
        min_size=1,
        max_size=8,
    ),
    st.randoms(use_true_random=False),
)
def test_bag_fingerprint_order_and_multiplicity_invariant(spark, toks, rng):
    from yelp_business_data_pipeline_spark.operators.text import bag_fingerprint

    shuffled = list(toks)
    rng.shuffle(shuffled)
    duplicated = shuffled + [rng.choice(toks)]
    other = toks + ["zzz-never-in-alphabet"]
    df = spark.createDataFrame(
        [
            (" ".join(toks),),
            (" ".join(shuffled),),
            (" ".join(duplicated),),
            (" ".join(other),),
        ],
        "text string",
    )
    fps = [r[0] for r in df.select(bag_fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]
