"""URL canonicalization (operators/urls.py): handwritten canonical-form
matrix, idempotency over the synthesized corpus, the exact DuckDB twin
(URL_CANONICAL_ORACLE — rotation queue), JVM-only plan shape, and the
registrable-domain heuristic boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.urls import (
    canonical_url,
    canonicalize_urls,
    registrable_domain,
    url_host,
)

CASES = [
    # scheme+host case-fold, default port dropped, empty path -> /
    ("HTTP://WWW.Example.COM:80", "http://www.example.com/"),
    ("https://example.com:443/x", "https://example.com/x"),
    # non-default and non-http(s) default-looking ports are kept
    ("https://example.com:8080/x", "https://example.com:8080/x"),
    ("ftp://example.com:80/x", "ftp://example.com:80/x"),
    # trailing host dots, duplicate slashes
    ("http://example.com./a//b///c", "http://example.com/a/b/c"),
    # userinfo stripped
    ("http://bot:pw@example.com/a", "http://example.com/a"),
    # fragment dropped; params sorted; tracking and empty params dropped
    (
        "http://e.com/p?z=1&utm_source=x&a=2&&fbclid=y#frag",
        "http://e.com/p?a=2&z=1",
    ),
    # query that is ONLY tracking params vanishes entirely
    ("http://e.com/p?utm_campaign=c&gclid=g", "http://e.com/p"),
    # duplicate params kept (documented multi-value semantics)
    ("http://e.com/p?a=1&a=1&a=0", "http://e.com/p?a=0&a=1&a=1"),
    # percent-encoding preserved byte-for-byte (documented boundary)
    ("http://e.com/a%2fb?k=%2F", "http://e.com/a%2fb?k=%2F"),
    # a '#' before '?' cuts the query with the fragment
    ("http://e.com/p#f?a=1", "http://e.com/p"),
    # padded input: every component helper trims (scraped hrefs)
    ("  http://A.com/x  ", "http://a.com/x"),
    # non-URLs and NULL canonicalize to NULL
    ("plain text line 33", None),
    ("   ", None),
    (None, None),
]


def test_canonical_matrix(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: r.canonical_url
        for r in canonicalize_urls(df).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, (u, got[i], want)


def test_canonicalization_is_idempotent(spark, sf_dir):
    """canonical(canonical(u)) == canonical(u) over the full synthesized
    corpus — the property that makes the canonical form a safe dedup KEY
    (re-canonicalizing a stored frontier never reshuffles groups)."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    # reuse the tracker's synthesis by canonicalizing the panel's min
    # canonicals, plus the matrix rows
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = canonical_url(F.col("url"))
    twice = canonical_url(once)
    bad = df.select(once.alias("a"), twice.alias("b")).where(
        ~(F.col("a").eqNullSafe(F.col("b")))
    )
    assert bad.count() == 0
    rows = QUERIES["url_canonical_panel"].spark(spark, sf_dir).collect()
    firsts = [r.first_canonical for r in rows if r.first_canonical]
    df2 = spark.createDataFrame([(u,) for u in firsts], "url string")
    bad2 = df2.select(
        F.col("url").alias("a"), canonical_url(F.col("url")).alias("b")
    ).where(~(F.col("a").eqNullSafe(F.col("b"))))
    assert bad2.count() == 0 and firsts


def test_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con

    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        URL_CANONICAL_ORACLE,
    )

    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted(
        (tuple(r) for r in QUERIES["url_canonical_panel"].spark(spark, sf_dir).collect()),
        key=key,
    )
    want = sorted(
        (tuple(r) for r in duck_con(sf_dir).execute(URL_CANONICAL_ORACLE).fetchall()),
        key=key,
    )
    assert got == want and len(got) > 1
    # non-vacuous: the NULL-host group exists (non-URL rows) and every
    # URL row canonicalized
    null_row = [r for r in got if r[0] is None]
    assert len(null_row) == 1 and null_row[0][2] == 0


def test_canonicalization_is_jvm_only(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans import QUERIES

    plan = (
        QUERIES["url_canonical_panel"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # no UDF anywhere on the path


def test_registrable_domain_heuristic(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)], "h string"
    )
    got = [r[0] for r in df.select(registrable_domain(F.col("h"))).collect()]
    # last-two-labels; single-label hosts yield '' (documented boundary:
    # public-suffix table needed for .co.uk-style suffixes)
    assert got == ["example.com", "example.com", ""]


def test_host_extraction_null_for_non_urls(spark):
    df = spark.createDataFrame(
        [("no scheme here",), ("http://H.X/",), ("  http://pad.ded/x",)], "u string"
    )
    got = [r[0] for r in df.select(url_host(F.col("u"))).collect()]
    assert got == [None, "h.x", "pad.ded"]  # padded input still resolves


def test_registry_gate_position():
    """Gated by the r9 fourth rotation swap, demoted by the r12
    freshness rotation (the crawl/web family keeps psl_domain_panel +
    warc_roundtrip_panel in the gate) — the twin auto-stashes in
    DEMOTED_ORACLES where test_demoted_twins_still_match pins it."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.registry import DEMOTED_ORACLES

    names = list(QUERIES)
    assert names.index("url_canonical_panel") >= 50
    assert QUERIES["url_canonical_panel"].oracle is None
    assert "url_canonical_panel" in DEMOTED_ORACLES


def test_frontier_dedup(spark):
    from yelp_business_data_pipeline_spark.operators.urls import frontier_dedup

    rows = [
        (1, "HTTP://E.com:80/a?utm_source=x&k=1"),
        (2, "http://e.com/a?k=1"),  # same canonical as row 1
        (3, "http://e.com/a?k=2"),  # different query -> kept
        (4, "not a url"),
        (5, "also not a url"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    kept = frontier_dedup(df, order_by=[F.col("id")])
    got = {r.id: r.canonical_url for r in kept.collect()}
    assert set(got) == {1, 3}  # lowest-id survivor per canonical group
    assert got[1] == "http://e.com/a?k=1"
    with_junk = frontier_dedup(df, order_by=[F.col("id")], keep_non_urls=True)
    ids = {r.id for r in with_junk.collect()}
    assert ids == {1, 3, 4, 5}  # NULL canonicals never collapse together


def test_ipv6_bracket_authorities_take_the_loud_null_path(spark):
    """The first-colon host rule would truncate '[2001:db8::1]' to
    '[2001' and collapse DISTINCT IPv6 hosts into one canonical form —
    silently dropping real pages at frontier dedup. Bracketed
    authorities must canonicalize to NULL (countable, never collapsed)
    with a NULL host, like any non-URL."""
    df = spark.createDataFrame(
        [
            ("http://[2001:db8::1]/p",),
            ("http://[2001:db8::2]/p",),
            ("http://user@[::1]:8080/x",),
            ("http://plain.example.com/p",),
        ],
        "url string",
    )
    rows = df.select(
        canonical_url(F.col("url")).alias("c"), url_host(F.col("url")).alias("h")
    ).collect()
    assert [r["c"] for r in rows[:3]] == [None, None, None]
    assert [r["h"] for r in rows[:3]] == [None, None, None]
    assert rows[3]["c"] == "http://plain.example.com/p"
    # and frontier_dedup therefore never merges the two IPv6 pages
    from yelp_business_data_pipeline_spark.operators.urls import frontier_dedup

    kept = frontier_dedup(df, "url", keep_non_urls=True)
    assert kept.count() == 4


def test_tracking_params_match_case_insensitively(spark):
    """'?UTM_SOURCE=x' is the same tracker as '?utm_source=x' — an
    uppercase tracking param must not split a dedup group (param VALUES
    stay byte-exact; only tracker NAMES fold)."""
    df = spark.createDataFrame(
        [
            ("https://a.com/p?UTM_SOURCE=x&b=2",),
            ("https://a.com/p?utm_source=y&b=2",),
            ("https://a.com/p?b=2&GCLID=1&FbClId=2&MsClKiD=3",),
            ("https://a.com/p?B=2",),  # non-tracker param case is DATA
        ],
        "url string",
    )
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got[0] == got[1] == got[2] == "https://a.com/p?b=2"
    assert got[3] == "https://a.com/p?B=2"


def _psl(spark):
    """A miniature publicsuffix.org snapshot: plain rules, a multi-label
    rule, a wildcard, and its exception — the four rule kinds."""
    return spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",), ("com.au",), ("*.ck",), ("!www.ck",)],
        "suffix string",
    )


def test_registrable_domain_psl_matrix(spark):
    """VERDICT r9 item 4: with a user-supplied PSL table the multi-label
    suffixes stop collapsing (a.co.uk and b.co.uk are DIFFERENT
    registrants, not one 'co.uk' group), wildcards and exceptions follow
    the publicsuffix.org algorithm, unknown TLDs fall back to the
    last-two-labels heuristic, and pure public suffixes go NULL."""
    from yelp_business_data_pipeline_spark.operators.urls import (
        with_registrable_domain,
    )

    rows = [
        # (host, expected registrable domain)
        ("a.co.uk", "a.co.uk"),  # co.uk is the suffix -> 3 labels
        ("x.a.co.uk", "a.co.uk"),
        ("b.co.uk", "b.co.uk"),  # does NOT group with a.co.uk
        ("b.com.au", "b.com.au"),
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("com", None),  # a public suffix names no registrant
        ("co.uk", None),
        ("uk", None),
        ("a.b.ck", "a.b.ck"),  # *.ck: b.ck is a public suffix
        ("b.ck", None),  # ...so b.ck itself is NULL
        ("www.ck", "www.ck"),  # !www.ck exception beats the wildcard
        ("sub.www.ck", "www.ck"),
        ("foo.example.unknown", "example.unknown"),  # implicit '*' rule
        ("localhost", None),  # single label, nothing to register
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "host string")
    out = with_registrable_domain(df, "host", psl=_psl(spark))
    got = {r.host: r.registrable_domain for r in out.collect()}
    for host, want in rows:
        assert got[host] == want, (host, got[host], want)


def test_registrable_domain_psl_is_broadcast_no_corpus_shuffle(spark):
    """The 100-TB shape: rule matching is broadcast joins probed by the
    corpus side — the host frame itself never exchanges (the only
    exchange keys on the tiny rule table's fold), and no Python UDF."""
    from tests.test_plans import plan_str
    from yelp_business_data_pipeline_spark.operators.urls import (
        with_registrable_domain,
    )

    df = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id")).alias("x"),
        F.concat(F.lit("a"), F.col("id"), F.lit(".co.uk")).alias("host"),
    )
    out = with_registrable_domain(df, "host", psl=_psl(spark))
    p = plan_str(out)
    assert "BroadcastHashJoin" in p
    # no Python EVALUATION nodes (createDataFrame's applySchemaToPythonRDD
    # in the fixture's RDD lineage is not a UDF)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in p
    import re

    # every Exchange hashpartitions on the rule-table fold (_sfx), never
    # on the corpus's host column
    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+)", p):
        assert "_sfx" in m.group(1), m.group(0)


def test_registrable_domain_psl_default_matches_heuristic(spark):
    """No PSL table -> the heuristic expression, NULL-safe."""
    from yelp_business_data_pipeline_spark.operators.urls import (
        with_registrable_domain,
    )

    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), (None,)], "host string"
    )
    got = [
        r.registrable_domain
        for r in with_registrable_domain(df, "host").collect()
    ]
    assert got == ["example.com", "example.com", None]


def test_registrable_domain_psl_overlong_rule_raises(spark):
    from yelp_business_data_pipeline_spark.operators.urls import (
        with_registrable_domain,
    )

    psl = spark.createDataFrame([("a.b.c.d.e",)], "suffix string")
    df = spark.createDataFrame([("x.com",)], "host string")
    with pytest.raises(ValueError, match="max_suffix_labels"):
        with_registrable_domain(df, "host", psl=psl, max_suffix_labels=4)


def test_psl_domain_panel_matches_duckdb_twin(spark, sf_dir):
    """Rotation-queue twin pin (the pytest half of the rotation
    contract): the registered psl_domain_panel must equal
    PSL_DOMAIN_ORACLE row-for-row — Spark's broadcast join-ladder vs
    DuckDB's explode-every-suffix re-derivation of the publicsuffix.org
    algorithm, two independent constructions."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        PSL_DOMAIN_ORACLE,
    )

    from .oracle_harness import duck_con

    srows = sorted(
        tuple(r) for r in QUERIES["psl_domain_panel"].spark(spark, sf_dir).collect()
    )
    drows = sorted(duck_con(sf_dir).execute(PSL_DOMAIN_ORACLE).fetchall())
    assert srows == drows and len(srows) > 5
    got = dict(srows)
    # the frontier-stats fix in one row: a.co.uk groups exist per s-prefix
    assert any(k.endswith(".a.co.uk") or k == "a.co.uk" for k in got), got
    # bare public suffixes / wildcard children count as no-registrant
    assert "(no registrant)" in got
