"""Core relational query pack (SURVEY.md §2.1-§2.7 operator coverage).

Every reference operator re-expressed on the driver's TPC-H-ish testdata
tables, each with a DuckDB oracle twin. Reference file:line citations are on
each query's docstring so parity can be checked against SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import top_k_global, top_k_per_group
from .registry import query, tbl

# ---------------------------------------------------------------------------
# Aggregations (A1, A2, §2.4) + filter/project (F1-F2, P3)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shaped scan+filter+groupBy agg pack (SURVEY §2.4 note: the "
    "BI aggregations implied by README.md:301-307). Map-side partial agg, "
    "one shuffle on the 2 group keys.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
            F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "data_quality_profile",
    """
    SELECT o_orderstatus,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS is_total,
           COUNT(*) AS n_rows,
           (COUNT(*) - COUNT(o_orderkey)) AS null_orderkey,
           (COUNT(*) - COUNT(o_custkey)) AS null_custkey,
           (COUNT(*) - COUNT(o_totalprice)) AS null_totalprice,
           (COUNT(*) - COUNT(o_orderdate)) AS null_orderdate,
           (COUNT(*) - COUNT(o_orderpriority)) AS null_orderpriority,
           CAST(count_if(o_totalprice <= 0) AS BIGINT) AS n_nonpositive_price,
           bool_and(o_custkey >= 0) AS all_custkeys_valid,
           bool_or(o_totalprice > 400000) AS has_jumbo_order
    FROM orders GROUP BY ROLLUP (o_orderstatus)
    """,
    doc="A1 one-pass per-column null profile (reference Review_ETL.py:57-63, "
    "User_ETL.py:54-60) MERGED with the declarative data-quality assertion "
    "pack (the dbt-test shape; the reference's test_cases/* null/validity "
    "asserts): conditional aggregates count_if / bool_and / bool_or plus "
    "per-column null counts, grouped by ROLLUP(status) so the grand-total "
    "row IS the whole-table null profile — every check shares one scan and "
    "one grouping-sets shuffle. The standalone operator is "
    "operators/cleaning.py:null_profile (pytest-pinned equal to this "
    "query's total row).",
)
def data_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    nulls = [
        (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c.removeprefix('o_')}")
        for c in ("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority")
    ]
    # grouping() disambiguates the grand-total row from a genuine NULL
    # o_orderstatus group — exactly the row a null-audit would create.
    return o.rollup("o_orderstatus").agg(
        F.grouping("o_orderstatus").cast("int").alias("is_total"),
        F.count(F.lit(1)).alias("n_rows"),
        *nulls,
        F.count_if(F.col("o_totalprice") <= 0).alias("n_nonpositive_price"),
        F.every(F.col("o_custkey") >= 0).alias("all_custkeys_valid"),
        F.some(F.col("o_totalprice") > 400000).alias("has_jumbo_order"),
    )


def horizontal_row_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7 horizontal fold-sum across columns (reference engagement_score
    Review_ETL.py:66-70 and days_open Business_ETL.py:133-135): pure row
    arithmetic, no shuffle. Oracle-gated as the ``row_sum`` branch of
    ``row_arithmetic_panel``."""
    li = tbl(spark, sf_dir, "lineitem")
    flags = (
        F.when(F.col("l_quantity") > 25, 1).otherwise(0)
        + F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
        + F.when(F.col("l_tax") > 0.04, 1).otherwise(0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + F.col("l_discount") + F.col("l_tax")).alias("row_sum"),
        flags.alias("flags_sum"),
    )


@query(
    "priority_stats_panel",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Distinct aggregation + exact interpolated percentiles in one grouped "
    "pass (SURVEY §2.4 'absent in reference, engine exposes via builtins'): "
    "two-phase distinct agg sharing its group-key shuffle with the "
    "percentile aggregates. Spark's exact `percentile` == DuckDB "
    "quantile_cont; at 100 TB swap for approx_count_distinct / "
    "percentile_approx (see approx_aggregates).",
)
def priority_stats_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    # Distinct agg kept in its own aggregation: combined with the
    # percentile buffers, countDistinct's Expand plan degrades the whole
    # agg to sort-based fallback (see approx_aggregates). Broadcast join
    # on the 5-row group key re-attaches it for ~free.
    pct = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )
    nd = o.groupBy("o_orderpriority").agg(F.countDistinct("o_custkey").alias("n_customers"))
    return pct.join(F.broadcast(nd), "o_orderpriority").select(
        "o_orderpriority", "n_customers", "n_orders", "p25", "p50", "p75"
    )


@query(
    "grouping_sets_revenue",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           o_orderstatus,
           o_orderpriority,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((order_year, o_orderpriority), (order_year),
                            (o_orderstatus, o_orderpriority), (o_orderstatus),
                            (o_orderpriority), ())
    """,
    doc="Grouping sets — the generalization of ROLLUP and CUBE (SURVEY §2.4 "
    "extension surface): ROLLUP(order_year, o_orderpriority) = the first two "
    "sets + (), CUBE(o_orderstatus, o_orderpriority) = the last four — both "
    "hierarchies computed in ONE pass/shuffle (Spark expands the "
    "grouping-set id map-side; a rollup+cube pair of queries would scan "
    "orders twice).",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return o.groupingSets(
        [
            ["order_year", "o_orderpriority"],
            ["order_year"],
            ["o_orderstatus", "o_orderpriority"],
            ["o_orderstatus"],
            ["o_orderpriority"],
            [],
        ],
        "order_year",
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (SURVEY §2.4 extension; guide 'pivot/unpivot'). Explicit value
    list so no extra distinct-values job at scale. Oracle-gated as the
    ``pivot`` branch of ``reshape_panel``."""
    ev = tbl(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = (
        ev.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", kinds)
        .count()
    )
    return piv.select(
        "cohort", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


# ---------------------------------------------------------------------------
# Joins (J1-J5) + rename (P4)
# ---------------------------------------------------------------------------


@query(
    "star_join_revenue",
    """
    SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS mktsegment,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items,
           COUNT(DISTINCT l.l_orderkey) AS n_orders
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc="J1/J2 star left-joins (reference join/unified_data_analytics.py:46-47): "
    "fact left-joins two dims. customer is broadcast (dim << fact); the "
    "orders join shuffles on the join key with AQE skew splitting.",
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .groupBy(F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("mktsegment"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "unified_star_rename",
    """
    SELECT o.o_orderkey AS order_key,
           o.o_totalprice AS order_totalprice,
           CAST(o.o_orderdate AS DATE) AS order_date,
           c.c_name AS customer_name,
           c.c_acctbal AS customer_acctbal,
           n.n_name AS nation_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc="P4 conflict-prefix rename + unified 3-way left join (reference "
    "join/unified_data_analytics.py:23-47, README.md:188): the denormalized "
    "UnifiedAnalytics build, dims broadcast.",
)
def unified_star_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey"),
        F.col("o_totalprice").alias("order_totalprice"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )
    c = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.col("c_nationkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_acctbal").alias("customer_acctbal"),
    )
    n = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation_name")
    )
    out = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .drop("o_custkey", "c_custkey", "c_nationkey", "n_nationkey")
    )
    return out


@query(
    "existence_join_panel",
    """
    SELECT 'no_1995_orders' AS op, c_custkey, c_name, c_mktsegment,
           CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND EXTRACT(year FROM o.o_orderdate) = 1995
    )
    UNION ALL
    SELECT 'active' AS op, c_custkey, CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS VARCHAR) AS c_mktsegment, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="J4 anti-join orphan detection + J5 existence/semi join in one "
    "op-tagged panel (reference neo4j_test.cypher:8-37 missing-edge "
    "checks; graph.cypher:50-51 FK-validated MERGE): customers with no "
    "1995 order via left_anti against a filtered build side, and "
    "customers with any order via left_semi (no fan-out). Merged from two "
    "round-2 registrations to keep every oracle-backed query inside the "
    "driver's 50-slot gate — both join plans survive verbatim as the "
    "panel's two branches.",
)
def existence_join_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o95 = (
        tbl(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    anti = c.join(o95, "c_custkey", "left_anti").select(
        F.lit("no_1995_orders").alias("op"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.lit(None).cast("double").alias("c_acctbal"),
    )
    semi = c.join(o, "c_custkey", "left_semi").select(
        F.lit("active").alias("op"),
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        "c_acctbal",
    )
    return anti.unionAll(semi)


@query(
    "integrity_orphan_checks",
    """
    SELECT 'events_user_not_in_customer' AS check_name,
           (SELECT COUNT(*) FROM events e
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS n_orphans
    UNION ALL
    SELECT 'lineitem_supp_not_in_supplier' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS n_orphans
    """,
    doc="Referential-integrity check pack via anti-joins + union (reference "
    "neo4j_test.cypher:7-37 orphan checks; README.md:369-372).",
)
def integrity_orphan_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    cust = tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("l_suppkey"))
    a = ev.join(F.broadcast(cust), "user_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_orphans")
    ).select(F.lit("events_user_not_in_customer").alias("check_name"), "n_orphans")
    b = li.join(F.broadcast(supp), "l_suppkey", "left_anti").agg(
        F.count(F.lit(1)).alias("n_orphans")
    ).select(F.lit("lineitem_supp_not_in_supplier").alias("check_name"), "n_orphans")
    return a.unionAll(b)


# ---------------------------------------------------------------------------
# Sorts / top-k / windows (W1-W3)
# ---------------------------------------------------------------------------


def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 global top-k (reference neo4j_test.cypher:49-53 'top 5 reviewers'):
    compiles to TakeOrderedAndProject — per-partition heaps, no global sort.

    Deregistered from the driver gate (the 50-slot CORRECTNESS cap):
    W1/W2 are driver-checked inside shipping_priority_top10 and
    graph_degree_top_customers (both end in the same orderBy+limit ->
    TakeOrderedAndProject); the plan property stays pinned in
    tests/test_plans.py against this function."""
    o = tbl(spark, sf_dir, "orders")
    return top_k_global(
        o.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        10,
    )


@query(
    "topk_orders_per_segment",
    """
    SELECT * FROM (
      SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS mktsegment,
             c.c_name AS customer_name,
             o.o_orderkey, o.o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY COALESCE(c.c_mktsegment, 'UNKNOWN')
               ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INTEGER) AS rnk
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rnk <= 5
    """,
    doc="W3 per-group top-k — the flagship slice (SURVEY §7 M0): scan -> "
    "broadcast left join -> window row_number <= k. One shuffle on the "
    "group key; AQE splits skewed segments.",
)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("mktsegment"),
        F.col("c_name").alias("customer_name"),
        "o_orderkey",
        "o_totalprice",
    )
    return top_k_per_group(
        joined,
        ["mktsegment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        5,
        rank_col="rnk",
    )


@query(
    "running_customer_spend",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
    doc="Window running aggregates (SURVEY §2.5 'true window functions "
    "absent in reference; engine exposes'): a cumulative ROWS frame with "
    "deterministic tie-broken order, plus a time-based RANGE frame — the "
    "trailing-30-day spend per customer, framed by VALUE (days since "
    "epoch) so simultaneous orders aggregate together regardless of row "
    "order. Both frames share the ONE customer-key window shuffle; the "
    "decimal(18,2) accumulation keeps both sums exact for cross-engine "
    "comparison.",
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # RANGE frame is framed by the ORDER value, so it must order by the
    # numeric day (unix_date) alone — Spark rejects multi-column RANGE
    # orderings, and that is the right semantics: same-day orders always
    # fall in each other's trailing window.
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-30, Window.currentRow)
    )
    spend = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(spend).over(w).cast("double").alias("running_spend"),
        F.sum(spend).over(wr).cast("double").alias("trailing_30d_spend"),
    )


#: Exact DuckDB twin of the PER-USER sessionize grain — demoted from the
#: driver gate in round 8 (the r8 rotation: the session-count histogram
#: is oracle-gated inside event_lifecycle_panel; this twin is pinned in
#: tests/test_queries_oracle.py so the per-user grain stays exact-checked,
#: and the grain itself stays driver-visible as a rows-only tracker).
SESSIONIZE_USER_ORACLE = """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            + INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap flag + count (guide 'common OLAP
    patterns'; streaming twin uses session_window). Interval comparison
    avoids epoch truncation divergence across engines. Oracle-gated as
    the ``sessionize`` histogram branch of ``event_lifecycle_panel``;
    the per-user grain is registered as a rows-only tracker with
    SESSIONIZE_USER_ORACLE pytest-pinned (r8 gate rotation)."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup / set ops (D1-D3)
# ---------------------------------------------------------------------------


def dedup_orders_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 deterministic dedup-keep-latest (reference MERGE insert-if-absent
    graph.cypher:24ff; dropDuplicates picks an arbitrary row, so the engine
    uses a tie-broken row_number for reproducibility). Oracle-gated as the
    ``latest`` branch of ``dedup_panel``."""
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("latest_order_date"),
        )
    )


def duplicate_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/D2 duplicate-PK detection (reference neo4j_test.cypher:2-5):
    groupBy(pk).count().filter(n > 1). Oracle-gated as the ``dup_keys``
    branch of ``dedup_panel``."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


@query(
    "dedup_panel",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey % 7 != 0
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 5 != 0
    ), j AS (
      SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
             o.o_totalprice AS op, n.o_totalprice AS np,
             o.o_orderstatus AS os, n.o_orderstatus AS ns
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    ), diffs AS (
      SELECT COALESCE(ok, nk) AS o_orderkey,
             CASE WHEN ok IS NULL THEN 'added'
                  WHEN nk IS NULL THEN 'removed'
                  WHEN (op IS DISTINCT FROM np) OR (os IS DISTINCT FROM ns)
                    THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                   AND ((op IS DISTINCT FROM np) OR (os IS DISTINCT FROM ns))
                  THEN concat_ws(',',
                         CASE WHEN op IS DISTINCT FROM np THEN 'o_totalprice' END,
                         CASE WHEN os IS DISTINCT FROM ns THEN 'o_orderstatus' END)
                  ELSE '' END AS changed_cols
      FROM j
      WHERE NOT (ok IS NOT NULL AND nk IS NOT NULL
                 AND NOT ((op IS DISTINCT FROM np) OR (os IS DISTINCT FROM ns)))
    )
    SELECT 'latest' AS op, o_custkey AS key_a, o_orderkey AS key_b,
           CAST(o_orderdate AS DATE) AS latest_order_date,
           CAST(NULL AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS detail
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    UNION ALL
    SELECT 'dup_keys' AS op, l_orderkey AS key_a, CAST(NULL AS BIGINT) AS key_b,
           CAST(NULL AS DATE) AS latest_order_date, COUNT(*) AS n,
           CAST(NULL AS VARCHAR) AS detail
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
    UNION ALL
    SELECT 'snapshot_diff' AS op, o_orderkey AS key_a,
           CAST(NULL AS BIGINT) AS key_b, CAST(NULL AS DATE) AS latest_order_date,
           CAST(NULL AS BIGINT) AS n,
           change_type || CASE WHEN changed_cols != ''
                               THEN ':' || changed_cols ELSE '' END AS detail
    FROM diffs
    """,
    doc="Dedup / change-tracking panel, op-tagged: D1 deterministic "
    "dedup-keep-latest (tie-broken row_number, reference MERGE "
    "insert-if-absent graph.cypher:24ff — ``latest`` branch), A3/D2 "
    "duplicate-PK detection (groupBy(pk).count().filter(n > 1), reference "
    "neo4j_test.cypher:2-5 — ``dup_keys`` branch), and snapshot diff / "
    "CDC reconciliation (operators/diff.py:table_diff, the complement of "
    "sources.writers.merge_upsert: two deterministic orders snapshots "
    "diffed into added/removed/changed with the exact differing columns "
    "via ONE full-outer sort-merge join, null-safe comparisons, output "
    "scaling with churn — ``snapshot_diff`` branch; merged here in round "
    "5 to free an oracle slot for triangle_count_friend_graph). All "
    "branch plans survive verbatim inside the union.",
)
def dedup_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    latest = dedup_orders_latest(spark, sf_dir).select(
        F.lit("latest").alias("op"),
        F.col("o_custkey").alias("key_a"),
        F.col("o_orderkey").alias("key_b"),
        "latest_order_date",
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("string").alias("detail"),
    )
    dups = duplicate_key_detection(spark, sf_dir).select(
        F.lit("dup_keys").alias("op"),
        F.col("l_orderkey").alias("key_a"),
        F.lit(None).cast("bigint").alias("key_b"),
        F.lit(None).cast("date").alias("latest_order_date"),
        "n",
        F.lit(None).cast("string").alias("detail"),
    )
    from .extensions import snapshot_diff_orders

    diff = snapshot_diff_orders(spark, sf_dir).select(
        F.lit("snapshot_diff").alias("op"),
        F.col("o_orderkey").alias("key_a"),
        F.lit(None).cast("bigint").alias("key_b"),
        F.lit(None).cast("date").alias("latest_order_date"),
        F.lit(None).cast("bigint").alias("n"),
        F.concat(
            F.col("change_type"),
            F.when(
                F.col("changed_cols") != "", F.concat(F.lit(":"), F.col("changed_cols"))
            ).otherwise(F.lit("")),
        ).alias("detail"),
    )
    return latest.unionAll(dups).unionAll(diff)


@query(
    "degree_panel",
    """
    WITH edges AS (
      SELECT DISTINCT s_suppkey AS src, s_nationkey AS dst FROM supplier
    ), sym AS (
      SELECT src, dst FROM edges
      UNION
      SELECT dst AS src, src AS dst FROM edges
    )
    SELECT 'closure_degree' AS op, src AS node_id,
           CAST(NULL AS VARCHAR) AS node_name, COUNT(*) AS degree
    FROM sym GROUP BY src
    UNION ALL
    SELECT 'orders_degree_top10' AS op, node_id, node_name, degree FROM (
      SELECT d.o_custkey AS node_id, c.c_name AS node_name, d.degree
      FROM (SELECT o_custkey, COUNT(*) AS degree FROM orders GROUP BY o_custkey) d
      JOIN customer c ON d.o_custkey = c.c_custkey
      ORDER BY d.degree DESC, d.o_custkey
      LIMIT 10
    )
    """,
    doc="D3 symmetric closure + A5 degree count + W1 top-k in one op-tagged "
    "panel (reference FRIENDS_WITH bidirectional merge graph.cypher:91-97; "
    "degree reconciliation neo4j_test.cypher:40-44): union-of-reversed-"
    "edges closure degrees, and order-count degrees top-10 joined back to "
    "the customer dim (agg shrinks the fact FIRST, broadcast dim join "
    "AFTER — never join before agg). Merged from two round-2 registrations "
    "to keep every oracle-backed query inside the driver's 50-slot gate; "
    "both plans survive verbatim as the panel's branches.",
)
def degree_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        tbl(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    closure = sym.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("degree")
    ).select(
        F.lit("closure_degree").alias("op"),
        "node_id",
        F.lit(None).cast("string").alias("node_name"),
        "degree",
    )
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    deg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("degree"))
    top = (
        deg.join(F.broadcast(c), deg.o_custkey == c.c_custkey)
        .select(F.col("o_custkey").alias("node_id"), F.col("c_name").alias("node_name"), "degree")
        .orderBy(F.desc("degree"), F.asc("node_id"))
        .limit(10)
        .select(F.lit("orders_degree_top10").alias("op"), "node_id", "node_name", "degree")
    )
    return closure.unionAll(top)


# ---------------------------------------------------------------------------
# Scalar functions (C1-C11)
# ---------------------------------------------------------------------------


@query(
    "string_ops_panel",
    """
    SELECT 'type_token' AS op, token, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS metric_a,
           CAST(NULL AS DOUBLE) AS metric_b
    FROM (SELECT unnest(string_split(p_type, ' ')) AS token, p_retailprice FROM part)
    GROUP BY token
    UNION ALL
    SELECT 'first_word' AS op, regexp_extract(p_name, '^(\\w+)', 1) AS token,
           COUNT(*) AS n,
           CAST(MIN(p_size) AS DOUBLE) AS metric_a,
           CAST(MAX(p_size) AS DOUBLE) AS metric_b
    FROM part GROUP BY 2
    UNION ALL
    SELECT op, token, n, metric_a, metric_b FROM (
      WITH m AS (
        SELECT doc_id, lang,
               array_to_string(list_transform(
                   string_split(regexp_replace(text, '((\\S+ ){6}\\S+) ',
                                               '\\1' || chr(10), 'g'), chr(10)),
                   (l, i) -> l || CASE WHEN (i - 1) % 3 < 2 THEN '.' ELSE '' END),
                 chr(10))
               || CASE WHEN doc_id % 17 = 0 THEN chr(10) ||
                    'our privacy policy applies to all visitors of this site.'
                  ELSE '' END
               || CASE WHEN doc_id % 19 = 0 THEN chr(10) ||
                    'enable javascript to view this page properly today.'
                  ELSE '' END
               || CASE WHEN doc_id % 23 = 0 THEN chr(10) ||
                    'function f() { return 1; }' ELSE '' END
               || CASE WHEN doc_id % 29 = 0 THEN chr(10) ||
                    'lorem ipsum dolor sit amet consectetur adipiscing elit.'
                  ELSE '' END AS mtext
        FROM documents WHERE text IS NOT NULL
      ), f AS (
        SELECT lang,
               len(string_split(mtext, chr(10))) AS n_lines,
               len(list_filter(string_split(mtext, chr(10)), l ->
                   rtrim(l) <> ''
                   AND rtrim(l)[-1] IN ('.', '!', '?', '"')
                   AND len(list_filter(string_split(trim(l), ' '),
                           w -> w <> '')) >= 5
                   AND NOT contains(l, 'javascript'))) AS n_kept,
               (contains(mtext, 'lorem ipsum') OR contains(mtext, '{')
                OR contains(mtext, 'terms of use')
                OR contains(mtext, 'privacy policy')
                OR contains(mtext, 'cookie policy')
                OR contains(mtext, 'uses cookies')) AS boiler
        FROM m
      ), g AS (
        SELECT lang AS token, COUNT(*) AS n,
               CAST(SUM(n_kept) AS DOUBLE) AS sum_kept,
               CAST(SUM(n_lines) AS DOUBLE) AS sum_lines,
               CAST(SUM(CASE WHEN NOT boiler AND n_kept >= 3 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS sum_passes,
               CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS DOUBLE)
                 AS sum_boiler
        FROM f GROUP BY 1
      )
      SELECT 'c4_lines' AS op, token, n, sum_kept AS metric_a,
             sum_lines AS metric_b FROM g
      UNION ALL
      SELECT 'c4_gate' AS op, token, n, sum_passes AS metric_a,
             sum_boiler AS metric_b FROM g
    )
    """,
    doc="C1/C6 split + explode fan-out (reference categories explode "
    "Business_ETL.py:65,146; friends explode User_ETL.py:98-100: lateral "
    "view multiplies rows, then re-aggregates) UNION'd with C3 "
    "regexp_extract (reference NoiseLevel unwrap Business_ETL.py:96) + "
    "min/max agg — one aligned-schema panel (op, token, n, metric_a, "
    "metric_b) over the part dim. Round 8 adds the C4 line-filter branch "
    "(VERDICT r7 item 4 — text.c4_kept_lines/c4_doc_flags had no "
    "driver-visible signal because the corpus is single-line): a "
    "deterministic in-plan multi-line rederivation (every 7th space -> "
    "newline via one regexp_replace, indexed-transform terminal "
    "punctuation on 2 of 3 lines, doc_id-seeded boilerplate injections "
    "covering the policy/javascript/curly-brace/lorem-ipsum branches), "
    "then per-lang rollups of kept-line counts and the document gate — "
    "every c4 predicate re-derived independently by the DuckDB twin.",
)
def string_ops_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tbl(spark, sf_dir, "part")
    tokens = (
        p.select(F.explode(F.split("p_type", " ")).alias("token"), "p_retailprice")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double").alias("metric_a"),
        )
        .select(
            F.lit("type_token").alias("op"), "token", "n", "metric_a",
            F.lit(None).cast("double").alias("metric_b"),
        )
    )
    words = (
        p.withColumn("token", F.regexp_extract("p_name", r"^(\w+)", 1))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_size").cast("double").alias("metric_a"),
            F.max("p_size").cast("double").alias("metric_b"),
        )
        .select(F.lit("first_word").alias("op"), "token", "n", "metric_a", "metric_b")
    )
    return tokens.unionByName(words).unionByName(c4_line_filter_branch(spark, sf_dir))


def c4_multiline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-line rederivation of the single-line synthetic
    corpus (the C4 line filter needs lines to filter): ONE regexp_replace
    turns every 7th inter-word space into a newline (no per-line
    re-tokenization — a transform(sequence)+slice formulation re-evaluates
    the token array per line, the dsir round-8 lesson), an indexed
    transform appends terminal '.' to two of every three lines, and
    doc_id-seeded literal lines inject the C4 boilerplate branches
    (privacy-policy phrase @%17, javascript @%19, curly brace @%23,
    lorem ipsum @%29). Returns (doc_id, lang, mtext); NULL-text docs are
    excluded (nothing to filter)."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = F.regexp_replace(F.col("text"), r"((\S+ ){6}\S+) ", "$1\n")
    lines = F.transform(
        F.split(base, "\n"),
        lambda l, i: F.concat(
            l, F.when(i % 3 < 2, F.lit(".")).otherwise(F.lit(""))
        ),
    )
    mtext = F.array_join(lines, "\n")
    for mod, line in (
        (17, "our privacy policy applies to all visitors of this site."),
        (19, "enable javascript to view this page properly today."),
        (23, "function f() { return 1; }"),
        (29, "lorem ipsum dolor sit amet consectetur adipiscing elit."),
    ):
        mtext = F.concat(
            mtext,
            F.when(F.col("doc_id") % mod == 0, F.lit("\n" + line)).otherwise(
                F.lit("")
            ),
        )
    return d.select("doc_id", "lang", mtext.alias("mtext"))


def c4_line_filter_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 branch of string_ops_panel (oracle-gated there): per-lang
    rollup of text.c4_kept_lines / c4_doc_flags over the derived
    multi-line corpus. ONE aggregation; the two op rows explode from the
    same aggregated frame, so the corpus is scanned once."""
    from ..operators.text import c4_doc_flags

    m = c4_multiline_docs(spark, sf_dir)
    flags = c4_doc_flags(F.col("mtext"))
    per_doc = m.select(
        "lang",
        F.size(F.split("mtext", "\n")).alias("n_lines"),
        flags.getField("n_kept_lines").alias("n_kept"),
        flags.getField("passes_c4").cast("int").alias("passes"),
        (
            flags.getField("has_policy_phrase")
            | flags.getField("has_lorem_ipsum")
            | flags.getField("has_curly_brace")
        )
        .cast("int")
        .alias("boiler"),
    )
    g = per_doc.groupBy(F.col("lang").alias("token")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_kept").cast("double").alias("sum_kept"),
        F.sum("n_lines").cast("double").alias("sum_lines"),
        F.sum("passes").cast("double").alias("sum_passes"),
        F.sum("boiler").cast("double").alias("sum_boiler"),
    )
    two = F.array(
        F.struct(
            F.lit("c4_lines").alias("op"),
            F.col("token"),
            F.col("n"),
            F.col("sum_kept").alias("metric_a"),
            F.col("sum_lines").alias("metric_b"),
        ),
        F.struct(
            F.lit("c4_gate").alias("op"),
            F.col("token"),
            F.col("n"),
            F.col("sum_passes").alias("metric_a"),
            F.col("sum_boiler").alias("metric_b"),
        ),
    )
    return g.select(F.explode(two).alias("r")).select("r.*")


@query(
    "json_extract_events",
    """
    SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) % 10 AS k_mod,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1
    """,
    doc="C4 from_json on a JSON-string column (reference Ambience/BusinessParking "
    "Business_ETL.py:72-81): Spark parses with an explicit StructType; the "
    "oracle uses a regexp twin to stay extension-free.",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        ev.withColumn("k_mod", k % 10)
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


@query(
    "date_features_orders",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_bucket,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_spend
    FROM orders GROUP BY 1, 2, 3
    """,
    doc="C10 date/time functions (reference to_timestamp/to_date "
    "Review_ETL.py:92-93, months_between User_ETL.py:86-92): calendar "
    "extraction + group. Extracted ints, not raw timestamps (ns-vs-us "
    "safe). Carries the C8 when/otherwise price buckets (reference "
    "Business_ETL.py:121-126, Review_ETL.py:80-84 label thresholds) as a "
    "third group key — round 2's standalone conditional_buckets query, "
    "merged here for the 50-slot gate; same scan, same shuffle.",
)
def date_features_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .withColumn("order_month", F.month("o_orderdate").cast("int"))
        .withColumn("price_bucket", bucket)
        .groupBy("order_year", "order_month", "price_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Graph-as-DataFrames (J3, A4, A5 — reference graph layer)
# ---------------------------------------------------------------------------


@query(
    "graph_two_hop_region_customers",
    """
    SELECT r.r_name AS region_name, COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS acctbal_sum
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="J3 node-edge-node pattern match (reference Cypher MATCH "
    "(u)-[:WROTE]->(r)-[:REVIEWS]->(b) neo4j_test.cypher:50-53): chained "
    "equi-joins over edge tables; both hops broadcast (dims are tiny).",
)
def graph_two_hop_region_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("acctbal_sum"),
        )
    )


@query(
    "friends_of_friends_recommendations",
    """
    WITH l AS (
      SELECT c_custkey AS src,
             LEAD(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS d1,
             LEAD(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS d2
      FROM customer
    ), fwd AS (
      SELECT src, dst FROM (SELECT src, UNNEST([d1, d2]) AS dst FROM l) WHERE dst IS NOT NULL
    ), sym AS (
      SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
    ), fof AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM sym e1 JOIN sym e2 ON e1.dst = e2.src
      WHERE e1.src <> e2.dst
    )
    SELECT a AS custkey_a, c AS custkey_c, COUNT(DISTINCT b) AS n_mutual
    FROM fof
    WHERE NOT EXISTS (SELECT 1 FROM sym WHERE sym.src = fof.a AND sym.dst = fof.c)
    GROUP BY a, c
    """,
    doc="Friends-of-friends recommendation — the natural extension of the "
    "reference's Cypher 2-hop (neo4j_test.cypher:40-53), expressed through "
    "the reusable motif matcher (operators/graph.py:match_motif): MATCH "
    "(a)-[:FRIENDS]->(b)-[:FRIENDS]->(c) WHERE a <> c AND NOT "
    "(a)-[:FRIENDS]->(c), grouped to mutual-friend counts. The friendship "
    "graph is deterministic and SPARSE by construction — each customer "
    "links to the next two in its nation's (acctbal, custkey) order via "
    "LEAD windows (degree <= 4 after symmetric closure; no self-join range "
    "explosion), so the 2-hop fan-out is bounded at any corpus scale. "
    "Distance-3 pairs share 2 mutuals, distance-4 pairs 1 — real signal "
    "variety for the recommendation ranking. Edge lineage is ONE "
    "explode-based pipeline (forward edges all run low->high rank, so the "
    "reversed closure is provably disjoint: UNION ALL, no distinct "
    "exchange) and the whole build costs one scan per motif use; a "
    "production pipeline would materialize the edge table once and hand "
    "match_motif the stored DataFrame, making it one scan total.",
)
def friends_of_friends_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.graph import match_motif

    c = tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    leads = c.select(
        F.col("c_custkey").alias("src"),
        F.lead("c_custkey", 1).over(w).alias("d1"),
        F.lead("c_custkey", 2).over(w).alias("d2"),
    )
    fwd = (
        leads.select("src", F.explode(F.array("d1", "d2")).alias("dst"))
        .filter(F.col("dst").isNotNull())
    )
    sym = (
        fwd.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                    F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .withColumn("rel_type", F.lit("FRIENDS"))
    )
    fof = match_motif(
        sym,
        pattern=[("a", "FRIENDS", "b"), ("b", "FRIENDS", "c")],
        negations=[("a", "FRIENDS", "c")],
        distinct=[("a", "c")],
    )
    return fof.groupBy(
        F.col("a").alias("custkey_a"), F.col("c").alias("custkey_c")
    ).agg(F.countDistinct("b").alias("n_mutual"))


# ---------------------------------------------------------------------------
# Extended relational surface (SURVEY §2.3/§2.4/§2.6 "absent in reference,
# engine exposes via builtins" + the as-of custom operator)
# ---------------------------------------------------------------------------


@query(
    "asof_purchase_prior_signup",
    """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
    s0 AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'signup'),
    s AS (
      SELECT event_id, user_id, ts, value FROM (
        SELECT s0.*, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM s0
      ) WHERE rn = 1
    )
    SELECT p.event_id, p.user_id, p.value,
           s.event_id AS prior_signup_id,
           s.value AS prior_signup_value
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of (backward temporal) join — an operator Spark lacks natively, "
    "built as union + one keyed window with last(ignorenulls) carry "
    "(operators/asof.py): for each purchase, the user's most recent signup "
    "at-or-before it. One shuffle on the key; oracle is DuckDB's native "
    "ASOF LEFT JOIN.",
)
def asof_purchase_prior_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join_backward

    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("prior_signup_id"),
        F.col("value").alias("prior_signup_value"),
    )
    out = asof_join_backward(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["prior_signup_id", "prior_signup_value"],
        right_tiebreak="prior_signup_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("asof_prior_signup_id").alias("prior_signup_id"),
        F.col("asof_prior_signup_value").alias("prior_signup_value"),
    )


#: Exact DuckDB twin of setops_customer_cohorts — demoted to a rows-only
#: tracker in the r9 gate rotation (green r3-r8; slot given to
#: incremental_dedup_panel); pinned in
#: tests/test_queries_oracle.py::test_demoted_twins_still_match per the
#: rotation contract (COVERAGE.md 'Oracle-gate rotation'). Registration
#: lives in plans/extensions.py's tracker section (positional gate).
SETOPS_COHORTS_ORACLE = """
    WITH c97 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997),
         c98 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998)
    SELECT 'both' AS segment, o_custkey FROM (SELECT o_custkey FROM c97 INTERSECT SELECT o_custkey FROM c98)
    UNION ALL
    SELECT 'only_1997' AS segment, o_custkey FROM (SELECT o_custkey FROM c97 EXCEPT SELECT o_custkey FROM c98)
    """


def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set ops (SURVEY §2.6: absent in the reference,
    engine exposes): year-cohort retention segments. Spark plans both as
    aggregated joins (left_semi/left_anti after distinct)."""
    o = tbl(spark, sf_dir, "orders")
    c97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    c98 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey").distinct()
    both = c97.intersect(c98).select(F.lit("both").alias("segment"), "o_custkey")
    only97 = c97.exceptAll(c98).select(F.lit("only_1997").alias("segment"), "o_custkey")
    return both.unionAll(only97)


def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt via stack() (guide 'pivot/unpivot'): wide metric
    columns to long (metric, val) rows, then re-aggregate. Oracle-gated
    as the ``unpivot`` branch of ``reshape_panel``."""
    li = tbl(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice, 'disc', l_discount) AS (metric, val)"
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("val_sum"),
    )


@query(
    "reshape_panel",
    """
    WITH piv AS (
      SELECT user_id % 10 AS cohort,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events GROUP BY 1
    ), unp AS (
      SELECT metric,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(val AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS val_sum
      FROM (
        SELECT 'qty' AS metric, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'price', l_extendedprice FROM lineitem
        UNION ALL SELECT 'disc', l_discount FROM lineitem
      ) GROUP BY metric
    )
    SELECT 'pivot' AS op, cohort, click, view, purchase, signup, error,
           CAST(NULL AS VARCHAR) AS metric, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS val_sum
    FROM piv
    UNION ALL
    SELECT 'unpivot' AS op, CAST(NULL AS BIGINT) AS cohort,
           CAST(NULL AS BIGINT) AS click, CAST(NULL AS BIGINT) AS view,
           CAST(NULL AS BIGINT) AS purchase, CAST(NULL AS BIGINT) AS signup,
           CAST(NULL AS BIGINT) AS error, metric, n, val_sum
    FROM unp
    """,
    doc="Reshape panel, op-tagged: pivot with an explicit value list (no "
    "distinct-values job — ``pivot`` branch over events) and unpivot/melt "
    "via stack() with re-aggregation (``unpivot`` branch over lineitem). "
    "Merged from the round-1 ``pivot_event_counts`` + "
    "``unpivot_lineitem_metrics`` registrations to keep every oracle-"
    "backed query inside the driver's 50-slot gate while freeing a slot "
    "for snapshot_diff_orders — both reshape plans survive verbatim as "
    "the panel's branches.",
)
def reshape_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = pivot_event_counts(spark, sf_dir).select(
        F.lit("pivot").alias("op"),
        "cohort",
        "click",
        "view",
        "purchase",
        "signup",
        "error",
        F.lit(None).cast("string").alias("metric"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("val_sum"),
    )
    unp = unpivot_lineitem_metrics(spark, sf_dir).select(
        F.lit("unpivot").alias("op"),
        F.lit(None).cast("bigint").alias("cohort"),
        *[F.lit(None).cast("bigint").alias(k) for k in ("click", "view", "purchase", "signup", "error")],
        "metric",
        "n",
        "val_sum",
    )
    return piv.unionAll(unp)


@query(
    "salted_agg_status_revenue",
    """
    SELECT o_orderstatus,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Salted two-phase aggregation (operators/skew.py): o_orderstatus has "
    "~3 distinct values — the few-hot-keys case where a plain groupBy "
    "funnels everything through 3 reducers at 100 TB. Salting fans each "
    "key over 16 partials, then merges. Oracle: plain GROUP BY — the "
    "rewrite is semantics-preserving and hash-matches.",
)
def salted_agg_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    o = tbl(spark, sf_dir, "orders").withColumn(
        "_price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    out = salted_aggregate(
        o,
        keys=["o_orderstatus"],
        aggs={
            "revenue": ("sum", "_price_dec"),
            "n_orders": ("count", "o_orderkey"),
            "min_price": ("min", "o_totalprice"),
            "max_price": ("max", "o_totalprice"),
        },
        n_salts=16,
        salt_on=["o_orderkey"],
    )
    return out.withColumn("revenue", F.col("revenue").cast("double"))


#: Exact DuckDB twin of approx_aggregates — demoted to a rows-only
#: tracker in the r9 rotation's third swap (green r2-r8, and its
#: tolerance semantics carry an INDEPENDENT tighter pin in
#: test_queries_oracle.py::test_approx_aggregates_accuracy); slot given
#: to bm25_topk_panel, completing 100% driver-executed coverage of the
#: repo's exact twins. Pinned in test_demoted_twins_still_match per the
#: rotation contract; registration lives in plans/extensions.py's
#: tracker section (positional gate).
APPROX_AGGREGATES_ORACLE = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           TRUE AS hll_within_5pct,
           TRUE AS tdigest_in_p40_p60
    FROM orders GROUP BY o_orderpriority
    """


def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB substitutes for exact
    distinct/percentile: approx_count_distinct (HyperLogLog++, fixed
    memory vs the exact two-shuffle distinct) and percentile_approx
    (t-digest, single pass). Half-oracled: the sketch values themselves
    are engine-specific, so the query emits (a) the exact n_orders,
    hash-checked, and (b) per-group TOLERANCE PREDICATES — Spark
    compares its sketch against the exact aggregates computed in the
    same pass and must emit TRUE (HLL within 5% of exact distinct,
    t-digest median inside the exact p40-p60 band); the oracle emits
    literal TRUE. A drifting sketch hash-mismatches the twin compare.
    Tighter relative-error pins live in tests/test_approx.py."""
    o = tbl(spark, sf_dir, "orders")
    # Two aggregations, NOT one: countDistinct plans through Expand while
    # percentile_approx is a TypedImperativeAggregate — combined in one agg
    # Spark falls back to sort-based aggregation with per-row buffer
    # serialization (measured 30s at sf0.1 vs 0.5s for either alone). Two
    # scans + a broadcast join on the 5-row group key cost ~1s total.
    sketches = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_hll"),
        # t-digest median must land inside the exact inter-quantile band
        # [p40, p60] — a rank-tolerance bound that is robust to flat or
        # spiky value distributions (an absolute-value bound is not).
        F.percentile_approx("o_totalprice", 0.5, 10000)
        .between(
            F.expr("percentile(o_totalprice, 0.40)"),
            F.expr("percentile(o_totalprice, 0.60)"),
        )
        .alias("tdigest_in_p40_p60"),
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("_nd")
    )
    return sketches.join(F.broadcast(exact), "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        (F.abs(F.col("_hll") - F.col("_nd")) <= F.col("_nd") * 0.05).alias(
            "hll_within_5pct"
        ),
        "tdigest_in_p40_p60",
    )


@query(
    "shipping_priority_top10",
    """
    SELECT l.l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H-Q3-shaped shipping-priority query: selective filters on all "
    "three tables pushed into the scans, customer broadcast, agg, global "
    "top-10 via TakeOrderedAndProject.",
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "order_date")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nation_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H-Q5-shaped 6-table join tree (local supplier volume): the "
    "deep-join case Catalyst reorders; dims broadcast, the "
    "supplier-nation=customer-nation theta condition rides the equi-join.",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_HOURS_PARSER_SQL = """
    WITH spans AS (
      SELECT event_id,
             extract(hour FROM ts)::VARCHAR || ':' || extract(minute FROM ts)::VARCHAR
               AS open_str,
             extract(hour FROM ts + to_minutes(CAST(floor(value * 10) AS INTEGER)))::VARCHAR || ':' ||
             extract(minute FROM ts + to_minutes(CAST(floor(value * 10) AS INTEGER)))::VARCHAR
               AS close_str
      FROM events WHERE event_type = 'purchase'
    ), parsed AS (
      SELECT event_id,
             (string_split(open_str, ':')[1]::INTEGER * 60
              + string_split(open_str, ':')[2]::INTEGER) AS open_min,
             (string_split(close_str, ':')[1]::INTEGER * 60
              + string_split(close_str, ':')[2]::INTEGER) AS close_min
      FROM spans
    )
    SELECT event_id,
           CASE WHEN close_min < open_min
                THEN (close_min + 1440 - open_min) / 60.0
                ELSE (close_min - open_min) / 60.0 END AS open_hours
    FROM parsed
    """


def hours_parser_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature hours-parser semantics (reference Business_ETL.py:
    107-131: 'H:M-H:M' -> minutes-since-midnight, overnight wrap +1440,
    close==open -> 0) under the oracle gate: spans synthesized from event
    timestamps (+value*10 minutes, so some cross midnight and exercise
    the wrap), formatted to the Yelp string shape, then parsed back by
    functions.hours.day_hours_expr. Oracle-gated as the ``hours`` branch
    of ``row_arithmetic_panel``."""
    from ..functions.hours import day_hours_expr

    ev = tbl(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    close_ts = F.expr("ts + make_interval(0, 0, 0, 0, 0, CAST(floor(value * 10) AS INT), 0)")
    span = F.concat_ws(
        "-",
        F.concat_ws(":", F.hour("ts").cast("string"), F.minute("ts").cast("string")),
        F.concat_ws(":", F.hour(close_ts).cast("string"), F.minute(close_ts).cast("string")),
    )
    return ev.select(
        "event_id", day_hours_expr(span).alias("open_hours")
    )


@query(
    "row_arithmetic_panel",
    f"""
    WITH hrs AS ({_HOURS_PARSER_SQL})
    SELECT 'row_sum' AS op, l_orderkey AS key_a, l_linenumber AS key_b,
           l_quantity + l_discount + l_tax AS row_sum,
           (CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END
            + CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END
            + CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS flags_sum,
           CAST(NULL AS DOUBLE) AS open_hours
    FROM lineitem
    UNION ALL
    SELECT 'hours' AS op, event_id AS key_a, CAST(NULL AS INTEGER) AS key_b,
           CAST(NULL AS DOUBLE) AS row_sum, CAST(NULL AS INTEGER) AS flags_sum,
           open_hours
    FROM hrs
    """,
    doc="Row-arithmetic panel, op-tagged: A6/A7 horizontal fold-sum across "
    "columns (reference engagement_score Review_ETL.py:66-70, days_open "
    "Business_ETL.py:133-135 — ``row_sum`` branch, pure row arithmetic, "
    "no shuffle) and the signature hours-parser roundtrip (reference "
    "Business_ETL.py:107-131 'H:M-H:M' -> minutes, overnight wrap +1440, "
    "close==open -> 0 — ``hours`` branch over synthesized event spans). "
    "Merged from the round-1 ``horizontal_row_sum`` + "
    "``hours_parser_roundtrip`` registrations to keep every oracle-backed "
    "query inside the driver's 50-slot gate while freeing a slot for "
    "weighted_sample_orders — both plans survive verbatim as the panel's "
    "branches.",
)
def row_arithmetic_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    rs = horizontal_row_sum(spark, sf_dir).select(
        F.lit("row_sum").alias("op"),
        F.col("l_orderkey").alias("key_a"),
        F.col("l_linenumber").alias("key_b"),
        "row_sum",
        "flags_sum",
        F.lit(None).cast("double").alias("open_hours"),
    )
    hrs = hours_parser_roundtrip(spark, sf_dir).select(
        F.lit("hours").alias("op"),
        F.col("event_id").alias("key_a"),
        F.lit(None).cast("int").alias("key_b"),
        F.lit(None).cast("double").alias("row_sum"),
        F.lit(None).cast("int").alias("flags_sum"),
        "open_hours",
    )
    return rs.unionAll(hrs)


@query(
    "range_join_purchase_click",
    """
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tp
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tc
      FROM events WHERE event_type = 'click'
    )
    SELECT p.purchase_id, c.click_id, CAST(abs(p.tp - c.tc) AS BIGINT) AS gap_s
    FROM p JOIN c ON p.user_id = c.user_id AND abs(p.tp - c.tc) <= 300
    """,
    doc="Range (interval) join via time-bucketing (operators/asof.py:"
    "time_bucket_range_join): clicks within 5 minutes of a purchase by the "
    "same user. The theta predicate |tp-tc|<=300 becomes an equi-join on "
    "(user, bucket+-1) + a residual filter — the decomposition that turns "
    "an O(n*m) nested loop into a shuffle join Catalyst handles normally.",
)
def range_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import time_bucket_range_join

    ev = tbl(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").cast("long").alias("tp")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").cast("long").alias("tc")
    )
    out = time_bucket_range_join(
        p, c, on=["user_id"], left_ts="tp", right_ts="tc",
        max_gap=F.lit(300), bucket=F.lit(300),
    )
    return out.select(
        "purchase_id", "click_id",
        F.abs(F.col("tp") - F.col("tc")).cast("bigint").alias("gap_s"),
    )


def zscore_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers via window aggregates (avg + stddev_pop
    over an unordered partition — one shuffle on the group key): orders
    more than 1.5 sigma from their priority class's mean price. The
    grouped-map pandas twin lives in operators/grouped.py; this is the
    plan Catalyst optimizes. Threshold 1.5 sigma: the synthetic price
    distribution is near-uniform (max |z| ~1.78), so 2 sigma never fires.
    Oracle-gated as the ``zscore`` branch of ``window_analytics_panel``."""
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    z = F.round(
        (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
        / F.stddev_pop("o_totalprice").over(w),
        4,
    )
    return (
        o.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= 1.5)
        .select("o_orderkey", "o_orderpriority", "zscore")
    )


@query(
    "blocked_linkage_pairs",
    """
    WITH v AS (
      SELECT c_custkey AS id,
             unnest(list_distinct(list_append(
               list_transform(range(1, len(c_name) + 1),
                              i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1, len(c_name))),
               c_name))) AS v
      FROM customer
    ), cand AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM v a JOIN v b ON a.v = b.v AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(levenshtein(an.c_name, bn.c_name) AS INTEGER) AS edit_distance
    FROM cand
    JOIN customer an ON an.c_custkey = id_a
    JOIN customer bn ON bn.c_custkey = id_b
    WHERE levenshtein(an.c_name, bn.c_name) <= 1
    """,
    doc="END-TO-END blocked record linkage over the FULL customer table: "
    "deletion-neighborhood blocking (SymSpell construction — exact for "
    "edit distance <= 1, see operators/dedup.py:"
    "deletion_neighborhood_candidates for the measured comparison vs "
    "MinHash-LSH, which bounds Jaccard, not edit distance, and floods "
    "candidates on this near-identical name space) -> levenshtein VERIFY "
    "on candidates only. Replaces the round-1 bounded-crossJoin demo "
    "(fuzzy_name_pairs): no crossJoin anywhere in the plan, candidate "
    "pairs ~1.7% of all pairs at recall 1.0, buckets bounded by alphabet "
    "size. The scale-representative entity-resolution pipeline shape: "
    "block -> verify -> emit links.",
)
def blocked_linkage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import deletion_neighborhood_candidates

    c = tbl(spark, sf_dir, "customer")
    cand = deletion_neighborhood_candidates(c, "c_custkey", "c_name").select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    an = c.select(F.col("c_custkey").alias("id_a"), F.col("c_name").alias("_na"))
    bn = c.select(F.col("c_custkey").alias("id_b"), F.col("c_name").alias("_nb"))
    return (
        cand.join(an, "id_a")
        .join(bn, "id_b")
        .withColumn("edit_distance", F.levenshtein("_na", "_nb").cast("int"))
        .filter(F.col("edit_distance") <= 1)
        .select("id_a", "id_b", "edit_distance")
    )


def rank_functions_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function panel (row_number/rank/dense_rank/
    percent_rank/cume_dist/ntile) in one window pass, fully tie-broken
    ordering so every rank and quartile assignment is deterministic
    across engines; deterministic row sample bounds the output across
    SFs. Oracle-gated as the ``rank`` branch of ``window_analytics_panel``."""
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).cast("int").alias("rn"),
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
        )
        .filter(F.col("o_orderkey") % 199 == 0)
    )


@query(
    "window_analytics_panel",
    """
    WITH rankb AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(row_number() OVER w AS INTEGER) AS rn,
             CAST(rank() OVER w AS INTEGER) AS rnk,
             CAST(dense_rank() OVER w AS INTEGER) AS drnk,
             round(percent_rank() OVER w, 6) AS prnk,
             round(cume_dist() OVER w, 6) AS cdist,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      QUALIFY o_orderkey % 199 = 0
    ), zb AS (
      SELECT o_orderkey, o_orderpriority,
             round((o_totalprice - avg(o_totalprice) OVER w)
                   / stddev_pop(o_totalprice) OVER w, 4) AS zscore
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority)
      QUALIFY abs(round((o_totalprice - avg(o_totalprice) OVER w)
                        / stddev_pop(o_totalprice) OVER w, 4)) >= 1.5
    )
    SELECT 'rank' AS op, o_orderkey, o_orderpriority,
           rn, rnk, drnk, prnk, cdist, quartile,
           CAST(NULL AS DOUBLE) AS zscore
    FROM rankb
    UNION ALL
    SELECT 'zscore' AS op, o_orderkey, o_orderpriority,
           CAST(NULL AS INTEGER) AS rn, CAST(NULL AS INTEGER) AS rnk,
           CAST(NULL AS INTEGER) AS drnk, CAST(NULL AS DOUBLE) AS prnk,
           CAST(NULL AS DOUBLE) AS cdist, CAST(NULL AS INTEGER) AS quartile,
           zscore
    FROM zb
    """,
    doc="Window-function panel, op-tagged: the full ranking-function pass "
    "(row_number/rank/dense_rank/percent_rank/cume_dist/ntile, fully "
    "tie-broken — ``rank`` branch) and per-group z-score outliers via "
    "unordered window aggregates (avg + stddev_pop, one shuffle on the "
    "group key — ``zscore`` branch). Merged from the round-3 "
    "``rank_functions_panel`` + ``zscore_outlier_orders`` registrations "
    "to keep every oracle-backed query inside the driver's 50-slot gate "
    "while freeing slots for the funnel/retention oracles — both window "
    "plans survive verbatim as the panel's two branches.",
)
def window_analytics_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    rankb = rank_functions_panel(spark, sf_dir).select(
        F.lit("rank").alias("op"),
        "o_orderkey",
        "o_orderpriority",
        "rn",
        "rnk",
        "drnk",
        "prnk",
        "cdist",
        "quartile",
        F.lit(None).cast("double").alias("zscore"),
    )
    zb = zscore_outlier_orders(spark, sf_dir).select(
        F.lit("zscore").alias("op"),
        "o_orderkey",
        "o_orderpriority",
        F.lit(None).cast("int").alias("rn"),
        F.lit(None).cast("int").alias("rnk"),
        F.lit(None).cast("int").alias("drnk"),
        F.lit(None).cast("double").alias("prnk"),
        F.lit(None).cast("double").alias("cdist"),
        F.lit(None).cast("int").alias("quartile"),
        "zscore",
    )
    return rankb.unionAll(zb)
