"""End-to-end Yelp pipeline orchestration — the engine's equivalent of the
reference's whole deployment: the three domain ETL notebooks + the unified
join job + the graph load, as one callable API.

Reference topology (``README.md:140-152`` job DAG; ``lambda/
trigeer_ETL_Pipeline.py`` trigger): Business ETL ∥ Review ETL ∥ User ETL →
UnifiedAnalytics; domains append, unified rebuilds; Glue crawler refreshes
the catalog; CSV exports feed Neo4j. Here:

- ``run_batch``   — one batch pass raw JSON -> processed parquet ->
  unified -> (optional) graph tables. Domains use the idempotent append
  writer (re-running a batch is a no-op); unified is an overwrite rebuild.
- ``run_streaming`` — the Lambda-trigger replacement: per-domain file
  streams drain whatever is in the landing folders (Trigger.AvailableNow),
  then the unified table rebuilds once, mirroring the reference's
  "unified depends on all three domains" gate.
- Processed tables register in the Spark catalog (the Glue/Athena
  replacement) so ``spark.sql("SELECT ... FROM yelp_unified")`` works.

Scale: each domain pipeline is one lazy plan ending in a partitioned
write; review output partitions by year(date) and business by state
(SURVEY.md §1.4) so downstream filters prune partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators.business import business_etl
from .operators.graph import build_edges, build_vertices
from .operators.review import review_etl
from .operators.unified import unified_analytics
from .operators.user import user_etl, user_friend_edges
from .schemas import BUSINESS_RAW_SCHEMA, REVIEW_RAW_SCHEMA, USER_RAW_SCHEMA
from .sources.readers import read_json_lines
from .sources.writers import write_append_idempotent, write_overwrite
from .streaming.pipeline import stream_domain_etl


@dataclass
class YelpPaths:
    business_raw: str
    review_raw: str
    user_raw: str
    out_dir: str

    @property
    def business_out(self) -> str:
        return f"{self.out_dir}/business_processed"

    @property
    def review_out(self) -> str:
        return f"{self.out_dir}/review_processed"

    @property
    def user_out(self) -> str:
        return f"{self.out_dir}/user_processed"

    @property
    def unified_out(self) -> str:
        return f"{self.out_dir}/unified_analytics"


DOMAIN_KEYS = {
    "business": ["business_id", "category"],
    "review": ["review_id"],
    "user": ["user_id", "friend"],
}


def run_batch(
    spark: SparkSession,
    paths: YelpPaths,
    as_of: str | None = "2026-01-01 00:00:00",
    build_graph: bool = False,
    register_views: bool = True,
    partition_outputs: bool = True,
) -> dict[str, DataFrame]:
    """One batch pass over the raw JSON folders. Returns the output tables.

    Idempotent: re-running with the same inputs appends nothing (domain
    writers anti-join on primary keys) and rebuilds unified to the same
    state.

    ``partition_outputs`` (SURVEY.md §1.4 scale layout): business
    partitions by ``state``, review by ``review_year`` (derived, kept in
    the schema) — downstream filters on state/year prune partitions
    instead of scanning the world.
    """
    from pyspark.sql import functions as F

    biz = business_etl(read_json_lines(spark, paths.business_raw, BUSINESS_RAW_SCHEMA))
    rev = review_etl(read_json_lines(spark, paths.review_raw, REVIEW_RAW_SCHEMA))
    usr = user_etl(read_json_lines(spark, paths.user_raw, USER_RAW_SCHEMA), as_of=as_of)

    if partition_outputs:
        rev = rev.withColumn("review_year", F.year("date"))
        write_append_idempotent(
            biz, paths.business_out, keys=DOMAIN_KEYS["business"], partition_by=["state"]
        )
        write_append_idempotent(
            rev, paths.review_out, keys=DOMAIN_KEYS["review"], partition_by=["review_year"]
        )
    else:
        write_append_idempotent(biz, paths.business_out, keys=DOMAIN_KEYS["business"])
        write_append_idempotent(rev, paths.review_out, keys=DOMAIN_KEYS["review"])
    write_append_idempotent(usr, paths.user_out, keys=DOMAIN_KEYS["user"])

    return _rebuild_unified(spark, paths, build_graph, register_views)


def run_streaming(
    spark: SparkSession,
    paths: YelpPaths,
    checkpoint_dir: str,
    as_of: str | None = "2026-01-01 00:00:00",
    build_graph: bool = False,
    register_views: bool = True,
    partition_outputs: bool = True,
) -> dict[str, DataFrame]:
    """Drain the three domain landing folders via Structured Streaming
    (exactly-once per file), then rebuild unified — the reference's
    S3-event -> Lambda -> job-DAG path without the Lambda.

    ``partition_outputs`` MUST match what ``run_batch`` used (both default
    True): the streams append into the same domain tables, and a mixed
    partitioned/unpartitioned directory breaks partition discovery for
    every reader. The review stream derives ``review_year`` exactly like
    the batch path so both write the same schema and layout."""
    from pyspark.sql import functions as F

    if partition_outputs:
        def _review_etl(df):
            return review_etl(df).withColumn("review_year", F.year("date"))

        biz_layout = {"partition_by": ["state"]}
        rev_layout = {"partition_by": ["review_year"]}
    else:
        _review_etl = review_etl
        biz_layout = rev_layout = {}
    streams = [
        stream_domain_etl(
            spark, paths.business_raw, BUSINESS_RAW_SCHEMA, business_etl,
            paths.business_out, f"{checkpoint_dir}/business", DOMAIN_KEYS["business"],
            **biz_layout,
        ),
        stream_domain_etl(
            spark, paths.review_raw, REVIEW_RAW_SCHEMA, _review_etl,
            paths.review_out, f"{checkpoint_dir}/review", DOMAIN_KEYS["review"],
            **rev_layout,
        ),
        stream_domain_etl(
            spark, paths.user_raw, USER_RAW_SCHEMA,
            lambda df: user_etl(df, as_of=as_of),
            paths.user_out, f"{checkpoint_dir}/user", DOMAIN_KEYS["user"],
        ),
    ]
    for q in streams:
        q.awaitTermination()
    return _rebuild_unified(spark, paths, build_graph, register_views)


def _domain_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()).exists(hpath)


def _rebuild_unified(
    spark: SparkSession, paths: YelpPaths, build_graph: bool, register_views: bool
) -> dict[str, DataFrame]:
    # The reference's job DAG gates UnifiedAnalytics on ALL THREE domain
    # tasks having produced data (README.md:150,215: 'Only when all three
    # domains have data will the UnifiedAnalytics task execute'). Mirror
    # that: with any domain still missing, return what exists and skip the
    # unified rebuild.
    missing = [
        p
        for p in (paths.business_out, paths.review_out, paths.user_out)
        if not _domain_exists(spark, p)
    ]
    if missing:
        out: dict[str, DataFrame] = {}
        for name, p in (
            ("business", paths.business_out),
            ("review", paths.review_out),
            ("user", paths.user_out),
        ):
            if _domain_exists(spark, p):
                out[name] = spark.read.parquet(p)
                if register_views:
                    out[name].createOrReplaceTempView(f"yelp_{name}")
        return out

    biz_t = spark.read.parquet(paths.business_out)
    rev_t = spark.read.parquet(paths.review_out)
    usr_t = spark.read.parquet(paths.user_out)
    unified = unified_analytics(rev_t, usr_t, biz_t)
    write_overwrite(unified, paths.unified_out)

    out: dict[str, DataFrame] = {
        "business": biz_t,
        "review": rev_t,
        "user": usr_t,
        "unified": spark.read.parquet(paths.unified_out),
    }
    if build_graph:
        out["vertices"] = build_vertices(biz_t, rev_t, usr_t)
        out["edges"] = build_edges(biz_t, rev_t, usr_t, user_friend_edges(usr_t))
    if register_views:
        for name, df in out.items():
            df.createOrReplaceTempView(f"yelp_{name}")
    return out
