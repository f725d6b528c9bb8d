"""Writers.

The reference's write discipline (reference ``README.md:217-223``): domain
tables are *append*-mode (``ETL-script/Business_ETL.py:159`` et al.), the
unified table is *overwrite* (``join/unified_data_analytics.py:56``). The
reference's append is not idempotent — a re-delivered S3 event duplicates
rows. This engine's append writer dedups against existing primary keys via a
left-anti join (a deliberate, documented improvement; SURVEY.md §7).

Scale notes: partitioned writes enable partition pruning downstream;
``partitionOverwriteMode=dynamic`` (set in the session factory) makes
partitioned overwrites replace only touched partitions. The anti-join reads
only the key column of the existing table (column-pruned parquet scan), so
idempotent append at 100 TB costs one key-scan + one shuffle, not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_overwrite(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Atomic rebuild (reference ``join/unified_data_analytics.py:56``).

    ``sort_by`` sorts within output partitions before writing so parquet
    row-group min/max stats become selective — point/range filters on the
    sort key skip row groups at scan time (SURVEY.md §4 'sorted-on-PK
    writes')."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_append_idempotent(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Append only rows whose ``keys`` are not already present.

    Emulates MERGE-insert-if-absent (the reference gets this from Neo4j's
    ``MERGE``, ``neo4j_load/graph.cypher:24`` ff., but NOT from its parquet
    appends). New-batch-internal duplicates are also dropped.

    The anti-join uses NULL-SAFE key equality: nullable key components (e.g.
    the user table's ``friend`` column for friendless users) must still
    dedupe — a plain equi-anti-join would re-append NULL-keyed rows forever.
    """
    from functools import reduce

    spark: SparkSession = df.sparkSession
    fresh = df.dropDuplicates(keys)
    # Does the target exist yet? (filesystem metadata check — a read attempt
    # would work but logs a scary handled-exception stack trace)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    existing_keys = (
        spark.read.parquet(path).select(*keys).alias("_existing") if fs.exists(hpath) else None
    )
    if existing_keys is not None:
        fresh_a = fresh.alias("_fresh")
        cond = reduce(
            lambda a, b: a & b,
            [fresh_a[k].eqNullSafe(existing_keys[k]) for k in keys],
        )
        fresh = fresh_a.join(existing_keys, on=cond, how="left_anti")
    # Appending nothing must not create table state: an empty write would
    # still materialize the directory, falsely signalling "this domain has
    # data" to consumers gating on table existence (pipeline.py's unified
    # DAG gate).
    if fresh.isEmpty():
        return
    if sort_by:
        fresh = fresh.sortWithinPartitions(*sort_by)
    writer = fresh.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def export_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV export for external-system interop — the reference's
    parquet -> CSV -> Neo4j bridge (reference README.md:351-353,
    graph.cypher:5). The graph itself lives Spark-side now
    (operators.graph), so this exists purely for interop with external
    consumers; array/struct columns must be flattened first (CSV cannot
    carry them — the reference's flat-schema rule, README.md:160-162)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
) -> int:
    """Compact a parquet directory's small files (the operational follow-up
    to idempotent streaming appends, which produce one file set per
    micro-batch) into ~``target_mb`` files. Returns the new file count.

    Staged rewrite: write to ``<path>__compacting``, then swap directories
    via filesystem renames so readers never observe a HALF-written table.
    NB this is not fully atomic on plain parquet: between the two renames
    the path briefly does not exist (a concurrent read fails path-not-found
    rather than seeing partial data), and if the rollback rename itself
    fails the primary copy survives under ``<path>__precompact`` (logged).
    On real deployments point callers at a table format with atomic commit
    (Delta/Iceberg OPTIMIZE / rewrite-data-files); plain-parquet
    directory-swap is the portable, crash-recoverable-but-not-atomic
    equivalent.
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    staging = f"{path}__compacting"
    backup = f"{path}__precompact"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(staging)
    s_path = jvm.org.apache.hadoop.fs.Path(staging)
    b_path = jvm.org.apache.hadoop.fs.Path(backup)
    if not fs.rename(hpath, b_path):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(s_path, hpath):
        if not fs.rename(b_path, hpath):  # roll back
            raise IOError(
                f"compaction swap failed AND rollback failed: original data "
                f"is intact under {backup}; restore it manually"
            )
        raise IOError(f"compaction swap failed: could not move {staging} into place")
    fs.delete(b_path, True)
    return n_files
