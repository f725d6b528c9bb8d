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

import datetime as _dt
import threading

from pyspark.sql import DataFrame, SparkSession

# Above this many affected partitions, merge_upsert switches its rewrite-set
# predicate from a literal OR-of-ANDs (statically prunable, provable in
# EXPLAIN) to a broadcast semi-join on the partition columns (dynamic
# partition pruning): a thousands-deep boolean expression tree makes Catalyst
# analysis itself the bottleneck long before execution.
AFFECTED_LITERAL_MAX = 32

#: Directory name Spark/Hive use for a NULL partition value.
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

# partitionColumnTypeInference is a SESSION conf: set/restore around a read
# races with concurrent jobs on the same SparkSession (two CDC streams, a
# merge next to a compaction). Partition discovery happens eagerly inside
# spark.read.parquet, so holding this lock across {set, read, restore}
# scopes the override correctly for every in-process caller.
_PARTITION_INFERENCE_LOCK = threading.Lock()


def _escape_partition_value(spark: SparkSession, v) -> str:
    """Directory-name form of one partition value, exactly as Spark wrote it.

    Python-side values must first be rendered the way SPARK renders them —
    str() alone diverges: None -> Spark's __HIVE_DEFAULT_PARTITION__ (not
    'None'), booleans -> 'true'/'false' (not 'True'/'False'); dates and
    datetimes str() to the ISO forms Spark writes. Then Spark/Hive
    percent-escape special characters in partition directory names
    (':' -> %3A etc. — ExternalCatalogUtils.escapePathName); building the
    path with a raw f"{c}={v}" targets a nonexistent directory for such
    values, silently leaving stale files behind. Delegate to the SAME JVM
    routine the writer used, so the round-trip is exact by construction.
    """
    if v is None:
        # Spark writes the sentinel literally (it contains no specials).
        return HIVE_DEFAULT_PARTITION
    if isinstance(v, bool):
        rendered = "true" if v else "false"
    elif isinstance(v, _dt.datetime):
        # Spark's timestampToString trims trailing zeros from the
        # fractional-seconds part ('.123000' -> '.123', '.000000' -> '');
        # Python isoformat pads to 6 digits — normalize or the
        # emptied-partition delete targets a directory that doesn't exist.
        rendered = v.isoformat(sep=" ")
        if "." in rendered:
            rendered = rendered.rstrip("0").rstrip(".")
    elif isinstance(v, _dt.date):
        rendered = v.isoformat()
    else:
        rendered = str(v)
    return spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(
        rendered
    )


def _read_no_partition_inference(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with directory-name partition-TYPE inference off,
    concurrency-safe: the session conf is mutated only inside the module
    lock (see _PARTITION_INFERENCE_LOCK). All partition columns arrive as
    written strings; callers cast explicitly."""
    conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    with _PARTITION_INFERENCE_LOCK:
        old = spark.conf.get(conf_key)
        spark.conf.set(conf_key, "false")
        try:
            return spark.read.parquet(path)
        finally:
            spark.conf.set(conf_key, old)


def _read_target(spark: SparkSession, path: str, like: DataFrame, pcols: list[str]) -> DataFrame:
    """Read a parquet target for merging, with partition-column types taken
    from the SOURCE schema instead of directory-name inference.

    Default partition-type inference parses directory names, so a string
    partition value that looks numeric ('01') reads back as int 1 —
    changing key equality under eqNullSafe and re-writing the partition as
    p=1. Disable inference for this read (partition values arrive as
    written strings) and cast to the source column's type: exact for the
    string case, and the identical parse Spark would have done otherwise
    for genuinely-typed columns.
    """
    from pyspark.sql import functions as F

    tgt = _read_no_partition_inference(spark, path)
    for c in pcols:
        tgt = tgt.withColumn(c, F.col(c).cast(like.schema[c].dataType))
    return tgt


#: staged-swap backup suffixes, one per swapping writer.
_BACKUP_SUFFIXES = ("__premerge", "__precompact")


def _recover_stale_swap(spark: SparkSession, fs, jvm, path: str) -> None:
    """Detect a crashed directory swap BEFORE treating the target as absent
    or readable.

    The swap protocol (write staging -> rename primary to backup -> rename
    staging to primary -> delete backup) can crash in two observable
    states:

    - primary MISSING + backup present: mid-swap crash. The data lives
      under the backup (and possibly a complete new copy under staging).
      Creating a "new" table here would silently mask total data loss —
      raise loudly with recovery instructions instead.
    - primary present + backup present: crash between the second rename
      and the backup delete. The swap COMPLETED; the backup is a stale
      pre-swap copy — finish the protocol by deleting it.
    """
    primary_exists = fs.exists(jvm.org.apache.hadoop.fs.Path(path))
    for suffix in _BACKUP_SUFFIXES:
        b_path = jvm.org.apache.hadoop.fs.Path(f"{path}{suffix}")
        if not fs.exists(b_path):
            continue
        if primary_exists:
            # completed swap, stale backup: finish the crashed protocol
            fs.delete(b_path, True)
        else:
            raise IOError(
                f"stale swap backup detected: {path} is missing but "
                f"{path}{suffix} exists — a directory swap crashed mid-way. "
                f"Restore it (rename {path}{suffix} back to {path}) before "
                "writing; refusing to create a fresh table over lost data"
            )


def _swap_directories(fs, jvm, path: str, staging: str, backup: str, op: str) -> None:
    """The shared staged-swap tail: primary -> backup, staging -> primary,
    delete backup; rollback on failure. Crash leaves either the old table,
    or the new table (with a stale backup the next writer cleans via
    _recover_stale_swap), or the old table under ``backup`` — never a half
    table."""
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    s_path = jvm.org.apache.hadoop.fs.Path(staging)
    b_path = jvm.org.apache.hadoop.fs.Path(backup)
    if not fs.rename(hpath, b_path):
        raise IOError(f"{op} swap failed: could not move {path} aside")
    if not fs.rename(s_path, hpath):
        if not fs.rename(b_path, hpath):  # roll back
            raise IOError(
                f"{op} swap failed AND rollback failed: original data is "
                f"intact under {backup}; restore it manually"
            )
        raise IOError(f"{op} swap failed: could not move {staging} into place")
    fs.delete(b_path, True)


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
    # would work but logs a scary handled-exception stack trace). A missing
    # path with a swap backup present is a crashed merge/compact — refuse
    # to treat it as first-write (that would mask the lost table).
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    _recover_stale_swap(spark, fs, jvm, path)
    existing_keys = (
        _read_target(spark, path, df, [c for c in (partition_by or []) if c in keys])
        .select(*keys)
        .alias("_existing")
        if fs.exists(hpath)
        else None
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
    # DAG gate). The anti-join is persisted so the emptiness probe and the
    # write execute it ONCE, not twice (it scans the whole existing key
    # column — at 100 TB recomputing it doubles the advertised cost).
    cached = fresh.persist()
    try:
        if cached.isEmpty():
            return
        out = cached.sortWithinPartitions(*sort_by) if sort_by else cached
        writer = out.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    finally:
        cached.unpersist()


def merge_upsert(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    dedup_order_by: list[str] | None = None,
) -> dict:
    """Keyed MERGE emulation on plain parquet: UPDATE matched keys, INSERT
    new ones — the full upsert the reference's Lambda-triggered rebuild
    implies (reference ``README.md:217-223`` re-runs the unified overwrite
    because parquet appends can't update; ``join/unified_data_analytics.py:
    46-56``) but scoped to touched partitions instead of the whole table.

    Plan (partitioned target):

    1. affected partitions = partitions holding a matched key (semi-join,
       key-column-pruned scan) ∪ partitions the source writes into. Collected
       to the driver — small-by-contract (a merge batch touches few
       partitions; the list is partition VALUES, never rows).
    2. rewrite set = (target rows in affected partitions, minus matched keys
       via null-safe anti-join) ∪ source. Unaffected partitions are never
       read past their partition values nor rewritten — at 100 TB the cost
       scales with the touched slice, not the table.
    3. dynamic partition overwrite writes exactly the partitions present in
       the rewrite set. Safe to read-and-overwrite in one job: dynamic mode
       deletes replaced partition files at COMMIT, after every scan task has
       finished (static mode clears the directory up front, hence the
       staging swap in the unpartitioned branch).
    4. partitions whose every row was matched and re-homed elsewhere (key
       changed partition value) end up absent from the rewrite set, so
       dynamic overwrite would leave their stale files behind — they are
       deleted explicitly from the collected affected-list.

    Source batches must be key-unique (multiple updates for one key is the
    ambiguity Delta's MERGE rejects); pass ``dedup_order_by`` for
    latest-wins resolution instead of the error. SOURCE partition values
    must be non-null (validated); a TARGET holding NULL partitions (other
    writers can produce them) still merges correctly — matched rows in the
    NULL partition are rewritten (null-safe slice) and an emptied NULL
    partition's ``__HIVE_DEFAULT_PARTITION__`` directory is deleted.

    Unpartitioned target: full rewrite through a staged directory swap
    (crash leaves either the old table, or the new table, or the old table
    under ``<path>__premerge`` — never a half table). On real deployments
    prefer a table format with atomic MERGE (Delta/Iceberg); this is the
    portable plain-parquet equivalent, and the jars are absent here.

    Returns ``{"created": bool, "affected_partitions": int,
    "emptied_partitions": int}``.
    """
    from functools import reduce

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark: SparkSession = df.sparkSession
    pcols = list(partition_by or [])

    fresh = df
    if dedup_order_by:
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in dedup_order_by])
        fresh = (
            fresh.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )
    # the source batch feeds four actions (validation, emptiness, key
    # extraction, the rewrite union): persist once so an expensive caller
    # lineage (a CDC batch unioned with stored rows) executes once
    fresh = fresh.persist()
    try:
        return _merge_upsert_body(
            spark, fresh, path, keys, pcols, partition_by, sort_by
        )
    finally:
        fresh.unpersist()


def _merge_upsert_body(
    spark: SparkSession,
    fresh: DataFrame,
    path: str,
    keys: list[str],
    pcols: list[str],
    partition_by: list[str] | None,
    sort_by: list[str] | None,
) -> dict:
    from functools import reduce

    from pyspark.sql import functions as F

    checks = fresh.select(*keys, *pcols).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.max(F.col(c).isNull().cast("int")).alias(f"_null_{c}") for c in pcols],
    )
    bad_cond = F.col("_n") > 1
    for c in pcols:
        bad_cond = bad_cond | (F.col(f"_null_{c}") == 1)
    bad = checks.filter(bad_cond).limit(1).collect()
    if bad:
        if bad[0]["_n"] > 1:
            raise ValueError(
                f"merge_upsert: source has multiple rows for key "
                f"{tuple(bad[0][k] for k in keys)}; pass dedup_order_by for latest-wins"
            )
        raise ValueError("merge_upsert: null partition values are not mergeable")
    # An empty batch merges nothing: no table creation, no partition scan,
    # no full rewrite of an unpartitioned target (streaming sinks routinely
    # deliver empty micro-batches on restart).
    if fresh.isEmpty():
        return {"created": False, "affected_partitions": 0, "emptied_partitions": 0}

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # A missing path with a swap backup present is a crashed merge/compact:
    # creating a "new" table here would silently mask the lost history.
    _recover_stale_swap(spark, fs, jvm, path)
    if not fs.exists(hpath):
        write_overwrite(fresh, path, partition_by=partition_by, sort_by=sort_by)
        return {"created": True, "affected_partitions": 0, "emptied_partitions": 0}

    tgt = _read_target(spark, path, fresh, pcols)
    src_keys = fresh.select(*keys).dropDuplicates(keys).alias("_src")

    def _key_cond(left):
        return reduce(lambda a, b: a & b, [left[k].eqNullSafe(src_keys[k]) for k in keys])

    if not pcols:
        tgt_a = tgt.alias("_tgt")
        out = tgt_a.join(src_keys, on=_key_cond(tgt_a), how="left_anti").unionByName(fresh)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        staging, backup = f"{path}__merging", f"{path}__premerge"
        out.write.mode("overwrite").parquet(staging)
        _swap_directories(fs, jvm, path, staging, backup, "merge")
        return {"created": False, "affected_partitions": 0, "emptied_partitions": 0}

    tgt_a = tgt.alias("_tgt")
    affected_rows = (
        tgt_a.join(src_keys, on=_key_cond(tgt_a), how="left_semi")
        .select(*pcols)
        .unionByName(fresh.select(*pcols))
        .dropDuplicates(pcols)
        .collect()
    )
    affected = {tuple(r[c] for c in pcols) for r in affected_rows}

    def _part_slice(frame):
        """Rows of ``frame`` in the affected partitions.

        Small affected sets: a literal OR-of-ANDs predicate — statically
        pushed to PartitionFilters (pinned in test_merge_upsert.py). Wide
        sets (a CDC batch touching thousands of partitions): the literal
        form is a thousands-deep expression tree that blows up Catalyst
        analysis, so switch to a broadcast LEFT SEMI join on the partition
        columns — Spark's dynamic partition pruning covers the file skip,
        and the join predicate stays O(1) deep. SOURCE partition values
        are validated non-null, but a TARGET written by other writers may
        hold NULL partitions whose keys this merge matches — the semi-join
        condition is null-safe so those rows are rewritten (a plain
        equi-join would silently strand the matched old row as a
        duplicate).
        """
        if len(affected) <= AFFECTED_LITERAL_MAX:
            return frame.filter(
                reduce(
                    lambda a, b: a | b,
                    [
                        reduce(
                            lambda a, b: a & b,
                            [frame[c].eqNullSafe(F.lit(v)) for c, v in zip(pcols, t)],
                        )
                        for t in affected
                    ],
                )
            )
        aff_df = spark.createDataFrame(
            [tuple(t) for t in sorted(affected, key=repr)], fresh.select(*pcols).schema
        ).alias("_aff")
        cond = reduce(
            lambda a, b: a & b,
            [frame[c].eqNullSafe(F.col(f"_aff.{c}")) for c in pcols],
        )
        return frame.join(F.broadcast(aff_df), on=cond, how="left_semi")

    tgt_slice = _part_slice(tgt).alias("_tgt")
    kept = tgt_slice.join(src_keys, on=_key_cond(tgt_slice), how="left_anti")
    out = kept.unionByName(fresh)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out = out.persist()
    try:
        written = {
            tuple(r[c] for c in pcols) for r in out.select(*pcols).dropDuplicates(pcols).collect()
        }
        # Dynamic partition overwrite is a CORRECTNESS requirement here, not
        # a tuning default: with the Spark-default static mode this overwrite
        # would delete EVERY partition of the target, not just the rewritten
        # ones. Set it on the writer itself rather than trusting the session
        # conf (the project session factory sets dynamic, but merge_upsert
        # must be safe from any session).
        out.write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
            *pcols
        ).parquet(path)
    finally:
        out.unpersist()
    emptied = affected - written
    for t in emptied:
        sub = "/".join(
            f"{c}={_escape_partition_value(spark, v)}" for c, v in zip(pcols, t)
        )
        dead = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
        if fs.exists(dead) and not fs.delete(dead, True):
            raise IOError(f"merge_upsert: failed to delete emptied partition {path}/{sub}")
    return {
        "created": False,
        "affected_partitions": len(affected),
        "emptied_partitions": len(emptied),
    }


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
    partition_by: list[str] | None = None,
    partition_types: dict | None = None,
) -> int:
    """Compact a parquet directory's small files (the operational follow-up
    to idempotent streaming appends and CDC merges, which produce one file
    set per micro-batch) into ~``target_mb`` files. Returns the planned
    file count (per partition-directory when partitioned).

    ``partition_by`` preserves a partitioned layout: rows are hash-
    clustered on the partition columns so each partition directory
    collapses to one file (a heavily-skewed single partition stays one
    task — acceptable for maintenance; split it manually if it exceeds
    executor memory). ``partition_types`` (col -> Spark DataType) re-reads
    with directory-name type inference DISABLED and casts explicitly — the
    same '01'-reads-back-as-1 hazard merge_upsert guards against; pass it
    whenever partition values are strings that can look numeric.

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
    _recover_stale_swap(spark, fs, jvm, path)
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    staging = f"{path}__compacting"
    backup = f"{path}__precompact"
    if partition_types:
        from pyspark.sql import functions as F

        df = _read_no_partition_inference(spark, path)
        for c, dt in partition_types.items():
            df = df.withColumn(c, F.col(c).cast(dt))
    else:
        df = spark.read.parquet(path)
    if partition_by:
        writer = df.repartition(n_files, *partition_by).write.mode("overwrite").partitionBy(
            *partition_by
        )
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(staging)
    _swap_directories(fs, jvm, path, staging, backup, "compaction")
    return n_files


def shard_assignment(key, n_shards: int, salt: str = "shard:"):
    """Deterministic shard id in [0, n_shards) from the portable md5
    hash of the key — layout-free (repartitioning the input can never
    move a document between shards) and engine-portable (the manifest
    twin recomputes it in DuckDB). Column-level so readers/auditors can
    re-derive membership without touching the written files."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from ..operators.dedup import portable_hash

    if n_shards < 1:
        raise ValueError(f"shard_assignment: n_shards must be >= 1, got {n_shards}")
    c = key if isinstance(key, Column) else F.col(key)
    # NULL keys have no shard identity: the hash would be NULL, the
    # writer would emit a __HIVE_DEFAULT_PARTITION__ directory, and the
    # manifest's range() join would silently drop the group — documents
    # on disk that no manifest row accounts for, the exact silent loss
    # the manifest exists to make impossible. Raise in-plan instead
    # (merge_upsert's duplicate-key discipline).
    guard = F.assert_true(
        c.isNotNull(),
        F.lit("shard_assignment: NULL shard key — shard membership is a "
              "pure function of the key; drop or fill NULL keys first"),
    )
    return F.when(
        guard.isNull(),
        F.pmod(portable_hash(c.cast("string"), salt=salt), F.lit(int(n_shards))),
    )


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    token_col: str | None = None,
    salt: str = "shard:",
) -> DataFrame:
    """Per-shard accounting — the auditable contract of a shard export:
    ``(shard, n_docs, n_tokens, key_checksum)``. The checksum is the SUM
    of the portable md5 hash of every member key — order-insensitive and
    exactly re-derivable from the raw corpus OR from the written shard
    files, so 'did every document land in exactly the right shard,
    nothing lost, nothing duplicated?' is one aggregate + one equality,
    never a full-corpus diff. Empty shards appear with zero counts (a
    training loader enumerates [0, n_shards) — a silently missing
    manifest row reads as data loss)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import portable_hash

    spark = df.sparkSession
    got = (
        df.groupBy(shard_assignment(key_col, n_shards, salt).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col(token_col)).cast("bigint")
                if token_col
                else F.lit(None).cast("bigint")
            ).alias("n_tokens"),
            F.sum(
                portable_hash(F.col(key_col).cast("string"), salt="shardck:")
            ).alias("key_checksum"),
        )
    )
    allshards = spark.range(int(n_shards)).select(
        F.col("id").cast("int").alias("shard")
    )
    return allshards.join(got, "shard", "left").select(
        "shard",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("n_tokens", F.lit(0) if token_col else F.lit(None).cast("bigint")).alias("n_tokens"),
        F.coalesce("key_checksum", F.lit(0)).alias("key_checksum"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    order_by: list | None = None,
    token_col: str | None = None,
    salt: str = "shard:",
) -> DataFrame:
    """Export a training corpus as ``n_shards`` deterministic shard
    directories plus a manifest — the pipeline-tail sink a trainer
    consumes.

    Determinism contract (pinned in pytest): shard membership is a pure
    function of the key (``shard_assignment``), file content order
    within a shard follows ``order_by`` (default: the key — curriculum
    sorts plug in here), and re-running the export over the same corpus
    writes byte-equivalent shard contents regardless of input
    partitioning — the exactly-once discipline of the other writers at
    the corpus-export grain.

    Layout: ``path/shards/shard=K/`` parquet dirs (ONE file per shard:
    the frame repartitions ON the shard column into ``n_shards`` tasks,
    so each shard's rows live in exactly one task and partitionBy emits
    exactly one file per directory — hash collisions between shard ids
    may co-locate two shards in one task, which still writes one file
    into each of its directories) and ``path/manifest/`` (the
    :func:`shard_manifest` rows, including empty shards). Returns the
    manifest as read back from disk.

    At 100 TB: one hash repartition of the corpus (the unavoidable
    placement shuffle) + an in-task sort; the manifest is a partial-agg'd
    groupBy on the same assignment expression. Readers audit with one
    aggregate per side (manifest == re-derived manifest)."""
    from pyspark.sql import functions as F

    if "shard" in df.columns:
        raise ValueError("write_training_shards: column 'shard' already exists")
    # the key column is ALWAYS the final tiebreaker: a caller-supplied
    # curriculum sort (quality score, length) is rarely a total order,
    # and tied rows would otherwise keep shuffle-arrival order — breaking
    # the byte-equivalence contract across input layouts
    order = list(order_by) + [F.col(key_col)] if order_by is not None else [
        F.col(key_col)
    ]
    sharded = (
        df.withColumn("shard", shard_assignment(key_col, n_shards, salt))
        .repartition(int(n_shards), F.col("shard"))
        .sortWithinPartitions(F.col("shard"), *order)
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(f"{path}/shards")
    manifest = shard_manifest(df, key_col, n_shards, token_col, salt)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/manifest")
    return df.sparkSession.read.parquet(f"{path}/manifest")


def merge_bloom_store(
    new_words: DataFrame,
    path: str,
    n_bits: int,
    n_hashes: int,
) -> None:
    """Fold freshly-built bloom words into the persistent filter at
    ``path`` (create it on first write). Same staging+swap discipline as
    ``merge_upsert`` — the merged frame READS the current store, so an
    in-place overwrite would clobber its own input; a crash between
    write and swap recovers via the standard stale-swap rule. The merge
    itself is exact bit_or (operators/bloom.py:merge_blooms), and every
    stored row carries its build params, so folding with mismatched
    (n_bits, n_hashes) raises in-plan instead of corrupting the bitmap."""
    from ..operators.bloom import merge_blooms

    spark = new_words.sparkSession
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    _recover_stale_swap(spark, fs, jvm, path)
    if not fs.exists(hpath):
        new_words.write.mode("overwrite").parquet(path)
        return
    # an empty fold is a no-op on an OR-bitmap — skip the full
    # read+rewrite+swap of the store (streaming replays and dup-heavy
    # batches deliver empty novel sets routinely; merge_upsert's
    # fresh.isEmpty() short-circuit, same reason)
    if new_words.isEmpty():
        return
    merged = merge_blooms(
        [spark.read.parquet(path), new_words], n_bits, n_hashes
    )
    staging, backup = f"{path}__merging", f"{path}__premerge"
    merged.write.mode("overwrite").parquet(staging)
    _swap_directories(fs, jvm, path, staging, backup, "merge")
