"""BM25 retrieval scoring — rank documents against a bag-of-terms query
(Robertson & Zaragoza 2009; the idf variant is Lucene's
``ln(1 + (N - df + 0.5) / (df + 0.5))``, which never goes negative).

The retrieval leg of the text-analysis family: TF-IDF (text.py) ranks
terms WITHIN a document; BM25 ranks DOCUMENTS against a query — the
scoring function a training-data pipeline uses for targeted corpus
probes ("show me what the corpus says about X") and hard-negative
mining around a retrieval index.

Spark shape — all JVM, one posting pass plus one narrow stats pass:

- document length (dl) is an EXPRESSION over the token array (no
  explode needed for the denominator);
- term frequencies come from ONE explode filtered to the query's terms
  BEFORE the shuffle — the stream is |matching positions|, not corpus
  positions, so a k-term query over 100 TB shuffles only the posting
  rows (predicate pushdown for explodes: filter inside the array first);
  per-term document frequency folds off that same tf aggregate, never a
  second explode;
- the idf table is <= |terms| rows and broadcasts; N and avgdl come
  from one extra narrow aggregate over the token-count expression (the
  only other read of the corpus), also broadcast;
- scores round to 6 decimals BEFORE ranking (the cross-engine rule),
  rank ties break by doc id; only matching docs return (standard
  retrieval semantics).

Exactly reproducible in DuckDB — the tracker carries an exact twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import ws_tokens


def _toks(text_col: str):
    # NULL text coalesces to '' so NULL-text docs (routine in crawl
    # corpora) contribute _dl=0 to BOTH n_docs and avgdl — without the
    # coalesce, count() sees every row while avg(size(NULL)) silently
    # skips them, computing the two corpus statistics over different
    # doc populations. Mirrored in BM25_TOPK_ORACLE.
    return ws_tokens(F.coalesce(F.col(text_col), F.lit("")))


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [carry...], n_hit_terms, score) — BM25 over the query bag.

    One posting pass: the token array is filtered to the query terms
    in-plan (``array_intersect``-style via filter) before exploding, so
    the exploded stream carries only postings for the k query terms,
    and document frequency folds off the same tf aggregate. One more
    narrow pass computes N/avgdl. Docs matching no term are absent
    (retrieval semantics)."""
    if not terms:
        raise ValueError("bm25_scores: empty query term list")
    terms = sorted(set(terms))
    toks = _toks(text_col)
    base = df.select(
        F.col(id_col),
        *carry,
        F.size(toks).alias("_dl"),
        F.filter(toks, lambda t: t.isin(terms)).alias("_hits"),
    ).filter(F.size("_hits") > 0)
    stats = df.select(F.size(toks).alias("_dl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("_dl").alias("avgdl"),
    )
    tf = (
        base.select(id_col, *carry, "_dl", F.explode("_hits").alias("_t"))
        .groupBy(id_col, *carry, "_dl", "_t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_tf"))
    )
    # document frequency per term comes OFF THE TF AGGREGATE (one row
    # per (doc, term) already) — never a second corpus explode/scan
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "_t",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        ).alias("_idf"),
        "avgdl",
    )
    scored = tf.join(F.broadcast(idf), "_t")
    contrib = F.col("_idf") * (
        F.col("_tf") * (k1 + 1.0)
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("avgdl")))
    )
    return (
        scored.groupBy(id_col, *carry)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
            F.round(F.sum(contrib), 6).alias("score"),
        )
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Top-k docs by BM25 (rank 1 = best); deterministic (rounded score
    desc, id asc). The global cut is orderBy+limit — Spark plans it as
    TakeOrderedAndProject (per-partition top-k, merge on the driver), so
    the full scored frame never moves to one partition; the rank window
    then runs over only the k surviving rows."""
    top = (
        bm25_scores(df, terms, id_col, text_col, k1, b, carry)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# Persisted inverted index — build once, query many
# ---------------------------------------------------------------------------


def build_bm25_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The index-once/query-many shape: ``bm25_scores`` re-reads the
    corpus per query; at 100 TB the corpus explode should be paid ONCE.

    Returns ``(postings, stats)``:

    - ``postings``: one row per distinct (term, doc) — ``(term, doc_id,
      tf, dl)``, ``dl`` denormalized onto every posting so queries never
      touch the raw corpus. One full explode + one (term, doc) shuffle —
      the amortized build cost.
    - ``stats``: ONE row ``(n_docs, avgdl)`` over the SAME doc
      population as the direct path (NULL text counts as length 0 —
      the ``_toks`` coalesce), so index-path scores are bit-identical.

    :func:`bm25_topk_from_index` over these frames equals
    :func:`bm25_topk` over the corpus EXACTLY (pinned in pytest):
    per-term document frequency is the term's posting-row count, which
    the query-time fetch already has."""
    toks = _toks(text_col)
    postings = (
        df.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("dl"),
                  F.explode(toks).alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    stats = df.select(F.size(toks).alias("_dl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("_dl").alias("avgdl"),
    )
    return postings, stats


def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of the ``_pt`` partition column: portable md5
    (the ``portable_hash`` definition) mod n_buckets — the SAME number
    the stored expression computes, so query-time pruning lists are
    derivable without a JVM round-trip."""
    import hashlib

    return int(hashlib.md5(("pt:" + term).encode()).hexdigest()[:8], 16) % n_buckets


def save_bm25_index(
    postings: DataFrame,
    stats: DataFrame,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Persist the index partitioned by a stable term-hash bucket
    ``_pt`` (md5-based — NOT term itself: a directory per term would be
    millions of partitions; 64 buckets keeps listings sane while a
    k-term query prunes to <= k directories). ``n_buckets`` is written
    INTO the stats row so readers can never prune with a mismatched
    bucket count (which would silently drop real postings)."""
    from .dedup import portable_hash

    if n_buckets < 1:
        raise ValueError(f"save_bm25_index: n_buckets must be >= 1, got {n_buckets}")
    (
        postings.withColumn(
            "_pt", F.pmod(portable_hash(F.col("term"), salt="pt:"), F.lit(n_buckets))
        )
        .write.mode("overwrite")
        .partitionBy("_pt")
        .parquet(f"{path}/postings")
    )
    stats.withColumn("n_buckets", F.lit(int(n_buckets))).write.mode(
        "overwrite"
    ).parquet(f"{path}/stats")


def load_bm25_index(spark, path: str) -> tuple[DataFrame, DataFrame, int]:
    """(postings, stats, n_buckets). One 1-row driver read (the stats
    frame) recovers the bucket count the index was WRITTEN with — the
    pruning list must come from the same modulus or queries would skip
    directories that hold real postings."""
    postings = spark.read.parquet(f"{path}/postings")
    stats_full = spark.read.parquet(f"{path}/stats")
    n_buckets = int(stats_full.select("n_buckets").first()[0])
    return postings, stats_full.select("n_docs", "avgdl"), n_buckets


def bm25_scores_from_index(
    postings: DataFrame,
    stats: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
) -> DataFrame:
    """BM25 over the persisted index: the corpus is never touched. The
    posting fetch filters ``term IN (query)`` — and, when the index was
    loaded from disk (``n_buckets`` given and ``_pt`` present), also
    ``_pt IN (buckets(query))``, a LITERAL list Spark pushes into
    PartitionFilters: a k-term query lists/reads <= k of the bucket
    directories, the inverted-index access path (plan-pinned in
    pytest). Identical output to :func:`bm25_scores` (pinned)."""
    if not terms:
        raise ValueError("bm25_scores_from_index: empty query term list")
    terms = sorted(set(terms))
    p = postings
    if n_buckets is not None:
        if "_pt" not in p.columns:
            raise ValueError(
                "bm25_scores_from_index: n_buckets given but postings has "
                "no _pt partition column — pass the frames from "
                "load_bm25_index, or omit n_buckets"
            )
        pts = sorted({_term_bucket_py(t, n_buckets) for t in terms})
        p = p.filter(F.col("_pt").isin(pts))
    p = p.filter(F.col("term").isin(terms))
    dfreq = p.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        ).alias("_idf"),
        "avgdl",
    )
    scored = p.join(F.broadcast(idf), "term")
    contrib = F.col("_idf") * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
        F.round(F.sum(contrib), 6).alias("score"),
    )


def bm25_topk_from_index(
    postings: DataFrame,
    stats: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
) -> DataFrame:
    """Top-k via the index — same deterministic cut and rank as
    :func:`bm25_topk` (TakeOrderedAndProject, rounded score desc, id
    asc), equal output pinned in pytest."""
    top = (
        bm25_scores_from_index(postings, stats, terms, k1, b, n_buckets)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w))
