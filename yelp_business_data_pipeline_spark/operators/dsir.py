"""DSIR — Data Selection with Importance Resampling (SURVEY.md §2.9 —
training-data composition; no reference counterpart, first-class
LLM-pipeline surface alongside sampling/mixing and the quality gates).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") selects pre-training documents that *look like* a target
domain: fit bag-of-hashed-n-gram distributions over the raw corpus and a
target corpus, score every raw doc with the log importance weight

    log w(d) = sum_b  c_d[b] * (log p_target[b] - log p_raw[b])

and sample k docs without replacement via Gumbel top-k. Everything here
is that recipe in Spark shapes:

- feature hashing (word unigrams + bigrams -> B buckets) uses the same
  portable md5 hash as the sampling/dedup families, so bucket counts are
  exactly reproducible in DuckDB and invariant to partitioning;
- the two fitted distributions are (bucket, count) FRAMES (<= B rows
  each), never driver-side arrays; the per-bucket log-ratio table
  broadcasts into the scoring join;
- scoring is explode -> broadcast join -> partial-agg'd groupBy(id) —
  the corpus shuffles once on the doc key, carrying one double;
- selection is deterministic Gumbel top-k: the noise is a pure function
  of the doc key (md5 unit draw), so the selected set survives
  repartitioning, retries, and engine swaps — same policy as
  ``sampling.hash_unit``; the top-k itself is a TakeOrdered (no global
  sort materialization).

At 100 TB, fit p_raw on a ``sampling.hash_sample`` of the corpus (the
paper fits on a sample too — the distribution converges long before the
corpus ends); the target side is small by construction. B (``buckets``)
bounds the broadcast at 8*B bytes of doubles — 10k buckets (the paper's
choice) is ~80 KB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash

#: portable_hash range — divides a hash into a strictly-interior unit draw.
_HASH_RANGE = float(1 << 32)


def _gram_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int,
    salt: str,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [carry...], bucket) — one row per word unigram/bigram
    occurrence, hashed into md5 buckets. THE single definition of the
    DSIR gram construction: the fit, scoring, and flagged single-pass
    paths all ride it (``carry`` keeps extra per-doc columns through the
    explode), so the gram semantics cannot drift between the paths whose
    equality the tests pin. No aggregation here — each caller keeps its
    own single exchange."""
    # F.split keeps empty segments ("" text -> [""], "a  b" -> an extra
    # ""), which would hash whitespace runs as grams and make weights
    # whitespace-sensitive — drop them, like the gopher kernels do
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), *carry, F.explode(F.concat(toks, bigrams)).alias("_g")
    ).select(
        id_col,
        *carry,
        F.pmod(portable_hash(F.col("_g"), salt=salt), F.lit(buckets)).alias("bucket"),
    )


def hashed_ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    salt: str = "dsir:",
) -> DataFrame:
    """(id, bucket, cnt) — per-doc hashed word unigram+bigram counts.

    Integer counters over md5 buckets: exactly reproducible in DuckDB
    (the pytest twin), partitioning-invariant, and shared shape with the
    dedup/decontam gram streams. One explode + one partial-agg'd
    groupBy(id, bucket)."""
    return (
        _gram_stream(df, id_col, text_col, buckets, salt)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def fit_bucket_distribution(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    salt: str = "dsir:",
) -> DataFrame:
    """(bucket, cnt) — global hashed-n-gram counts, <= ``buckets`` rows.

    Fit this on a ``sampling.hash_sample`` of the raw corpus at scale —
    the estimate converges long before the corpus ends and the output
    frame is bounded by B either way."""
    return (
        hashed_ngram_buckets(df, id_col, text_col, buckets, salt)
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def bucket_log_ratios(
    target_dist: DataFrame,
    raw_dist: DataFrame,
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """(bucket, log_ratio) for every bucket 0..B-1: additive-smoothed
    ``log p_target[b] - log p_raw[b]``. Built as a frame (spine join over
    a ``sequence`` literal — no driver collect) so it broadcasts into the
    scoring join; missing buckets get the smoothed floor on both sides."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0 (unseen buckets), got {smoothing}")
    spine = (
        target_dist.sparkSession.range(0, buckets)
        .select(F.col("id").cast("bigint").alias("bucket"))
    )
    t = target_dist.groupBy().agg(F.sum("cnt").alias("_tot")).alias("tt")
    r = raw_dist.groupBy().agg(F.sum("cnt").alias("_tot")).alias("rt")
    a = float(smoothing)
    out = (
        spine.join(target_dist.withColumnRenamed("cnt", "_tc"), "bucket", "left")
        .join(raw_dist.withColumnRenamed("cnt", "_rc"), "bucket", "left")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(r.withColumnRenamed("_tot", "_rtot")))
        .select(
            "bucket",
            (
                # totals coalesce to 0 so an EMPTY distribution means the
                # smoothed-uniform, not NULL ratios (which would silently
                # zero every weight) — and matches the flagged path, whose
                # sums naturally give 0 on an empty flag set
                F.log(
                    (F.coalesce("_tc", F.lit(0)) + a)
                    / (F.coalesce("_tot", F.lit(0)) + a * buckets)
                )
                - F.log(
                    (F.coalesce("_rc", F.lit(0)) + a)
                    / (F.coalesce("_rtot", F.lit(0)) + a * buckets)
                )
            ).alias("log_ratio"),
        )
    )
    return out


def importance_weights(
    corpus: DataFrame,
    target_dist: DataFrame,
    raw_dist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    salt: str = "dsir:",
) -> DataFrame:
    """Per-doc log importance weight: (id, log_weight). Docs with no
    grams (empty text) get 0.0 — indifferent under resampling.

    Scoring rides the PRE-AGGREGATED (id, bucket, cnt) frame, not the
    raw gram stream, deliberately: when ``raw_dist`` is fitted from the
    same corpus (the :func:`dsir_select` default) the fit's
    groupBy(id, bucket) exchange is byte-identical to the feature
    frame's, so AQE reuses it and the corpus is scanned+hashed ONCE for
    both. Measured A/B at sf0.1 (interleaved median-of-3): pre-agg
    4.95s vs direct per-gram join 8.18s — the "one less exchange"
    rewrite re-scans and re-hashes the corpus for the fit and loses.
    With a pre-fitted sampled ``raw_dist`` the pre-agg still bounds the
    broadcast-join probe volume by distinct (doc, bucket) pairs."""
    feats = hashed_ngram_buckets(corpus, id_col, text_col, buckets, salt)
    ratios = bucket_log_ratios(target_dist, raw_dist, buckets, smoothing)
    scored = (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_weight"))
    )
    base = corpus.select(id_col)
    return base.join(scored, id_col, "left").select(
        id_col, F.coalesce("log_weight", F.lit(0.0)).alias("log_weight")
    )


def gumbel_key(id_col: Column | str, log_weight: Column, salt: str = "dsir-g:") -> Column:
    """Deterministic Gumbel-perturbed key: ``log_weight - log(-log(u))``
    with ``u`` a strictly-interior md5 unit draw of the doc key —
    sampling without replacement by taking the top-k of this key is
    exactly Gumbel top-k (Vieira 2014). Pure function of (key, weight):
    reproducible across layouts and engines."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    u = (portable_hash(c.cast("string"), salt=salt) + F.lit(0.5)) / F.lit(_HASH_RANGE)
    return log_weight - F.log(-F.log(u))


def _gumbel_topk(corpus: DataFrame, w: DataFrame, k: int, id_col: str) -> DataFrame:
    """Shared selection tail: Gumbel-perturb the weights, TakeOrdered the
    top-k over (key desc, id asc), join the winners back to the corpus.
    ONE definition so the two dsir_select entry points cannot drift."""
    keyed = w.select(
        id_col, "log_weight", gumbel_key(id_col, F.col("log_weight")).alias("_gk")
    )
    picked = keyed.orderBy(F.col("_gk").desc(), F.col(id_col).asc()).limit(int(k))
    return corpus.join(picked.select(id_col, "log_weight"), id_col, "inner")


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    raw_dist: DataFrame | None = None,
) -> DataFrame:
    """Select ``k`` corpus docs by DSIR: importance weights toward
    ``target``'s hashed-n-gram distribution, Gumbel top-k without
    replacement. Returns the corpus rows of the selected docs plus their
    ``log_weight``.

    ``raw_dist`` defaults to fitting on the full corpus; pass a
    pre-fitted (bucket, cnt) frame (e.g. from a hash_sample) at scale.
    The top-k is a TakeOrdered over (gumbel key desc, id asc) — full
    tie-break, no global sort materialization."""
    t_dist = fit_bucket_distribution(target, id_col, text_col, buckets)
    r_dist = (
        raw_dist
        if raw_dist is not None
        else fit_bucket_distribution(corpus, id_col, text_col, buckets)
    )
    w = importance_weights(corpus, t_dist, r_dist, id_col, text_col, buckets, smoothing)
    return _gumbel_topk(corpus, w, k, id_col)


def importance_weights_flagged(
    corpus: DataFrame,
    target_flag: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    salt: str = "dsir:",
) -> DataFrame:
    """Single-pass :func:`importance_weights` for the common case where
    the target domain is a SUBSET of the corpus (a predicate column —
    e.g. ``lang == 'en'``, a quality flag, a curated-source marker).

    One corpus scan, one (id, bucket) exchange, one <= B-row (bucket)
    exchange: the flag rides the gram stream into the per-doc feature
    frame, BOTH distributions fold out of that same frame (raw =
    everything, target = flagged rows' counts), and the scoring join
    reuses the feature exchange — where the two-frame path scans and
    hashes the corpus for each fit, this plan never reads it twice.
    Totals come from an unbounded window over the <= B-row combined
    frame (one tiny exchange), keeping the whole thing a single linear
    plan with no branch recomputation. Weight values are identical to
    the two-frame path up to float summation order (selection equality
    pinned in tests/test_dsir.py)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0 (unseen buckets), got {smoothing}")
    flagged = corpus.withColumn("_tflag", target_flag)
    grams = _gram_stream(
        flagged, id_col, text_col, buckets, salt, carry=("_tflag",)
    )
    feats = grams.groupBy(id_col, "bucket").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.max("_tflag").alias("_tflag"),  # constant per id
    )
    combined = feats.groupBy("bucket").agg(
        F.sum("cnt").alias("_rc"),
        F.sum(F.when(F.col("_tflag"), F.col("cnt")).otherwise(F.lit(0))).alias("_tc"),
    )
    a = float(smoothing)
    w_all = Window.partitionBy()
    ratios = (
        combined.withColumn("_rtot", F.sum("_rc").over(w_all))
        .withColumn("_ttot", F.sum("_tc").over(w_all))
        .select(
            "bucket",
            (
                F.log((F.col("_tc") + a) / (F.col("_ttot") + a * buckets))
                - F.log((F.col("_rc") + a) / (F.col("_rtot") + a * buckets))
            ).alias("log_ratio"),
        )
    )
    scored = (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_weight"))
    )
    base = corpus.select(id_col)
    return base.join(scored, id_col, "left").select(
        id_col, F.coalesce("log_weight", F.lit(0.0)).alias("log_weight")
    )


def dsir_select_flagged(
    corpus: DataFrame,
    target_flag: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """:func:`dsir_select` with an in-corpus target predicate — the
    single-pass plan of :func:`importance_weights_flagged` plus the same
    deterministic Gumbel top-k."""
    w = importance_weights_flagged(
        corpus, target_flag, id_col, text_col, buckets, smoothing
    )
    return _gumbel_topk(corpus, w, k, id_col)
