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
    sentinel: bool = False,
) -> DataFrame:
    """(id, [carry...], bucket) — one row per word unigram/bigram
    occurrence, hashed into md5 buckets. THE single definition of the
    DSIR gram construction: the fit, scoring, and flagged single-pass
    paths all ride it (``carry`` keeps extra per-doc columns through the
    explode), so the gram semantics cannot drift between the paths whose
    equality the tests pin. No aggregation here — each caller keeps its
    own single exchange.

    ``sentinel=True`` additionally emits ONE bucket ``-1`` row for each
    doc that produces no grams (NULL / empty / whitespace-only text —
    explode_outer's NULL row on an empty array), so a single frame
    covers the FULL corpus: the flagged single-pass plan rides this to
    give gramless docs their defined 0.0 weight without a corpus-keyed
    completion join (the sentinel bucket never matches the 0..B-1 ratio
    spine and contributes exactly 0). Real grams hash to 0..B-1, so the
    sentinel cannot collide with a real bucket."""
    # F.split keeps empty segments ("" text -> [""], "a  b" -> an extra
    # ""), which would hash whitespace runs as grams and make weights
    # whitespace-sensitive — ws_tokens drops them (the shared tokenizer
    # of the gram/LM/retrieval operators, like the gopher kernels)
    from .text import ws_tokens

    toks = ws_tokens(F.col(text_col))
    # bigrams as zip_with over two shifted slices — bit-identical output
    # to the index-transform formulation but 7.6x faster at sf0.1
    # (0.35s vs 2.66s): transform(sequence)+element_at is an interpreted
    # per-element lambda with two O(1)-but-boxed array probes, while
    # slice+zip_with walks both arrays once. greatest(.,0) clamps the
    # 0/1-token cases to empty slices ([] bigrams); NULL text stays NULL
    # through slice/zip_with, matching the old when()-guard's behavior.
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_bi),
        F.slice(toks, 2, n_bi),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    all_g = F.concat(toks, bigrams)
    bucket = F.pmod(portable_hash(F.col("_g"), salt=salt), F.lit(buckets))
    if sentinel:
        # explode_outer emits ONE NULL-gram row for an empty (or NULL-
        # text) array — the sentinel costs nothing extra: a when(size>0)
        # guard would make Catalyst evaluate the tokenize+bigram array
        # TWICE per row (measured ~1.6x the whole panel at sf0.1)
        explode_col = F.explode_outer(all_g)
        bucket = F.when(F.col("_g").isNull(), F.lit(-1).cast("bigint")).otherwise(
            bucket
        )
    else:
        explode_col = F.explode(all_g)
    return df.select(F.col(id_col), *carry, explode_col.alias("_g")).select(
        id_col, *carry, bucket.alias("bucket")
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
    # completion to full corpus coverage is an ids-only left join, NOT a
    # rescan-and-union of gramless docs: corpus.select(id) prunes to the
    # key column, where the union shape would re-read the (heaviest)
    # text column a second time at scale
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
    # picked is <= k rows by construction — hint it so the join-back is a
    # broadcast on the FIRST plan, not after an AQE re-plan
    return corpus.join(F.broadcast(picked.select(id_col, "log_weight")), id_col, "inner")


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
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Single-pass :func:`importance_weights` for the common case where
    the target domain is a SUBSET of the corpus (a predicate column —
    e.g. ``lang == 'en'``, a quality flag, a curated-source marker).

    One corpus scan, one (id, bucket, flag) exchange, one <= B-row
    (bucket) exchange: the flag rides the gram stream into the per-doc
    feature frame, BOTH distributions fold out of that same frame (raw =
    everything, target = flagged rows' counts), and the scoring branch
    REUSES the feature exchange — where the two-frame path scans and
    hashes the corpus for each fit, this plan never reads it twice.

    Three plan-level choices make the reuse and the job count real
    (plan-pinned in tests/test_dsir.py, A/B'd in BASELINE.md r8):

    - ``_tflag`` is a GROUPING KEY of the feature frame, not a
      ``max()`` aggregate (it's constant per doc, so the grain is
      unchanged): column pruning cannot drop a grouping key, so both
      consumer branches see byte-identical partial aggregates under the
      exchange and AQE's stage cache reuses it — as an aggregate, the
      scoring branch pruned ``max(_tflag)`` away and the "shared"
      exchange silently planned TWICE (two corpus scans; caught by
      reading the executed plan, round 8).
    - the gram stream runs with ``sentinel=True``: gramless docs carry a
      bucket ``-1`` row, so the frame covers the full corpus and the
      scoring left-join's ``coalesce(log_ratio, 0)`` gives them the
      defined 0.0 weight with NO completion join (the fit branch filters
      the sentinel out ABOVE the exchange, which leaves the reused
      exchange intact).
    - totals come from ``coalesce(1)`` + an unbounded window over the
      <= B-row combined frame: the static single partition satisfies the
      window's AllTuples requirement, so no extra exchange/query stage.

    Weight values are identical to the two-frame path up to float
    summation order (selection equality pinned in tests/test_dsir.py)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0 (unseen buckets), got {smoothing}")
    flagged = corpus.withColumn("_tflag", target_flag)
    grams = _gram_stream(
        flagged, id_col, text_col, buckets, salt,
        carry=("_tflag", *carry), sentinel=True,
    )
    # ``carry`` columns ride as GROUPING KEYS (constant per doc, so the
    # grain is unchanged) for the same pruning-immunity reason as
    # _tflag: a caller that needs per-doc attributes downstream (the
    # registered panel needs source/lang) gets them without a corpus
    # rejoin, and both consumer branches still see the identical
    # exchange. Cost: ~bytes-per-carry-column on each post-aggregation
    # shuffle row — far below the join-back's second corpus scan.
    feats = grams.groupBy(id_col, "bucket", "_tflag", *carry).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    # The sentinel bucket (-1) is excluded from the fit ARITHMETICALLY,
    # never with a filter: ANY `bucket >= 0` predicate on this branch —
    # even disguised — gets pushed below the feature aggregate into the
    # shared exchange's subtree, the two branches stop canonicalizing
    # equal, and AQE plans the corpus scan twice (verified by reading
    # the executed plan; a `| cnt.isNull()` guard was constant-folded
    # away because count(*) is non-nullable). when()-guards in the
    # projection leave the exchange byte-identical for both consumers.
    real = F.col("bucket") >= 0
    combined = feats.groupBy("bucket").agg(
        F.sum("cnt").alias("_rc"),
        F.sum(F.when(F.col("_tflag"), F.col("cnt")).otherwise(F.lit(0))).alias("_tc"),
    )
    a = float(smoothing)
    w_all = Window.partitionBy()
    ratios = (
        combined.coalesce(1)
        .withColumn("_rtot", F.sum(F.when(real, F.col("_rc"))).over(w_all))
        .withColumn("_ttot", F.sum(F.when(real, F.col("_tc"))).over(w_all))
        .select(
            "bucket",
            F.when(
                real,
                F.log((F.col("_tc") + a) / (F.col("_ttot") + a * buckets))
                - F.log((F.col("_rc") + a) / (F.col("_rtot") + a * buckets)),
            )
            .otherwise(F.lit(0.0))  # sentinel row scores exactly 0
            .alias("log_ratio"),
        )
    )
    # LEFT join, not inner: an inner join would infer `bucket IS NOT
    # NULL` into the probe side's subtree — same reuse-breaking pushdown
    return (
        feats.join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col, *carry)
        .agg(
            F.sum(F.col("cnt") * F.coalesce("log_ratio", F.lit(0.0))).alias(
                "log_weight"
            )
        )
    )


def dsir_select_flagged(
    corpus: DataFrame,
    target_flag: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`dsir_select` with an in-corpus target predicate — the
    single-pass plan of :func:`importance_weights_flagged` plus the same
    deterministic Gumbel top-k.

    With ``carry`` set, returns ``(id, *carry, log_weight)`` for the
    selected docs WITHOUT joining back to the corpus — the carried
    attributes ride the feature frame's grouping keys, so the corpus is
    read exactly once end to end. Without it, returns the full corpus
    rows of the selected docs (one broadcast join-back)."""
    w = importance_weights_flagged(
        corpus, target_flag, id_col, text_col, buckets, smoothing, carry=carry
    )
    if carry:
        keyed = w.select(
            id_col, *carry, "log_weight",
            gumbel_key(id_col, F.col("log_weight")).alias("_gk"),
        )
        return (
            keyed.orderBy(F.col("_gk").desc(), F.col(id_col).asc())
            .limit(int(k))
            .drop("_gk")
        )
    return _gumbel_topk(corpus, w, k, id_col)
