"""Within-corpus exact duplicate-SPAN detection (SURVEY.md §2.9 —
training-data hygiene; no reference counterpart, first-class LLM-pipeline
surface alongside doc-level dedup and benchmark decontamination).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") showed that removing *substrings* repeated verbatim across a
corpus — not just whole near-duplicate documents — measurably improves
LMs. Their tool builds a single-machine suffix array; that does not
distribute. The Spark-first equivalent of "find every maximal repeated
run of >= k tokens" is a **positional-gram pipeline**:

1. tokenize + hash each doc once (one md5/xxhash per TOKEN, shared with
   the MinHash/decontam family via ``dedup.folded_shingle_hashes``);
2. ``posexplode`` the k-gram hash array into a (doc, pos, gram) stream —
   O(total tokens) rows, the distributed stand-in for the suffix array's
   O(total chars) construction;
3. one ``groupBy(gram)`` count with map-side partial aggregation (most
   grams are unique, so the partial agg collapses the stream to ~one row
   per distinct gram per partition before the exchange);
4. join the gram stream back to the duplicated-gram set. The duplicated
   set is usually a small fraction of distinct grams — AQE picks a
   broadcast join when it fits and Spark's runtime bloom-filter pushdown
   prunes the probe side when it doesn't — then
5. merge overlapping gram intervals [pos, pos+k) per doc into maximal
   spans with a windowed running-max (interval union, pure SQL).

Every step is expressible in ANSI SQL, so unlike the suffix array the
whole operator carries an exact DuckDB twin (``plans.extensions``).

Scale shape at 100 TB: the corpus is scanned once; the only corpus-sized
shuffles are the gram-count exchange (collapsed by partial agg) and the
join-back (bloom/broadcast-pruned); the per-doc window repartitions only
the *matched* grams, which is bounded by the duplicated mass, not the
corpus. No driver-side state at all — contrast ``decontam.py``'s
Aho-Corasick, which is the right shape only when the pattern side is
small and fixed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import folded_shingle_hashes, portable_hash


def gram_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    impl: str = "md5",
) -> DataFrame:
    """(id, pos, gh) positional word-k-gram hash stream, one row per gram
    START position (0-based). Docs with fewer than k tokens emit nothing.

    One hash per token, Horner-folded into k-gram ids — identical
    constants to the MinHash/decontamination family, so one tokenize+hash
    pass can feed doc-level dedup, decontamination AND span-level dedup.
    """
    toks = F.split(F.col(text_col), " ")
    hashed = df.filter(F.size(toks) >= k).select(
        F.col(id_col),
        F.transform(toks, lambda t: portable_hash(t, salt="mh:", impl=impl)).alias("_th"),
    )
    return hashed.select(
        id_col,
        F.posexplode(folded_shingle_hashes(F.col("_th"), k)).alias("pos", "gh"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
    scope: str = "corpus",
    impl: str = "md5",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A k-gram is *duplicated* when it occurs >= ``min_count`` times in the
    corpus (``scope="corpus"``, Lee et al.'s semantics — within-doc
    repeats count) or in >= ``min_count`` distinct documents
    (``scope="cross_doc"`` — template/boilerplate detection that ignores
    in-doc refrains). Each duplicated gram covers tokens [pos, pos+k);
    overlapping/adjacent covers are unioned into maximal spans.

    Returns one row per span: (id, span_start, span_end, span_tokens,
    n_grams, max_occurrences) with token positions 0-based and span_end
    exclusive — ``span_tokens = span_end - span_start`` is the exact
    number of duplicated tokens, so per-doc duplicated fractions sum
    without double counting (spans are disjoint by construction).
    """
    if scope not in ("corpus", "cross_doc"):
        raise ValueError(f"scope must be 'corpus' or 'cross_doc', got {scope!r}")
    grams = gram_positions(df, id_col, text_col, k, impl)

    # count_distinct only when cross_doc asks for it: the distinct-agg
    # path carries (gh, doc) pairs and per-gram distinct state through
    # the corpus-sized exchange — pure waste for the default scope,
    # which thresholds on total occurrences
    if scope == "cross_doc":
        counts = grams.groupBy("gh").agg(
            F.count("*").alias("occ"), F.count_distinct(id_col).alias("n_docs")
        )
        dup = counts.filter(F.col("n_docs") >= min_count).select("gh", "occ")
        marked = grams.join(dup, "gh")
    else:
        # r13 (guide §2.4): the former groupBy(gh) -> join(grams, gh)
        # shuffled the corpus-sized gram stream on gh TWICE (the agg and
        # the join probe) and sorted both join sides. occ is a plain
        # per-key count, so ONE window over the same shuffle computes it
        # in place — measured 15.4 -> 5.4 s on the 500k-doc scaling
        # corpus (same rows out, pinned). Skew note: a boilerplate
        # mega-gram lands its occurrences in one window partition, which
        # is the same placement the join's probe side had — no new hot
        # spot, and no per-gram state beyond a count.
        occ = F.count(F.lit(1)).over(Window.partitionBy("gh"))
        marked = grams.withColumn("occ", occ).filter(F.col("occ") >= min_count)

    # Interval union of [pos, pos+k) covers: a new span starts when this
    # gram's start lies strictly past the running max end of everything
    # before it. Window input is only the MATCHED grams — bounded by the
    # duplicated mass, not the corpus.
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = marked.select(
        id_col,
        "pos",
        "occ",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
        .alias("_new"),
    )
    spans = (
        flagged.withColumn("_span", F.sum("_new").over(w))
        .groupBy(id_col, "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count("*").alias("n_grams"),
            F.max("occ").alias("max_occurrences"),
        )
        .select(
            id_col,
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start")).cast("bigint").alias("span_tokens"),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("max_occurrences").cast("bigint").alias("max_occurrences"),
        )
    )
    return spans


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
    scope: str = "corpus",
    impl: str = "md5",
) -> DataFrame:
    """Per-doc rollup over ALL docs (zero-filled for clean ones):
    (id, n_tokens, n_spans, dup_tokens). Integer counters only — the
    duplicated fraction is ``dup_tokens / n_tokens`` for the caller, kept
    out of the frame so the DuckDB twin compares exactly (no float
    division drift), same policy as the Gopher repetition panel."""
    spans = duplicate_spans(df, id_col, text_col, k, min_count, scope, impl)
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"), F.sum("span_tokens").alias("dup_tokens")
    )
    # NULL text -> NULL token count (non-ANSI size(NULL) is -1, which
    # would report a negative count and drift from the DuckDB twin's NULL)
    base = df.select(
        id_col,
        F.when(
            F.col(text_col).isNull(), F.lit(None).cast("bigint")
        )
        .otherwise(F.size(F.split(F.col(text_col), " ")).cast("bigint"))
        .alias("n_tokens"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
    scope: str = "corpus",
    impl: str = "md5",
    out_col: str | None = None,
) -> DataFrame:
    """Cut the duplicated spans out of each doc's text (Lee et al.'s
    ExactSubstr deduplication, token-granular): tokens covered by any
    span are dropped, survivors re-joined with single spaces.

    The span list per doc is collected into an array (bounded by that
    doc's span count) and the cut is pure codegen'd JVM expressions, no
    Python in the row path; the corpus-side frame is only joined (left)
    against the per-doc span aggregate, never re-shuffled itself when
    AQE broadcasts the span side.

    Cut shape (r9 — the 6.65x probe row's fix): ``duplicate_spans``
    emits DISJOINT merged intervals per doc, so instead of testing every
    token index against every span (O(tokens x spans) — the old
    exists-per-index HOF), the kept text is the concatenation of the
    COMPLEMENT gaps: sort the spans (array_sort on the struct orders by
    span_start first), zip (0, end_1, end_2, ...) with (start_1,
    start_2, ..., n_tokens) into gap windows, and ``slice`` the token
    array once per gap — O(tokens + spans) per doc. A/B at scaledata
    sf1: 8.9 -> see BASELINE.md probe table."""
    out = out_col or text_col
    spans = duplicate_spans(df, id_col, text_col, k, min_count, scope, impl)
    span_arrays = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(F.col(text_col), " ")
    ss = F.array_sort(F.col("_spans"))
    gap_starts = F.concat(
        F.array(F.lit(0).cast("bigint")),
        F.transform(ss, lambda s: s["span_end"]),
    )
    gap_ends = F.concat(
        F.transform(ss, lambda s: s["span_start"]),
        F.array(F.size(toks).cast("bigint")),
    )
    kept = F.flatten(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda a, b: F.slice(
                toks,
                (a + 1).cast("int"),
                F.greatest(b - a, F.lit(0).cast("bigint")).cast("int"),
            ),
        )
    )
    cleaned = F.concat_ws(" ", kept)
    return (
        df.join(span_arrays, id_col, "left")
        .withColumn(
            out, F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(cleaned)
        )
        .drop("_spans")
    )
