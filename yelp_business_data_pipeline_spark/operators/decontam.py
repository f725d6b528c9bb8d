"""Benchmark decontamination (SURVEY.md §2.9 — training-data hygiene; no
reference counterpart, first-class LLM-pipeline surface).

Before training, the corpus must be scrubbed of documents that overlap the
evaluation benchmarks, or scores are inflated by memorization. The standard
check (GPT-3 appendix C / PaLM / Llama cards) is **n-gram collision**: a
training doc is contaminated if it shares at least one word-n-gram (n
typically 8-13; 5 here, scaled to the synthetic corpus' short docs) with
any benchmark document.

Scale shape: the benchmark side is small by construction (thousands of eval
docs vs billions of training docs), so its distinct shingle set broadcasts;
the training corpus streams through a broadcast-hash semi-join — **no
shuffle of the corpus at all**. Shingles are the portable md5-fold hashes
shared with the MinHash/ngram-Jaccard family (`dedup.folded_shingle_hashes`)
so one tokenize+hash pass can feed dedup AND decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import folded_shingle_hashes, portable_hash


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs — distinct word-n-gram hashes per document.

    One md5 per token (not per shingle), Horner-folded into n-gram hashes
    per row, then a single explode of the distinct set."""
    toks = F.split(F.col(text_col), " ")
    hashed = df.filter(F.size(toks) >= n).select(
        F.col(id_col),
        F.transform(toks, lambda t: portable_hash(t, salt="mh:")).alias("_th"),
    )
    return hashed.select(
        id_col,
        F.explode(F.array_distinct(folded_shingle_hashes(F.col("_th"), n))).alias("shingle"),
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-training-doc contamination report: training docs sharing >= 1
    word-n-gram with any benchmark doc, with the evidence counts.

    Returns (id, n_shared_shingles, n_bench_docs): distinct shared shingle
    count and number of distinct benchmark docs hit. Docs absent from the
    result are clean. The benchmark shingle set is broadcast — the training
    corpus is never shuffled, only its (id, shingle) stream aggregated on
    the already-partitioned id."""
    t_sh = doc_shingles(train, id_col, text_col, n)
    # doc_shingles emits array_distinct per doc, so (id, shingle) pairs are
    # already unique — no extra distinct shuffle on the bench side
    b_sh = doc_shingles(bench, id_col, text_col, n).select(
        F.col(id_col).alias("_bench_id"), "shingle"
    )
    return (
        t_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("_bench_id").alias("n_bench_docs"),
        )
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Drop contaminated docs: left-anti join of the corpus against the
    contamination report's ids. The BENCH side of the report is broadcast
    (small by construction), but the HIT set is bounded only by the
    corpus — a boilerplate-heavy benchmark can contaminate a large
    fraction of a billion-doc corpus, so the anti-join is left unhinted
    and AQE picks broadcast vs shuffle from the hit set's actual size
    (a forced broadcast would die on the 8 GB limit exactly when
    contamination is worst)."""
    hits = ngram_contamination(train, bench, id_col, text_col, n).select(id_col)
    return train.join(hits, id_col, "left_anti")


def _build_aho(patterns: list[str]):
    """Aho-Corasick automaton (Aho & Corasick 1975) over ``patterns``:
    returns ``(goto, fail, out)`` — per-state child dict, failure link,
    and the pattern indices recognized at the state (including via
    suffix links, pre-flattened so the scan never walks them)."""
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for pi, pat in enumerate(patterns):
        s = 0
        for ch in pat:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(pi)
    fail = [0] * len(goto)
    from collections import deque

    q = deque()
    for ch, s in goto[0].items():
        q.append(s)  # depth-1 states fail to root
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0)
            if fail[s] == s:  # depth-1 self-reference guard
                fail[s] = 0
            out[s].extend(out[fail[s]])  # flatten suffix outputs
    return goto, fail, out


#: Worker-side automaton cache: content-fingerprint -> (goto, fail, out).
#: Lives in each reused Python worker process (and the driver when plans
#: run in-process); bounded to the two most recent automatons so
#: long-lived workers serving many different benchmark sets don't leak.
_AHO_CACHE: dict = {}


def _worker_aho(key: str, patterns: list[str]):
    auto = _AHO_CACHE.pop(key, None)  # pop+reinsert: hits refresh recency
    if auto is None:
        auto = _build_aho(patterns)
        while len(_AHO_CACHE) >= 2:
            _AHO_CACHE.pop(next(iter(_AHO_CACHE)))
    _AHO_CACHE[key] = auto
    return auto


def exact_substring_hits(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_len: int = 20,
    max_patterns: int = 1_000_000,
    max_pattern_bytes: int = 16 << 20,
) -> DataFrame:
    """Exact verbatim-substring contamination (the Lee et al. 2022 /
    "did the eval string appear verbatim in training data" check — the
    stricter sibling of :func:`ngram_contamination`, which tolerates
    tokenization drift but misses sub-n-gram verbatim strings).

    One row per (training doc, benchmark string) with at least one
    occurrence: ``(id, bench_id, n_occurrences, first_pos)`` —
    occurrences count OVERLAPPING matches (every match position),
    ``first_pos`` is the 1-based character index. Docs/pairs without
    hits are absent.

    Scale shape: the benchmark side is small by contract — it collects
    to the driver (loudly bounded by ``max_patterns`` rows and
    ``max_pattern_bytes`` chars, the ANN query-side convention) and
    compiles into ONE Aho-Corasick automaton, closure-captured by an
    Arrow ``mapInPandas`` kernel. The corpus then streams through a
    SINGLE automaton pass per document — O(doc chars + hits),
    independent of pattern count, ZERO shuffle — where per-pattern
    ``contains`` would cost O(patterns x chars). Patterns shorter than
    ``min_len`` chars are dropped (too-short strings hit everywhere;
    Lee et al. use a 50-token floor at web scale).

    MEMORY: the dict-of-dicts automaton is roughly TWO ORDERS OF
    MAGNITUDE larger than the raw pattern text (one python dict + list
    per trie node, ~one node per char). Only the PATTERN LIST travels in
    the task closure (= the capped chars); each Python worker builds the
    automaton once and caches it under a content fingerprint
    (``_worker_aho`` — amortized by ``spark.python.worker.reuse``), so
    ``max_pattern_bytes`` caps closure/shuffle bytes directly while
    RUNTIME memory per worker is still ~50-100x the chars. The 16 MiB
    default (~1-1.5 GB resident automaton) fits comfortable executor
    sizings; raise it only with that much per-worker headroom, or swap
    in a flat-array automaton encoding (int32 goto table) if benchmark
    suites outgrow it.
    """
    rows = bench.select(bench_id_col, bench_text_col).filter(
        # the empty pattern would sit at the automaton root and "match"
        # every position — a length floor of 1 applies even at min_len=0
        F.length(F.col(bench_text_col)) >= max(min_len, 1)
    ).collect()
    if len(rows) > max_patterns:
        raise ValueError(
            f"exact_substring_hits: {len(rows)} benchmark strings exceed "
            f"max_patterns={max_patterns} — the bench side must stay "
            "driver-bounded (raise the cap only with driver memory to match)"
        )
    total = sum(len(r[1]) for r in rows)
    if total > max_pattern_bytes:
        raise ValueError(
            f"exact_substring_hits: benchmark text totals {total} chars, "
            f"over max_pattern_bytes={max_pattern_bytes} — note the "
            "automaton costs ~50-100x the char count in driver and "
            "per-executor memory, so raise the cap only with that much "
            "measured headroom"
        )
    # dedup identical pattern strings; every bench id sharing the text
    # still reports (hits fan back out over the id list)
    by_text: dict = {}
    for bid, btext in rows:
        by_text.setdefault(btext, []).append(bid)
    patterns = sorted(by_text)  # deterministic automaton layout
    bench_ids = [sorted(by_text[p]) for p in patterns]
    plens = [len(p) for p in patterns]
    # the automaton is built ON the worker, not here: the dict-of-dicts
    # structure is ~50-100x the pattern chars, and closure-pickling it
    # into every task would ship (and driver-build) multi-GB state at the
    # byte cap. The closure carries only the PATTERN LIST (= the capped
    # chars); each reused Python worker builds once and caches under a
    # content fingerprint (build is O(chars), ~seconds at the cap, paid
    # once per worker lifetime thanks to spark.python.worker.reuse).
    import hashlib

    _h = hashlib.md5()
    for p in patterns:
        # delimited length prefix: bare decimal prefixes collide ("2"+"abcdefghij"
        # vs "10abcdefghij" digest the same bytes), and a reused worker
        # would then serve the WRONG cached automaton
        _h.update(f"{len(p)}:".encode())
        _h.update(p.encode("utf-8", "surrogatepass"))
    aho_key = _h.hexdigest()

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, train.schema[id_col].dataType),
            T.StructField("bench_id", bench.schema[bench_id_col].dataType),
            T.StructField("n_occurrences", T.LongType()),
            T.StructField("first_pos", T.LongType()),
        ]
    )

    def scan(batches):
        goto, fail, out = _worker_aho(aho_key, patterns)
        for pdf in batches:
            ids_out, bids_out, cnt_out, pos_out = [], [], [], []
            for did, text in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                text = text or ""
                s = 0
                counts: dict = {}
                first: dict = {}
                for i, ch in enumerate(text):
                    while s and ch not in goto[s]:
                        s = fail[s]
                    s = goto[s].get(ch, 0)
                    for pi in out[s]:
                        counts[pi] = counts.get(pi, 0) + 1
                        if pi not in first:
                            first[pi] = i - plens[pi] + 2  # 1-based start
                for pi in sorted(counts):
                    for bid in bench_ids[pi]:
                        ids_out.append(did)
                        bids_out.append(bid)
                        cnt_out.append(counts[pi])
                        pos_out.append(first[pi])
            yield pd.DataFrame(
                {
                    id_col: ids_out,
                    "bench_id": bids_out,
                    "n_occurrences": cnt_out,
                    "first_pos": pos_out,
                }
            )

    return train.select(id_col, text_col).mapInPandas(scan, schema)


def semantic_contamination(
    train_emb: DataFrame,
    bench_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    threshold: float = 0.8,
    max_bench_rows: int = 100_000,
    impl: str = "jvm",
) -> DataFrame:
    """Embedding-space decontamination report (the semantic counterpart of
    :func:`ngram_contamination` — Llama-3-style eval hygiene: n-gram
    collision misses paraphrased benchmark leakage, so the second screen
    is cosine similarity between training-doc and benchmark embeddings).

    Returns one row per CONTAMINATED training doc: (id, max_cosine,
    nearest_bench_id, n_bench_hits), with cosine rounded to 6 decimals
    before thresholding/ranking (cross-engine stable) and nearest-bench
    ties broken to the smallest bench id. Docs absent are clean.

    Scale shape, same as the n-gram screen: the benchmark side is small
    by construction and BROADCASTS; the training corpus streams through
    the broadcast loop join ONCE with zero shuffle — the only exchange
    aggregates the (bounded) hit set on its already-grouped key. For a
    benchmark side too big to broadcast, block both sides first with
    ``similarity.cross_polytope_candidates`` and score only candidates.
    """
    from .similarity import dot, l2_norm

    if impl == "arrow":
        return _semantic_contamination_arrow(
            train_emb, bench_emb, id_col, vec_col, threshold, max_bench_rows
        )
    if impl != "jvm":
        raise ValueError(f"impl must be 'jvm' or 'arrow', got {impl!r}")
    # null vectors are filtered BEFORE the guard count so the bound is
    # impl-invariant (the arrow path also limits post-filter): the same
    # bench frame must raise (or pass) identically under both impls
    bench_emb = bench_emb.filter(F.col(vec_col).isNotNull())
    n_bench = bench_emb.count()
    if n_bench > max_bench_rows:
        raise ValueError(
            f"semantic_contamination: benchmark side has {n_bench} rows > "
            f"max_bench_rows={max_bench_rows}. The broadcast loop join is "
            "O(corpus x bench) — this ceases to be the right shape when the "
            "benchmark grows with the corpus (measured 72x wall for 10x "
            "data with an unbounded bench side). Block both sides with "
            "similarity.cross_polytope_candidates and score candidates, or "
            "raise max_bench_rows deliberately."
        )
    b = bench_emb.select(
        F.col(id_col).alias("_bench_id"),
        F.col(vec_col).alias("_bv"),
        l2_norm(F.col(vec_col)).alias("_bn"),
    )
    t = train_emb.select(
        id_col,
        F.col(vec_col).alias("_tv"),
        l2_norm(F.col(vec_col)).alias("_tn"),
    )
    cos = F.round(
        F.try_divide(dot(F.col("_tv"), F.col("_bv")), F.col("_tn") * F.col("_bn")), 6
    )
    hits = (
        t.crossJoin(F.broadcast(b))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= float(threshold))
    )
    return hits.groupBy(id_col).agg(
        F.max("cosine").alias("max_cosine"),
        # min over (-cosine, id): max cosine first, then SMALLEST id —
        # only the float is negated, so string bench ids order correctly
        # too (the arrow impl's sorted-argmax makes the same promise)
        F.min_by(
            "_bench_id",
            F.struct((-F.col("cosine")).alias("nc"), F.col("_bench_id").alias("i")),
        ).alias("nearest_bench_id"),
        F.count(F.lit(1)).alias("n_bench_hits"),
    )


def semantic_decontaminate(
    train: DataFrame,
    report: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Drop semantically contaminated rows: left-anti join against the
    report's ids. Unhinted for the same reason as :func:`decontaminate` —
    the hit set is bounded by the corpus, not the benchmark."""
    return train.join(report.select(id_col), id_col, "left_anti")


def _semantic_contamination_arrow(
    train_emb: DataFrame,
    bench_emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    max_bench_rows: int,
) -> DataFrame:
    """Arrow/BLAS physical strategy for :func:`semantic_contamination`
    (same output contract): the guarded bench matrix is closure-captured
    and each corpus Arrow batch scores against ALL benchmark vectors in
    one matmul — the guide-sanctioned dense-algebra Pandas-UDF case the
    per-pair interpreted HOF fold is 10-100x slower at. Still zero
    corpus shuffle; the report needs no post-aggregation at all (one
    output row per contaminated doc, computed row-locally). np.round is
    banker's where the JVM rounds half-away — identical except exactly
    at .5e-6 cosine boundaries; equality on the real corpus is pinned in
    tests/test_semantic_decontam.py, same policy as
    ``similarity.arrow_cosine_topk``."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    # ONE action on the bench side: collect capped at limit+1 so an
    # oversized benchmark raises without materializing it all, and the
    # guard and the matrix share the job
    b_rows = (
        bench_emb.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .limit(max_bench_rows + 1)
        .collect()
    )
    if len(b_rows) > max_bench_rows:
        raise ValueError(
            f"semantic_contamination: benchmark side exceeds "
            f"max_bench_rows={max_bench_rows}. Block both sides with "
            "similarity.cross_polytope_candidates and score candidates, "
            "or raise max_bench_rows deliberately."
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, train_emb.schema[id_col].dataType),
            T.StructField("max_cosine", T.DoubleType()),
            T.StructField("nearest_bench_id", bench_emb.schema[id_col].dataType),
            T.StructField("n_bench_hits", T.LongType()),
        ]
    )
    if not b_rows:
        return train_emb.sparkSession.createDataFrame([], out_schema)
    b_rows.sort(key=lambda r: r[0])  # ascending ids -> first-max == smallest
    b_ids = np.array([r[0] for r in b_rows])
    b_mat = np.array([r[1] for r in b_rows], dtype=np.float64)
    b_norm = np.linalg.norm(b_mat, axis=1)
    thr = float(threshold)

    def _score(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if pdf.empty:
                continue
            t_mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)  # .tolist() + asarray: 5x faster than np.array(list(...)) per batch (measured)
            t_ids = pdf[id_col].to_numpy()
            t_norm = np.linalg.norm(t_mat, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (t_mat @ b_mat.T) / np.outer(t_norm, b_norm)
            rounded = np.round(sims, 6)
            mask = rounded >= thr  # NaN (zero-norm) compares False
            n_hits = mask.sum(axis=1)
            keep = n_hits > 0
            if not keep.any():
                continue
            r_keep = np.where(mask[keep], rounded[keep], -np.inf)
            max_c = r_keep.max(axis=1)
            # nearest = smallest bench id among max-cosine ties:
            # b_ids is sorted ascending and argmax returns the FIRST
            # max column — works for string ids too
            nearest = b_ids[np.argmax(r_keep == max_c[:, None], axis=1)]
            yield pd.DataFrame(
                {
                    id_col: t_ids[keep],
                    "max_cosine": max_c,
                    "nearest_bench_id": nearest,
                    "n_bench_hits": n_hits[keep].astype("int64"),
                }
            )

    return train_emb.select(id_col, vec_col).mapInPandas(_score, schema=out_schema)
