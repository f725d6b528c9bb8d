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
