"""Sequence packing for LLM training batches (SURVEY.md §2.9 — no
reference counterpart; first-class LLM-pipeline surface).

Tokenized documents are packed into fixed-capacity context windows before
training. Two industry-standard strategies, two scale shapes:

- :func:`pack_concat_split` — "concat then split": the per-stream token
  stream is laid end-to-end and cut every ``capacity`` tokens, so documents
  may straddle a cut (they get an attention-mask reset in the trainer).
  This is pure window arithmetic — ONE shuffle (the per-stream sort), no
  UDF, engine-portable integer math — so it is the 100 TB default. Output
  is the per-document placement (start offset, first/last bin), from which
  both the bin manifest and the straddle list derive.
- :func:`pack_next_fit` — greedy next-fit WITHOUT splitting: a document
  that would overflow the open bin closes it and starts the next. Inherently
  sequential per stream, so it runs as ``applyInPandas`` over the stream
  key — the parallelism unit is the stream (shard corpora into many streams
  for cluster-width parallelism). Arrow-batched, no driver collect.

Both are deterministic given the (stream, order) columns; orders must carry
a full tie-break. ``tok > capacity`` documents are legal: concat-split
spans them over multiple bins; next-fit gives them a dedicated oversized
bin (trainers truncate or reject downstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_concat_split(
    df: DataFrame,
    token_col: str,
    capacity: int,
    stream: str = "source",
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Concat-split packing: adds ``start_offset`` (tokens before this doc
    in its stream), ``bin_start`` / ``bin_end`` (first/last context window
    the doc lands in) and ``n_bins_spanned``.

    Zero-token rows are dropped (they occupy no window). Integer division
    uses ``div`` (exact on int64 — `/` would round through double).
    DuckDB twin: ``(cum - tok) // capacity`` / ``(cum - 1) // capacity``.
    """
    if capacity <= 0:
        raise ValueError(f"pack_concat_split: capacity must be positive, got {capacity}")
    if order_by is None:
        order_by = [F.col("doc_id")]
    w = (
        Window.partitionBy(stream)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    out = (
        df.filter(F.col(token_col) > 0)
        .withColumn("_cum", cum)
        .withColumn("start_offset", F.col("_cum") - F.col(token_col))
        .withColumn("bin_start", F.expr(f"start_offset div {int(capacity)}"))
        .withColumn("bin_end", F.expr(f"(_cum - 1) div {int(capacity)}"))
        .withColumn("n_bins_spanned", (F.col("bin_end") - F.col("bin_start") + 1).cast("int"))
        .drop("_cum")
    )
    return out


def next_fit_reference(tokens: list[int], capacity: int) -> list[int]:
    """Pure-python next-fit bin assignment (the test oracle and the exact
    semantics contract for :func:`pack_next_fit`): items in order; if the
    open bin cannot take the next item, close it and open a new one. An
    item larger than ``capacity`` gets a bin of its own."""
    bins: list[int] = []
    bin_id, fill = 0, 0
    for tok in tokens:
        if fill > 0 and fill + tok > capacity:
            bin_id += 1
            fill = 0
        bins.append(bin_id)
        fill += tok
    return bins


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    stream: str = "source",
    order_col: str | list[str] = "doc_id",
) -> DataFrame:
    """Greedy next-fit packing per stream via ``applyInPandas``.

    Output: (stream, id, token, bin_id) — bin ids are dense per stream and
    deterministic under ``order_col`` — pass a LIST for compound keys when
    a single column has ties (the module contract: orders must carry a
    full tie-break, or bin assignment varies with Arrow batch arrival
    order). Each group is one stream; at scale the stream key is the
    shard id, so group size stays bounded by shard size, not corpus size
    (no skew beyond the sharding scheme)."""
    schema = T.StructType(
        [
            df.schema[stream],
            df.schema[id_col],
            df.schema[token_col],
            T.StructField("bin_id", T.LongType(), False),
        ]
    )
    if capacity <= 0:
        raise ValueError(f"pack_next_fit: capacity must be positive, got {capacity}")
    cap = int(capacity)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        bins = next_fit_reference([int(t) for t in pdf[token_col]], cap)
        return pd.DataFrame(
            {
                stream: pdf[stream].values,
                id_col: pdf[id_col].values,
                token_col: pdf[token_col].values,
                "bin_id": bins,
            }
        )

    cols = [stream, id_col, token_col]
    for oc in order_cols:
        if oc not in cols:
            cols.append(oc)
    return (
        df.filter(F.col(token_col) > 0)
        .select(*cols)
        .groupBy(stream)
        .applyInPandas(_pack, schema=schema)
    )
