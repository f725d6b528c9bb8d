"""Trained byte-pair-encoding (BPE) tokenizer — the subword vocabulary
step of an LLM data pipeline (Sennrich et al. 2016; the GPT-2 merge-rank
encoder shape).

The pipeline's existing token counting (``text.token_count``) is
whitespace/regex-grade; this module adds the LEARNED tokenizer: train a
merge table once, then measure real subword token budgets per document —
the number that actually prices a corpus for pretraining.

Spark-first decomposition (same architecture as the quality classifier
and the IVF/PQ codebooks):

- **Training is driver-side on a FIXED-SIZE deterministic sample.** BPE
  fitting is inherently sequential (merge i+1 depends on merge i), so it
  is NOT a distributed job — but it only needs word FREQUENCIES, which
  saturate on a sample: the ``n_train`` lowest ``hash_unit(id)`` docs
  feed one distributed word-count aggregation (explode -> groupBy ->
  Arrow transfer, row-capped with a loud ValueError), and the classic
  greedy merge loop runs in pure python over the <= ``max_word_rows``
  word-frequency dict. Deterministic: ties in pair frequency break
  lexicographically; no RNG anywhere. Driver cost is CONSTANT in corpus
  size — the 100-TB shape.
- **Encoding is embarrassingly parallel.** The merge-rank dict rides the
  UDF closure (a few KB — a broadcast variable in spirit; Spark ships it
  once per executor), and an Arrow-batched ``pandas_udf`` encodes each
  batch. Within a batch, each DISTINCT word is encoded once and reused
  (Zipf makes the per-word LRU the dominant saving), and the per-word
  merge loop is the standard rank-greedy algorithm. This is pattern (b)
  of the build brief: iterative subword merging has no DataFrame/SQL
  form, so the Python kernel is the sanctioned fallback — Arrow-batched,
  never row-at-a-time.
- **No DuckDB oracle by design** (iterative algorithm, the house rule
  for non-SQL-expressible ops): the tracker is rows-only and the exact
  pin is a from-scratch python model in ``tests/test_bpe.py``, the same
  discipline as pagerank/k-core/semdedup.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sampling import hash_unit

#: end-of-word marker (the Sennrich convention) — lets merges distinguish
#: "est" inside a word from "est" ending one, and makes decode lossless.
EOW = "</w>"


@dataclass(frozen=True)
class BpeModel:
    """An ordered merge table. ``merges[i]`` is the pair merged at rank
    i; earlier rank always wins during encode (the GPT-2 encoder rule)."""

    merges: tuple[tuple[str, str], ...]
    n_train_docs: int = 0
    n_train_words: int = 0
    meta: dict = field(default_factory=dict)

    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 200,
    n_train: int = 512,
    salt: str = "bpe:",
    max_word_rows: int = 500_000,
) -> BpeModel:
    """Fit a BPE merge table on the corpus sample and return the model.

    One distributed word-frequency aggregation over the ``n_train``
    lowest-hash docs (explode -> groupBy(word) -> Arrow transfer; more
    than ``max_word_rows`` distinct words raises loudly — shrink
    ``n_train`` or raise the bound deliberately), then the classic
    greedy loop: repeatedly merge the most frequent adjacent symbol
    pair, ties broken to the lexicographically smallest pair, until
    ``n_merges`` merges or no pair repeats. Bit-deterministic across
    layouts and reruns."""
    sample = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    if n_train is not None:
        # orderBy+limit TOGETHER so Spark plans TakeOrderedAndProject;
        # with n_train=None (train on everything) the sort would be a
        # useless full global shuffle before the word aggregation, so
        # it is only applied alongside the limit.
        sample = sample.orderBy(
            hash_unit("_id", salt=salt + "train:").asc(), F.col("_id").asc()
        ).limit(n_train)
    from .text import ws_tokens

    words = (
        sample.select(F.explode(ws_tokens(F.col("_text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .limit(max_word_rows + 1)
        .toPandas()
    )
    if len(words) > max_word_rows:
        raise ValueError(
            f"train_bpe: the {n_train}-doc sample produced more than "
            f"max_word_rows={max_word_rows} distinct words — lower "
            "n_train, or raise the bound deliberately"
        )
    # deterministic iteration order regardless of transfer layout
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(w): int(n)
        for w, n in sorted(zip(words["w"], words["n"]))
        if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break  # nothing repeats: further merges memorize singletons
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return BpeModel(
        merges=tuple(merges),
        n_train_docs=n_train if n_train is not None else -1,
        n_train_words=int(words["n"].sum()),
        meta={"n_merges": n_merges, "salt": salt},
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE encode of one word (the GPT-2 encoder loop):
    repeatedly apply the LOWEST-rank applicable merge until none apply.
    Training replays exactly this (merge i applied before i+1), so
    encode(train_word) reproduces the training segmentation."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokens_udf(model: BpeModel):
    """Arrow-batched encoder: string column -> array<string> of subword
    tokens. Distinct words within each batch encode once (Zipf: the
    cache hit rate IS the speedup); the merge-rank dict rides the
    closure, shipped once per executor."""
    ranks = model.ranks()

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text: str | None) -> list[str]:
            if not text:
                return []
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = encode_word(w, ranks)
                out.extend(hit)
            return out

        return texts.map(enc)

    return _encode


def bpe_token_stats(
    df: DataFrame,
    model: BpeModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [carry...], n_bpe_tokens, n_ws_tokens, n_chars) — the learned
    token budget next to the whitespace one. One Arrow pass for the BPE
    count; the whitespace/char counts stay JVM-side expressions."""
    from .text import ws_tokens

    toks = bpe_tokens_udf(model)(F.col(text_col))
    return df.select(
        id_col,
        *carry,
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(ws_tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .cast("bigint")
        .alias("n_ws_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("bigint").alias("n_chars"),
    )


def save_bpe_model(model: BpeModel, path: str) -> None:
    """Persist the merge table as a single JSON artifact (train once,
    encode every future batch with the SAME vocabulary — token budgets
    are only comparable under one tokenizer). JSON, not pickle:
    engine/version-portable and human-auditable. ATOMIC (tmp +
    os.replace): overwriting yesterday's artifact in place must not
    leave a truncated file if the process dies mid-write."""
    import json
    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "merges": [list(p) for p in model.merges],
                "n_train_docs": model.n_train_docs,
                "n_train_words": model.n_train_words,
                "meta": model.meta,
            },
            fh,
            allow_nan=False,
        )
    os.replace(tmp, path)


def load_bpe_model(path: str) -> BpeModel:
    """Inverse of :func:`save_bpe_model`; round-trip is exact. Validates
    the merge-table shape (every entry a 2-item pair) so a truncated or
    hand-edited artifact fails here, not as a silent mis-tokenization."""
    import json

    with open(path) as fh:
        d = json.load(fh)
    if any(len(p) != 2 for p in d["merges"]):
        raise ValueError(
            f"load_bpe_model: artifact at {path} carries a malformed "
            "merge entry — corrupted or hand-edited; refusing to encode "
            "with it"
        )
    return BpeModel(
        merges=tuple((a, b) for a, b in d["merges"]),
        n_train_docs=d["n_train_docs"],
        n_train_words=d["n_train_words"],
        meta=d["meta"],
    )
