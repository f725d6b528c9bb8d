"""Trained BPE tokenizer (operators/bpe.py): merge table and encoded
tokens vs a from-scratch python model (exact), the Sennrich textbook
corpus, rank-greedy encode == training segmentation, lossless roundtrip,
layout invariance, the word-rows guard, and panel non-vacuousness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.bpe import (
    EOW,
    BpeModel,
    bpe_token_stats,
    bpe_tokens_udf,
    encode_word,
    train_bpe,
)


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# from-scratch python model (independent construction: string lists, not
# the operator's tuple-keyed dict)
# ---------------------------------------------------------------------------


def _py_train(texts, n_merges):
    freq: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    vocab = [[list(w[:-1]) + [w[-1] + EOW], n] for w, n in sorted(freq.items())]
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        for entry in vocab:
            sym = entry[0]
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def _py_encode(word, merges):
    sym = list(word[:-1]) + [word[-1] + EOW]
    for a, b in merges:  # apply merges in training order
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i : i + 2] = [a + b]
            else:
                i += 1
    return sym


SENNRICH = ["low low low low low", "lower lower", "newest newest newest",
            "newest newest newest", "widest widest widest"]


def test_merges_match_python_model_on_textbook_corpus(spark):
    d = _docs(spark, SENNRICH)
    m = train_bpe(d, n_merges=10, n_train=100)
    assert list(m.merges) == _py_train(SENNRICH, 10)
    # the famous first merges: 'es' (9 occurrences) then 'est'
    assert m.merges[0] == ("e", "s")
    assert m.merges[1] == ("es", "t" + EOW)


def test_rank_greedy_encode_equals_training_order_replay(spark):
    d = _docs(spark, SENNRICH)
    m = train_bpe(d, n_merges=10, n_train=100)
    ranks = m.ranks()
    for w in ["low", "lower", "newest", "widest", "lowest", "news", "zzz"]:
        assert encode_word(w, ranks) == _py_encode(w, list(m.merges)), w


def test_distributed_tokens_match_python_model(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    texts = [r.text for r in d.select("text").collect()]
    m = train_bpe(d, n_merges=30, n_train=50)
    got = {
        r.doc_id: r.toks
        for r in d.select(
            "doc_id", bpe_tokens_udf(m)(F.col("text")).alias("toks")
        ).collect()
    }
    rows = {r.doc_id: r.text for r in d.collect()}
    for did, text in rows.items():
        want = []
        for w in (text or "").split(" "):
            if w:
                want.extend(_py_encode(w, list(m.merges)))
        assert got[did] == want, did


def test_training_is_layout_invariant_and_deterministic(spark):
    texts = [f"pre{i} shared suffix common tail{i % 3}" for i in range(40)]
    d = _docs(spark, texts)
    m1 = train_bpe(d, n_merges=25, n_train=100)
    m2 = train_bpe(d.repartition(7), n_merges=25, n_train=100)
    m3 = train_bpe(d, n_merges=25, n_train=100)
    assert m1.merges == m2.merges == m3.merges
    assert m1.n_train_words == m2.n_train_words


def test_encode_roundtrip_is_lossless(spark):
    d = _docs(spark, SENNRICH + ["a lone unseen wordform"])
    m = train_bpe(d, n_merges=8, n_train=100)
    out = d.select(
        "text", bpe_tokens_udf(m)(F.col("text")).alias("toks")
    ).collect()
    for r in out:
        rebuilt = "".join(r.toks).replace(EOW, " ").rstrip(" ")
        want = " ".join(w for w in r.text.split(" ") if w)
        assert rebuilt == want


def test_stats_columns_and_null_text(spark):
    d = spark.createDataFrame(
        [(1, "low lower"), (2, None), (3, "")], "doc_id long, text string"
    )
    m = train_bpe(_docs(spark, SENNRICH), n_merges=5, n_train=100)
    rows = {r.doc_id: r for r in bpe_token_stats(d, m).collect()}
    assert rows[1].n_bpe_tokens >= rows[1].n_ws_tokens == 2
    assert (rows[2].n_bpe_tokens, rows[2].n_ws_tokens, rows[2].n_chars) == (0, 0, 0)
    assert (rows[3].n_bpe_tokens, rows[3].n_ws_tokens, rows[3].n_chars) == (0, 0, 0)


def test_word_rows_guard_raises_loudly(spark):
    d = _docs(spark, [f"w{i} x{i} y{i} z{i}" for i in range(20)])
    with pytest.raises(ValueError, match="max_word_rows"):
        train_bpe(d, n_merges=5, n_train=100, max_word_rows=3)


def test_merge_stops_when_nothing_repeats(spark):
    # all-distinct characters: no pair ever reaches count 2
    d = _docs(spark, ["abc def"])
    m = train_bpe(d, n_merges=50, n_train=10)
    assert len(m.merges) == 0


def test_panel_is_nonvacuous_subword_regime(spark, sf_dir):
    from yelp_business_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["bpe_token_stats_panel"].spark(spark, sf_dir).collect()
    assert len(rows) > 0
    total_bpe = sum(r.total_bpe_tokens for r in rows)
    total_ws = sum(r.total_ws_tokens for r in rows)
    # genuinely subword (more BPE tokens than words), not memorized (==)
    # and not char-level garbage (bounded well below chars)
    assert total_bpe > total_ws
    for r in rows:
        assert 1.0 < r.chars_per_bpe_token < 10.0


def test_ranks_and_model_shape():
    m = BpeModel(merges=(("a", "b"), ("ab", "c")))
    assert m.ranks() == {("a", "b"): 0, ("ab", "c"): 1}
    assert encode_word("abc", m.ranks()) == ["ab", "c" + EOW]


def test_model_json_roundtrip_is_exact(spark, tmp_path):
    from yelp_business_data_pipeline_spark.operators.bpe import (
        load_bpe_model,
        save_bpe_model,
    )

    m = train_bpe(_docs(spark, SENNRICH), n_merges=10, n_train=100)
    p = str(tmp_path / "bpe.json")
    save_bpe_model(m, p)
    m2 = load_bpe_model(p)
    assert m2 == m
    assert encode_word("lowest", m2.ranks()) == encode_word("lowest", m.ranks())


def test_persistence_is_atomic_and_validated(tmp_path):
    import json as _json
    import os

    from yelp_business_data_pipeline_spark.operators.bpe import (
        load_bpe_model,
        save_bpe_model,
    )

    m = BpeModel(merges=(("a", "b"), ("ab", "c")))
    p = str(tmp_path / "bpe.json")
    save_bpe_model(m, p)
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]  # no debris
    assert load_bpe_model(p) == m
    d = _json.load(open(p))
    d["merges"][1] = ["only-one"]
    _json.dump(d, open(str(tmp_path / "bad.json"), "w"))
    with pytest.raises(ValueError, match="malformed merge"):
        load_bpe_model(str(tmp_path / "bad.json"))
