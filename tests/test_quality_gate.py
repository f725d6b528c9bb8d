"""Gopher quality filters (text.gopher_quality_flags) and the composed
quality_gate_panel: python-model equality on adversarial docs, real-table
recombination, and the panel's non-vacuity at both SFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.text import (
    GOPHER_QUALITY_STOPWORDS,
    gopher_quality_flags,
)


def _model(text, min_words=50, max_words=100_000, min_stopword_hits=2):
    t = text or ""
    words = [w for w in t.split(" ") if w]
    n = len(words)
    chars = len(t.replace(" ", ""))
    lines = t.split("\n")
    n_hash = t.count("#")
    n_ell, i = 0, 0
    while True:  # non-overlapping '...' occurrences
        j = t.find("...", i)
        if j < 0:
            break
        n_ell += 1
        i = j + 3
    n_bullet = sum(
        1 for l in lines if l.lstrip()[:1] in ("-", "*", "•") and l.lstrip()
    )
    n_ell_end = sum(1 for l in lines if l.rstrip().endswith("..."))
    n_alpha = sum(
        1 for w in words if any(c.isalpha() and c.isascii() for c in w)
    )
    sw = sum(1 for s in GOPHER_QUALITY_STOPWORDS if s in words)
    ok = {
        "ok_word_count": min_words <= n <= max_words,
        "ok_mean_word_len": (chars >= 3.0 * n) and (chars <= 10.0 * n),
        "ok_symbol_ratio": (n_hash + n_ell) <= 0.1 * n,
        "ok_bullet_lines": n_bullet <= 0.9 * len(lines),
        "ok_ellipsis_lines": n_ell_end <= 0.3 * len(lines),
        "ok_alpha_words": n_alpha >= 0.8 * n,
        "ok_stopwords": sw >= min_stopword_hits,
    }
    ok["passes_gopher_quality"] = all(ok.values())
    ok["n_words"] = n
    return ok


DOCS = [
    (0, "the cat sat on the mat with a hat and that was that to be sure " * 3),
    (1, "short doc"),
    (2, None),
    (3, ""),
    (4, "### " * 60),  # symbol screen
    (5, "- one\n- two\n- three " + "the of and to be that have with " * 10),
    (6, "trailing dots... " * 60),  # ellipsis lines + symbol ratio
    (7, " ".join("supercalifragilistic" for _ in range(60))),  # mean len
    (8, " ".join("12 34" for _ in range(30)) + " the of"),  # alpha gate
    (9, "the be to of and that have with " + " ".join(f"w{i}" for i in range(50))),
    (10, "• bullet\n" * 20 + "the of and to be that have with it now"),
]


def test_flags_match_python_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.q.asDict()
        for r in df.select(
            "doc_id", gopher_quality_flags(F.col("text")).alias("q")
        ).collect()
    }
    for did, text in DOCS:
        want = _model(text)
        for k, v in want.items():
            assert got[did][k] == v, (did, k)


def test_flags_match_model_on_documents_table(spark):
    """Real corpus: every flag field equals the python model doc-for-doc
    (the operator's min_words=20 panel parameterization included)."""
    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    df = spark.createDataFrame([(r.doc_id, r.text) for r in rows],
                               "doc_id long, text string")
    got = {
        r.doc_id: r.q.asDict()
        for r in df.select(
            "doc_id", gopher_quality_flags(F.col("text"), min_words=20, min_stopword_hits=1).alias("q")
        ).collect()
    }
    n_pass = 0
    for r in rows:
        want = _model(r.text, min_words=20, min_stopword_hits=1)
        for k, v in want.items():
            assert got[r.doc_id][k] == v, (r.doc_id, k)
        n_pass += want["passes_gopher_quality"]
    assert 0 < n_pass < len(rows)  # the gate is non-vacuous on the corpus


def test_quality_gate_panel_recombines(spark):
    """The registered panel must equal a from-scratch recombination of
    the three independent flag computations, and be non-vacuous."""
    from yelp_business_data_pipeline_spark.operators.text import (
        c4_doc_flags,
        gopher_repetition_flags,
        gopher_repetition_metrics,
    )
    from yelp_business_data_pipeline_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r.source: r.asDict()
        for r in QUERIES["quality_gate_panel"].spark(spark, sf).collect()
    }
    d = spark.read.parquet(f"{sf}/documents.parquet")
    per_doc = (
        d.select("doc_id", "source", "text")
        .join(gopher_repetition_metrics(d), "doc_id")
        .select(
            "source",
            gopher_repetition_flags().alias("r"),
            gopher_quality_flags(F.col("text"), min_words=20, min_stopword_hits=1)[
                "passes_gopher_quality"
            ].alias("q"),
            c4_doc_flags(F.col("text"), min_kept_lines=1)["passes_c4"].alias("c"),
        )
        .collect()
    )
    want: dict = {}
    for row in per_doc:
        w = want.setdefault(
            row.source,
            {"n_docs": 0, "n_pass_repetition": 0, "n_pass_quality": 0,
             "n_pass_c4": 0, "n_pass_all": 0},
        )
        w["n_docs"] += 1
        w["n_pass_repetition"] += bool(row.r)
        w["n_pass_quality"] += bool(row.q)
        w["n_pass_c4"] += bool(row.c)
        w["n_pass_all"] += bool(row.r) and bool(row.q) and bool(row.c)
    assert set(got) == set(want)
    for src, w in want.items():
        for k, v in w.items():
            assert got[src][k] == v, (src, k)
    tot = sum(w["n_docs"] for w in want.values())
    tot_rep = sum(w["n_pass_repetition"] for w in want.values())
    tot_q = sum(w["n_pass_quality"] for w in want.values())
    tot_c4 = sum(w["n_pass_c4"] for w in want.values())
    # repetition + quality gates are non-vacuous on this corpus; the C4
    # sentence rules legitimately pass NOTHING (single-line word soup,
    # no terminal punctuation) — the per-filter columns make that
    # visible, which is the point of reporting rates per gate
    assert 0 < tot_rep < tot and 0 < tot_q < tot
    assert tot_c4 == 0
    for w in want.values():
        assert w["n_pass_all"] <= min(
            w["n_pass_repetition"], w["n_pass_quality"], w["n_pass_c4"]
        )
