"""C4 cleaning rules (text.c4_kept_lines / c4_doc_flags): python-model
equality, a DuckDB list_filter twin, and the documented gate semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.text import (
    C4_POLICY_PHRASES,
    C4_TERMINAL,
    c4_doc_flags,
    c4_kept_lines,
)


def _kept_model(text, min_words=5):
    out = []
    for line in (text or "").split("\n"):
        r = line.rstrip()
        words = [w for w in line.strip().split() if w]
        if (
            r
            and r[-1] in C4_TERMINAL
            and len(words) >= min_words
            and "javascript" not in line
        ):
            out.append(line)
    return out


DOCS = [
    (0, "this is a fine prose sentence with plenty of words.\n"
        "short one.\n"
        "another perfectly reasonable sentence that also terminates properly!\n"
        "no terminal punctuation on this long enough line here\n"
        'a quoted sentence with enough words ends like this."\n'
        "enable javascript to view this content please now."),
    (1, "lorem ipsum dolor sit amet and then some more words here.\n"
        "a second proper sentence with enough words to count fine.\n"
        "a third proper sentence with enough words to count fine."),
    (2, "function f() { return 1; } described in plenty of words here.\n"
        "a second proper sentence with enough words to count fine.\n"
        "a third proper sentence with enough words to count fine."),
    (3, "please accept our privacy policy to continue reading this site.\n"
        "a second proper sentence with enough words to count fine.\n"
        "a third proper sentence with enough words to count fine."),
    (4, "one good long sentence that would pass every single line rule.\n"
        "two good long sentences that would pass every single line rule.\n"
        "three good long sentences that would pass every single line rule."),
    (5, "only two surviving lines in this document sadly exist here.\n"
        "the second surviving line of this document also exists here.\n"
        "but this third line has no terminal punctuation at all"),
    (6, ""),
    (7, None),
]


def test_kept_lines_matches_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.kept
        for r in df.select(
            "doc_id", c4_kept_lines(F.col("text")).alias("kept")
        ).collect()
    }
    for doc_id, text in DOCS:
        want = _kept_model(text)
        if text is None:
            assert got[doc_id] is None
        else:
            assert got[doc_id] == want, doc_id


def test_doc_flags_gate(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.f.asDict()
        for r in df.select(
            "doc_id", c4_doc_flags(F.col("text")).alias("f")
        ).collect()
    }
    assert got[1]["has_lorem_ipsum"] and not got[1]["passes_c4"]
    assert got[2]["has_curly_brace"] and not got[2]["passes_c4"]
    assert got[3]["has_policy_phrase"] and not got[3]["passes_c4"]
    assert got[4] == {
        "has_lorem_ipsum": False,
        "has_curly_brace": False,
        "has_policy_phrase": False,
        "n_kept_lines": 3,
        "passes_c4": True,
    }
    assert got[5]["n_kept_lines"] == 2 and not got[5]["passes_c4"]
    assert got[0]["n_kept_lines"] == len(_kept_model(DOCS[0][1]))
    assert sorted(C4_POLICY_PHRASES)  # frozen tuple exists for twins


def test_duckdb_list_filter_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    df = spark.createDataFrame([d for d in DOCS if d[1] is not None],
                               "doc_id long, text string")
    got = {
        r.doc_id: (r.n_kept, r.passes)
        for r in df.select(
            "doc_id",
            F.size(c4_kept_lines(F.col("text"))).alias("n_kept"),
            c4_doc_flags(F.col("text")).passes_c4.alias("passes"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [d for d in DOCS if d[1] is not None]
    )
    rows = con.execute(
        """
        SELECT doc_id,
               len(list_filter(string_split(text, chr(10)), l ->
                   rtrim(l) <> ''
                   AND rtrim(l)[-1] IN ('.', '!', '?', '"')
                   AND len(list_filter(regexp_split_to_array(trim(l), ' +'),
                           w -> w <> '')) >= 5
                   AND NOT contains(l, 'javascript'))) AS n_kept,
               NOT contains(text, 'lorem ipsum')
               AND NOT contains(text, '{')
               AND NOT (contains(text, 'terms of use')
                        OR contains(text, 'privacy policy')
                        OR contains(text, 'cookie policy')
                        OR contains(text, 'uses cookies'))
        FROM docs
        """
    ).fetchall()
    for doc_id, n_kept, clean in rows:
        assert got[doc_id][0] == n_kept, doc_id
        assert got[doc_id][1] == (clean and n_kept >= 3), doc_id
