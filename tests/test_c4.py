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


# ---------------------------------------------------------------------------
# c4_span_dedup — the corpus-wide three-line span dedup (Raffel §2.2)
# ---------------------------------------------------------------------------


def _span_dedup_model(docs, span_lines=3):
    """From-scratch python reference: global smallest-(id, start) winner
    per duplicated span, union of losing spans' line indexes dropped."""
    lined = {i: (t or "").split("\n") for i, t in docs}
    occ = {}
    for i, ls in lined.items():
        for p in range(len(ls) - span_lines + 1):
            occ.setdefault("\n".join(ls[p : p + span_lines]), []).append((i, p))
    drops = {i: set() for i in lined}
    for places in occ.values():
        if len(places) > 1:
            win = min(places)
            for i, p in places:
                if (i, p) != win:
                    drops[i].update(range(p, p + span_lines))
    return {
        i: (
            "\n".join(l for j, l in enumerate(ls) if j not in drops[i]),
            len(drops[i]),
        )
        for i, ls in lined.items()
    }


SPAN_DOCS = [
    (1, "a\nb\nc\nd"),                     # global winner of 'a b c'
    (2, "x\na\nb\nc\ny"),                  # loser -> x\ny
    (3, "a\nb\nc"),                        # loser -> empty
    (4, "short"),                          # < 3 lines: untouched
    (5, "p\nq\nr\np\nq\nr\np\nq\nr"),      # within-doc repeats
    (6, "w1\na\nb\nc\nw2\na\nb\nc"),       # two losing occurrences, one doc
    (7, ""),                               # empty text
]


def test_span_dedup_matches_python_model(spark):
    from yelp_business_data_pipeline_spark.operators.text import c4_span_dedup

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean"], r["lines_removed"])
        for r in c4_span_dedup(df, "doc_id", "text").collect()
    }
    assert got == _span_dedup_model(SPAN_DOCS)
    # spot-check the hand-derived facts the model encodes
    assert got[1] == ("a\nb\nc\nd", 0)       # winner keeps its lines
    assert got[2] == ("x\ny", 3)
    assert got[3] == ("", 3)                 # whole doc was the dup
    assert got[4] == ("short", 0)
    assert got[5] == ("p\nq\nr", 6)          # overlap union, one survivor
    assert got[6] == ("w1\nw2", 6)           # both in-doc occurrences lose
    assert got[7] == ("", 0)


def test_span_dedup_exactly_one_occurrence_survives(spark):
    """The C4 sentence: of a span occurring N times corpus-wide, exactly
    one occurrence remains afterwards."""
    from yelp_business_data_pipeline_spark.operators.text import c4_span_dedup

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    out = c4_span_dedup(df, "doc_id", "text").collect()
    survivors = 0
    for r in out:
        ls = r["clean"].split("\n")
        for p in range(len(ls) - 2):
            if "\n".join(ls[p : p + 3]) == "a\nb\nc":
                survivors += 1
    assert survivors == 1


def test_span_dedup_layout_invariance(spark):
    from yelp_business_data_pipeline_spark.operators.text import c4_span_dedup

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    a = sorted(
        map(tuple, c4_span_dedup(df.repartition(7), "doc_id", "text").collect())
    )
    b = sorted(
        map(tuple, c4_span_dedup(df.coalesce(1), "doc_id", "text").collect())
    )
    assert a == b


def test_span_dedup_guards(spark):
    from yelp_business_data_pipeline_spark.operators.text import c4_span_dedup

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        c4_span_dedup(df, "doc_id", "text", span_lines=0)
    with pytest.raises(ValueError, match="already exists"):
        c4_span_dedup(df.withColumn("clean", F.lit("x")), "doc_id", "text")


def test_span_dedup_is_jvm_only(spark):
    from yelp_business_data_pipeline_spark.operators.text import c4_span_dedup

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    plan = (
        c4_span_dedup(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_span_dedup_panel_matches_duckdb_twin_exactly(spark, sf_dir):
    from tests.oracle_harness import duck_con
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        C4_SPAN_DEDUP_ORACLE,
    )

    srows = [
        tuple(r)
        for r in QUERIES["c4_span_dedup_panel"].spark(spark, sf_dir).collect()
    ]
    drows = [
        tuple(r)
        for r in duck_con(sf_dir).execute(C4_SPAN_DEDUP_ORACLE).fetchall()
    ]
    assert srows == drows
    assert len(srows) > 0
    # the synthesis must actually exercise removal
    assert sum(r[4] for r in srows) > 0  # docs_changed


def test_span_dedup_registry_gate_layout():
    """Promoted into the 50-slot gate in the r10 rotation: the panel must
    sit in the driver-executed prefix WITH its exact twin attached."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        C4_SPAN_DEDUP_ORACLE,
    )

    names = list(QUERIES)
    assert names.index("c4_span_dedup_panel") < 50
    assert QUERIES["c4_span_dedup_panel"].oracle == C4_SPAN_DEDUP_ORACLE


def test_span_dedup_winner_is_aggregate_not_corpus_window(spark):
    """The scale claim in the docstring: the global winner comes from a
    min(struct) AGGREGATE on the span hash — the only Window in the plan
    would be a corpus-wide sort; there must be none."""
    from yelp_business_data_pipeline_spark.operators.text import c4_span_dedup

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    plan = (
        c4_span_dedup(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_blocklist_whole_word_matrix(spark):
    """The C4 bad-words page filter (r10): WHOLE-word matching with
    class-based boundaries — 'class' never trips an 'ass' entry, words
    match at text start/end and against punctuation, multi-word entries
    match across their literal space, regex metachars in entries are
    escaped."""
    from yelp_business_data_pipeline_spark.operators.text import (
        blocklist_hit,
        blocklist_pattern,
    )

    words = ["badword", "two words", "meta+char"]
    cases = [
        ("a badword here", True),
        ("badword", True),                    # whole text
        ("ends with badword", True),
        ("badword, punctuation", True),
        ("notabadword here", False),          # substring must NOT match
        ("badwords plural differs", False),
        ("two words together", True),
        ("two  words double space", False),   # literal single space
        ("meta+char hits", True),
        ("metaXchar misses", False),          # '+' was escaped, not regex
        ("clean text entirely", False),
        ("", False),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
    )
    got = {
        r.i: r.hit
        for r in df.select("i", blocklist_hit(F.col("t"), words).alias("hit")).collect()
    }
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, (t, got[i], want)

    # the same pattern means the same thing under RE2 (the DuckDB twin
    # portability rule for every class-based regex in this repo)
    import duckdb

    pat = blocklist_pattern(words)
    con = duckdb.connect()
    for t, want in cases:
        (d,) = con.execute(
            "SELECT regexp_matches(?, ?)", [t, pat]
        ).fetchone()
        assert d == want, ("duckdb", t, d, want)

    with pytest.raises(ValueError, match="empty word list"):
        blocklist_pattern([])
    with pytest.raises(ValueError, match="empty string"):
        blocklist_pattern(["ok", ""])


def test_c4_doc_flags_blocklist_leg_and_struct_stability(spark):
    """With a blocklist the struct gains has_blocklist_word and the
    verdict conjoins it; WITHOUT one the struct is byte-identical to the
    pre-r10 shape (existing consumers' schemas must not move)."""
    good = "this line is long enough to pass the filter today.\n" * 3
    bad = good + "one badword line also long enough to pass today.\n"
    df = spark.createDataFrame([(1, good), (2, bad)], "i long, t string")

    plain = df.select(c4_doc_flags(F.col("t")).alias("f"))
    assert [f.name for f in plain.schema["f"].dataType.fields] == [
        "has_lorem_ipsum",
        "has_curly_brace",
        "has_policy_phrase",
        "n_kept_lines",
        "passes_c4",
    ]
    assert all(r.f.passes_c4 for r in plain.collect())

    gated = {
        r.i: r.f
        for r in df.select(
            "i", c4_doc_flags(F.col("t"), blocklist=["badword"]).alias("f")
        ).collect()
    }
    assert gated[1].has_blocklist_word is False and gated[1].passes_c4
    assert gated[2].has_blocklist_word is True and not gated[2].passes_c4
