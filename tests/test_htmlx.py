"""HTML main-text extraction (operators/htmlx.py): handwritten parser
fixture matrix, jusText-core classification semantics, corpus-wide
roundtrip through the Spark path, plan pins (zero-shuffle Arrow map;
JVM-only wrap template), and block/doc grain agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.htmlx import (
    classify_blocks,
    extract_main_text,
    html_blocks,
    parse_html,
    wrap_documents_as_html,
)

PAGE = (
    "<html><head><title>Doc 7</title><script>var page={id:7};</script></head>"
    '<body><nav><a href="/">home</a> <a href="/docs">docs</a></nav>'
    '<div class="content"><p>hello world one two three</p>'
    "<p>a &amp; b &lt;tag&gt;</p></div>"
    '<footer><a href="/tos">terms</a> &amp; conditions</footer></body></html>'
)


def test_parse_html_full_page_blocks():
    p = parse_html(PAGE)
    assert p["title"] == "Doc 7"
    assert [(b["tag"], b["text"], b["boilerplate_tag"]) for b in p["blocks"]] == [
        ("nav", "home docs", True),
        ("p", "hello world one two three", False),
        ("p", "a & b <tag>", False),  # entities decoded
        ("footer", "terms & conditions", True),
    ]
    nav, p1, p2, foot = p["blocks"]
    assert nav["link_chars"] == len("home") + len("docs")
    assert p1["link_chars"] == p2["link_chars"] == 0
    assert foot["link_chars"] == len("terms")
    assert p1["n_words"] == 5 and p2["n_words"] == 4


@pytest.mark.parametrize(
    ("html", "expected"),
    [
        # unclosed tag: flushed at document end
        ("<p>unclosed one", [("p", "unclosed one")]),
        # implicit close: <p> reopens without </p> (browsers do the same)
        ("<p>a<p>b</p>", [("p", "a"), ("p", "b")]),
        # stray close ignored, bare body text lands in a 'body' block
        ("</div>plain words here", [("body", "plain words here")]),
        # inline markup does not split a block
        ("<div>bare <b>bold</b> text</div>", [("div", "bare bold text")]),
        # comments and doctype are invisible
        ("<!doctype html><!-- c --><p>after comment</p>", [("p", "after comment")]),
        # script payload containing '<' never leaks into text
        ("<script>if(a<b){x()}</script><p>real</p>", [("p", "real")]),
        # truncated entity at EOF survives as literal text
        ("<p>trunc &am", [("p", "trunc &am")]),
        # whitespace runs collapse; br is a space, not a block break
        ("<p>two\n   spaced<br>words</p>", [("p", "two spaced words")]),
        # an svg <title>/<path> inside a paragraph is invisible and must
        # NOT split the block (accessible-icon markup is everywhere)
        (
            '<p>Hello there my good <svg viewBox="0 0 1 1"><title>star</title>'
            "<path/></svg> friends of five words</p>",
            [("p", "Hello there my good friends of five words")],
        ),
        # a stray block close inside a skip subtree must not pop the
        # enclosing block either
        (
            "<p>before <template><p>ghost</p></template> after</p>",
            [("p", "before after")],
        ),
        (None, []),
        ("", []),
        ("   \n\t ", []),
    ],
)
def test_parse_html_malformation_matrix(html, expected):
    assert [(b["tag"], b["text"]) for b in parse_html(html)["blocks"]] == expected


def test_tabs_and_crlf_normalize_like_the_panel(spark, sf_dir):
    """A document containing tabs/CR must keep the live roundtrip
    invariant: the kernel and the panel's JVM expected-text expression
    pin the SAME whitespace class."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    docs = spark.createDataFrame(
        [(0, "a\tb  c\r", "en", "srcX", 8), (1, "x\x0by", "en", "srcX", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        rows = QUERIES["html_extract_panel"].spark(spark, td).collect()
    assert len(rows) == 1
    assert rows[0].n_roundtrip == rows[0].n_docs == 2


def test_nested_anchors_link_chars_never_exceed_text():
    b = parse_html("<p><a><a>x</a>y</a> done</p>")["blocks"][0]
    assert b["text"] == "xy done"
    assert 0 < b["link_chars"] <= b["n_chars"]


def test_classify_blocks_rules():
    blocks = parse_html(PAGE)["blocks"]
    # default min_words=5: only the 5-word paragraph is content
    assert classify_blocks(blocks) == [False, True, False, False]
    # min_words=1 admits the second paragraph; boilerplate stays out even
    # though the footer's own link density (5/18) is under the threshold
    assert classify_blocks(blocks, min_words=1) == [False, True, True, False]
    # link density gate: a nav-free link farm dies on density alone
    farm = parse_html('<p><a href="x">click here for more deals</a> now</p>')
    assert classify_blocks(farm["blocks"], min_words=1) == [False]


def test_extract_one_matches_parse(spark):
    df = spark.createDataFrame([(7, PAGE)], "doc_id long, html string")
    row = extract_main_text(df, min_words=1).select("extracted.*").collect()[0]
    assert row.title == "Doc 7"
    assert row.text == "hello world one two three\na & b <tag>"
    assert (row.n_blocks, row.n_good_blocks) == (4, 2)
    assert row.kept_chars == len("hello world one two three") + len("a & b <tag>")
    assert row.link_chars == (len("home") + len("docs")) + len("terms")


def test_extract_plan_is_zero_shuffle_arrow(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = extract_main_text(wrap_documents_as_html(d), min_words=1)
    plan = e._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time
    assert "Exchange" not in plan  # the WET map shuffles nothing
    assert "BatchEvalPython" not in plan


def test_wrap_template_is_jvm_only(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = wrap_documents_as_html(d)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_corpus_roundtrip_panel(spark, sf_dir):
    """The tracker's live invariants on the real corpus: every wrapped
    document extracts back to its whitespace-normalized source lines and
    its synthetic title; boilerplate contributes link chars but no kept
    blocks beyond the paragraphs."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["html_extract_panel"].spark(spark, sf_dir).collect()
    assert rows, "panel returned no rows"
    for r in rows:
        assert r.n_roundtrip == r.n_docs, r
        assert r.n_title_ok == r.n_docs, r
        # template anatomy: nav + content div + footer + >=1 paragraph
        assert r.n_blocks >= 3 * r.n_docs
        assert r.n_good_blocks == r.n_blocks - 2 * r.n_docs  # nav+footer only
        assert r.link_chars == r.n_docs * (len("homedocs") + len("terms"))


def test_block_grain_agrees_with_doc_grain(spark):
    docs = [
        (1, PAGE),
        (2, "<p>unclosed one two three four five"),
        (3, "<ul><li>alpha beta gamma delta epsilon</li><li>tiny</li></ul>"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, html string")
    blocks = html_blocks(df, min_words=1).orderBy("doc_id", "block_idx").collect()
    docf = {
        r.doc_id: r.extracted
        for r in extract_main_text(df, min_words=1).collect()
    }
    rebuilt: dict = {}
    for b in blocks:
        if b.good:
            rebuilt.setdefault(b.doc_id, []).append(b.block_text)
    for did, ext in docf.items():
        assert "\n".join(rebuilt.get(did, [])) == ext.text, did
    # per-block fields round the repo way and order within doc
    idx = [b.block_idx for b in blocks if b.doc_id == 1]
    assert idx == list(range(len(idx)))
    assert all(0.0 <= b.link_density <= 1.0 for b in blocks)
    assert 4 not in rebuilt  # NULL html: zero blocks, empty text
    assert docf[4].text == "" and docf[4].n_blocks == 0


def test_registry_tail_layout():
    """The tracker registers AFTER the 50-slot oracle gate."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    assert names.index("html_extract_panel") >= 50
    assert QUERIES["html_extract_panel"].oracle is None
