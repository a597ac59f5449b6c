"""HTML -> text extraction (operators/htmltext.py): planted-markup
coverage for the parser behaviors the catalog's template-subset oracle
cannot exercise — nesting, malformed markup, CDATA, comments, numeric
charrefs, case-insensitivity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _extract(spark, pages):
    from slurm2sql_spark.operators.htmltext import html_to_text

    df = spark.createDataFrame(pages, "id int, html string")
    return {
        r["id"]: r for r in html_to_text(df, "id", "html").collect()
    }


def test_subtree_drops_and_blocks(spark):
    rows = _extract(
        spark,
        [
            (
                1,
                "<html><head><title>T</title><style>p{x}</style></head>"
                "<body><nav><ul><li>Home</li><li>About</li></ul></nav>"
                "<h1>Hello</h1><p>World one.</p>"
                "<script>var x = '<p>not text</p>';</script>"
                "<p>World two.</p></body></html>",
            ),
        ],
    )
    r = rows[1]
    assert r["text"] == "Hello\nWorld one.\nWorld two."
    assert r["n_blocks"] == 3
    # head + nav + script are the dropped ROOTS (title/style/ul/li are
    # inside already-dropped subtrees or kept)
    assert r["n_dropped"] == 3
    assert r["n_links"] == 0


def test_inline_tags_do_not_split_text(spark):
    rows = _extract(
        spark,
        [(1, "<p>al<b>pha</b> <i>bet</i>a <a href='/x'>link</a>ed</p>")],
    )
    assert rows[1]["text"] == "alpha beta linked"
    assert rows[1]["n_links"] == 1


def test_entity_decoding_named_numeric_hex(spark):
    rows = _extract(
        spark,
        [(1, "<p>&lt;tag&gt; &amp;amp; &#65;&#x42;c &quot;q&quot;</p>")],
    )
    assert rows[1]["text"] == '<tag> &amp; ABc "q"'


def test_uppercase_tags_and_self_closing(spark):
    rows = _extract(
        spark,
        [
            (1, "<P>One</P><BR/><DIV>Two</DIV>"),
            (2, "<p>line one<br>line two</p>"),
        ],
    )
    assert rows[1]["text"] == "One\nTwo"
    # <br> delimits a block even unclosed (void element)
    assert rows[2]["text"] == "line one\nline two"


def test_comments_and_unclosed_script(spark):
    rows = _extract(
        spark,
        [
            (1, "<p>keep</p><!-- <p>comment text</p> --><p>also</p>"),
            # unclosed script: CDATA runs to EOF, rest is dropped
            (2, "<p>before</p><script>var a = 1;"),
        ],
    )
    assert rows[1]["text"] == "keep\nalso"
    assert rows[2]["text"] == "before"


def test_nested_drop_tags_balance(spark):
    rows = _extract(
        spark,
        [
            (
                1,
                "<nav>outer <nav>inner</nav> tail</nav><p>kept</p>"
                "<nav>again</nav>",
            )
        ],
    )
    r = rows[1]
    assert r["text"] == "kept"
    # nested nav is not a new ROOT; the second top-level nav is
    assert r["n_dropped"] == 2


def test_mismatched_drop_close_cannot_undrop(spark):
    """r11 ADVICE: a stray close of a DIFFERENT drop tag inside an open
    drop region (a lone </noscript> inside <nav>) must not un-drop the
    subtree and leak boilerplate; only the matching innermost close
    pops."""
    rows = _extract(
        spark,
        [
            (1, "<nav>menu </noscript>still menu</nav><p>body</p>"),
            # interleaved close order: </nav> inside <script> is CDATA
            # (no effect); the mismatched </style> inside <nav> is
            # ignored, the matching </nav> pops
            (2, "<nav>a</style>b</nav><p>kept</p>"),
            # a stray close with NO open drop region stays a no-op
            (3, "</noscript><p>fine</p>"),
        ],
    )
    assert rows[1]["text"] == "body"
    assert rows[2]["text"] == "kept"
    assert rows[3]["text"] == "fine"


def test_edge_strip_and_empty_blocks(spark):
    rows = _extract(
        spark,
        [
            (1, "<p>  padded  </p><p>\t\n</p><div> x </div>"),
            (2, None),
            (3, ""),
        ],
    )
    assert rows[1]["text"] == "padded\nx"
    assert rows[1]["n_blocks"] == 2
    assert rows[2]["text"] is None and rows[2]["n_tags"] is None
    assert rows[3]["text"] == "" and rows[3]["n_blocks"] == 0


def test_stray_end_tags_and_text_outside_blocks(spark):
    rows = _extract(
        spark,
        [(1, "</div>loose text<p>para</p>trailing")],
    )
    # stray end tag flushes nothing harmful; trailing data flushes at
    # close
    assert rows[1]["text"] == "loose text\npara\ntrailing"


def test_composes_with_quality_filter(spark):
    """The extracted text column feeds quality_filter unchanged — the
    html_clean composition path."""
    from slurm2sql_spark.operators.htmltext import html_to_text
    from slurm2sql_spark.operators.textstats import quality_filter

    body = " ".join(
        ["the quick brown fox jumps over the lazy dog and that"] * 5
    )
    df = spark.createDataFrame(
        [(1, f"<body><nav>Home About Contact</nav><p>{body}</p></body>")],
        "doc_id int, html string",
    )
    ext = html_to_text(df, "doc_id", "html").select("doc_id", "text")
    qf = quality_filter(ext, "doc_id", "text", min_words=30).collect()[0]
    assert qf["n_words"] == 55  # nav words must NOT count
    assert qf["keep"]
