"""HTML -> text extraction: the FIRST stage of every web-corpus
pipeline (CommonCrawl-style corpora enter as HTML; the curation chain
— C4 cleaning, Gopher quality rules, dedup, decontamination — consumes
extracted text). VERDICT r10 "next round" #1.

Pure-stdlib ``html.parser.HTMLParser`` running as an Arrow-batched
pandas kernel:

- **subtree drops**: ``script``/``style``/``head``/``nav``/
  ``noscript``/``template``/``iframe`` subtrees contribute no text
  (boilerplate chrome and code, the C4/trafilatura drop set);
- **entity decoding**: character references (``&amp;`` ``&#65;``
  ``&lt;`` ...) decode to their characters (HTMLParser's
  ``convert_charrefs``);
- **block segmentation**: block-level tags (``p`` ``div`` ``h1-h6``
  ``li`` ``br`` ``tr`` ...) delimit text blocks; inline tags
  (``b`` ``i`` ``a`` ``span`` ...) do not split the surrounding text.
  Each block is edge-stripped on the pinned whitespace class
  (``' \\t\\n\\r\\f'`` — the RE2-parity set every tokenizer here
  uses); empty blocks are dropped; output is the newline-joined
  block list.
- **per-doc tag stats**: total start tags seen, dropped subtree
  roots, link (``<a>``) tags, emitted blocks — the signals a
  boilerplate-ratio filter reads.

Scale shape: a narrow Arrow kernel — one Python pass per document,
zero shuffle, composes with the ``fan_out`` seam upstream exactly like
the winnow/shingle kernels (the UDF dominates; a single-row-group scan
would run it nearly serial). Downstream operators
(``textstats.c4_filter``, ``textstats.quality_filter``, the dedup
family) consume the ``text`` column unchanged.

Determinism: HTMLParser is a deterministic tokenizer (no network, no
entity table drift — ``html.entities`` is stdlib-pinned), so the
extraction is reproducible across executors and runs; malformed markup
degrades deterministically (unclosed drop-tags skip to EOF, stray end
tags are ignored).

No reference-repo analog (slurm2sql ingests sacct text); this extends
the engine's LLM-pipeline surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["html_to_text", "DROP_TAGS", "BLOCK_TAGS"]

#: Subtrees whose text never reaches the output. ``head`` covers
#: title/style/meta wholesale; ``nav`` is the canonical boilerplate
#: container the extraction exists to kill.
DROP_TAGS = frozenset(
    ["script", "style", "head", "nav", "noscript", "template", "iframe"]
)

#: Tags that delimit text blocks (flush on both start and end). The
#: HTML block-level display set plus ``br``/``hr``/``tr``/``td`` —
#: anything whose boundary should not glue two words together.
BLOCK_TAGS = frozenset(
    [
        "address", "article", "aside", "blockquote", "body", "br",
        "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "head", "header", "hr", "html", "li", "main", "nav", "ol", "p",
        "pre", "section", "table", "tbody", "td", "tfoot", "th",
        "thead", "title", "tr", "ul",
    ]
)

#: Void elements (no matching end tag): a DROP-depth increment for
#: these would never be undone.
_VOID_TAGS = frozenset(
    ["area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "source", "track", "wbr"]
)

#: The pinned edge-strip class (RE2 ``\s`` parity — no ``\x0b``).
_STRIP_CHARS = " \t\n\r\f"


def html_to_text(
    df: DataFrame,
    id_col: str,
    html_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Extract block text + tag stats from an HTML column.

    Returns ``(id_col, text, n_tags, n_dropped, n_links, n_blocks)``:

    - ``text`` — newline-joined non-empty blocks (see module doc);
      NULL html stays NULL;
    - ``n_tags`` — start tags (incl. self-closing) the tokenizer saw
      (content inside ``script``/``style`` is CDATA and contributes
      none, matching browsers);
    - ``n_dropped`` — dropped subtree ROOTS (a ``<nav>`` with ten
      children counts once);
    - ``n_links`` — ``<a>`` start tags anywhere, dropped regions
      included (the link-density signal wants the raw count);
    - ``n_blocks`` — blocks that survived the empty-strip.
    """
    from html.parser import HTMLParser

    @F.pandas_udf(
        "struct<text:string,n_tags:int,n_dropped:int,"
        "n_links:int,n_blocks:int>"
    )
    def _kernel(htmls: pd.Series) -> pd.DataFrame:
        class _Extractor(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.blocks: list[str] = []
                self._buf: list[str] = []
                # stack of OPEN drop tags — a close only pops when it
                # matches the innermost open drop tag, so a stray
                # mismatched close (a lone </noscript> inside an open
                # <nav>, routine in crawled HTML) cannot un-drop the
                # subtree and leak boilerplate into the extraction
                self._drop_stack: list[str] = []
                self._skip = 0
                self.n_tags = 0
                self.n_dropped = 0
                self.n_links = 0

            def _flush(self):
                s = "".join(self._buf).strip(_STRIP_CHARS)
                self._buf.clear()
                if s:
                    self.blocks.append(s)

            def handle_starttag(self, tag, attrs):
                self.n_tags += 1
                if tag == "a":
                    self.n_links += 1
                if tag in BLOCK_TAGS:
                    self._flush()
                if tag in DROP_TAGS and tag not in _VOID_TAGS:
                    if self._skip == 0:
                        self.n_dropped += 1
                    self._drop_stack.append(tag)
                    self._skip += 1

            def handle_startendtag(self, tag, attrs):
                # self-closing form: counts as a tag, delimits a block,
                # but opens no subtree (nothing to skip)
                self.n_tags += 1
                if tag == "a":
                    self.n_links += 1
                if tag in BLOCK_TAGS:
                    self._flush()
                if tag in DROP_TAGS and self._skip == 0:
                    self.n_dropped += 1

            def handle_endtag(self, tag):
                if (
                    tag in DROP_TAGS
                    and self._drop_stack
                    and self._drop_stack[-1] == tag
                ):
                    self._drop_stack.pop()
                    self._skip -= 1
                if tag in BLOCK_TAGS:
                    self._flush()

            def handle_data(self, data):
                if self._skip == 0 and data:
                    self._buf.append(data)

        rows = []
        for h in htmls:
            if h is None:
                rows.append((None, None, None, None, None))
                continue
            p = _Extractor()
            p.feed(h)
            p.close()
            p._flush()
            rows.append(
                (
                    "\n".join(p.blocks),
                    p.n_tags,
                    p.n_dropped,
                    p.n_links,
                    len(p.blocks),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["text", "n_tags", "n_dropped", "n_links", "n_blocks"],
        )

    out = df.withColumn("_ht", _kernel(F.col(html_col)))
    return out.select(
        F.col(id_col),
        F.col("_ht.text").alias(text_col),
        F.col("_ht.n_tags").alias("n_tags"),
        F.col("_ht.n_dropped").alias("n_dropped"),
        F.col("_ht.n_links").alias("n_links"),
        F.col("_ht.n_blocks").alias("n_blocks"),
    )
