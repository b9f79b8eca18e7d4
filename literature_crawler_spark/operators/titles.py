"""PDF candidate-title finder (pure-logic port of the reference's
font-size-ranked title machinery).

Reference: ``app/service/pdf2doi/find_title_via_pymupdf.py`` (the whole
file — ``fonts`` span-size histogram, ``font_tags`` size->tag ladder,
``headers_para`` block assembly, ``find_title_via_pymupdf`` first-<h1>
pick) and ``app/service/pdf2doi/finders.py:390-444``
``find_possible_titles`` (the 4-tier candidate ladder: pdftitle ->
pymupdf-h1 -> document-info title keys -> filename, order-preserving
dedup).

PyMuPDF (``fitz``) is not in this container, so the *span extraction*
step — real-PDF bytes -> (block, line, size, text) spans — is the
documented library swap point, exactly like the codec swap points in
operators/images. Everything downstream of span extraction is the pure
algorithm, ported faithfully and driven batch-at-a-time through a
pandas UDF (Arrow transfer, no per-row Python UDF).

Faithfully-preserved reference quirks (documented, not "fixed"):

* ``font_tags`` numbers heading tags by *rank among all sizes above the
  paragraph size* with the off-by-design ``idx`` walk — ``<h1>`` exists
  iff at least one span size exceeds the modal (paragraph) size.
* ``find_title_via_pymupdf`` returns ``e.lstrip("<h1>")`` — a CHAR-SET
  strip, not a prefix strip, so a title that itself starts with any of
  ``<``, ``h``, ``1``, ``>`` loses those leading characters (e.g.
  ``"1110 patterns"`` -> ``"0 patterns"``). Ported as-is; the unit test
  pins it.
* ``headers_para`` appends a ``|`` per line and per block; the h1 pick
  then deletes every pipe from the title.
* tier thresholds: pdftitle/pymupdf titles must strip-len > 12;
  info-dict titles must ALSO have > 3 whitespace words; a filename is
  only a candidate when its strip-len > 30 (finders.py:402-440).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("block", T.IntegerType()),
            T.StructField("line", T.IntegerType()),
            T.StructField("size", T.DoubleType()),
            T.StructField("text", T.StringType()),
        ]
    )
)

TITLES_SCHEMA = T.ArrayType(T.StringType())


# ------------------------------------------------------------ pure port ----


def font_size_tags(sizes: list[float]) -> dict[float, str]:
    """Size -> element tag (reference ``fonts`` + ``font_tags``): the
    most frequent span size is the paragraph ``<p>``; sizes above it get
    ``<h{idx}>`` in descending order, sizes below get ``<s{idx}>`` with
    the reference's idx walk (reset to 0 at the paragraph size)."""
    if not sizes:
        return {}
    counts = Counter(sizes)
    # reference sorts by count desc only (Python's stable sort keeps
    # first-seen order among ties) — replicate via (count, first-seen)
    first_seen: dict[float, int] = {}
    for i, s in enumerate(sizes):
        first_seen.setdefault(s, i)
    p_size = min(counts, key=lambda s: (-counts[s], first_seen[s]))
    size_tag: dict[float, str] = {}
    idx = 0
    for size in sorted(counts, reverse=True):
        idx += 1
        if size == p_size:
            idx = 0
            size_tag[size] = "<p>"
        if size > p_size:
            size_tag[size] = f"<h{idx}>"
        elif size < p_size:
            size_tag[size] = f"<s{idx}>"
    return size_tag


def headers_para(spans: list[tuple[int, int, float, str]]) -> list[str]:
    """Tag-prefixed block strings (reference ``headers_para``): spans of
    one block concatenate while the size stays constant, a size change
    flushes the running string, every line appends a ``|``. ``spans`` is
    (block, line, size, text), already in document order."""
    size_tag = font_size_tags([s[2] for s in spans])
    out: list[str] = []
    first = True
    prev_size: float | None = None
    block_string = ""
    # group document order into blocks -> lines (document order is the
    # input order; block/line ids delimit the reference's nested loops)
    blocks: dict[int, dict[int, list[tuple[float, str]]]] = {}
    order: list[int] = []
    for block, line, size, text in spans:
        if block not in blocks:
            blocks[block] = {}
            order.append(block)
        blocks[block].setdefault(line, []).append((size, text))
    for block in order:
        block_string = ""
        for line in sorted(blocks[block]):
            for size, text in blocks[block][line]:
                if not text.strip():
                    continue
                if first:
                    first = False
                    block_string = size_tag[size] + text
                elif size == prev_size:
                    if block_string and all(c == "|" for c in block_string):
                        block_string = size_tag[size] + text
                    if block_string == "":
                        block_string = size_tag[size] + text
                    else:
                        block_string += " " + text
                else:
                    out.append(block_string)
                    block_string = size_tag[size] + text
                prev_size = size
            block_string += "|"
        out.append(block_string)
    return out


def title_from_spans(spans: list[tuple[int, int, float, str]]) -> str | None:
    """First ``<h1>`` element, reference ``find_title_via_pymupdf``:
    ``lstrip("<h1>")`` (char-set strip — quirk preserved) + pipe strip."""
    if not spans:
        return None
    for e in headers_para(spans):
        if e.startswith("<h1>"):
            return e.lstrip("<h1>").replace("|", "")
    return None


def find_possible_titles(
    pdftitle_title: str | None,
    spans: list[tuple[int, int, float, str]],
    info: dict[str, str] | None,
    filename: str | None,
) -> list[str]:
    """The 4-tier candidate ladder (finders.py:390-444), pure form.

    ``pdftitle_title`` stands in for tier 1's pdftitle-library output
    (the library swap point — pass None when unavailable, matching the
    reference's swallowed-exception behavior)."""
    titles: list[str] = []
    if isinstance(pdftitle_title, str) and len(pdftitle_title.strip()) > 12:
        titles.append(pdftitle_title.strip())
    try:
        t = title_from_spans(spans)
    except Exception:
        t = None
    if isinstance(t, str) and len(t.strip()) > 12:
        titles.append(t.strip())
    if info:
        for key, value in info.items():
            if "title" in key.lower():
                if isinstance(value, str) and len(value.strip()) > 12 and len(value.split()) > 3:
                    titles.append(value.strip())
    if filename:
        base = filename.rsplit("/", 1)[-1]
        if len(base.strip()) > 30:
            titles.append(base.strip())
    deduped: list[str] = []
    for x in titles:
        if x not in deduped:
            deduped.append(x)
    return deduped


# ---------------------------------------------------------- spark surface ----


@F.pandas_udf(TITLES_SCHEMA)
def _possible_titles_udf(
    pdftitle_title: pd.Series, spans: pd.Series, info: pd.Series, filename: pd.Series
) -> pd.Series:
    out = []
    for pt, sp, inf, fn in zip(pdftitle_title, spans, info, filename):
        tuples = (
            [(int(s["block"]), int(s["line"]), float(s["size"]), s["text"]) for s in sp]
            if sp is not None
            else []
        )
        out.append(find_possible_titles(pt, tuples, inf, fn))
    return pd.Series(out)


def possible_titles(
    pdftitle_title: Column, spans: Column, info: Column, filename: Column
) -> Column:
    """array<string> candidate titles. ``spans``: SPAN_SCHEMA array in
    document order; ``info``: map<string,string> document-info dict;
    vectorized (one Arrow batch per partition) — scale is one pass over
    the span arrays, no shuffle."""
    return _possible_titles_udf(pdftitle_title, spans, info, filename)


def with_possible_titles(
    df: DataFrame,
    spans_col: str = "spans",
    info_col: str = "info",
    filename_col: str = "filename",
    pdftitle_col: str | None = None,
    out_col: str = "candidate_titles",
) -> DataFrame:
    pt = (
        F.col(pdftitle_col)
        if pdftitle_col
        else F.lit(None).cast("string")
    )
    return df.withColumn(
        out_col,
        possible_titles(pt, F.col(spans_col), F.col(info_col), F.col(filename_col)),
    )
