"""HTML -> markdown conversion with placeholder protection (M6 tail).

The reference converts fetched article HTML to markdown with the
``html2text`` library AFTER shielding ~12 element categories behind
placeholders so the converter cannot mangle them, then restores them
(``app/util/current_protocol_clean_util.py:211-534``
``get_content_text_by_text``): sub/sup spans, figure sections (image +
video variants), inline images, data tables kept as raw HTML,
computer-code tables -> fenced code, annotation paragraphs -> <Note>
tags, type="a" ordered lists, plain lists, MathJax TeX annotations; it
also strips in-page anchors and drops the references/cited-by sections.

The engine re-expresses the same pipeline without the html2text
dependency (not available in this container): ``protect`` applies the
category shields, ``markdown_core`` is a native block/inline HTML ->
markdown converter (headings, paragraphs, lists, emphasis, links, code,
entity unescape — covering the constructs the reference's corpus
exercises with ``body_width=0`` semantics: no line wrapping), and
``restore`` swaps the placeholders back. Per-document string surgery is
inherently scalar, so the Spark surface is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PLACEHOLDER = "\x00PH{}\x00"


class _Shield:
    """Allocates placeholders and records their replacements."""

    def __init__(self) -> None:
        self.mapping: dict[str, str] = {}

    def add(self, replacement: str) -> str:
        ph = _PLACEHOLDER.format(len(self.mapping))
        self.mapping[ph] = replacement
        return ph

    def restore(self, text: str) -> str:
        # reverse insertion order: a LATER shield can swallow a region
        # containing an EARLIER placeholder (sub/sup inside a table div),
        # so later replacements must expand first or the nested
        # placeholder would never be found and \x00PH..\x00 bytes would
        # leak into the output; the converse cannot happen (a
        # replacement string is captured before later placeholders exist)
        for ph, original in reversed(self.mapping.items()):
            text = text.replace(ph, original)
        return text


def _strip_tags(s: str) -> str:
    return _html.unescape(re.sub(r"(?s)<[^>]+>", "", s)).strip()


# opening-tag patterns; regions close at the MATCHING </div> via
# _balanced_div_spans (a non-greedy .*?</div> stopped at the first
# NESTED close, leaking reference-list tails into the article text)
_SECTION_DROPS = [
    r'(?is)<div[^>]*class="article-section article-section__references"[^>]*>',
    r'(?is)<div[^>]*class="article-section article-section__citedBy[^"]*"[^>]*>',
]

_DIV_TOKEN = re.compile(r"(?is)<div(?![\w-])[^>]*>|</div\s*>")


def _balanced_div_spans(html: str, open_rx: str) -> list[tuple[int, int]]:
    """[start, end) spans of <div> regions whose opening tag matches
    ``open_rx``, closed by the matching ``</div>`` with nested divs
    counted (mirrors html.parser's tree, which the reference's
    BeautifulSoup ``decompose()`` operates on). An unclosed region runs
    to end-of-string; an opener inside an already-claimed region is
    skipped."""
    spans: list[tuple[int, int]] = []
    last_end = 0
    for m in re.finditer(open_rx, html):
        if m.start() < last_end:
            continue
        depth = 1
        end = len(html)
        for t in _DIV_TOKEN.finditer(html, m.end()):
            depth += -1 if t.group(0).startswith("</") else 1
            if depth == 0:
                end = t.end()
                break
        spans.append((m.start(), end))
        last_end = end
    return spans


def _replace_spans(html: str, spans: list[tuple[int, int]], repl) -> str:
    out, cur = [], 0
    for s, e in spans:
        out.append(html[cur:s])
        out.append(repl(html[s:e]))
        cur = e
    out.append(html[cur:])
    return "".join(out)


def protect(html: str, shield: _Shield) -> str:
    """Apply the reference's protection ladder (categories and output
    formats mirror current_protocol_clean_util.py:211-475)."""
    # drop references / cited-by sections entirely (deal_section)
    for pat in _SECTION_DROPS:
        html = _replace_spans(html, _balanced_div_spans(html, pat), lambda _: "")

    # in-page anchors collapse to their text (:325-331)
    html = re.sub(r'(?is)<a(?![\w-])[^>]*href="#[^"]*"[^>]*>(.*?)</a>', r"\1", html)

    # sub/sup survive verbatim (:276-283)
    html = re.sub(
        r"(?is)<(su[bp])(?![\w-])[^>]*>(.*?)</\1>",
        lambda m: shield.add(f"<{m.group(1)}>{_strip_tags(m.group(2))}</{m.group(1)}>"),
        html,
    )

    # MathJax TeX annotations become the TeX source; a container without
    # one is dropped (:285-315 — replace_with on the equation node).
    # Deliberate deviation: the reference decodes the TeX entities
    # REVERSED (`.replace('&gt;', '<').replace('&lt;', '>')`, :299,314 —
    # every > in a formula comes out <), an evident defect rather than a
    # semantic choice; we decode correctly via html.unescape.
    def mjx(m: re.Match) -> str:
        ann = re.search(
            r'(?is)<annotation[^>]*encoding="application/x-tex"[^>]*>(.*?)</annotation>',
            m.group(0),
        )
        if ann:
            return shield.add("\n" + _html.unescape(ann.group(1)) + "\n")
        return " "

    html = re.sub(r"(?is)<mjx-container[^>]*>.*?</mjx-container>", mjx, html)
    html = re.sub(
        r'(?is)<annotation[^>]*encoding="application/x-tex"[^>]*>(.*?)</annotation>',
        lambda m: shield.add("\n" + _html.unescape(m.group(1)) + "\n"),
        html,
    )

    # figure sections -> <img>/<video> tags with caption (:333-356)
    def fig(m: re.Match) -> str:
        body = m.group(1)
        img = re.search(r'(?is)<img[^>]*data-lg-src="([^"]*)"[^>]*alt="([^"]*)"', body)
        cap = re.search(
            r'(?is)<div[^>]*class="figure__caption[^"]*"[^>]*>(.*?)</div>', body
        )
        caption = _strip_tags(cap.group(1)) if cap else ""
        if img:
            return shield.add(
                f'\n<img src="{img.group(1)}" alt="{caption}"  loading="lazy" '
                f'title="{img.group(2)}"/>\n'
            )
        vid = re.search(
            r'(?is)<a[^>]*class="download-media linkBehavior"[^>]*href="([^"]*)"', body
        )
        if vid:
            return shield.add(
                f'\n<video src="{vid.group(1)}" controls muted title="{caption}"/>\n'
            )
        return ""

    html = re.sub(
        r'(?is)<section[^>]*class="article-section__inline-figure"[^>]*>(.*?)</section>',
        fig,
        html,
    )

    # computer-code tables -> fenced blocks; other tables stay raw HTML
    # (:252-259, 358-368, 388-396)
    def table(body: str) -> str:
        if re.search(r'(?is)class="computerCode"', body):
            lines = "".join(
                "\n" + _strip_tags(li)
                for li in re.findall(r"(?is)<li(?![\w-])[^>]*>(.*?)</li>", body)
            )
            return shield.add(f"\n\n```\n{lines}\n```\n\n")
        return shield.add(body)

    html = _replace_spans(
        html,
        _balanced_div_spans(
            html,
            r'(?is)<div[^>]*class="(?:article-table-content|'
            r'support-info__table-wrapper article-table-content-wrapper)"[^>]*>',
        ),
        table,
    )

    # inline images (InlineGraphics alt / section_image class) (:370-386)
    def inline_img(m: re.Match) -> str:
        tag = m.group(0)
        if not re.search(r'(?i)alt="InlineGraphics"|class="[^"]*section_image', tag):
            return tag
        src = re.search(r'(?i)src="([^"]*)"', tag)
        alt = re.search(r'(?i)alt="([^"]*)"', tag)
        title = re.search(r'(?i)title="([^"]*)"', tag)
        return shield.add(
            f'\n\n<img src="{src.group(1) if src else ""}" '
            f'alt="{alt.group(1) if alt else ""}"  loading="lazy" '
            f'title="{title.group(1) if title else ""}"/>\n\n'
        )

    html = re.sub(r"(?is)<img(?![\w-])[^>]*>", inline_img, html)

    # annotation paragraphs -> <Note> (:446-466)
    html = re.sub(
        r'(?is)<p(?![\w-])[^>]*class="annotation"[^>]*>(.*?)</p>',
        lambda m: shield.add(
            f'\n<Note title="Note" type="info">{_strip_tags(m.group(1))}</Note>\n'
        ),
        html,
    )

    # type="a" ordered lists -> numbered markdown; plain lists -> bullets
    # (:398-403, 437-443 via process_tag_to_md_*)
    def ol(m: re.Match) -> str:
        items = re.findall(r"(?is)<li(?![\w-])[^>]*>(.*?)</li>", m.group(1))
        body = "".join(f"{i + 1}. {_strip_tags(t)}\n" for i, t in enumerate(items))
        return shield.add("\n" + body)

    html = re.sub(r'(?is)<ol(?![\w-])[^>]*type="a"[^>]*>(.*?)</ol>', ol, html)

    def ul(m: re.Match) -> str:
        items = re.findall(r"(?is)<li(?![\w-])[^>]*>(.*?)</li>", m.group(1))
        return shield.add("\n" + "".join(f"* {_strip_tags(t)}\n" for t in items))

    html = re.sub(r'(?is)<ul(?![\w-])[^>]*class="plain-list"[^>]*>(.*?)</ul>', ul, html)

    return html


_BLOCK_BREAKS = [
    (re.compile(r"(?is)<br\s*/?>"), "\n"),
    (re.compile(r"(?is)</(p|div|section|tr|table|h[1-6]|li|ul|ol|blockquote)>"), "\n\n"),
]


def markdown_core(html: str) -> str:
    """Native html2text stand-in: headings, emphasis, links, code,
    list items, paragraph breaks, entity unescape; no line wrapping
    (the reference sets body_width = 0)."""
    s = html
    for i in range(6, 0, -1):
        s = re.sub(
            rf"(?is)<h{i}[^>]*>(.*?)</h{i}>",
            lambda m, i=i: "\n\n" + "#" * i + " " + _strip_tags(m.group(1)) + "\n\n",
            s,
        )
    s = re.sub(r"(?is)<(b|strong)(?![\w-])[^>]*>(.*?)</\1>",
               lambda m: "**" + _strip_tags(m.group(2)) + "**", s)
    s = re.sub(r"(?is)<(i|em)(?![\w-])[^>]*>(.*?)</\1>",
               lambda m: "_" + _strip_tags(m.group(2)) + "_", s)
    s = re.sub(r"(?is)<(code|tt)(?![\w-])[^>]*>(.*?)</\1>",
               lambda m: "`" + _strip_tags(m.group(2)) + "`", s)
    s = re.sub(r"(?is)<pre(?![\w-])[^>]*>(.*?)</pre>",
               lambda m: "\n```\n" + _strip_tags(m.group(1)) + "\n```\n", s)
    s = re.sub(
        r'(?is)<a(?![\w-])[^>]*href="([^"]*)"[^>]*>(.*?)</a>',
        lambda m: f"[{_strip_tags(m.group(2))}]({m.group(1)})",
        s,
    )
    s = re.sub(r"(?is)<li(?![\w-])[^>]*>(.*?)</li>", lambda m: "\n* " + _strip_tags(m.group(1)), s)
    for pat, rep in _BLOCK_BREAKS:
        s = pat.sub(rep, s)
    s = re.sub(r"(?s)<[^>]+>", "", s)
    s = _html.unescape(s)
    s = re.sub(r"[ \t]+\n", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return s.strip()


def html_to_markdown(html: str | None) -> str | None:
    """Full pipeline: protect -> convert -> restore (the reference's
    get_content_text_by_text minus the resource-URL rewrite, which is the
    separate J3 join in operators/assets.py)."""
    if html is None:
        return None
    shield = _Shield()
    protected = protect(html, shield)
    out = shield.restore(markdown_core(protected))
    # restored placeholders carry their own newline padding; re-normalize
    out = re.sub(r"[ \t]+\n", "\n", out)
    out = re.sub(r"\n[ \t]+", "\n", out)
    out = re.sub(r"\n{3,}", "\n\n", out)
    return out.strip()


@F.pandas_udf(T.StringType())
def html_to_md_udf(html: pd.Series) -> pd.Series:
    return html.map(html_to_markdown)


def convert_documents(df: DataFrame, html_col: str) -> DataFrame:
    """Adds ``content_md`` from an HTML column, one Arrow batch per call."""
    return df.withColumn("content_md", html_to_md_udf(F.col(html_col)))
