"""Clean-stage structured extraction: authors / references / related works
as typed ``array<struct>`` columns — pure Catalyst expressions.

The reference extracts these with per-row BeautifulSoup walks:
* authors — ``current_protocol_clean_util.py:655-685`` (author-info
  blocks -> name / email / orcid spans);
* references — ``nature_protocol_clean_util.py:55-79`` (reference list
  items -> data-doi attribute, percent-decoded href, citation text);
* related works — ``nature_protocol_clean_util.py:83-97``
  (recommendation cards -> title / href / data-track-label doi).

Here each becomes ``regexp_extract_all`` over the enclosing element +
``transform`` into a typed struct array, all inside whole-stage codegen
(same philosophy as functions/html.py: target the regular fragments the
reference actually reads; pages that defeat the regexes yield NULL fields
exactly like the reference's ``find(...) is None`` branches). The typed
columns are the ``authors: Array<Struct>`` / ``refs: Array<Struct>``
schema SURVEY.md §2.7 promises for the clean stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _field(block: Column, pattern: str) -> Column:
    return F.nullif(F.trim(F.regexp_extract(block, pattern, 1)), F.lit(""))


def extract_authors(html: Column) -> Column:
    """``array<struct<name, email, orcid>>`` from author-info blocks
    (reference get_author_by_soup: <div class="author-info...">, p.author-
    name, email/orcid account links)."""
    blocks = F.regexp_extract_all(
        html, F.lit(r'(?is)<div class="author-info[^"]*">(.*?)</div>'), 1
    )
    return F.transform(
        blocks,
        lambda b: F.struct(
            _field(b, r'(?is)<p class="author-name"[^>]*>(.*?)</p>').alias("name"),
            _field(
                b, r'(?is)<a[^>]*class="sm-account__link"[^>]*title="Link to email address"[^>]*><span>(.*?)</span>'
            ).alias("email"),
            _field(
                b, r'(?is)<a[^>]*class="sm-account__link[^"]*icon-orcid[^"]*"[^>]*><span>(.*?)</span>'
            ).alias("orcid"),
        ),
    )


def extract_references(html: Column) -> Column:
    """``array<struct<doi, uri, ref_text>>`` from the reference list
    (reference get_ref_txt_by_html: li.c-article-references__item with a
    data-doi anchor whose href is percent-decoded, plus the citation
    text paragraph)."""
    items = F.regexp_extract_all(
        html,
        F.lit(r'(?is)<li class="c-article-references__item[^"]*">(.*?)</li>'),
        1,
    )
    return F.transform(
        items,
        lambda b: F.struct(
            _field(b, r'(?is)<a[^>]*data-doi="([^"]*)"').alias("doi"),
            F.url_decode(
                _field(b, r'(?is)<a[^>]*data-doi="[^"]*"[^>]*href="([^"]*)"')
            ).alias("uri"),
            _field(
                b, r'(?is)<p class="c-article-references__text"[^>]*>(.*?)</p>'
            ).alias("ref_text"),
        ),
    )


def extract_related(html: Column) -> Column:
    """``array<struct<title, uri, doi>>`` from recommendation cards
    (reference get_relate_txt_by_html: a.c-article-recommendations-
    card__link text/href/data-track-label)."""
    cards = F.regexp_extract_all(
        html,
        F.lit(r'(?is)(<a[^>]*class="c-article-recommendations-card__link"[^>]*>.*?</a>)'),
        1,
    )
    return F.transform(
        cards,
        lambda b: F.struct(
            _field(b, r"(?is)>([^<]*)</a>").alias("title"),
            _field(b, r'(?is)href="([^"]*)"').alias("uri"),
            _field(b, r'(?is)data-track-label="([^"]*)"').alias("doi"),
        ),
    )


def extract_abstract(html: Column) -> Column:
    """Visible text of the Abs1-content section (reference
    get_abstract_by_html, nature_protocol_clean_util.py:107-112)."""
    section = F.regexp_extract(
        html, r'(?is)<div[^>]*id="Abs1-content"[^>]*>(.*?)</div>', 1
    )
    return F.nullif(
        F.trim(F.regexp_replace(F.regexp_replace(section, r"(?s)<[^>]+>", " "), r"\s+", " ")),
        F.lit(""),
    )


def extract_issue(html: Column) -> Column:
    """citation_issue meta content (reference get_issue_by_html,
    nature_protocol_clean_util.py:100-105); attribute order free, content
    quotes paired per alternative (see functions/html.py extract_meta)."""
    from literature_crawler_spark.functions.html import extract_meta

    return F.nullif(F.trim(extract_meta(html, "citation_issue")), F.lit(""))


def document_attachment_attrs(documents: Column) -> Column:
    """array<struct<name, uri>> from a documents payload array — the
    reference's per-attachment (ofn | filename fallback, url) pick
    (get_documents_attrs, protocol_io_util.py:152-158)."""
    return F.transform(
        documents,
        lambda d: F.struct(
            F.coalesce(F.nullif(d["ofn"], F.lit("")), d["filename"]).alias("name"),
            d["url"].alias("uri"),
        ),
    )


def extract_key_points(html: Column) -> Column:
    """``array<string>`` of key-point list items (reference
    get_key_points_by_html: lis under the Abs2-content section)."""
    section = F.regexp_extract(
        html, r'(?is)<div[^>]*id="Abs2-content"[^>]*>(.*?)</div>', 1
    )
    return F.transform(
        F.regexp_extract_all(section, F.lit(r"(?is)<li[^>]*>(.*?)</li>"), 1),
        lambda x: F.trim(x),
    )
