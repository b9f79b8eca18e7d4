"""HTML field extraction as pure Catalyst expressions.

The reference extracts title/description/date/links/ld+json from fetched
pages with BeautifulSoup selectors run per row
(``app/util/nature_protocol_crawl_util.py:58-93`` title/desc/type/date;
``app/util/nature_protocol_clean_util.py:15-52`` ld+json;
``app/util/text_deal.py:354-365`` URL-regex extraction). BeautifulSoup is
row-at-a-time Python; for the 100 TB extract stage the same fields come out
of ``regexp_extract`` / ``regexp_extract_all`` inside whole-stage codegen —
no Python, no DOM allocation. This intentionally targets the regular
fragments the reference actually reads (title tag, meta tags, hrefs,
ld+json script bodies), not general HTML parsing; pages that defeat the
regexes fall back to NULL exactly like the reference's ``find(...) is
None`` branches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def extract_title(html: Column) -> Column:
    """<title> text, whitespace-collapsed; NULL when absent."""
    t = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.nullif(F.trim(F.regexp_replace(t, r"\s+", " ")), F.lit(""))


def extract_meta(html: Column, name: str) -> Column:
    """content="" of a <meta name=...> tag (reference description/type
    extraction). HTML attribute order is arbitrary, so both
    ``name=... content=...`` and ``content=... name=...`` forms match
    (BeautifulSoup's attribute lookup is order-free). The content quotes
    are PAIRED per alternative — a ["'] char class on both sides would
    truncate a double-quoted value at its first apostrophe
    (content="O'Brien et al" -> "O") — without backreferences, so the
    patterns stay RE2-compatible for the DuckDB oracle twin."""
    pats = []
    for q in ('"', "'"):
        pats.append(
            rf'(?is)<meta[^>]*name=["\']{name}["\'][^>]*content={q}([^{q}]*){q}'
        )
    for q in ('"', "'"):
        pats.append(
            rf'(?is)<meta[^>]*content={q}([^{q}]*){q}[^>]*name=["\']{name}["\']'
        )
    # Per-alternative fall-through: a whitespace-only match must not win
    # the coalesce and mask a real value a later pattern would find, but
    # the winning value is returned VERBATIM (callers decide trimming).
    vals = [F.regexp_extract(html, p, 1) for p in pats]
    return F.coalesce(
        *[
            F.when(F.nullif(F.trim(v), F.lit("")).isNotNull(), v)
            for v in vals
        ]
    )


def extract_links(html: Column) -> Column:
    """All href targets, document order (reference link loops; feeds the
    frontier's canonicalize stage)."""
    return F.regexp_extract_all(html, F.lit(r'(?i)href=["\']([^"\'#][^"\']*)["\']'), 1)


def extract_ld_json(html: Column) -> Column:
    """Body of the first application/ld+json script (parse downstream with
    from_json + explicit schema, reference nature_protocol_clean_util.py:15-52)."""
    pat = r'(?is)<script[^>]*type=["\']application/ld\+json["\'][^>]*>(.*?)</script>'
    return F.nullif(F.trim(F.regexp_extract(html, pat, 1)), F.lit(""))


def strip_tags(html: Column) -> Column:
    """Visible-text approximation: drop script/style bodies, then tags,
    then collapse whitespace (reference content_deal scrubbing)."""
    # no backreferences: keeps the pattern RE2-compatible (same regex runs
    # in the DuckDB oracle)
    no_script = F.regexp_replace(
        html, r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " "
    )
    no_tags = F.regexp_replace(no_script, r"(?s)<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))
