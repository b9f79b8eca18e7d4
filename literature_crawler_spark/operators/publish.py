"""Publish tail: literature-type mapping + protocol-number assignment +
the final-serving fan-out (literature row, author/keyword dims + link
tables, conflict strategies).

Reference: ``app/service/nature_protocol/process_task/
nature_protocol_publish.py`` — ``get_literature_type`` (:43-65, the
param -> (type, has_protocol) elif ladder), ``migrate_data`` (:68-185:
per-row loop over clean ids doing skip/update/insert conflict handling,
'%d %B %Y' publish-date parse with swallowed ValueError, protocol-number
assignment via ``get_protocol_max_id`` MAX(id)+1 with a 20000 floor,
author-name collection skipping entries without a 'name', keyword/author
``insert_or_select_id`` + link-table inserts) and ``app/util/
migrate_util.py:60-83`` (``insert_protocol``/``get_protocol_max_id``).

Spark-first shape: the mapping is one CASE expression (codegen, no UDF);
the MAX(id)+1-with-floor sequence — a driver-side race in the reference
— becomes the engine's dense two-phase numbering
(``plans.crawl.assign_global_seq``: range-repartition + per-partition
window + offset map, only per-partition counts hit the driver); the
dim/link fan-out reuses ``operators.assets.upsert_dimension`` /
``link_table`` (hash ids, broadcast joins). At 100 TB nothing here
shuffles more than once per output table and no dimension is driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# param -> (literature_type, has_protocol); transcribed from
# nature_protocol_publish.py:43-65 including the reference's typo
# ('Retracion') and its implicit None for unmapped params (the elif
# ladder falls through).
LITERATURE_TYPE_MAP: list[tuple[list[str], str, bool]] = [
    (["Addendum", "Corrigendum", "Erratum"], "erratum", True),
    (["Author Correction", "Publisher Correction", "Retracion"], "correction", True),
    (["Consensus Statement", "Consensus"], "consensus", False),
    (["Correspondence"], "correspondence", False),
    (["Editorial"], "editorial", False),
    (["Matters Arising"], "matters", False),
    (["News & Views"], "views", False),
    (["Perspective"], "perspective", False),
    (["Poster"], "poster", True),
    (["Protocol", "Protocol Extension", "Protocol Update"], "protocol", True),
    (["Review Article"], "review", True),
]

PROTOCOL_NUMBER_FLOOR = 20000  # nature_protocol_publish.py:127-133


def literature_type(param: Column) -> Column:
    """struct(lit_type, has_protocol) — the ``get_literature_type``
    ladder as one chained CASE expression (NULL/NULL for unmapped
    params, the reference's fall-through None)."""
    t: Column | None = None
    p: Column | None = None
    for params, lt, flag in LITERATURE_TYPE_MAP:
        cond = param.isin(params)
        t = F.when(cond, F.lit(lt)) if t is None else t.when(cond, F.lit(lt))
        p = F.when(cond, F.lit(flag)) if p is None else p.when(cond, F.lit(flag))
    return F.struct(t.alias("lit_type"), p.alias("has_protocol"))


def parse_publish_date(s: Column) -> Column:
    """'%d %B %Y' -> date, NULL on mismatch (the reference's
    try/strptime/except-None, nature_protocol_publish.py:115-120).
    ``try_to_timestamp`` is the expression twin of the swallowed
    ValueError."""
    return F.try_to_timestamp(s, F.lit("d MMMM yyyy")).cast("date")


def assign_protocol_numbers(
    flagged: DataFrame,
    order_cols: list[str],
    existing_max: int | None = None,
) -> DataFrame:
    """Dense protocol numbers for the has_protocol rows.

    Reference semantics (nature_protocol_publish.py:126-134): each insert
    takes MAX(id)+1 when the table has grown past 19999, else jumps to
    the 20000 floor — i.e. a dense sequence starting at
    ``max(existing_max + 1, 20000)``. The per-row SELECT MAX race becomes
    one deterministic numbering pass in ``order_cols`` order
    (assign_global_seq — scalable, per-partition windows only).
    """
    from literature_crawler_spark.plans.crawl import assign_global_seq

    start = max((existing_max or 0) + 1, PROTOCOL_NUMBER_FLOOR)
    out = assign_global_seq(flagged, order_cols, start=start)
    return out.withColumnRenamed("seq", "protocol_number")


def author_names(authors: Column) -> Column:
    """Non-empty author names from an array<struct> with a ``name``
    field — the reference's collection loop skips entries missing 'name'
    or with a falsy value (nature_protocol_publish.py:134-139)."""
    return F.transform(
        F.filter(authors, lambda a: a["name"].isNotNull() & (a["name"] != "")),
        lambda a: a["name"],
    )


def publish_literature(
    clean: DataFrame,
    existing: DataFrame | None = None,
    conflict_strategy: str = "insert",
    existing_protocol_max: int | None = None,
) -> dict[str, DataFrame]:
    """The migrate_data fan-out as declarative plans.

    ``clean`` columns: literature_id, title, doi, abstract_text,
    param (raw literature-type string), publish_date_str, keywords
    array<string>, authors array<struct<name,type,institution>>.

    Returns {'literature', 'protocol', 'keywords_dim', 'authors_dim',
    'literature_keywords', 'literature_authors'} DataFrames — the
    normalized serving schema. ``conflict_strategy`` mirrors the
    reference: 'skip' drops rows whose literature_id exists, 'update'
    keeps them for the caller's MERGE (plans.state upsert path),
    'insert' assumes a clean target.
    """
    from literature_crawler_spark.operators import assets as ast

    lt = literature_type(F.col("param"))
    rows = clean.withColumn("lit_type", lt["lit_type"]).withColumn(
        "has_protocol", lt["has_protocol"]
    )
    if existing is not None and conflict_strategy == "skip":
        rows = rows.join(
            existing.select("literature_id"), "literature_id", "left_anti"
        )
    rows = rows.withColumn("publish_date", parse_publish_date(F.col("publish_date_str")))
    literature = rows.select(
        "literature_id", "title", "doi", "abstract_text",
        F.col("lit_type").alias("literature_type"), "publish_date",
    )
    protocol = assign_protocol_numbers(
        rows.filter(F.col("has_protocol")).select(
            "literature_id", "doi", "title", "publish_date",
            author_names(F.col("authors")).alias("author_names"), "keywords",
        ),
        ["literature_id"],
        existing_max=existing_protocol_max,
    )
    kw_dim = ast.upsert_dimension(rows, "keywords")
    au = rows.select(
        "literature_id", author_names(F.col("authors")).alias("names")
    )
    au_dim = ast.upsert_dimension(au, "names")
    return {
        "literature": literature,
        "protocol": protocol,
        "keywords_dim": kw_dim,
        "authors_dim": au_dim,
        "literature_keywords": ast.link_table(rows, "literature_id", "keywords", kw_dim),
        "literature_authors": ast.link_table(au, "literature_id", "names", au_dim),
    }


# img-tag grammar for the figure-list rebuild. The reference parses with
# BeautifulSoup (html.parser); this regex form mirrors its tolerant tag
# scan: quoted values are consumed atomically ONLY where html.parser
# treats them as values — right after an '=' — so a literal '>' inside
# title="fig > 2" does not truncate the tag, while a lone apostrophe
# anywhere else (alt=O'Brien) is plain text rather than an unterminated
# quote that kills the whole match. Each (?>...) iteration is atomic, so
# pathological quote runs cannot trigger exponential backtracking.
# (?![\w-]) keeps custom elements like <img-lazy> from matching; a
# src-less <img> (which would crash the reference's ``oss_path.replace``)
# is dropped by the caller instead.
_IMG_TAG_RX = (
    r"(?i)<img(?![\w-])"
    r"""(?>=\s*+(?>"[^"]*+"|'[^']*+'|[^>\s]*+)|[^>=]++)*>"""
)

# One whole attribute (name, optionally = quoted-or-unquoted value), used
# to SKIP leading attributes when scanning for a target one. '/' is
# excluded from names so self-closing '/>' never reads as a name.
_SKIP_ATTR = r"""[^\s>/=]++(?:\s*=\s*(?>"[^"]*+"|'[^']*+'|[^\s>]*+))?+"""


def _attr_value(col: Column, name: str) -> Column:
    """Value of the first attribute ``name`` inside one matched tag
    string, NULL when absent — BeautifulSoup's ``tag.get(name)``. Scans
    attributes SEQUENTIALLY from the tag start (skipping whole
    non-target attributes, their quoted values consumed atomically)
    rather than searching for ``name=`` anywhere, so attribute-shaped
    text inside ANOTHER attribute's quoted value (alt="see src=x here")
    is never extracted, ``data-src``/``data-title`` lazy-load markup
    never shadows the real attribute, and document order — not quoting
    style — decides which occurrence wins. Handles double-quoted,
    single-quoted, and unquoted values; an empty value reads as NULL
    (the caller drops those rows either way)."""
    base = (
        rf"(?i)^<img(?![\w-])"
        rf"(?:[\s/]++(?!{name}\s*=)(?>{_SKIP_ATTR}))*+"
        rf"""[\s/]++{name}\s*=\s*(?:"([^"]*+)"|'([^']*+)'|([^\s>]*+))"""
    )
    dq, sq, uq = (F.regexp_extract(col, base, i) for i in (1, 2, 3))
    return F.coalesce(
        F.nullif(dq, F.lit("")), F.nullif(sq, F.lit("")), F.nullif(uq, F.lit(""))
    )


def extract_figure_list(
    steps: DataFrame,
    id_cols: list[str] = ("literature_id", "doi"),
    data_col: str = "data",
    step_order_col: str = "step_idx",
    static_prefix: str = "https://static.yanyin.tech/",
) -> DataFrame:
    """Rebuild ``literature_figures`` rows from rendered step content —
    the publish-stage figure-list extraction
    (``/root/reference/app/service/protocol_io/process_task/protocol_io_publish.py:226-248``
    ``insert_figure_list``): every ``<img>`` across a document's steps, in
    (step, document) order, becomes one figure row with

    * ``oss_path``  — the img ``src`` with the static-host prefix stripped
      (the reference's ``replace('https://static.yanyin.tech/', '')``);
      inline ``;base64`` data URIs are skipped (:237-239);
    * ``description`` — the ``title`` attribute, NULL when absent
      (BeautifulSoup ``.get`` -> None);
    * ``preview_oss_path`` — NULL at insert time (:241), paired later by
      ``operators.assets.pair_figures_previews``.

    Spark-first shape: ``regexp_extract_all`` -> ``posexplode`` (keeps the
    reference's in-document order as ``fig_idx``) -> attribute regexes —
    one codegen projection per row, no HTML parser, no Python. At 100 TB
    this is a single narrow map over the published table: no shuffle, no
    driver state (the reference pages LIMIT/OFFSET 10 rows at a time).
    """
    tags = steps.select(
        *id_cols,
        F.col(step_order_col),
        F.posexplode(
            F.regexp_extract_all(F.col(data_col), F.lit(_IMG_TAG_RX), F.lit(0))
        ).alias("fig_idx", "_img"),
    )
    src = _attr_value(F.col("_img"), "src")
    return (
        tags.withColumn("_src", src)
        .filter(F.col("_src").isNotNull())
        .withColumn("oss_path", F.replace(F.col("_src"), F.lit(static_prefix), F.lit("")))
        .filter(~F.col("oss_path").contains(";base64"))
        .withColumn("description", _attr_value(F.col("_img"), "title"))
        .withColumn("preview_oss_path", F.lit(None).cast("string"))
        .drop("_img", "_src")
    )


def merge_figure_list(
    existing: DataFrame | None,
    fresh: DataFrame,
    conflict_strategy: str = "insert",
    key: str = "doi",
    refreshed: DataFrame | None = None,
    published: DataFrame | None = None,
) -> DataFrame:
    """Figure-list conflict handling as set operations — the reference's
    per-doc branch
    (``protocol_io_update_figure_list.py:63-`` ``update_figure_list``):

    * ``'skip'``   — a document already published keeps its rows; fresh
      rows land only for new documents. ``published`` (a ``key`` column of
      the literature table) is the reference's existence check
      (``query_row`` on the literature table); when absent, documents
      with existing figure rows are used as the proxy;
    * ``'update'`` — delete-then-reinsert per document (``delete_figure_list``
      + ``insert_figure_list``): existing rows for every document in the
      refresh batch drop, INCLUDING documents whose new content yields
      zero figures (the reference deletes unconditionally, then inserts
      whatever the parse found). Pass ``refreshed`` (a ``key`` column of
      the documents being reprocessed) to convey that set; when absent
      the keys present in ``fresh`` are used, which cannot clear a
      refreshed document down to zero figures;
    * ``'insert'`` — unconditional append (the reference's else branch).

    Anti-joins on the document key replace the reference's per-doc
    ``query_row`` point-read + Redis success-set; both sides stay
    distributed.
    """
    if existing is None:
        return fresh
    if conflict_strategy == "skip":
        have = (published if published is not None else existing).select(key).distinct()
        keep_fresh = fresh.join(have, key, "left_anti")
        return existing.unionByName(keep_fresh)
    if conflict_strategy == "update":
        drop = (refreshed if refreshed is not None else fresh).select(key).distinct()
        keep_existing = existing.join(drop, key, "left_anti")
        return keep_existing.unionByName(fresh)
    return existing.unionByName(fresh)
