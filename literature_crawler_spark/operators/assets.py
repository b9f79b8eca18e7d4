"""Asset-table operators: figure/preview pairing, dimension upsert, codec.

Re-expresses the reference's publish/migrate-stage row loops:

* ``pair_figures_with_previews`` (J4): the reference finds a figure's
  preview variant with a per-row ``LIKE '%stem%' AND NOT LIKE '%full%'``
  scan (``nature_protocol_clean.py:171-205``,
  ``current_protocol_migrate_util.py:165-202``). Here: extract the stem
  once, then an equi self-join on it — O(n) shuffle instead of O(n^2) LIKE.
* ``upsert_dimension`` (J5): the reference does per-value
  ``INSERT ... ON CONFLICT DO NOTHING RETURNING id`` + fallback SELECT
  (``migrate_util.py:126-153``). Here: explode -> dropDuplicates ->
  stable-hash surrogate ids -> union with existing dim -> join back. At
  deploy this is an Iceberg ``MERGE INTO ... WHEN NOT MATCHED``.
* ``compress_text / decompress_text`` (S11): zlib+base64 body codec
  (``text_deal.py:322-351``), Arrow-batched.
"""

from __future__ import annotations

import base64
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stem_of(path: Column) -> Column:
    """Filename stem: last path segment minus extension and minus the
    full/preview marker suffixes the reference embeds in oss paths."""
    name = F.element_at(F.split(path, "/"), -1)
    name = F.regexp_replace(name, r"\.[A-Za-z0-9]{1,5}$", "")
    return F.regexp_replace(name, r"[_-](full|preview|thumb)$", "")


def pair_figures_with_previews(
    assets: DataFrame, path_col: str = "oss_path", id_col: str = "asset_id"
) -> DataFrame:
    """(stem, full_id, full_path, preview_id, preview_path) — each full-res
    figure matched to its preview variant by stem equi-join (J4)."""
    marked = assets.select(
        F.col(id_col).alias("_id"),
        F.col(path_col).alias("_path"),
        stem_of(F.col(path_col)).alias("stem"),
        F.col(path_col).rlike(r"[_-]full\.").alias("is_full"),
    )
    full = marked.filter(F.col("is_full")).select(
        "stem", F.col("_id").alias("full_id"), F.col("_path").alias("full_path")
    )
    # exactly ONE preview per stem ("matched to its preview variant",
    # singular): a stem with several non-full variants (preview + thumb +
    # unmarked original) would otherwise fan the full figure out into
    # duplicate rows. Prefer the explicit preview marker, then thumb,
    # then path order — deterministic across runs.
    prev = (
        marked.filter(~F.col("is_full"))
        .withColumn(
            "_pref",
            F.when(F.col("_path").rlike(r"[_-]preview\."), F.lit(0))
            .when(F.col("_path").rlike(r"[_-]thumb\."), F.lit(1))
            .otherwise(F.lit(2)),
        )
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("stem").orderBy("_pref", "_path")),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "stem", F.col("_id").alias("preview_id"), F.col("_path").alias("preview_path")
        )
    )
    return full.join(prev, "stem", "left")


def upsert_dimension(
    facts: DataFrame,
    values_col: str,
    existing_dim: DataFrame | None = None,
    name_col: str = "name",
    id_col: str = "dim_id",
) -> DataFrame:
    """Lookup-or-insert a dimension from an array column (J5).

    Returns the updated dimension (name, dim_id). New ids are stable
    64-bit hashes of the name — deterministic across runs and executors,
    unlike the reference's MAX(id)+1 race
    (``migrate_util.py:78-83`` / A5).
    """
    vals = (
        facts.select(F.explode(values_col).alias(name_col))
        .filter(F.col(name_col).isNotNull() & (F.trim(name_col) != ""))
        .dropDuplicates([name_col])
    )
    if existing_dim is not None:
        vals = vals.join(existing_dim.select(name_col), name_col, "left_anti")
    new = vals.withColumn(id_col, F.xxhash64(F.col(name_col)))
    if existing_dim is None:
        return new
    return existing_dim.select(name_col, id_col).unionByName(new)


def link_table(
    facts: DataFrame, fact_id: str, values_col: str, dim: DataFrame,
    name_col: str = "name", id_col: str = "dim_id",
) -> DataFrame:
    """(fact_id, dim_id) link rows: explode + broadcast join back (J5's
    ``literature_authors``/``literature_keywords`` link inserts)."""
    pairs = facts.select(F.col(fact_id), F.explode(values_col).alias(name_col))
    return pairs.join(F.broadcast(dim), name_col, "inner").select(fact_id, id_col)


@F.pandas_udf(T.StringType())
def _replace_many_udf(text: pd.Series, repl: pd.Series) -> pd.Series:
    """Apply [(original, replacement)] pair lists to each text — plain
    str.replace per pair, longest original first so prefixes don't clobber
    (mirrors the reference's sequential replace loop)."""
    out = []
    for t, pairs in zip(text, repl):
        if t is None or pairs is None:
            out.append(t)
            continue
        for p in sorted(pairs, key=lambda x: -len(x["original_path"] or "")):
            o, n = p["original_path"], p["oss_path"]
            if o:
                t = t.replace(o, n or "")
        out.append(t)
    return pd.Series(out)


def rewrite_asset_urls(
    docs: DataFrame,
    assets: DataFrame,
    key: str = "doi",
    text_col: str = "content_md",
    original_col: str = "original_path",
    oss_col: str = "oss_path",
    order_col: str | None = None,
) -> DataFrame:
    """J3: per-document original->stored URL rewrite in rendered text.

    The reference fetches each doi's resources and string-replaces
    original URLs with object-store URLs one row at a time
    (``protocol_io_clean.py:123``; ``text_deal.py:300-319``
    ``get_replace_resource``, first-seen dedup included). Here: aggregate
    the replacement pairs per key (one shuffle on ``key``), join once, and
    apply all of a document's replacements in one Arrow batch pass.
    Duplicate ``original_col`` rows dedup to one winner per key, mirroring
    the reference's set() first-seen dedup; DataFrames carry no row order,
    so pass an explicit position column as ``order_col`` where the
    reference's document order matters (defaults to ``oss_col`` for a
    deterministic pick).
    """
    w = Window.partitionBy(key, original_col).orderBy(order_col or oss_col)
    pairs = (
        assets.select(
            key,
            F.col(original_col).alias("original_path"),
            F.col(oss_col).alias("oss_path"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy(key)
        .agg(F.collect_list(F.struct("original_path", "oss_path")).alias("_repl"))
    )
    joined = docs.join(pairs, key, "left")
    return joined.withColumn(
        text_col, _replace_many_udf(F.col(text_col), F.col("_repl"))
    ).drop("_repl")


@F.pandas_udf(T.StringType())
def compress_text(s: pd.Series) -> pd.Series:
    """zlib+base64 (reference content compression, text_deal.py:322-338)."""
    return s.map(
        lambda x: None if x is None else base64.b64encode(zlib.compress(x.encode())).decode()
    )


@F.pandas_udf(T.StringType())
def decompress_text(s: pd.Series) -> pd.Series:
    """Inverse of compress_text (text_deal.py:341-351)."""
    return s.map(
        lambda x: None if x is None else zlib.decompress(base64.b64decode(x)).decode()
    )
