"""Clean-stage document rendering: steps JSON -> markdown (M6 tail).

The reference renders protocols.io Draft.js step documents to markdown via
a ~1,500-line per-row dispatcher (~30 entity types,
``app/util/protocol_io_util.py:406-715`` dispatch; renderers
``:238-378,1001-1975``), after sorting steps by float(step number)
(``:2064-2068``, guarded at ``protocol_io_clean.py:139-160``).

This module re-expresses the dataflow shape Spark-first:

* step ordering is a Catalyst sort (``sort_array`` on a (number, payload)
  struct — O1), not Python;
* the per-document string assembly is one Arrow-batched ``pandas_udf``
  over the pre-parsed struct column (schema-on-read via ``from_json``),
  covering the core entity types (text, heading, list, link, image,
  note); the reference's long tail of rare entity renderers would extend
  the same dispatcher dict.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STEP_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("number", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField(
                "blocks",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("type", T.StringType()),
                            T.StructField("text", T.StringType()),
                            T.StructField("url", T.StringType()),
                            T.StructField("qty", T.StringType()),
                            T.StructField("unit_id", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
)


def parse_steps(json_col: Column) -> Column:
    """Schema-on-read parse of the steps JSON column (reference splats the
    payload onto ORM rows instead, protocol_io_crawl.py:153-156)."""
    return F.from_json(json_col, STEP_SCHEMA)


def ordered_steps(steps: Column) -> Column:
    """Steps sorted by float(number) — null/unparsable numbers last
    (reference protocol_io_util.py:2064-2068)."""
    keyed = F.transform(
        steps,
        lambda s: F.struct(
            # try_cast: under Spark 4's default ANSI mode a plain cast
            # THROWS on '2a'/'1.2.3' instead of yielding the NULL this
            # coalesce was written for
            F.coalesce(s["number"].try_cast("double"), F.lit(1e18)).alias("k"),
            s.alias("s"),
        ),
    )
    return F.transform(F.array_sort(keyed), lambda x: x["s"])


def resolve_units(steps: Column, units_map: Column) -> Column:
    """J7: quantity-block unit resolution as a Catalyst map lookup.

    The reference scans a per-document units list with a linear
    ``next(u for u in units if u['id']==unit_key)`` inside every quantity
    renderer (``protocol_io_util.py:238-247,250-260,296-306``). Here the
    units live in a ``MapType(string,string)`` column and each quantity
    block's text becomes ``qty unit_name`` via ``element_at`` — JVM-side,
    before the render UDF ever runs (unknown unit ids fall back to the
    raw id, mirroring the reference's silent-miss behavior)."""
    return F.transform(
        steps,
        lambda s: F.struct(
            s["number"].alias("number"),
            s["title"].alias("title"),
            F.transform(
                s["blocks"],
                lambda b: F.struct(
                    b["type"].alias("type"),
                    F.when(
                        b["type"] == "quantity",
                        F.concat_ws(
                            " ",
                            b["qty"],
                            F.coalesce(
                                F.element_at(units_map, b["unit_id"]), b["unit_id"]
                            ),
                        ),
                    )
                    .otherwise(b["text"])
                    .alias("text"),
                    b["url"].alias("url"),
                    b["qty"].alias("qty"),
                    b["unit_id"].alias("unit_id"),
                ),
            ).alias("blocks"),
        ),
    )


_BLOCK_RENDERERS = {
    "heading": lambda b: f"### {b.get('text') or ''}",
    "text": lambda b: b.get("text") or "",
    "list": lambda b: "- " + (b.get("text") or ""),
    "note": lambda b: f"> Note: {b.get('text') or ''}",
    "quantity": lambda b: b.get("text") or "",  # resolved by resolve_units (J7)
    "link": lambda b: f"[{b.get('text') or b.get('url') or ''}]({b.get('url') or ''})",
    "image": lambda b: f"![{b.get('text') or ''}]({b.get('url') or ''})",
}


def _render_doc(steps: list | None) -> str | None:
    if steps is None:
        return None
    out = []
    for step in steps:
        d = step if isinstance(step, dict) else step.asDict(recursive=True)
        header = f"## Step {d.get('number') or '?'}"
        if d.get("title"):
            header += f": {d['title']}"
        out.append(header)
        for b in d.get("blocks") or []:
            bb = b if isinstance(b, dict) else b.asDict()
            fn = _BLOCK_RENDERERS.get(bb.get("type") or "text", _BLOCK_RENDERERS["text"])
            out.append(fn(bb))
    return "\n\n".join(out)


@F.pandas_udf(T.StringType())
def render_markdown_udf(steps_json: pd.Series) -> pd.Series:
    """JSON string of ALREADY-ORDERED steps -> markdown (ordering happens
    JVM-side in ``ordered_steps``), one Arrow batch at a time."""
    def go(x):
        if x is None:
            return None
        try:
            steps = json.loads(x)
        except (ValueError, TypeError):
            return None
        return _render_doc(steps)

    return steps_json.map(go)


def render_documents(
    df: DataFrame, steps_json_col: str, units_map_col: str | None = None
) -> DataFrame:
    """Adds ``content_md``: parse -> order -> resolve units (all Catalyst)
    -> render (Arrow UDF).

    The ordering and unit lookups run JVM-side so the Python stage only
    does string assembly on already-sorted, already-resolved structs.
    """
    steps = ordered_steps(parse_steps(F.col(steps_json_col)))
    if units_map_col is not None:
        steps = resolve_units(steps, F.col(units_map_col))
    return df.withColumn("content_md", render_markdown_udf(F.to_json(steps)))


# --------------------------------------------------- O4: bookmark tree ----

_BOOKMARK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("level", T.IntegerType()),
            T.StructField("title", T.StringType()),
            T.StructField("page", T.IntegerType()),
        ]
    )
)


def _nest_bookmarks(flat: list) -> list:
    """(level,title,page) tuples -> nested children trees (reference PDF
    TOC recursion, ``parse_pdf.py:236-262``). Iterative stack walk."""
    root: list = []
    stack: list[tuple[int, list]] = [(0, root)]
    for item in flat or []:
        d = item if isinstance(item, dict) else {
            "level": item[0], "title": item[1], "page": item[2]
        }
        node = {
            "title": d.get("title"),
            "page": d.get("page"),
            "children": [],
        }
        lvl = max(int(d.get("level") or 1), 1)
        while len(stack) > 1 and stack[-1][0] >= lvl:
            stack.pop()
        stack[-1][1].append(node)
        stack.append((lvl, node["children"]))
    return root


@F.pandas_udf(T.StringType())
def bookmark_tree_udf(flat_json: pd.Series) -> pd.Series:
    """JSON array of {level,title,page} -> JSON nested tree (single-document
    scope, so a per-row scalar transform is the right altitude — O4)."""
    def go(x):
        if x is None:
            return None
        try:
            flat = json.loads(x)
        except (ValueError, TypeError):
            return None
        return json.dumps(_nest_bookmarks(flat))

    return flat_json.map(go)


def build_bookmark_trees(df: DataFrame, flat_col: str) -> DataFrame:
    """Adds ``bookmark_tree`` (JSON) from a flat TOC column — either an
    ``array<struct(level,title,page)>`` or a JSON string of the same."""
    col = F.col(flat_col)
    if isinstance(df.schema[flat_col].dataType, T.ArrayType):
        col = F.to_json(col)
    return df.withColumn("bookmark_tree", bookmark_tree_udf(col))
