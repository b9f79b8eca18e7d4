"""RIS bibliographic-record source (reference seed-list format S3).

The reference parses RIS files record-at-a-time into dicts with multi-valued
AU/KW accumulation (``app/util/current_protocol_crawl_util.py:272-327``,
sample fixture ``app/static/current_protocol/Bioinformatics_2.txt``). Here
the same grammar is a DataFrame pipeline:

    spark.read.text -> tag/value split -> record-id assignment (running
    count of ER terminators) -> groupBy record -> map + multi-value arrays

Record assignment uses a window cumulative-sum over (file, line order) —
for multi-GB RIS dumps partition per file; within a file order is the
record delimiter so the window partitions by filename.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MULTI_TAGS = ["AU", "KW", "A1", "A2"]


def read_ris(spark: SparkSession, path: str) -> DataFrame:
    """Parse RIS file(s) -> one row per record:
    (file, record_id, type, title, doi, url, authors, keywords, fields)."""
    lines = (
        spark.read.text(path)
        .select(
            F.col("value"),
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("line_id"),
        )
    )
    parsed = lines.select(
        "file",
        "line_id",
        F.regexp_extract("value", r"^([A-Z][A-Z0-9])  ?- ?(.*)$", 1).alias("tag"),
        F.trim(F.regexp_extract("value", r"^([A-Z][A-Z0-9])  ?- ?(.*)$", 2)).alias("val"),
    ).filter(F.col("tag") != "")
    # record id = number of ER terminators strictly before this line
    w = Window.partitionBy("file").orderBy("line_id").rowsBetween(Window.unboundedPreceding, -1)
    rec = parsed.withColumn(
        "record_id",
        F.coalesce(F.sum(F.when(F.col("tag") == "ER", 1).otherwise(0)).over(w), F.lit(0)),
    ).filter(F.col("tag") != "ER")
    # Repeated scalar tags keep the LAST occurrence — the reference's dict
    # assignment (parse_entry: data[key] = value) overwrites — and a second
    # 'UR'/'N1' line must not abort the read (map_from_entries raises
    # DUPLICATED_MAP_KEY on dup keys under Spark's default policy).
    wtag = Window.partitionBy("file", "record_id", "tag").orderBy(
        F.col("line_id").desc()
    )
    rec = rec.withColumn("_last", F.row_number().over(wtag) == 1)

    def _ordered_vals(cond):
        # multi-value tags accumulate in DOCUMENT order (the reference
        # appends as it scans; first-author order is load-bearing) —
        # collect (line_id, val) structs and sort by position, never by
        # value
        return F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        cond,
                        F.struct(
                            F.col("line_id").alias("pos"), F.col("val").alias("v")
                        ),
                    )
                )
            ),
            lambda s: s["v"],
        )

    agg = rec.groupBy("file", "record_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.when(
                    ~F.col("tag").isin(MULTI_TAGS) & F.col("_last"),
                    F.struct("tag", "val"),
                )
            )
        ).alias("fields"),
        _ordered_vals(F.col("tag").isin("AU", "A1", "A2")).alias("authors"),
        _ordered_vals(F.col("tag") == "KW").alias("keywords"),
    )
    return agg.select(
        "file",
        "record_id",
        F.col("fields").getItem("TY").alias("type"),
        F.coalesce(F.col("fields").getItem("TI"), F.col("fields").getItem("T1")).alias("title"),
        F.col("fields").getItem("DO").alias("doi"),
        F.col("fields").getItem("UR").alias("url"),
        "authors",
        "keywords",
        "fields",
    )
