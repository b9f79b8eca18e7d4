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
    agg = rec.groupBy("file", "record_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.when(~F.col("tag").isin(MULTI_TAGS), F.struct("tag", "val"))
            )
        ).alias("fields"),
        F.sort_array(
            F.collect_list(F.when(F.col("tag").isin("AU", "A1", "A2"), F.col("val")))
        ).alias("authors"),
        F.sort_array(
            F.collect_list(F.when(F.col("tag") == "KW", F.col("val")))
        ).alias("keywords"),
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
