"""Time-window + ordering expressions (reference time utilities re-expressed).

* ``split_time_windows`` — the reference splits [t1, t2) into fixed-width
  buckets in a Python loop (``app/util/time_deal.py:37-56`` ``split_time``,
  10-day windows driving the protocols.io list scan S1); here it's
  ``sequence()`` + ``explode`` — a generated dimension, no driver loop.
* ``to_epoch / format_publish_date / publish_year`` — the reference
  triplicates timestamps as epoch ints, '%d %B %Y' strings and datetimes
  (``time_deal.py:8-30,59-73``); single-TimestampType replacements.
* ``natural_sort_key`` — the reference's ``natural_keys`` alnum sort
  (``text_deal.py:273-297``) used for step ordering (O1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def split_time_windows(
    spark: SparkSession, start: str, end: str, days: int = 10
) -> DataFrame:
    """One row per [win_start, win_end) bucket covering [start, end).

    Reference semantics (time_deal.py:37-56): fixed-width windows, the last
    window clipped to ``end``.
    """
    seq = F.sequence(
        F.to_timestamp(F.lit(start)),
        F.to_timestamp(F.lit(end)),
        F.expr(f"INTERVAL {int(days)} DAYS"),
    )
    df = spark.range(1).select(F.explode(seq).alias("win_start"))
    win_end = F.least(
        F.col("win_start") + F.expr(f"INTERVAL {int(days)} DAYS"),
        F.to_timestamp(F.lit(end)),
    )
    return (
        df.withColumn("win_end", win_end)
        .filter(F.col("win_start") < F.to_timestamp(F.lit(end)))
        .withColumn("win_id", F.row_number().over(Window.orderBy("win_start")) - 1)
    )


def to_epoch(ts: Column) -> Column:
    """Timestamp -> epoch seconds (reference stores epoch ints,
    crawl_data.py:116,150)."""
    return F.unix_timestamp(ts)


def format_publish_date(ts: Column) -> Column:
    """'%d %B %Y' render (reference time_deal.py:59-65 timestamp_format)."""
    return F.date_format(ts, "d MMMM yyyy")


def publish_year(ts: Column) -> Column:
    return F.year(ts)


def natural_sort_key(s: Column, width: int = 10) -> Column:
    """Sortable key for mixed-alnum strings ('step 2' < 'step 10'):
    zero-pads every digit run so lexicographic order equals natural order
    (reference ``natural_keys``, text_deal.py:273-297)."""
    parts = F.split(s, r"(?<=\D)(?=\d)|(?<=\d)(?=\D)")
    padded = F.transform(
        parts,
        lambda p: F.when(p.rlike(r"^\d+$"), F.lpad(p, width, "0")).otherwise(p),
    )
    return F.concat_ws("", padded)
