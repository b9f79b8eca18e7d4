"""Structured Streaming front-end: seed ingestion via foreachBatch folds
into the same batch kernel (idempotent under replay), and the windowed
per-host rate monitor aggregates with a watermark."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from literature_crawler_spark.plans.state import SnapshotStore
from literature_crawler_spark.streaming import waves


def _write_seed_file(d: str, name: str, urls: list[str]) -> None:
    with open(os.path.join(d, name), "w") as f:
        f.write("\n".join(urls) + "\n")


def test_seed_ingest_stream_builds_frontier(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_seed_file(
        str(src),
        "batch0.txt",
        [
            "https://h1.example.org/a",
            "https://h1.example.org/a?utm=1",  # canonicalizes to /a -> dedup
            "https://h2.example.org/b",
            "https://h2.example.org/ads/x",  # robots-denied
        ],
    )
    store = SnapshotStore(str(tmp_path / "state"))
    robots = spark.createDataFrame(
        [("*", "/ads/", False)], "host string, pattern string, allow boolean"
    )
    stream = (
        spark.readStream.schema(T.StructType([T.StructField("url", T.StringType())]))
        .text(str(src))
        .withColumnRenamed("value", "url")
    )
    q = waves.seed_ingest_stream(stream, store, robots, str(tmp_path / "ckpt1"))
    q.awaitTermination(120)
    seen = store.read(spark, "seen")
    urls = {r.canon_url for r in seen.collect()}
    assert urls == {"https://h1.example.org/a", "https://h2.example.org/b"}
    frontier = store.read(spark, "frontier")
    assert frontier.filter(F.col("status") == "pending").count() == 2


def test_seed_ingest_is_idempotent_for_seen_urls(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_seed_file(str(src), "b0.txt", ["https://h1.example.org/a"])
    store = SnapshotStore(str(tmp_path / "state"))
    stream_schema = T.StructType([T.StructField("url", T.StringType())])

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(stream_schema)
            .text(str(src))
            .withColumnRenamed("value", "url")
        )
        q = waves.seed_ingest_stream(stream, store, None, str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ckpt1")
    # replay the same file through a FRESH checkpoint (simulates at-least-once
    # redelivery); the anti-join vs seen must keep membership exactly-once
    run("ckpt2")
    assert store.read(spark, "seen").count() == 1
    assert store.read(spark, "frontier").count() == 1


def test_host_rate_monitor_windows(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        '{"ts": "2024-01-01T00:00:01", "host": "h1"}',
        '{"ts": "2024-01-01T00:00:05", "host": "h1"}',
        '{"ts": "2024-01-01T00:00:12", "host": "h1"}',
        '{"ts": "2024-01-01T00:00:03", "host": "h2"}',
    ]
    with open(os.path.join(str(src), "e.json"), "w") as f:
        f.write("\n".join(rows))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("host", T.StringType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    out = waves.host_rate_monitor(stream, window="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.host): r.n_fetches
        for r in spark.sql("SELECT * FROM rates").collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", "h1"): 2,
        ("2024-01-01T00:00:10", "h1"): 1,
        ("2024-01-01T00:00:00", "h2"): 1,
    }
