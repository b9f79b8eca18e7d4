"""Partition-parallel fetch+extract stage (Arrow UDF path).

The reference fetches serially with per-request retry ladders
(``app/util/download.py:26-48`` ``get_http_data``: 3-5 retries, fixed
backoff, browser headers; streamed variant ``:104-147``). Here the fetch
stage is ``mapInPandas`` over the scheduled frontier: each Arrow batch of
URLs is fetched by a pluggable ``fetcher`` callable (session pool /
HTTP client at deploy; deterministic synthetic corpus here — real network
I/O is out of scope in this sandbox, SURVEY §7.4), with the retry ladder
applied per URL *inside* the batch.

Partitioning contract: the caller repartitions on ``salt`` (the
politeness scheduler's post-quota shard key) so one host's scheduled rows
spread across fetch partitions while each partition still processes whole
Arrow batches. The engine's default fetch is the hash-join against the
``pages`` table (cheaper when the corpus IS a table); this stage is the
deploy path for live fetching and is verified to produce the identical
fetched set on the synthetic corpus (tests/test_fetch.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fetcher: url -> dict(status=..., caption=..., links=[...], image_id=...)
#          or None for a transient failure (retried)
Fetcher = Callable[[str], dict | None]

FETCH_RESULT_FIELDS = [
    T.StructField("fetch_status", T.StringType()),
    T.StructField("image_id", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
    T.StructField("attempts", T.IntegerType()),
]


def make_synthetic_fetcher(
    n_pages: int, n_hosts: int, fail_every: int | None = None
) -> Fetcher:
    """Deterministic stand-in for the HTTP client: regenerates the same
    page the synthetic corpus holds for a URL (sources/synthetic grammar).
    ``fail_every=k`` makes every k-th page fail transiently once per
    process — exercising the retry ladder deterministically."""
    from literature_crawler_spark.sources import synthetic as syn

    flaky_seen: set[int] = set()

    def fetch(url: str) -> dict | None:
        m = syn.page_index_of_url(url, n_hosts)
        if m is None or m >= n_pages:
            return {"status": "missing"}
        if fail_every and m % fail_every == 0 and m not in flaky_seen:
            flaky_seen.add(m)  # transient: first attempt fails
            return None
        return {
            "status": "fetched",
            "image_id": f"img-{m:010d}",
            "caption": syn._caption_of_index(m),
            "links": syn._links_of_index(m, n_pages, n_hosts),
        }

    return fetch


def fetch_extract(
    scheduled: DataFrame,
    fetcher: Fetcher,
    url_col: str = "canon_url",
    retries: int = 3,
    salt_col: str = "salt",
    n_partitions: int | None = None,
) -> DataFrame:
    """scheduled frontier -> fetched rows with extract columns.

    Adds (fetch_status, image_id, caption, links, attempts). Retry ladder
    per URL inside the Arrow batch (reference download.py:26-48); URLs
    still failing after ``retries`` get status 'error' — poisoned URLs
    mark their outcome instead of failing the Spark task (SURVEY §4
    blacklist note). Input is repartitioned on ``salt_col`` so supernode
    hosts spread over fetch partitions.
    """
    schema = T.StructType(list(scheduled.schema.fields) + FETCH_RESULT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: pd.DataFrame([]) below
                continue       # would have no columns -> KeyError
            results = []
            for url in pdf[url_col]:
                out, attempts = None, 0
                while attempts < retries:
                    attempts += 1
                    out = fetcher(url)
                    if out is not None:
                        break
                if out is None:
                    out = {"status": "error"}
                results.append(
                    {
                        "fetch_status": out.get("status", "error"),
                        "image_id": out.get("image_id"),
                        "caption": out.get("caption"),
                        "links": out.get("links"),
                        "attempts": attempts,
                    }
                )
            res = pd.DataFrame(results)
            pdf = pdf.reset_index(drop=True)
            for f in FETCH_RESULT_FIELDS:
                pdf[f.name] = res[f.name]
            yield pdf

    if salt_col in scheduled.columns:
        parts = n_partitions or scheduled.sparkSession.sparkContext.defaultParallelism
        scheduled = scheduled.repartition(parts, F.col(salt_col))
    return scheduled.mapInPandas(run, schema)
