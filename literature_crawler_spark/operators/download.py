"""Streamed binary download stage (SURVEY §2 S5, deploy path) with the
reference's integrity checks folded into the same Arrow pass.

Reference semantics being served:

* ``app/util/download.py:106-152`` (``download_file``) — retry ladder
  (3 retries, fixed delay) around a chunked streamed GET; exhausted
  retries mark the download failed instead of raising.
* ``app/util/download.py:79-103`` (``download_video``) — streamed read
  with a **content-length vs bytes-received** integrity check: a short
  read is a failed download even though the GET "succeeded".
* ``app/util/oss_util.py:54-72`` (``get_file_md5``) — the md5/ETag
  read-back of the stored object, the reference's post-upload integrity
  handle. Here the md5 is computed in the SAME pass that produced the
  bytes, so the read-back costs no second scan of a 100-TB blob table.
* ``app/util/url_util.py`` ``is_download`` — the extension whitelist gate
  runs BEFORE any download; that predicate is
  ``functions/urls.has_whitelisted_extension`` (P4) and stays a caller-
  side Catalyst filter so denied URLs never reach the Python stage.

Spark-first shape: ``mapInPandas`` over the fetched wave with the same
``salt`` partitioning contract as ``fetch_extract`` (a supernode host's
rows spread across download partitions); the downloader is a pluggable
callable (HTTP session pool at deploy, deterministic synthetic
regeneration in tests/bench — same pattern as the fetch/render stages).
Per-row failures mark the row (status column) rather than failing the
task, the poisoned-URL contract shared by every network stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# downloader: url -> dict(status='ok'|'missing'|'denied',
#                         bytes=<payload>|None,
#                         content_length=<declared size>|None)
#             or None for a transient failure (retried)
Downloader = Callable[[str], dict | None]

DOWNLOAD_RESULT_FIELDS = [
    T.StructField("download_status", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("md5", T.StringType()),
    T.StructField("download_attempts", T.IntegerType()),
]


def make_synthetic_downloader(
    n_pages: int,
    n_hosts: int,
    fail_every: int | None = None,
    truncate_every: int | None = None,
) -> Downloader:
    """Deterministic stand-in for the streaming HTTP client: regenerates
    the exact bytes the synthetic corpus holds for a page URL (the encode
    path is deterministic, so the download is byte-identical to the
    ``pages`` table — the "reference's fetched corpus" per-row invariant
    is checkable with a plain join).

    ``fail_every=k``: every k-th page fails transiently once per process
    (exercises the retry ladder, mirroring ``make_synthetic_fetcher``).
    ``truncate_every=k``: every k-th page is a PERMANENT short read — the
    declared content length is the full size but only half the payload
    arrives (``download_video``'s progress_bar.n != total_size case).
    """
    from literature_crawler_spark.operators.images import encode_image
    from literature_crawler_spark.sources import synthetic as syn

    flaky_seen: set[int] = set()

    def download(url: str) -> dict | None:
        i = syn.page_index_of_url(url, n_hosts)
        if i is None or i >= n_pages:
            return {"status": "missing"}
        if fail_every and i % fail_every == 0 and i not in flaky_seen:
            flaky_seen.add(i)  # transient: first attempt fails
            return None
        blob = encode_image(
            syn.page_image_pixels(i),
            "png" if i % 20 < 14 else ("jpeg" if i % 20 < 19 else "gif"),
        )
        full = len(blob)
        if truncate_every and i % truncate_every == 0:
            return {"status": "ok", "bytes": blob[: full // 2], "content_length": full}
        return {"status": "ok", "bytes": blob, "content_length": full}

    return download


def download_binaries(
    fetched: DataFrame,
    downloader: Downloader,
    url_col: str = "canon_url",
    retries: int = 3,
    salt_col: str = "salt",
    n_partitions: int | None = None,
) -> DataFrame:
    """Fetched rows -> rows with downloaded payload + integrity columns.

    Adds ``(download_status, bytes, n_bytes, content_length, md5,
    download_attempts)``:

    * ``ok`` — payload complete; ``md5`` is its hex digest (the ETag
      read-back value) and ``n_bytes == content_length`` when the server
      declared one.
    * ``truncated`` — a short read (``n_bytes < content_length``):
      ``bytes``/``md5`` are NULL so a corrupt blob can never be committed;
      ``n_bytes`` records what arrived for diagnostics. Marked, not
      raised — the wave outcome table is where failures live.
    * ``missing`` / ``denied`` — the downloader's own verdicts (404 / 403
      in the reference).
    * ``error`` — the retry ladder exhausted on transient failures.

    The extension-whitelist gate (``urls.has_whitelisted_extension``)
    belongs in a Catalyst filter BEFORE this stage, exactly where the
    reference calls ``is_download`` before ``download_file`` — denied
    URLs then never cross into Python at all.
    """
    schema = T.StructType(list(fetched.schema.fields) + DOWNLOAD_RESULT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            results = []
            for url in pdf[url_col]:
                out, attempts = None, 0
                while attempts < retries:
                    attempts += 1
                    out = downloader(url)
                    if out is not None:
                        break
                if out is None:
                    out = {"status": "error"}
                status = out.get("status", "error")
                blob = out.get("bytes")
                declared = out.get("content_length")
                n_recv = len(blob) if blob is not None else None
                if (
                    status == "ok"
                    and declared is not None
                    and n_recv != declared
                ):
                    status, blob = "truncated", None
                results.append(
                    {
                        "download_status": status,
                        "bytes": blob,
                        "n_bytes": n_recv,
                        "content_length": declared,
                        "md5": hashlib.md5(blob).hexdigest() if blob is not None else None,
                        "download_attempts": attempts,
                    }
                )
            res = pd.DataFrame(results)
            # failed rows carry None in the int columns; pandas would
            # widen to float64, which Arrow refuses to cast back (NaN) —
            # nullable extension dtypes keep the schema honest
            res["n_bytes"] = res["n_bytes"].astype("Int64")
            res["content_length"] = res["content_length"].astype("Int64")
            res["download_attempts"] = res["download_attempts"].astype("Int32")
            pdf = pdf.reset_index(drop=True)
            for f in DOWNLOAD_RESULT_FIELDS:
                pdf[f.name] = res[f.name]
            yield pdf

    if salt_col in fetched.columns:
        parts = n_partitions or fetched.sparkSession.sparkContext.defaultParallelism
        fetched = fetched.repartition(parts, F.col(salt_col))
    return fetched.mapInPandas(run, schema)
