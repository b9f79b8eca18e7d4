"""Streamed binary download stage (S5 deploy path): byte-identity vs the
corpus table, the input_hint's per-row decoded-pixel invariant at the
pipeline level (allclose for lossless formats, PSNR >= 40 dB for jpeg,
caption equality), the retry ladder, and short-read integrity marking.

Reference contracts under test: download_file's retry ladder
(app/util/download.py:106-152), download_video's content-length vs
bytes-received check (:79-103), oss_util.get_file_md5's md5/ETag
read-back (:54-72).
"""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from literature_crawler_spark.operators import download as dl
from literature_crawler_spark.operators import fetch as fe
from literature_crawler_spark.operators import images as im
from literature_crawler_spark.sources import synthetic as syn

N_PAGES, N_HOSTS = 200, 6


def _scheduled(spark, ids):
    rows = [
        (
            syn._url_of_index(i, N_HOSTS),
            f"h{syn._host_of_index(i, N_HOSTS)}.example.org",
            i % 4,
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "canon_url string, host string, salt int")


def test_download_matches_corpus_bytes(spark):
    """The UDF download path produces byte-identical payloads to the
    corpus table (join on url, compare md5 + length — the ETag check)."""
    pages = syn.generate_pages(spark, N_PAGES, N_HOSTS, with_images=True).select(
        F.col("url").alias("canon_url"),
        F.md5("bytes").alias("corpus_md5"),
        F.length("bytes").alias("corpus_len"),
    )
    sched = _scheduled(spark, range(0, 80))
    got = dl.download_binaries(
        sched, dl.make_synthetic_downloader(N_PAGES, N_HOSTS)
    ).join(pages, "canon_url")
    assert got.count() == 80
    bad = got.filter(
        (F.col("download_status") != "ok")
        | (F.col("md5") != F.col("corpus_md5"))
        | (F.col("n_bytes") != F.col("corpus_len"))
        | (F.col("n_bytes") != F.col("content_length"))
    )
    assert bad.count() == 0


def test_per_row_decoded_pixel_and_caption_invariant(spark):
    """BASELINE.json input_hint, end-to-end through fetch + download UDF
    stages: decoded pixels allclose vs the origin field for lossless
    formats, PSNR >= 40 dB for jpeg, caption exact equality — checked
    per row against the independently generated corpus grammar."""
    sched = _scheduled(spark, range(0, 60))
    fetched = fe.fetch_extract(sched, fe.make_synthetic_fetcher(N_PAGES, N_HOSTS))
    rows = dl.download_binaries(
        fetched, dl.make_synthetic_downloader(N_PAGES, N_HOSTS)
    ).collect()
    assert len(rows) == 60
    n_jpeg = 0
    for r in rows:
        i = syn.page_index_of_url(r.canon_url, N_HOSTS)
        assert r.caption == syn._caption_of_index(i)
        px, w, h, fmt = im.decode_image(bytes(r.bytes))
        origin = syn.page_image_pixels(i)
        assert px is not None and px.shape == origin.shape
        if fmt == "jpeg":
            n_jpeg += 1
            assert im.psnr(origin, px) >= 40.0
        else:
            assert np.array_equal(px, origin)  # lossless: exact allclose
    assert n_jpeg > 0  # the lossy branch was actually exercised


def test_download_retry_ladder(spark):
    flaky = dl.make_synthetic_downloader(N_PAGES, N_HOSTS, fail_every=5)
    out = {
        r.canon_url: r
        for r in dl.download_binaries(_scheduled(spark, range(0, 30)), flaky).collect()
    }
    for i in range(30):
        r = out[syn._url_of_index(i, N_HOSTS)]
        assert r.download_status == "ok"
        assert r.download_attempts == (2 if i % 5 == 0 else 1)

    def always_down(url):
        return None

    dead = dl.download_binaries(_scheduled(spark, [1]), always_down).collect()[0]
    assert dead.download_status == "error" and dead.download_attempts == 3
    assert dead.bytes is None and dead.md5 is None


def test_truncated_reads_marked_not_committed(spark):
    """A short read (bytes received < declared content length) is marked
    'truncated' with a NULL payload — a corrupt blob can never reach the
    store — while n_bytes records what arrived."""
    shorty = dl.make_synthetic_downloader(N_PAGES, N_HOSTS, truncate_every=7)
    out = {
        r.canon_url: r
        for r in dl.download_binaries(_scheduled(spark, range(0, 42)), shorty).collect()
    }
    n_trunc = 0
    for i in range(42):
        r = out[syn._url_of_index(i, N_HOSTS)]
        if i % 7 == 0:
            n_trunc += 1
            assert r.download_status == "truncated"
            assert r.bytes is None and r.md5 is None
            assert r.n_bytes < r.content_length
        else:
            assert r.download_status == "ok"
            assert hashlib.md5(bytes(r.bytes)).hexdigest() == r.md5
    assert n_trunc == 6


def test_out_of_corpus_marked_missing(spark):
    sched = spark.createDataFrame(
        [("https://h1.example.org/page/99999", "h1.example.org", 0)],
        "canon_url string, host string, salt int",
    )
    r = dl.download_binaries(
        sched, dl.make_synthetic_downloader(N_PAGES, N_HOSTS)
    ).collect()[0]
    assert r.download_status == "missing"
    assert r.bytes is None and r.n_bytes is None and r.content_length is None
