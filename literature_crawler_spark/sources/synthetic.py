"""Deterministic synthetic crawl corpus (pages + seeds + politeness + robots).

Stands in for the reference's live web targets (protocols.io API, Nature
pagination, RIS seed files — SURVEY.md S1-S3) with a closed synthetic web:
every URL is ``https://h<k>.example.org/page/<i>``; the link graph, captions
and image bytes are pure functions of the page index, so any two runs (and
the single-threaded oracle) see the identical corpus. Generation is
partition-parallel via ``mapInPandas`` over ``spark.range`` — the same shape
that synthesizes 10^10-row benchmark frontiers without driver memory.

Skew: host 0 receives ~1/3 of all pages (a supernode host), exercising the
salted politeness scheduling required by the north rule.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from literature_crawler_spark.operators.images import encode_image, phash64_pixels, pixels_for_id

PAGES_SCHEMA = (
    "image_id string, url string, host string, bytes binary, w int, h int, "
    "fmt string, caption string, phash long, links array<string>"
)

_WORDS = (
    "protocol cell assay buffer sample gene antibody culture stain image "
    "figure panel resolution microscope dilution incubation wash elution"
).split()


def _host_of_index(i: int, n_hosts: int) -> int:
    # ~1/3 of pages land on host 0 (skewed supernode); rest uniform.
    u = (i * 2654435761) % (2**32)
    if u % 3 == 0:
        return 0
    return 1 + (u % (n_hosts - 1)) if n_hosts > 1 else 0

def _url_of_index(i: int, n_hosts: int) -> str:
    return f"https://h{_host_of_index(i, n_hosts)}.example.org/page/{i}"


def page_index_of_url(url: str, n_hosts: int) -> int | None:
    """Inverse of ``_url_of_index`` for canonical URLs: the page index, or
    None if the URL is not a page of this corpus (wrong grammar or the
    host doesn't match the index's assigned host)."""
    m = re.match(r"https://h(\d+)\.example\.org/page/(\d+)$", url or "")
    if not m:
        return None
    host, i = int(m.group(1)), int(m.group(2))
    if _host_of_index(i, n_hosts) != host:
        return None
    return i


def page_image_size(
    i: int, min_side: int = 16, max_side: int = 48, seed: int = 42
) -> tuple[int, int]:
    """(w, h) of page i's image — the single source of truth shared by
    ``generate_pages`` and the browser-renderer's screenshot stand-in
    (operators/browser.py), so screenshot-vs-origin PSNR compares the
    same pixel field."""
    span = max_side - min_side
    return (min_side + (i * 13 + seed) % span, min_side + (i * 29 + seed) % span)


def page_image_pixels(
    i: int, min_side: int = 16, max_side: int = 48, seed: int = 42
) -> np.ndarray:
    w, h = page_image_size(i, min_side, max_side, seed)
    return pixels_for_id(f"img-{i:010d}", w, h)


def _caption_of_index(i: int) -> str:
    w = [_WORDS[(i * 7 + k * 13) % len(_WORDS)] for k in range(5 + i % 4)]
    return f"Figure {i % 9 + 1}: " + " ".join(w)


def _links_of_index(i: int, n_pages: int, n_hosts: int) -> list[str]:
    """3-8 outlinks: mostly same-host neighborhood, some cross-host, plus
    noise mirroring FIXTURES.md — duplicates, a blocked URL, a relative
    path, and a query-string variant of an existing page."""
    n_links = 3 + (i % 6)
    out = []
    for k in range(n_links):
        j = (i * 31 + k * 97 + 7) % n_pages
        out.append(_url_of_index(j, n_hosts))
    if i % 5 == 0 and out:
        out.append(out[0])  # exact duplicate
    if i % 7 == 0:
        out.append(f"{_url_of_index((i * 13 + 1) % n_pages, n_hosts)}?utm_source=feed")
    if i % 11 == 0:
        out.append("https://ads.doubleclick.net/banner.jpg")  # blocked
    if i % 13 == 0:
        out.append(f"/page/{(i * 17 + 3) % n_pages}")  # relative path
    return out


def generate_pages(
    spark: SparkSession,
    n_pages: int = 5000,
    n_hosts: int = 50,
    with_images: bool = True,
    min_side: int = 16,
    max_side: int = 48,
    seed: int = 42,
) -> DataFrame:
    """The image+caption corpus per BASELINE.json input_hint:
    (image_id, bytes, w, h, fmt, caption, phash) + crawl-graph columns
    (url, host, links)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                image_id = f"img-{i:010d}"
                url = _url_of_index(i, n_hosts)
                host = f"h{_host_of_index(i, n_hosts)}.example.org"
                fmt = "png" if i % 20 < 14 else ("jpeg" if i % 20 < 19 else "gif")
                if with_images:
                    w, h = page_image_size(i, min_side, max_side, seed)
                    px = pixels_for_id(image_id, w, h)
                    blob = encode_image(px, fmt)
                    ph = phash64_pixels(px)
                else:
                    w = h = 0
                    blob = None
                    ph = 0
                rows.append(
                    (
                        image_id,
                        url,
                        host,
                        blob,
                        w,
                        h,
                        fmt,
                        _caption_of_index(i),
                        ph,
                        _links_of_index(i, n_pages, n_hosts),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "url", "host", "bytes", "w", "h", "fmt",
                    "caption", "phash", "links",
                ],
            )

    # Partitions track corpus size, NOT cluster parallelism: each
    # mapInPandas task pays a fixed Python-runner handshake (~10 ms), so
    # fanning a 200-row fixture across 32 tasks costs 3x more wall time
    # than 4 tasks (measured: an identity crossing over 200 rows is
    # 263 ms at 4 parts, 340 ms at 32). The //500 divisor raises
    # parallelism exactly when there are enough rows per task to amortize
    # the handshake; the old cap of 64 would have throttled a 10^7-page
    # corpus and is now 512. Values derive purely from `id`, so
    # partitioning never changes results.
    n_parts = max(4, min(512, n_pages // 500 or 4))
    return spark.range(0, n_pages, numPartitions=n_parts).mapInPandas(gen, PAGES_SCHEMA)


VIDEOS_SCHEMA = (
    "video_id string, bytes binary, n_frames int, w int, h int, fmt string"
)


def generate_videos(
    spark: SparkSession,
    n_videos: int = 50,
    n_frames: int = 6,
    side: int = 16,
    fmt: str = "png",
) -> DataFrame:
    """Deterministic fake-codec video corpus (FVID container of FIMG
    frames) — the multimodal frame-sampling test bed. Same shape as the
    pages generator: distributed mapInPandas over spark.range."""
    from literature_crawler_spark.operators.images import encode_video

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                vid = f"vid-{i:08d}"
                frames = [
                    pixels_for_id(f"{vid}/f{j}", side, side) for j in range(n_frames)
                ]
                rows.append(
                    (vid, encode_video(frames, fmt), n_frames, side, side, fmt)
                )
            yield pd.DataFrame(
                rows, columns=["video_id", "bytes", "n_frames", "w", "h", "fmt"]
            )

    n_parts = max(4, min(512, n_videos // 100 or 4))
    return spark.range(0, n_videos, numPartitions=n_parts).mapInPandas(
        gen, VIDEOS_SCHEMA
    )


AUDIO_BAND_LEN = 256


def generate_audio(spark: SparkSession, n_clips: int = 120, n_bands: int = 16) -> DataFrame:
    """Deterministic fake audio blobs whose band energies are CLOSED-FORM:
    byte k of clip i is ((i*7 + (k//256)*13) % 6) * 51 — constant within
    each 256-byte band, so band b's mean/255 is exactly
    ((i*7 + b*13) % 6) / 5. This makes operators.images.audio_features
    oracle-checkable (the DuckDB twin recomputes the energies from the id
    arithmetic) while the UDF still decodes real binary columns."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                vals = np.repeat(
                    np.array([((i * 7 + b * 13) % 6) * 51 for b in range(n_bands)],
                             dtype=np.uint8),
                    AUDIO_BAND_LEN,
                )
                rows.append((f"aud-{i:08d}", vals.tobytes()))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes"])

    return spark.range(0, n_clips, numPartitions=max(2, min(128, n_clips // 50 or 2))).mapInPandas(
        gen, "audio_id string, bytes binary"
    )


def generate_bordered_images(spark: SparkSession, n_images: int = 120) -> DataFrame:
    """Images wrapped in the reference's (14,14,14) black border
    (pic_back_deal.py) with formula-known inner dims and pads — the
    crop operator's oracle-checkable corpus."""
    from literature_crawler_spark.operators.images import BORDER_RGB

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w, h = 16 + i % 9, 12 + i % 7
                top, bottom = 1 + i % 3, 2 + i % 2
                left, right = i % 4, 1 + i % 3
                inner = pixels_for_id(f"crop-{i}", w, h)
                padded = np.full(
                    (h + top + bottom, w + left + right, 3),
                    BORDER_RGB[0], dtype=np.uint8,
                )
                padded[top : top + h, left : left + w] = inner
                rows.append((f"bimg-{i:08d}", encode_image(padded, "png")))
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    return spark.range(0, n_images, numPartitions=max(2, min(128, n_images // 50 or 2))).mapInPandas(
        gen, "image_id string, bytes binary"
    )


def generate_seeds(
    spark: SparkSession, n_seeds: int = 100, n_pages: int = 5000, n_hosts: int = 50
) -> DataFrame:
    """Seed list: every 7th URL is a query-string variant, every 13th an
    exact duplicate of seed 0 — exercising query-strip + first-seen dedup
    (reference ``protocol_io_crawl.py:217-221``)."""
    rows = []
    for s in range(n_seeds):
        i = (s * 137) % n_pages
        url = _url_of_index(i, n_hosts)
        if s % 7 == 3:
            url += "?ref=seedlist"
        if s % 13 == 5 and rows:
            url = rows[0][0]
        rows.append((url, 0, s))
    return spark.createDataFrame(rows, "url string, priority int, seq long")


def generate_politeness(spark: SparkSession, n_hosts: int = 50, default_budget: int = 10) -> DataFrame:
    """Per-host budgets; host 0 (the skewed supernode) gets 4x budget but
    still far below its page mass, forcing multi-wave spillover."""
    rows = [
        (f"h{k}.example.org", 1000 if k else 250, default_budget * (4 if k == 0 else 1))
        for k in range(n_hosts)
    ]
    return spark.createDataFrame(rows, "host string, min_interval_ms int, budget_per_wave int")


def generate_robots(spark: SparkSession) -> DataFrame:
    """Deny rules in the shape of the reference blocklist (url_util.py:30-107)."""
    rows = [
        ("*", "doubleclick", False),
        ("*", "/ads/", False),
        ("*", "utm_banned", False),
        ("h3.example.org", "/page/3", False),
    ]
    return spark.createDataFrame(rows, "host string, pattern string, allow boolean")


def python_corpus(n_pages: int, n_hosts: int) -> dict[int, dict]:
    """Driver-side mirror of the page graph (urls + links only, no bytes)
    for the single-threaded oracle. Must stay in lock-step with
    ``generate_pages`` — both derive from the same pure index functions."""
    return {
        i: {
            "url": _url_of_index(i, n_hosts),
            "host": f"h{_host_of_index(i, n_hosts)}.example.org",
            "links": _links_of_index(i, n_pages, n_hosts),
        }
        for i in range(n_pages)
    }
