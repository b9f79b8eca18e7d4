"""PDF source: TOC extraction + page rasterization (pure-logic port).

The reference walks real PDFs with PyMuPDF (``app/service/common/
parse_pdf.py``): ``get_bookmarks`` (:236-262) turns ``get_toc()``'s flat
(level, title, page) tuples into a nested tree (stripping a trailing
``\\r`` from titles), and ``pdf_to_png_and_upload`` (:266-305) rasters
each page at a 2.5x matrix and emits {type, pageId, pageUrl, pageWidth,
pageHeight} records.

PyMuPDF is not in this container, so the byte format is a deterministic
fake container ("FPDF": page count + TOC entries + length-prefixed FIMG
page images — same pattern as the FIMG/FVID fakes in operators/images).
The PURE logic is fully ported and tested: TOC flattening/nesting (the
nest walk is shared with operators/render._nest_bookmarks), title
normalization, the raster scale arithmetic (nearest-neighbor stand-in
for the 2.5x matrix), and the page-record schema. Swapping in PyMuPDF
replaces ``decode_pdf`` only.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from literature_crawler_spark.operators.images import (
    decode_image,
    encode_image,
    pixels_for_id,
)
from literature_crawler_spark.operators.render import _nest_bookmarks

PDF_MAGIC = b"FPDF"

RASTER_SCALE = 2.5  # the reference's fitz.Matrix(2.5, 2.5)


# ---------------------------------------------------------------- codec ----


def encode_pdf(pages: list[np.ndarray], toc: list[tuple[int, str, int]]) -> bytes:
    """FPDF container: magic + u16 page count + u16 TOC count +
    [u8 level | u16 page | u16 len | title utf8]* + [u32 len | FIMG]*."""
    out = [PDF_MAGIC, len(pages).to_bytes(2, "big"), len(toc).to_bytes(2, "big")]
    for level, title, page in toc:
        t = (title or "").encode()
        out += [int(level).to_bytes(1, "big"), int(page).to_bytes(2, "big"),
                len(t).to_bytes(2, "big"), t]
    for px in pages:
        blob = encode_image(px, "png")
        out += [len(blob).to_bytes(4, "big"), blob]
    return b"".join(out)


def decode_pdf(data: bytes) -> tuple[list[tuple[int, str, int]], list[bytes]] | None:
    """(toc tuples, page image blobs) or None on garbage — the PyMuPDF
    swap point."""
    if data is None or len(data) < 8 or data[:4] != PDF_MAGIC:
        return None
    n_pages = int.from_bytes(data[4:6], "big")
    n_toc = int.from_bytes(data[6:8], "big")
    off, toc = 8, []
    for _ in range(n_toc):
        if off + 5 > len(data):
            return None
        level = data[off]
        page = int.from_bytes(data[off + 1 : off + 3], "big")
        tlen = int.from_bytes(data[off + 3 : off + 5], "big")
        off += 5
        toc.append((level, data[off : off + tlen].decode(), page))
        off += tlen
    pages = []
    for _ in range(n_pages):
        if off + 4 > len(data):
            return None
        ln = int.from_bytes(data[off : off + 4], "big")
        off += 4
        pages.append(data[off : off + ln])
        off += ln
    return toc, pages


# ------------------------------------------------------------ pure logic ----


def normalize_toc(toc: list[tuple[int, str, int]]) -> list[dict]:
    """Flat (level, title, page) entries with the reference's trailing-\\r
    strip (parse_pdf.py:258-259)."""
    out = []
    for level, title, page in toc:
        if title is not None and title.endswith("\r"):
            title = title[:-1]
        out.append({"level": level, "title": title, "page": page})
    return out


def toc_tree(toc: list[tuple[int, str, int]]) -> list[dict]:
    """Nested bookmark tree (reference get_bookmarks recursion; shared
    stack-walk implementation with operators/render O4)."""
    return _nest_bookmarks(normalize_toc(toc))


def raster_dims(w: int, h: int, scale: float = RASTER_SCALE) -> tuple[int, int]:
    """Output dimensions of the scale matrix (fitz rounds the pixmap to
    int(dim * scale))."""
    return int(w * scale), int(h * scale)


def _raster(px: np.ndarray, scale: float) -> np.ndarray:
    """Nearest-neighbor upscale — the fake codec's stand-in for the PDF
    raster; the dimension arithmetic matches fitz."""
    h, w = px.shape[:2]
    out_w, out_h = raster_dims(w, h, scale)
    ys = (np.arange(out_h) / scale).astype(int).clip(0, h - 1)
    xs = (np.arange(out_w) / scale).astype(int).clip(0, w - 1)
    return px[np.ix_(ys, xs)]


def _fitz():
    """Guarded PyMuPDF import — the real-PDF codec activates only where
    the lib exists (deploy); this sandbox ships neither fitz nor its
    native deps."""
    try:
        import fitz  # noqa: PLC0415

        return fitz
    except ImportError:
        return None


def real_pdf_toc(data: bytes) -> tuple[list[tuple[int, str, int]], int] | None:
    """TOC + page count of a real PDF WITHOUT rasterizing anything —
    ``extract_toc`` consumes only these, and a pixmap per page just to
    count pages costs seconds per large document. None where the blob is
    not a parseable PDF or PyMuPDF is absent."""
    fitz = _fitz()
    if fitz is None or data is None or bytes(data[:5]) != b"%PDF-":
        return None
    try:
        doc = fitz.open(stream=bytes(data), filetype="pdf")
    except Exception:
        return None
    try:
        toc = [(lvl, title, page) for lvl, title, page in doc.get_toc(simple=True)]
        return toc, doc.page_count
    except Exception:
        return None
    finally:
        doc.close()


def decode_real_pdf(
    data: bytes, scale: float = RASTER_SCALE
) -> tuple[list[tuple[int, str, int]], list[np.ndarray]] | None:
    """Real-PDF twin of ``decode_pdf`` + the raster, via PyMuPDF
    (reference ``app/service/common/parse_pdf.py:266-305`` rasterizes
    each page through ``page.get_pixmap(matrix=fitz.Matrix(scale,
    scale))``; TOC via ``doc.get_toc()``). Returns ``(toc, [HxWx3 uint8
    page pixels])`` — pages arrive already rasterized at ``scale``
    because fitz's pixmap IS the raster step. ``None`` when the blob is
    not a parseable PDF or PyMuPDF is absent (the Spark stages then skip
    the row — marked, never a task abort)."""
    fitz = _fitz()
    if fitz is None or data is None or bytes(data[:5]) != b"%PDF-":
        return None
    try:
        doc = fitz.open(stream=bytes(data), filetype="pdf")
    except Exception:
        return None
    try:
        toc = [(lvl, title, page) for lvl, title, page in doc.get_toc(simple=True)]
        mat = fitz.Matrix(scale, scale)
        pages = []
        for page in doc:
            pix = page.get_pixmap(matrix=mat, alpha=False)
            arr = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
                pix.height, pix.width, pix.n
            )
            pages.append(arr[:, :, :3].copy())
        return toc, pages
    except Exception:
        return None
    finally:
        doc.close()


# -------------------------------------------------------------- Spark API ----

PAGES_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_id", T.IntegerType()),
        T.StructField("page_w", T.IntegerType()),
        T.StructField("page_h", T.IntegerType()),
        T.StructField("png", T.BinaryType()),
    ]
)

TOC_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_toc", T.IntegerType()),
        T.StructField("toc_titles", T.StringType()),
        T.StructField("max_level", T.IntegerType()),
        T.StructField("toc_tree", T.StringType()),
    ]
)


def rasterize_pdf_pages(
    df: DataFrame, bytes_col: str, id_col: str, scale: float = RASTER_SCALE
) -> DataFrame:
    """One row per page: (doc_id, page_id, page_w, page_h, png) — the
    reference's per-page raster loop as a mapInPandas fan-out (same batch
    shape as operators/images.sample_video_frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                dec = decode_pdf(blob)
                if dec is None:
                    # real %PDF- blobs: fitz pixmaps arrive pre-rastered
                    real = decode_real_pdf(blob, scale)
                    if real is None:
                        continue
                    for i, big in enumerate(real[1]):
                        rows.append(
                            (rid, i, big.shape[1], big.shape[0],
                             encode_image(big, "png"))
                        )
                    continue
                _toc, pages = dec
                for i, page_blob in enumerate(pages):
                    px, _w, _h, _f = decode_image(page_blob)
                    if px is None:
                        continue
                    big = _raster(px, scale)
                    rows.append(
                        (rid, i, big.shape[1], big.shape[0], encode_image(big, "png"))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "page_id", "page_w", "page_h", "png"]
            )

    return df.mapInPandas(run, PAGES_OUT_SCHEMA)


def extract_toc(df: DataFrame, bytes_col: str, id_col: str) -> DataFrame:
    """Per-document TOC summary + nested tree JSON."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                dec = decode_pdf(blob)
                if dec is None:
                    real = real_pdf_toc(blob)  # fitz path, raster-free
                    if real is None:
                        continue
                    toc, n_pages = real
                else:
                    toc, pages = dec
                    n_pages = len(pages)
                flat = normalize_toc(toc)
                rows.append(
                    (
                        rid,
                        n_pages,
                        len(flat),
                        "|".join(e["title"] or "" for e in flat),
                        max((e["level"] for e in flat), default=0),
                        json.dumps(_nest_bookmarks(flat)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_pages", "n_toc", "toc_titles", "max_level", "toc_tree"],
            )

    return df.mapInPandas(run, TOC_OUT_SCHEMA)


# ------------------------------------------------------------- synthesis ----


def generate_pdfs(spark: SparkSession, n_docs: int = 50, base_side: int = 12) -> DataFrame:
    """Deterministic FPDF corpus: doc i has 2 + i%3 pages of
    (base_side + i%5) x (base_side + 2 + i%4) pixels and 1 + i%4 TOC
    entries with levels alternating 1/2 and \\r-suffixed titles (so the
    normalization is exercised)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                n_pages = 2 + i % 3
                w, h = base_side + i % 5, base_side + 2 + i % 4
                pages = [
                    pixels_for_id(f"pdf-{i}/p{j}", w, h) for j in range(n_pages)
                ]
                toc = [
                    (1 + k % 2, f"Sec {i}.{k}\r", k % n_pages)
                    for k in range(1 + i % 4)
                ]
                rows.append((f"pdf-{i:06d}", encode_pdf(pages, toc)))
            yield pd.DataFrame(rows, columns=["doc_id", "bytes"])

    n_parts = max(2, min(16, n_docs // 25 or 2))
    return spark.range(0, n_docs, numPartitions=n_parts).mapInPandas(
        gen, "doc_id string, bytes binary"
    )

def generate_pdf_meta(spark: SparkSession, n_docs: int = 50) -> DataFrame:
    """Deterministic per-doc text-layout metadata for the candidate-title
    ladder (operators.titles): font-size spans, a document-info dict and
    a filename, keyed like ``generate_pdfs``. Doc i cycles the ladder's
    four outcomes: i%4==0 an <h1> span title (+ long filename -> two
    candidates), 1 info-dict title only, 2 long filename only, 3 nothing
    qualifying. The expected candidates are pure string formulas of i, so
    the SQL oracle re-derives them without re-running the algorithm."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                m = i % 4
                body = [
                    {"block": 1, "line": j, "size": 10.0, "text": f"body {i} line {j}"}
                    for j in range(3)
                ]
                if m == 0:
                    spans = [
                        {"block": 0, "line": 0, "size": 20.0,
                         "text": f"Synthetic Study {i} Of Deterministic Corpora"}
                    ] + body
                    info = {"producer": "synthetic"}
                    fname = f"a-very-long-deterministic-filename-{i:06d}.pdf"
                elif m == 1:
                    spans = body
                    info = {"Title": f"Archived Report {i} With Many Words"}
                    fname = f"r{i}.pdf"
                elif m == 2:
                    spans = body
                    info = {"title": "short"}
                    fname = f"a-very-long-deterministic-filename-{i:06d}.pdf"
                else:
                    spans = body
                    info = {}
                    fname = f"x{i}.pdf"
                rows.append((f"pdf-{i:06d}", spans, info, fname))
            yield pd.DataFrame(rows, columns=["doc_id", "spans", "info", "filename"])

    n_parts = max(2, min(16, n_docs // 25 or 2))
    return spark.range(0, n_docs, numPartitions=n_parts).mapInPandas(
        gen,
        "doc_id string, "
        "spans array<struct<block:int,line:int,size:double,text:string>>, "
        "info map<string,string>, filename string",
    )
