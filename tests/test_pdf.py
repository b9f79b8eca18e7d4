"""PDF source: FPDF codec round-trip, TOC normalization/nesting (the
reference get_bookmarks pure logic), raster dims, Spark fan-out."""

import json

import pytest

import numpy as np

from literature_crawler_spark.operators.images import decode_image, pixels_for_id
from literature_crawler_spark.sources import pdf as P


def _sample():
    pages = [pixels_for_id(f"t/p{j}", 10, 8) for j in range(3)]
    toc = [(1, "Intro\r", 0), (2, "Setup", 1), (2, "Run", 1), (1, "Results", 2)]
    return P.encode_pdf(pages, toc), pages, toc


def test_codec_round_trip():
    blob, pages, toc = _sample()
    dec = P.decode_pdf(blob)
    assert dec is not None
    got_toc, got_pages = dec
    assert got_toc == toc
    assert len(got_pages) == 3
    px, w, h, fmt = decode_image(got_pages[0])
    assert (w, h, fmt) == (10, 8, "png") and np.array_equal(px, pages[0])
    assert P.decode_pdf(b"garbage") is None
    assert P.decode_pdf(None) is None


def test_toc_normalize_and_tree():
    _, _, toc = _sample()
    flat = P.normalize_toc(toc)
    assert flat[0]["title"] == "Intro"  # trailing \r stripped
    tree = P.toc_tree(toc)
    assert [n["title"] for n in tree] == ["Intro", "Results"]
    assert [n["title"] for n in tree[0]["children"]] == ["Setup", "Run"]
    assert tree[0]["children"][0]["page"] == 1


def test_raster_dims_match_fitz_arithmetic():
    assert P.raster_dims(10, 8) == (25, 20)
    assert P.raster_dims(13, 15) == (32, 37)  # int(13*2.5)=32, int(15*2.5)=37


def test_spark_toc_and_raster(spark):
    pdfs = P.generate_pdfs(spark, 12)
    toc = {r.doc_id: r for r in P.extract_toc(pdfs, "bytes", "doc_id").collect()}
    assert len(toc) == 12
    r5 = toc["pdf-000005"]  # i=5: 2+5%3=4 pages, 1+5%4=2 toc entries
    assert r5.n_pages == 4 and r5.n_toc == 2
    assert r5.toc_titles == "Sec 5.0|Sec 5.1" and r5.max_level == 2
    tree = json.loads(r5.toc_tree)
    assert tree[0]["title"] == "Sec 5.0" and tree[0]["children"][0]["title"] == "Sec 5.1"

    pages = P.rasterize_pdf_pages(pdfs, "bytes", "doc_id").collect()
    by_doc = {}
    for r in pages:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc["pdf-000005"]) == 4
    p0 = min(by_doc["pdf-000005"], key=lambda r: r.page_id)
    # i=5: page w=12+0=12, h=14+1=15 -> raster int(12*2.5)=30, int(15*2.5)=37
    assert (p0.page_w, p0.page_h) == (30, 37)
    px, w, h, _ = decode_image(bytes(p0.png))
    assert (w, h) == (30, 37) and px is not None


def test_real_pdf_raster_when_fitz_present(spark):
    """Real-PDF twin of the raster/TOC stages through PyMuPDF wherever it
    exists (skips cleanly in this sandbox): a generated real PDF's pages
    rasterize at the scale-matrix dimensions and its bookmarks surface
    through extract_toc."""
    fitz = pytest.importorskip("fitz")
    doc = fitz.open()
    for i in range(2):
        page = doc.new_page(width=72, height=90)
        page.insert_text((10, 20), f"page {i}")
    doc.set_toc([[1, "Intro", 1], [2, "Detail", 2]])
    blob = doc.tobytes()
    doc.close()

    df = spark.createDataFrame(
        [("real-1", bytearray(blob))], "doc_id string, bytes binary"
    )
    pages = P.rasterize_pdf_pages(df, "bytes", "doc_id", scale=2.0).collect()
    assert len(pages) == 2
    assert all(p.page_w == 144 and p.page_h == 180 for p in pages)
    toc = P.extract_toc(df, "bytes", "doc_id").collect()[0]
    assert toc.n_pages == 2 and toc.n_toc == 2
    assert toc.toc_titles == "Intro|Detail" and toc.max_level == 2
