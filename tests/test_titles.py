"""Candidate-title finder: parity with a direct transcription of the
reference algorithm (find_title_via_pymupdf.py fonts/font_tags/
headers_para + finders.py:390-444 find_possible_titles), including the
preserved quirks (char-set lstrip, doubled text after a pipes-only
block, idx tag walk)."""

from operator import itemgetter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from literature_crawler_spark.operators import titles as ti


# --- transcription of the reference pipeline over (block, line, size,
# text) span streams — the oracle the port must match exactly. Mirrors
# find_title_via_pymupdf.py with fitz's nested dict replaced by the same
# nesting rebuilt from the flat tuples.
def _ref_title(spans):
    if not spans:
        return None
    styles, font_counts = {}, {}
    for _b, _l, size, _t in spans:
        identifier = "{0}".format(size)
        styles[identifier] = {"size": size}
        font_counts[identifier] = font_counts.get(identifier, 0) + 1
    font_counts = sorted(font_counts.items(), key=itemgetter(1), reverse=True)
    p_size = styles[font_counts[0][0]]["size"]
    font_sizes = sorted({s for _b, _l, s, _t in spans}, reverse=True)
    idx, size_tag = 0, {}
    for size in font_sizes:
        idx += 1
        if size == p_size:
            idx = 0
            size_tag[size] = "<p>"
        if size > p_size:
            size_tag[size] = "<h{0}>".format(idx)
        elif size < p_size:
            size_tag[size] = "<s{0}>".format(idx)
    # rebuild block -> line nesting in document order
    blocks, order = {}, []
    for b, l, s, t in spans:
        if b not in blocks:
            blocks[b] = {}
            order.append(b)
        blocks[b].setdefault(l, []).append((s, t))
    header_para, first, previous, block_string = [], True, None, ""
    for b in order:
        block_string = ""
        for l in sorted(blocks[b]):
            for s, t in blocks[b][l]:
                if t.strip():
                    if first:
                        previous = s
                        first = False
                        block_string = size_tag[s] + t
                    else:
                        if s == previous:
                            if block_string and all(c == "|" for c in block_string):
                                block_string = size_tag[s] + t
                            if block_string == "":
                                block_string = size_tag[s] + t
                            else:
                                block_string += " " + t
                        else:
                            header_para.append(block_string)
                            block_string = size_tag[s] + t
                        previous = s
            block_string += "|"
        header_para.append(block_string)
    for e in header_para:
        if e.startswith("<h1>"):
            return (e.lstrip("<h1>")).replace("|", "")
    return None


span_streams = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 2),
        st.sampled_from([8.0, 10.0, 12.0, 20.0, 24.0]),
        st.text(alphabet="ab h1<>| .", max_size=8),
    ),
    max_size=25,
).map(lambda sp: sorted(sp, key=lambda x: (x[0], x[1])))


@settings(max_examples=300, deadline=None)
@given(span_streams)
def test_title_from_spans_matches_reference(spans):
    assert ti.title_from_spans(spans) == _ref_title(spans)


def test_h1_pick_and_lstrip_quirk():
    spans = [
        (0, 0, 20.0, "1101 Ways To Title A Paper"),
        (1, 0, 10.0, "body text one"),
        (1, 1, 10.0, "body text two"),
    ]
    # char-set lstrip eats BOTH leading '1's (chars in {<,h,1,>}) before
    # stopping at the '0' — quirk preserved
    assert ti.title_from_spans(spans) == "01 Ways To Title A Paper"
    spans[0] = (0, 0, 20.0, "Safe Title Of Many Words")
    assert ti.title_from_spans(spans) == "Safe Title Of Many Words"


def test_no_h1_when_biggest_font_is_modal():
    spans = [(0, 0, 20.0, "big but everywhere"), (0, 1, 20.0, "also big"),
             (1, 0, 10.0, "small once")]
    assert ti.title_from_spans(spans) is None  # 20.0 is the paragraph size


def test_find_possible_titles_ladder():
    h1_spans = [
        (0, 0, 20.0, "Span Title With Enough Length"),
        (1, 0, 10.0, "p"), (1, 1, 10.0, "q"),
    ]
    info = {"Title": "Info Title With More Than Three Words", "dc:title": "short"}
    long_fn = "a-filename-that-is-definitely-long-enough.pdf"
    # tier order: pdftitle > spans > info > filename; order-preserving dedup
    got = ti.find_possible_titles("Pdftitle Found This One", h1_spans, info, long_fn)
    assert got == [
        "Pdftitle Found This One",
        "Span Title With Enough Length",
        "Info Title With More Than Three Words",
        long_fn,
    ]
    # thresholds: <=12 chars dropped; info needs >3 words; filename >30
    assert ti.find_possible_titles("tiny", [], {"title": "Four Words But Short"}, "x.pdf") == [
        "Four Words But Short"
    ]
    assert ti.find_possible_titles(None, [], {"title": "TwoWords Only Here x"}, None) == [
        "TwoWords Only Here x"
    ]
    assert ti.find_possible_titles(None, [], {"title": "NoSpacesHereAtAllForThis"}, None) == []
    assert ti.find_possible_titles(None, [], None, "short.pdf") == []
    # duplicates collapse, first position wins
    assert ti.find_possible_titles(
        "Info Title With More Than Three Words", [], info, None
    ) == ["Info Title With More Than Three Words"]


def test_possible_titles_udf(spark):
    from literature_crawler_spark.sources import pdf as pdfsrc

    meta = pdfsrc.generate_pdf_meta(spark, 12)
    out = {
        r.doc_id: list(r.candidate_titles)
        for r in ti.with_possible_titles(meta).collect()
    }
    for i in range(12):
        doc_id = f"pdf-{i:06d}"
        m = i % 4
        if m == 0:
            assert out[doc_id] == [
                f"Synthetic Study {i} Of Deterministic Corpora",
                f"a-very-long-deterministic-filename-{i:06d}.pdf",
            ]
        elif m == 1:
            assert out[doc_id] == [f"Archived Report {i} With Many Words"]
        elif m == 2:
            assert out[doc_id] == [f"a-very-long-deterministic-filename-{i:06d}.pdf"]
        else:
            assert out[doc_id] == []
