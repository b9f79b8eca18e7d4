"""Property-based tests (hypothesis) for the Draft.js string-surgery
primitives — the offset splicer and style-range merge must hold for ANY
well-formed input, not just the goldens."""

from hypothesis import given, settings
from hypothesis import strategies as st

from literature_crawler_spark.operators import draftjs as dj


@st.composite
def text_with_disjoint_spans(draw):
    text = draw(st.text(min_size=0, max_size=60))
    n = len(text)
    k = draw(st.integers(min_value=0, max_value=4))
    cuts = sorted(draw(st.lists(st.integers(0, n), min_size=2 * k, max_size=2 * k)))
    spans = [(cuts[2 * i], cuts[2 * i + 1]) for i in range(k)]
    spans = [(a, b) for a, b in spans if a < b]
    # drop touching duplicates so spans are strictly disjoint
    out, last_end = [], -1
    for a, b in spans:
        if a >= last_end:
            out.append((a, b))
            last_end = b
    repl = {s: draw(st.one_of(st.none(), st.text(max_size=10))) for s in out}
    return text, repl


@given(text_with_disjoint_spans())
@settings(max_examples=200, deadline=None)
def test_splice_reconstruction(case):
    """splice == manual cut-and-paste for any disjoint span set; with no
    replacements it is the identity."""
    text, repl = case
    got = dj.splice(repl, text)
    expected, cur = [], 0
    for (a, b) in sorted(repl, key=lambda s: s[0]):
        expected.append(text[cur:a])
        expected.append(repl[(a, b)] or "")
        cur = b
    expected.append(text[cur:])
    assert got == "".join(expected)
    assert dj.splice({}, text) == text


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "offset": st.integers(0, 50),
                "length": st.integers(1, 20),
                "style": st.sampled_from(["bold", "italic", "sup", "sub", "UNDERLINE"]),
            }
        ),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_merge_style_ranges_properties(ranges):
    """Merging never invents spans, only collapses co-located bold+italic;
    the (offset, length) span multiset is preserved up to that collapse."""
    merged = dj.merge_style_ranges(ranges)
    in_spans = {(r["offset"], r["length"]) for r in ranges}
    assert {(r["offset"], r["length"]) for r in merged} <= in_spans
    for r in merged:
        span_styles = {
            x["style"] for x in ranges
            if (x["offset"], x["length"]) == (r["offset"], r["length"])
        }
        if r["style"] == "bold_italic":
            assert {"bold", "italic"} <= span_styles
        else:
            assert r["style"] in span_styles
    # idempotence: merging the merged output changes nothing
    assert sorted(dj.merge_style_ranges(merged), key=str) == sorted(merged, key=str)


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_escape_markdown_roundtrip_safety(text):
    escaped = dj.escape_markdown(text)
    assert escaped.replace("\\#", "#").replace("\\~", "~").replace("\\$", "$") == text
    for ch in ("#", "~", "$"):
        # every occurrence is escaped
        assert escaped.count(ch) == escaped.count("\\" + ch)


@given(st.lists(st.tuples(st.integers(1, 4), st.text(max_size=12), st.integers(0, 9)), max_size=12))
@settings(max_examples=100, deadline=None)
def test_toc_tree_preserves_all_entries(flat):
    """Nesting never drops or duplicates TOC entries."""
    from literature_crawler_spark.sources import pdf as P

    tree = P.toc_tree(list(flat))

    def count(nodes):
        return sum(1 + count(n["children"]) for n in nodes)

    assert count(tree) == len(flat)
