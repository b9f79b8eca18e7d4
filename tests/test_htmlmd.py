"""Golden tests for the HTML -> markdown converter with placeholder
protection (reference get_content_text_by_text,
current_protocol_clean_util.py:211-534): one test per protected
category, plus the conversion core and the Spark UDF surface."""

from literature_crawler_spark.operators import htmlmd as hm


def md(s: str) -> str:
    return hm.html_to_markdown(s)


# ------------------------------------------------------------------ core --


def test_core_headings_emphasis_links():
    out = md("<h2>Title</h2><p>a <b>bold</b> and <i>it</i> word</p>")
    assert out == "## Title\n\na **bold** and _it_ word"
    assert md('<p>see <a href="https://e.org/x">docs</a></p>') == "see [docs](https://e.org/x)"
    assert md("<p>x&amp;y &lt;3</p>") == "x&y <3"


def test_core_lists_and_code():
    assert md("<ul><li>one</li><li>two</li></ul>") == "* one\n* two"
    assert md("<p>run <code>make</code></p>") == "run `make`"
    assert md("<pre>a\nb</pre>") == "```\na\nb\n```"


def test_core_no_wrapping():
    long = "word " * 50
    assert "\n" not in md(f"<p>{long.strip()}</p>")  # body_width = 0


# ------------------------------------------------------- protected cats --


def test_sub_sup_preserved():
    out = md("<p>H<sub>2</sub>O and x<sup>2</sup></p>")
    assert out == "H<sub>2</sub>O and x<sup>2</sup>"


def test_inpage_anchor_collapses_but_real_link_stays():
    out = md('<p><a href="#sec1">Section 1</a> vs <a href="https://a.org">A</a></p>')
    assert out == "Section 1 vs [A](https://a.org)"


def test_references_and_citedby_sections_dropped():
    html = (
        "<p>keep</p>"
        '<div class="article-section article-section__references"><li>ref</li></div>'
        '<div class="article-section article-section__citedBy cited-by"><li>c</li></div>'
    )
    assert md(html) == "keep"


def test_figure_section_image_and_video():
    html = (
        '<section class="article-section__inline-figure">'
        '<img data-lg-src="https://e.org/f.png" alt="Fig 1">'
        '<div class="figure__caption figure__caption-text">A caption</div>'
        "</section>"
    )
    assert md(html) == '<img src="https://e.org/f.png" alt="A caption"  loading="lazy" title="Fig 1"/>'
    html_v = (
        '<section class="article-section__inline-figure">'
        '<a class="download-media linkBehavior" href="https://e.org/v.mp4">dl</a>'
        '<div class="figure__caption figure__caption-text">vid cap</div>'
        "</section>"
    )
    assert md(html_v) == '<video src="https://e.org/v.mp4" controls muted title="vid cap"/>'


def test_table_kept_raw_and_code_table_fenced():
    raw = '<div class="article-table-content"><table><tr><td>1</td></tr></table></div>'
    assert md(f"<p>before</p>{raw}") .startswith("before")
    assert '<div class="article-table-content">' in md(f"<p>b</p>{raw}")
    code = (
        '<div class="article-table-content"><div class="computerCode">'
        '<ul class="custom rlist"><li>x = 1</li><li>y = 2</li></ul></div></div>'
    )
    assert md(code) == "```\n\nx = 1\ny = 2\n```"


def test_inline_graphics_img():
    out = md('<p>t <img src="https://e.org/i.png" alt="InlineGraphics" title="T"> u</p>')
    assert out == (
        't\n\n<img src="https://e.org/i.png" alt="InlineGraphics"  loading="lazy" title="T"/>\n\nu'
    )
    # ordinary images without the marker are dropped by the core
    assert md('<p>t <img src="x.png" alt="plain"> u</p>') == "t  u"


def test_annotation_paragraph_becomes_note():
    out = md('<p class="annotation">be <b>careful</b> here</p>')
    assert out == '<Note title="Note" type="info">be careful here</Note>'


def test_type_a_ol_numbered_and_plain_ul():
    out = md('<ol type="a"><li>first</li><li>second</li></ol>')
    assert out == "1. first\n2. second"
    out = md('<ul class="plain-list"><li>p</li><li>q</li></ul>')
    assert out == "* p\n* q"


def test_mathjax_tex_annotation():
    html = (
        "<p>eq: <mjx-container class=\"MathJax CtxtMenu_Attached_0\">junk"
        '<annotation encoding="application/x-tex">E=mc^2</annotation>'
        "</mjx-container></p>"
    )
    assert "E=mc^2" in md(html)
    assert "junk" not in md(html)


def test_null_passthrough():
    assert hm.html_to_markdown(None) is None


# ------------------------------------------------------------ Spark UDF --


def test_convert_documents_udf(spark):
    df = spark.createDataFrame(
        [(1, "<h1>T</h1><p>a <b>b</b></p>"), (2, None)], "doc_id int, html string"
    )
    rows = {r.doc_id: r.content_md for r in hm.convert_documents(df, "html").collect()}
    assert rows[1] == "# T\n\na **b**"
    assert rows[2] is None


# --------------------------------------------- tag-grammar regressions --


def test_br_body_not_swallowed_by_emphasis():
    """<br>/<body>/<blockquote> must not parse as a bold-open (and
    <img>/<iframe> not as italic): the emphasis regex needs a word
    boundary after the tag name or everything up to the next close tag
    is swallowed into one ** span."""
    out = md("<p>line one<br>line two</p><p>end <b>bold</b> tail</p>")
    assert "**bold**" in out and "line two" in out and "**line" not in out
    out2 = md("<body><p>pic <img src='x'> here <i>it</i></p></body>")
    assert "_it_" in out2 and "**" not in out2


def test_nested_placeholder_restores():
    """A sub/sup shielded BEFORE a table div that contains it must still
    restore — placeholder restore walks newest-first so outer regions
    expand before the placeholders nested inside them."""
    out = md(
        '<div class="article-table-content"><table><tr><td>'
        "H<sub>2</sub>O</td></tr></table></div>"
    )
    assert "\x00" not in out
    assert "<sub>2</sub>" in out


def test_reference_section_with_nested_divs_fully_dropped():
    """deal_section semantics: the references div is removed as a TREE
    (BeautifulSoup decompose) — nested inner divs must not cut the drop
    short and leak reference text into the article."""
    out = md(
        '<div class="article-section article-section__references">'
        "<div>Ref 1 text</div><div>Ref 2 text</div></div><p>real content</p>"
    )
    assert out == "real content"


def test_table_shield_spans_nested_divs():
    """A table wrapper containing inner divs shields the WHOLE region
    verbatim, not just up to the first inner close."""
    html = (
        '<div class="article-table-content"><div class="inner">'
        "<table><tr><td>cell <b>x</b></td></tr></table></div></div>after"
    )
    out = md(html)
    assert "<b>x</b>" in out  # raw HTML preserved, not converted to **x**
    assert out.endswith("after")
