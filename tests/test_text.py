"""Text-analysis expressions: tokens, quality, lang-id, shingles, fingerprints."""

from pyspark.sql import functions as F

from literature_crawler_spark.functions import text as tx


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("   ",), ("one",)], ["t"])
    got = [r[0] for r in df.select(tx.token_count(F.col("t"))).collect()]
    assert got == [3, 0, 0, 1]


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], ["t"])
    got = [r[0] for r in df.select(tx.char_ngrams(F.col("t"), 3)).collect()]
    assert got[0] == ["abc", "bcd", "cde", "def"]
    assert got[1] == ["ab"]


def test_lang_id(spark):
    cases = [
        ("the cat and the dog of the house is big", "en"),
        ("der hund und die katze ist nicht hier", "de"),
        ("le chat et la maison est grande les deux", "fr"),
        ("el gato es una maravilla que corre", "es"),
        ("xyzzy plugh", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["t"])
    got = [r[0] for r in df.select(tx.lang_id(F.col("t"))).collect()]
    assert got == [want for _, want in cases]


def test_quality_score_ordering(spark):
    good = "The experiment was repeated three times and the results of the analysis " * 5
    bad = "@@@@ #### !!!! %%%%"
    df = spark.createDataFrame([(good,), (bad,)], ["t"])
    g, b = [r[0] for r in df.select(tx.quality_score(F.col("t"))).collect()]
    assert g > 0.7 and b < 0.2


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("  HELLO WORLD  ",), ("different",)], ["t"]
    )
    got = [r[0] for r in df.select(tx.fingerprint64(F.col("t"))).collect()]
    assert got[0] == got[1] == got[2] != got[3]


def test_html_extraction(spark):
    from literature_crawler_spark.functions import html as H

    doc = (
        "<html><head><TITLE>A  Title\n here</TITLE>"
        '<meta name="description" content="desc text">'
        '<script type="application/ld+json"> {"x": 1} </script>'
        "<style>p {color: red}</style></head>"
        '<body><p>Hello <b>world</b></p><a href="https://a.org/1">l1</a>'
        '<a href="#frag">skip</a><a href=\'/rel\'>l2</a></body></html>'
    )
    df = spark.createDataFrame([(doc,), ("<html><body>no meta</body></html>",)], ["html"])
    rows = df.select(
        H.extract_title(F.col("html")).alias("t"),
        H.extract_meta(F.col("html"), "description").alias("d"),
        H.extract_links(F.col("html")).alias("l"),
        H.extract_ld_json(F.col("html")).alias("j"),
        H.strip_tags(F.col("html")).alias("v"),
    ).collect()
    r = rows[0]
    assert r.t == "A Title here"
    assert r.d == "desc text"
    assert r.l == ["https://a.org/1", "/rel"]  # '#frag' excluded
    assert r.j == '{"x": 1}'
    assert r.v == "A Title here Hello world l1 skip l2"
    r2 = rows[1]
    assert r2.t is None and r2.d is None and r2.l == [] and r2.j is None
    assert r2.v == "no meta"


def test_clean_struct_extraction(spark):
    """Authors/refs/related typed struct extraction (functions/clean.py):
    field nulls mirror the reference's find(...)-is-None branches."""
    from pyspark.sql import functions as F

    from literature_crawler_spark.functions import clean as cl

    html = (
        '<html><body>'
        '<div class="author-info accordion-tabbed__content">'
        '<p class="author-name">Jane Doe</p>'
        '<a class="sm-account__link" title="Link to email address"><span>j@x.org</span></a>'
        '<a class="sm-account__link icon-orcid"><span>0000-0002-1</span></a></div>'
        '<div class="author-info accordion-tabbed__content">'
        '<p class="author-name">No Links</p></div>'
        '<li class="c-article-references__item js-y">'
        '<a data-doi="10.1/a" href="https://doi.org/10.1%2Fa">GS</a>'
        '<p class="c-article-references__text">Doe 2020</p></li>'
        '<a class="c-article-recommendations-card__link" href="/doi/full/10.1/b" '
        'data-track-label="10.1/b">More work</a>'
        '<div id="Abs2-content"><li> point one </li><li>point two</li></div>'
        '</body></html>'
    )
    df = spark.createDataFrame([(html,)], ["html"])
    row = df.select(
        cl.extract_authors(F.col("html")).alias("a"),
        cl.extract_references(F.col("html")).alias("r"),
        cl.extract_related(F.col("html")).alias("rel"),
        cl.extract_key_points(F.col("html")).alias("kp"),
    ).collect()[0]
    assert [a.asDict() for a in row.a] == [
        {"name": "Jane Doe", "email": "j@x.org", "orcid": "0000-0002-1"},
        {"name": "No Links", "email": None, "orcid": None},
    ]
    assert [r.asDict() for r in row.r] == [
        {"doi": "10.1/a", "uri": "https://doi.org/10.1/a", "ref_text": "Doe 2020"}
    ]
    assert [r.asDict() for r in row.rel] == [
        {"title": "More work", "uri": "/doi/full/10.1/b", "doi": "10.1/b"}
    ]
    assert list(row.kp) == ["point one", "point two"]


def test_clean_abstract_issue_attachments(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from literature_crawler_spark.functions import clean as cl

    html = (
        '<html><meta content="42" name="citation_issue">'
        '<div id="Abs1-content"><p>We  present</p> a <b>method</b>.</div>'
        '<div id="Abs2-content"><li>kp</li></div></html>'
    )
    doc_schema = T.ArrayType(T.StructType([
        T.StructField("ofn", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("url", T.StringType()),
    ]))
    df = spark.createDataFrame(
        [(html, [("nice.pdf", "x1.pdf", "https://e/1.pdf"), ("", "fb.pdf", "https://e/2.pdf")])],
        T.StructType([T.StructField("html", T.StringType()), T.StructField("docs", doc_schema)]),
    )
    row = df.select(
        cl.extract_abstract(F.col("html")).alias("ab"),
        cl.extract_issue(F.col("html")).alias("iss"),
        cl.document_attachment_attrs(F.col("docs")).alias("att"),
    ).collect()[0]
    assert row.ab == "We present a method ."
    assert row.iss == "42"
    assert [a.asDict() for a in row.att] == [
        {"name": "nice.pdf", "uri": "https://e/1.pdf"},
        {"name": "fb.pdf", "uri": "https://e/2.pdf"},
    ]


def test_content_thirds_matches_reference_slices(spark):
    """Exact parity with the reference content_split (text_deal.py:24-32)
    on every remainder class, including the rem==1 quirk where part2 is
    one char SHORT of a third ('abcd' -> ('ab', '', 'cd'))."""

    def ref_split(text):  # transcription of the reference formula
        third = len(text) // 3
        rem = len(text) % 3
        p1 = text[: third + (1 if rem > 0 else 0)]
        p2 = text[third + (1 if rem > 0 else 0): 2 * third + (1 if rem > 1 else 0)]
        p3 = text[2 * third + (1 if rem > 1 else 0):]
        return p1, p2, p3

    samples = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
               "x" * 10, "abcdefghijk"]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    t = tx.content_thirds(F.col("text"))
    got = {
        r.text: (r.p1, r.p2, r.p3)
        for r in df.select(
            "text", t["p1"].alias("p1"), t["p2"].alias("p2"), t["p3"].alias("p3")
        ).collect()
    }
    for s in samples:
        assert got[s] == ref_split(s), (s, got[s], ref_split(s))
    assert got["abcd"] == ("ab", "", "cd")
