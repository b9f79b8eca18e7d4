"""pdf2doi golden corpus: standardise_doi + the extraction ladder against
the reference's own test set (test DATA ported from
app/service/pdf2doi/test_patterns.py:8-70, which VERDICT r01 names as the
golden set; the implementations under test are the engine's Spark Column
expressions in functions/urls.py)."""

from pyspark.sql import functions as F

from literature_crawler_spark.functions import urls

BASIC_DOIS = [
    "10.1006/jmrb.1993.1004",
    "10.1068/p080244",
    "10.2307/357448",
    "10.1002/cber.19260590832",
    "10.1016/0141-4607(85)90047-2",
    "10.1016/j.gaitpost.2009.07.035",
    "10.1109/sibgrapi.2012.5",
    "10.1111/j.1532-5415.2012.04014.x",
    "10.2307/3950104",
    "10.1002/esp.3322",
]

SEPARATOR_VARIANTS = (
    [(d.replace("/", ":"), d) for d in BASIC_DOIS]
    + [(d.replace("/", " "), d) for d in BASIC_DOIS]
    + [(f"[{d.replace('/', ']')}", d) for d in BASIC_DOIS]
)

STANDARDISE_CASES = [
    ("10.1177:0146167297234003", "10.1177/0146167297234003"),
    ("10.1109/CVPR.2016.90.", "10.1109/cvpr.2016.90"),
    *SEPARATOR_VARIANTS,
]

LADDER_CASES = [
    *[(d, d) for d in BASIC_DOIS],
    ("10.1109/sp.2011.40", "10.1109/sp.2011.40"),
    ("doi10.1177:0146167297234003", "10.1177/0146167297234003"),
    ("10.1177:0146167297234003.pdf", "10.1177/0146167297234003.pdf"),
    (
        "https://journals.sagepub.com/doi/pdf/10.1177/0146167297234003",
        "10.1177/0146167297234003",
    ),
    ("https://doi.org/10.1109/sp.2011.40", "10.1109/sp.2011.40"),
    # protocols.io fast path (ladder tier -1 in the reference)
    ("see dx.doi.org/10.17504/protocols.io.abc12x/v2 here", "10.17504/protocols.io.abc12x/v2"),
]


def _run(spark, cases, expr):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i int, s string")
    got = {r.i: r.out for r in df.select("i", expr(F.col("s")).alias("out")).collect()}
    return [got[i] for i in range(len(cases))]


def test_standardise_doi_corpus(spark):
    got = _run(spark, STANDARDISE_CASES, urls.standardise_doi)
    for (suspected, expected), actual in zip(STANDARDISE_CASES, got):
        assert actual == expected, suspected


def test_standardise_doi_rejects_garbage(spark):
    cases = [("not a doi", None), ("10.x/y", None), ("", None)]
    got = _run(spark, cases, urls.standardise_doi)
    assert got == [None, None, None]


def test_extraction_ladder_corpus(spark):
    got = _run(spark, LADDER_CASES, urls.extract_doi_ladder)
    for (suspected, expected), actual in zip(LADDER_CASES, got):
        assert actual == expected, suspected


# arXiv golden cases authored from the reference regexps + replacement
# semantics (pdf2doi/patterns.py:60-72 arxiv_regexp;
# finders.py:189-213,341-346,668-687). The reference's own test file has
# no arXiv rows, so these pin the ported grammar directly.
ARXIV_CASES = [
    ("arXiv:2103.12345 rest", "2103.12345"),           # v0, space term
    ("arxiv : 2103.12345v2\n", "2103.12345"),          # v0, version tag
    ('see arXiv:2103.12345"', "2103.12345"),           # v0, quote term
    ("paper 2104.00001v3.pdf", "2104.00001"),          # v1 filename form
    ("2105.09876", "2105.09876"),                      # v2 whole-string
    ("2105.09876v4", "2105.09876"),                    # v2 with version
    ("no id here", None),
    ("arXiv:123.45", None),                            # needs 4+digit YYMM
]


def test_arxiv_ladder_corpus(spark):
    got = _run(spark, ARXIV_CASES, urls.extract_arxiv_ladder)
    for (suspected, expected), actual in zip(ARXIV_CASES, got):
        assert actual == expected, suspected


IDENTIFIER_CASES = [
    # DOI always beats arXiv (find_identifier_in_text runs the full DOI
    # ladder before any arXiv tier)
    (
        "doi: 10.1109/sp.2011.40 and arXiv:2103.12345 ",
        ("10.1109/sp.2011.40", "DOI"),
    ),
    # lone arXiv ID is replaced by its arXiv DOI
    ("arXiv:2103.12345 x", ("10.48550/arXiv.2103.12345", "arxiv DOI")),
    ("nothing here", (None, None)),
]


def test_extract_identifier_corpus(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(IDENTIFIER_CASES)], "i int, s string"
    )
    ident = urls.extract_identifier(F.col("s"))
    got = {
        r.i: (r.identifier, r.identifier_type)
        for r in df.select(
            "i",
            ident["identifier"].alias("identifier"),
            ident["identifier_type"].alias("identifier_type"),
        ).collect()
    }
    for i, (suspected, expected) in enumerate(IDENTIFIER_CASES):
        assert got[i] == expected, suspected


def test_find_identifier_ladder_source_order(spark):
    """pdf-info -> filename -> text tier ordering (finders.py:627-790),
    incl. %2F unquoting and progressive extension stripping in the
    filename tier."""
    rows = [
        # pdf-info wins over filename and text
        (0, ["random junk", "doi: 10.1006/jmrb.1993.1004 "],
         "2104.00001.pdf", "arXiv:2105.00001 x",
         ("10.1006/jmrb.1993.1004", "DOI")),
        # empty info -> filename tier; %2F-unquoted whole-name DOI (kept
        # with .pdf, the reference's offline behavior)
        (1, [], "10.1227%2F12345678.pdf", "arXiv:2105.00002 x",
         ("10.1227/12345678.pdf", "DOI")),
        # filename arXiv form
        (2, [], "2104.00001v2.pdf", "doi: 10.1109/sp.2011.40 ",
         ("10.48550/arXiv.2104.00001", "arxiv DOI")),
        # no info/filename hit -> text tier
        (3, ["no ids"], "paper.notes", "arXiv:2199.00007",
         ("10.48550/arXiv.2199.00007", "arxiv DOI")),
        (4, [], "plain.txt", "nothing", (None, None)),
    ]
    df = spark.createDataFrame(
        [(i, info, fn, tx) for i, info, fn, tx, _ in rows],
        "i int, info array<string>, fn string, tx string",
    )
    out = urls.find_identifier_ladder(F.col("info"), F.col("fn"), F.col("tx"))
    got = {
        r.i: (r.identifier, r.identifier_type)
        for r in df.select(
            "i",
            out["identifier"].alias("identifier"),
            out["identifier_type"].alias("identifier_type"),
        ).collect()
    }
    for i, _info, _fn, _tx, expected in rows:
        assert got[i] == expected, i
