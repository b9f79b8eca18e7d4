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
