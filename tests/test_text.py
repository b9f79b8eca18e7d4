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
