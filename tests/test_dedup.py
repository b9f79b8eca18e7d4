"""Dedup suite: exact, MinHash-LSH vs exact-Jaccard oracle, SimHash."""

import pytest
from pyspark.sql import functions as F

from literature_crawler_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today", 1),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today!", 2),  # near-dup of 1
    (3, "completely unrelated text about spark dataframes and shuffle partitions", 3),
    (4, "The Quick Brown Fox jumps over the lazy dog near the river bank today", 4),  # case-dup of 1
    (5, "another document discussing politeness budgets for web crawl scheduling", 5),
    (6, "the quick brown fox jumps over the lazy dog near the river bank today", 6),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "ord"])


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 4, 6]  # case-normalized fingerprint


def test_dedup_keep_first(docs):
    kept = dedup.dedup_exact_keep_first(docs, "text", "ord")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 3, 5]


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8
    assert (1, 4) in pairs and (1, 6) in pairs
    assert not any(3 in p or 5 in p for p in pairs)


def test_lsh_agrees_with_exact_jaccard(docs):
    """Every LSH pair's Jaccard must equal the exact exploded-join Jaccard."""
    lsh = {(r.id_a, r.id_b): r.jaccard for r in dedup.minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.3).collect()}
    exact = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect()}
    for pair, j in lsh.items():
        assert abs(exact[pair] - j) < 1e-6
    # LSH is allowed to miss pairs, never to invent them
    assert set(lsh) <= set(exact)


def test_simhash_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_near_dups(docs, "text", "doc_id", max_hamming=4).collect()}
    assert (1, 6) in pairs  # identical token stream
    assert (1, 4) in pairs  # case-folded tokens identical
    assert not any((3 in p or 5 in p) for p in pairs)


def test_exact_dedup_on_documents_table(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = dedup.dedup_exact_keep_first(df, "text", "doc_id").count()
    assert 0 < kept <= df.count()
