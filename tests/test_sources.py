"""RIS parser + synthetic corpus determinism + Bloom filter properties."""

import os

import numpy as np

from literature_crawler_spark.operators import bloom
from literature_crawler_spark.sources import ris, synthetic as syn

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample.ris")


def test_ris_parse(spark):
    recs = ris.read_ris(spark, FIXTURE).orderBy("record_id").collect()
    assert len(recs) == 3
    r0 = recs[0]
    assert r0.type == "JOUR"
    assert r0.title == "A reproducible protocol for widget assembly"
    assert r0.doi == "10.1002/cpz1.1001"
    assert r0.url == "https://example.org/articles/widget-assembly"
    assert r0.authors == ["Doe, John", "Smith, Jane"]
    assert r0.keywords == ["assembly", "widgets"]
    assert recs[2].title == "Chapter on staining methods"  # T1 fallback
    assert recs[1].keywords == ["pipelines"]


def test_synthetic_pages_deterministic(spark):
    a = syn.generate_pages(spark, 50, 5, with_images=True).orderBy("image_id").collect()
    b = syn.generate_pages(spark, 50, 5, with_images=True).orderBy("image_id").collect()
    assert [(r.url, r.caption, r.phash, bytes(r.bytes)) for r in a] == [
        (r.url, r.caption, r.phash, bytes(r.bytes)) for r in b
    ]


def test_python_corpus_mirrors_spark(spark):
    pages = syn.generate_pages(spark, 80, 7, with_images=False).collect()
    mirror = syn.python_corpus(80, 7)
    spark_side = {r.url: (r.host, list(r.links)) for r in pages}
    py_side = {v["url"]: (v["host"], v["links"]) for v in mirror.values()}
    assert spark_side == py_side


def test_bloom_no_false_negatives_and_fpp(spark):
    df = spark.range(20000).selectExpr("xxhash64(id) as h")
    bf = bloom.build_bloom(df, "h", expected_items=20000, fpp=0.01)
    members = np.array([r.h for r in df.collect()])
    assert bf.might_contain(members).all()  # zero false negatives
    rng = np.random.default_rng(7)
    probes = rng.integers(-(2**62), 2**62, size=20000)
    fresh = probes[~np.isin(probes, members)]
    fpp = bf.might_contain(fresh).mean()
    assert fpp < 0.03, fpp
