"""Arrow-UDF fetch stage: retry ladder, synthetic fetcher fidelity, and
join-path vs UDF-path engine equivalence."""

from pyspark.sql import functions as F

from literature_crawler_spark.operators import fetch as fe
from literature_crawler_spark.plans.crawl import CrawlEngine
from literature_crawler_spark.plans.state import SnapshotStore
from literature_crawler_spark.sources import synthetic as syn

N_PAGES, N_HOSTS = 200, 6


def _scheduled(spark, ids):
    rows = [(syn._url_of_index(i, N_HOSTS), f"h{syn._host_of_index(i, N_HOSTS)}.example.org", i % 4) for i in ids]
    return spark.createDataFrame(rows, "canon_url string, host string, salt int")


def test_fetch_extract_matches_corpus(spark):
    pages = {r.url: r for r in syn.generate_pages(spark, N_PAGES, N_HOSTS, with_images=False).collect()}
    sched = _scheduled(spark, range(0, 60))
    out = fe.fetch_extract(sched, fe.make_synthetic_fetcher(N_PAGES, N_HOSTS)).collect()
    assert len(out) == 60
    for r in out:
        assert r.fetch_status == "fetched" and r.attempts == 1
        p = pages[r.canon_url]
        assert r.caption == p.caption and r.links == p.links and r.image_id == p.image_id


def test_fetch_retry_ladder_and_poisoned_urls(spark):
    sched = _scheduled(spark, range(0, 30)).unionByName(
        spark.createDataFrame(
            [("https://h1.example.org/page/99999", "h1.example.org", 0),
             ("https://nowhere.example.net/x", "nowhere.example.net", 1)],
            "canon_url string, host string, salt int",
        )
    )
    flaky = fe.make_synthetic_fetcher(N_PAGES, N_HOSTS, fail_every=3)
    out = {r.canon_url: r for r in fe.fetch_extract(sched, flaky, retries=3).collect()}
    for i in range(30):
        r = out[syn._url_of_index(i, N_HOSTS)]
        assert r.fetch_status == "fetched"
        assert r.attempts == (2 if i % 3 == 0 else 1)  # transient failure retried
    # out-of-corpus URLs are marked, never crash the task
    assert out["https://h1.example.org/page/99999"].fetch_status == "missing"
    assert out["https://nowhere.example.net/x"].fetch_status == "missing"

    def always_down(url):
        return None

    dead = fe.fetch_extract(_scheduled(spark, [1]), always_down, retries=3).collect()[0]
    assert dead.fetch_status == "error" and dead.attempts == 3


def test_engine_udf_fetch_equals_join_fetch(spark, tmp_path):
    corpus = {
        "pages": syn.generate_pages(spark, N_PAGES, N_HOSTS, with_images=False),
        "seeds": syn.generate_seeds(spark, 20, N_PAGES, N_HOSTS),
        "robots": syn.generate_robots(spark),
        "politeness": syn.generate_politeness(spark, N_HOSTS),
    }

    def run(path, fetcher):
        eng = CrawlEngine(
            spark, SnapshotStore(path), corpus["pages"], corpus["robots"],
            corpus["politeness"], fetcher=fetcher,
        )
        eng.run(corpus["seeds"], max_waves=2)
        seen = {r.canon_url for r in eng.seen().collect()}
        order = [(r.wave, r.seq, r.canon_url) for r in eng.crawl_order().orderBy("wave", "seq").collect()]
        return seen, order

    join_state = run(str(tmp_path / "join"), None)
    udf_state = run(str(tmp_path / "udf"), fe.make_synthetic_fetcher(N_PAGES, N_HOSTS))
    assert join_state == udf_state


def test_two_phase_schedule_equals_single(spark):
    """schedule_wave(two_phase=True) — the skew-proof sharded quota rank —
    must produce the IDENTICAL scheduled set and host_rank values as the
    single-window rank (union-of-shard-top-Bs containment property)."""
    from pyspark.sql import functions as F

    from literature_crawler_spark.operators import frontier as fr
    from literature_crawler_spark.operators import politeness as pol

    cand = fr.canonicalize_candidates(
        spark.range(30000).selectExpr(
            "id",
            "concat('https://h', cast(id % 23 as string), '.example.org/p/', cast(id as string)) as url",
        )
    )
    pending = cand.select(
        "canon_url", "url_hash", "host",
        (F.col("id") % 3).alias("priority"), F.col("id").alias("seq"),
    )
    politeness = spark.createDataFrame(
        [(f"h{k}.example.org", 100, 5 + k % 9) for k in range(23)],
        "host string, min_interval_ms int, budget_per_wave int",
    )
    one = {(r.host, r.host_rank, r.canon_url)
           for r in pol.schedule_wave(pending, politeness, two_phase=False).collect()}
    two = {(r.host, r.host_rank, r.canon_url)
           for r in pol.schedule_wave(pending, politeness, two_phase=True).collect()}
    assert one == two and len(one) > 0
