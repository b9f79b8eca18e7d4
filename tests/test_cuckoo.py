"""Cuckoo-filter seen store: table semantics, store lifecycle, engine wiring.

The invariant under test everywhere: NO FALSE NEGATIVES for inserted keys
(a false negative re-crawls a seen URL — the correctness failure the
north rule's dedup exists to prevent). False positives are allowed and
bounded; deletes must remove only what was inserted.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from literature_crawler_spark.operators import cuckoo as ck
from literature_crawler_spark.operators.cuckoo import (
    BucketedCuckooStore,
    CuckooOverflow,
    _Table,
    rows_for,
)


def _hashes(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


# ------------------------------------------------------------- unit ----
class TestTable:
    def test_no_false_negatives_at_high_load(self):
        h = _hashes(3000)
        t = _Table(np.zeros((rows_for(3000), ck.SLOTS), dtype=np.uint16))
        assert t.insert_batch(h) == 0
        assert t.contains(h).all()

    def test_false_positive_rate_bounded(self):
        t = _Table(np.zeros((rows_for(3000), ck.SLOTS), dtype=np.uint16))
        assert t.insert_batch(_hashes(3000, seed=1)) == 0
        probe = _hashes(200_000, seed=2)
        fpr = t.contains(probe).mean()
        # theory ~ 2*SLOTS/2^16 * load ~ 1.2e-4; allow generous slack
        assert fpr < 2e-3, fpr

    def test_eviction_path_still_exact(self):
        # tiny table forced to heavy eviction traffic (load ~0.94)
        h = _hashes(120, seed=3)
        t = _Table(np.zeros((32, ck.SLOTS), dtype=np.uint16))
        assert t.insert_batch(h) == 0
        assert t.contains(h).all()

    def test_overflow_reports_failures(self):
        t = _Table(np.zeros((4, ck.SLOTS), dtype=np.uint16))
        assert t.insert_batch(_hashes(100, seed=4)) > 0

    def test_delete_removes_only_requested(self):
        h = _hashes(2000, seed=5)
        t = _Table(np.zeros((rows_for(2000), ck.SLOTS), dtype=np.uint16))
        assert t.insert_batch(h) == 0
        gone, kept = h[:1000], h[1000:]
        assert t.delete_batch(gone) == 1000
        # the no-false-negative invariant survives deletion of OTHER keys
        assert t.contains(kept).all()
        # deleted keys drop to (near-)zero presence: only fingerprint
        # twins sharing a row pair may still read as present
        assert t.contains(gone).mean() < 0.01

    def test_alt_index_is_an_involution(self):
        m = 1 << 10
        f = ck._fingerprints(_hashes(500, seed=6))
        i = np.arange(500) % m
        alt = ck._alt_index(i, f, m)
        back = ck._alt_index(alt, f, m)
        assert (back == i).all()

    def test_fingerprints_never_zero(self):
        assert (ck._fingerprints(_hashes(100_000, seed=8)) != 0).all()


# ------------------------------------------------------------ store ----
@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(20_000).select(F.xxhash64("id").alias("url_hash"))


class TestStore:
    def test_merge_probe_roundtrip(self, spark, keys_df, tmp_path):
        st = BucketedCuckooStore.create(str(tmp_path / "c1"), expected_items=40_000)
        counts = st.merge(keys_df)
        assert sum(counts.values()) == 20_000
        probed = keys_df.withColumn("hit", st.might_contain_col(F.col("url_hash")))
        assert probed.filter(~F.col("hit")).count() == 0  # no false negatives

    def test_probe_fpr_on_fresh_keys(self, spark, keys_df, tmp_path):
        st = BucketedCuckooStore.create(str(tmp_path / "c2"), expected_items=40_000)
        st.merge(keys_df)
        fresh = spark.range(100_000, 200_000).select(F.xxhash64("id").alias("url_hash"))
        hits = fresh.withColumn("hit", st.might_contain_col(F.col("url_hash"))).filter(
            "hit"
        ).count()
        assert hits / 100_000 < 2e-3

    def test_delete_enables_reinsert_membership_flip(self, spark, keys_df, tmp_path):
        st = BucketedCuckooStore.create(str(tmp_path / "c3"), expected_items=40_000)
        st.merge(keys_df)
        victims = keys_df.filter(F.col("url_hash") % 2 == 0)
        kept = keys_df.filter(F.col("url_hash") % 2 != 0)
        removed = st.delete(victims)
        assert sum(removed.values()) == victims.count()
        # kept keys still all present; victims (mostly) retractable
        assert kept.withColumn("h", st.might_contain_col(F.col("url_hash"))).filter(
            ~F.col("h")
        ).count() == 0
        vic_hits = victims.withColumn(
            "h", st.might_contain_col(F.col("url_hash"))
        ).filter("h").count()
        assert vic_hits / max(victims.count(), 1) < 0.01

    def test_overflow_raises_and_preserves_files(self, spark, tmp_path):
        st = BucketedCuckooStore.create(
            str(tmp_path / "c4"), expected_items=64, n_buckets=4
        )
        small = spark.range(60).select(F.xxhash64("id").alias("url_hash"))
        st.merge(small)
        with pytest.raises(CuckooOverflow):
            st.merge(
                spark.range(1000, 60_000).select(F.xxhash64("id").alias("url_hash"))
            )
        # the pre-overflow contents are untouched (files were not replaced)
        assert small.withColumn("h", st.might_contain_col(F.col("url_hash"))).filter(
            ~F.col("h")
        ).count() == 0

    def test_open_roundtrip_and_watermark(self, tmp_path):
        root = str(tmp_path / "c5")
        st = BucketedCuckooStore.create(root, expected_items=1000, n_buckets=8)
        st.set_watermark(17)
        st2 = BucketedCuckooStore.open(root)
        assert st2 is not None
        assert (st2.n_buckets, st2.bucket_rows) == (st.n_buckets, st.bucket_rows)
        assert st2.watermark() == 17

    def test_open_rejects_bloom_store_root(self, tmp_path):
        from literature_crawler_spark.operators.bloom import BucketedBloomStore

        root = str(tmp_path / "c6")
        BucketedBloomStore.create(root, expected_items=1000)
        assert BucketedCuckooStore.open(root) is None


# ----------------------------------------------------------- engine ----
class TestEngineWiring:
    def test_cuckoo_crawl_equals_exact_crawl(self, spark, tmp_path):
        from literature_crawler_spark.plans.crawl import CrawlEngine
        from literature_crawler_spark.plans.state import SnapshotStore
        from literature_crawler_spark.sources import synthetic as syn

        pages = syn.generate_pages(spark, 300, 8, with_images=False)
        seeds = syn.generate_seeds(spark, 25, 300, 8)
        results = {}
        for mode in (False, "cuckoo"):
            store = SnapshotStore(str(tmp_path / f"st_{mode}"))
            eng = CrawlEngine(spark, store, pages, use_bloom=mode)
            eng.run(seeds, max_waves=3)
            results[mode] = {
                "seen": {r.canon_url for r in eng.seen().collect()},
                "order": [
                    (r.wave, r.seq, r.canon_url)
                    for r in eng.crawl_order().orderBy("seq").collect()
                ],
            }
        assert results["cuckoo"]["seen"] == results[False]["seen"]
        assert results["cuckoo"]["order"] == results[False]["order"]

    def test_retract_and_recrawl(self, spark, tmp_path):
        """Both retract modes end-to-end. requeue=True (recrawl): the URL
        KEEPS its seen/store membership — it is still in the frontier, so
        link re-discovery must keep deduping against it (removing it
        would re-admit it as 'new' with a fresh seq in the same wave as
        its outcome row) — and the next wave re-schedules it under its
        original seq. requeue=False (forget): the key leaves seen and the
        cuckoo store deletes it in place."""
        from pyspark.sql import functions as F

        from literature_crawler_spark.plans.crawl import CrawlEngine
        from literature_crawler_spark.plans.state import SnapshotStore
        from literature_crawler_spark.sources import synthetic as syn

        pages = syn.generate_pages(spark, 200, 6, with_images=False)
        seeds = syn.generate_seeds(spark, 15, 200, 6)
        store = SnapshotStore(str(tmp_path / "rt"))
        eng = CrawlEngine(spark, store, pages, use_bloom="cuckoo")
        eng.run(seeds, max_waves=2)
        order = eng.crawl_order().orderBy("seq").limit(2).collect()
        victim, victim2 = order[0], order[1]
        before = eng.seen().count()

        out = eng.retract(
            spark.createDataFrame([(victim.canon_url,)], "url string"), requeue=True
        )
        assert out == {"retracted": 0, "matched": 1, "requeued": 1}
        # membership retained: seen unchanged, store still hits — links to
        # the requeued URL keep deduping while it waits in the frontier
        assert eng.seen().count() == before
        assert (
            eng.seen().filter(F.col("canon_url") == victim.canon_url).count() == 1
        )
        probed = (
            eng.frontier()
            .filter(F.col("canon_url") == victim.canon_url)
            .withColumn("h", eng._bloom_store.might_contain_col(F.col("url_hash")))
        )
        assert probed.filter("h").count() == 1
        # next wave re-schedules the requeued row (same seq, new wave)
        next_wave = (eng.last_wave() or 0) + 1
        eng.run_wave(next_wave)
        reorder = eng.crawl_order().filter(
            (F.col("wave") == next_wave) & (F.col("canon_url") == victim.canon_url)
        )
        assert reorder.count() == 1
        assert reorder.collect()[0].seq == victim.seq

        # forget path: seen shrinks and the cuckoo store deletes in place
        before2 = eng.seen().count()  # the extra wave added new URLs
        out2 = eng.retract(
            spark.createDataFrame([(victim2.canon_url,)], "url string")
        )
        assert out2 == {"retracted": 1, "matched": 1, "requeued": 0}
        assert eng.seen().count() == before2 - 1
        assert (
            eng.seen().filter(F.col("canon_url") == victim2.canon_url).count() == 0
        )
        gone = (
            eng.frontier()
            .filter(F.col("canon_url") == victim2.canon_url)
            .withColumn("h", eng._bloom_store.might_contain_col(F.col("url_hash")))
        )
        assert gone.filter("h").count() == 0

    def test_retract_rebuilds_bloom_store(self, spark, tmp_path):
        """Bloom bitmaps cannot delete: retract must rebuild the store
        from the new seen, and the rebuilt store must still cover every
        remaining key (superset invariant)."""
        from pyspark.sql import functions as F

        from literature_crawler_spark.plans.crawl import CrawlEngine
        from literature_crawler_spark.plans.state import SnapshotStore
        from literature_crawler_spark.sources import synthetic as syn

        pages = syn.generate_pages(spark, 150, 5, with_images=False)
        seeds = syn.generate_seeds(spark, 12, 150, 5)
        store = SnapshotStore(str(tmp_path / "rb"))
        eng = CrawlEngine(spark, store, pages, use_bloom="bucketed")
        eng.run(seeds, max_waves=2)
        victim = eng.crawl_order().orderBy("seq").limit(1).collect()[0]
        out = eng.retract(
            spark.createDataFrame([(victim.canon_url,)], "url string")
        )
        assert out["retracted"] == 1
        remaining = eng.seen().withColumn(
            "h", eng._bloom_store.might_contain_col(F.col("url_hash"))
        )
        assert remaining.filter(~F.col("h")).count() == 0

    def test_engine_overflow_rebuild(self, spark, tmp_path, monkeypatch):
        """Force a tiny store so wave merges overflow: the engine must
        transparently rebuild from committed seen and still match the
        exact crawl."""
        from literature_crawler_spark.operators import cuckoo as cuckoo_mod
        from literature_crawler_spark.plans.crawl import CrawlEngine
        from literature_crawler_spark.plans.state import SnapshotStore
        from literature_crawler_spark.sources import synthetic as syn

        orig_create = cuckoo_mod.BucketedCuckooStore.create.__func__

        def tiny_create(cls, root, expected_items, n_buckets=64):
            # first creation starts absurdly small; rebuilds keep their size
            if expected_items == 2_000_000:
                expected_items = 64
            return orig_create(cls, root, expected_items, n_buckets)

        monkeypatch.setattr(
            cuckoo_mod.BucketedCuckooStore, "create", classmethod(tiny_create)
        )
        pages = syn.generate_pages(spark, 200, 6, with_images=False)
        seeds = syn.generate_seeds(spark, 20, 200, 6)
        store = SnapshotStore(str(tmp_path / "tiny"))
        eng = CrawlEngine(spark, store, pages, use_bloom="cuckoo", n_buckets=8)
        eng.run(seeds, max_waves=3)
        got = {r.canon_url for r in eng.seen().collect()}

        store2 = SnapshotStore(str(tmp_path / "exact"))
        eng2 = CrawlEngine(spark, store2, pages, use_bloom=False)
        eng2.run(seeds, max_waves=3)
        want = {r.canon_url for r in eng2.seen().collect()}
        assert got == want

    def test_adoption_refresh_capacity_is_bounded(self, spark, tmp_path):
        """A stale store (watermark behind committed seen, e.g. runs
        alternating use_bloom modes) rebuilds on adoption. The rebuild
        must size from the ACTUAL key count — slot capacity is not a
        fixed point of rows_for, so sizing from it doubled the table on
        every restart with zero key growth."""
        from pyspark.sql import functions as F

        from literature_crawler_spark.plans.crawl import CrawlEngine
        from literature_crawler_spark.plans.state import SnapshotStore
        from literature_crawler_spark.sources import synthetic as syn

        pages = syn.generate_pages(spark, 200, 6, with_images=False)
        seeds = syn.generate_seeds(spark, 15, 200, 6)
        store = SnapshotStore(str(tmp_path / "alt"))
        eng = CrawlEngine(spark, store, pages, use_bloom="cuckoo", n_buckets=8)
        eng.run(seeds, max_waves=2)
        rows0 = eng._bloom_store.bucket_rows
        sizes = []
        for _ in range(4):
            eng._bloom_store.set_watermark(-1)  # force the refresh path
            eng = CrawlEngine(spark, store, pages, use_bloom="cuckoo", n_buckets=8)
            sizes.append(eng._bloom_store.bucket_rows)
        assert set(sizes) == {sizes[0]}, f"capacity drifted across refreshes: {sizes}"
        assert sizes[0] <= rows0
        # superset invariant survives the rebuilds: every seen key probes true
        miss = (
            eng.seen()
            .withColumn("h", eng._bloom_store.might_contain_col(F.col("url_hash")))
            .filter(~F.col("h"))
            .count()
        )
        assert miss == 0

    def test_auto_upgrades_to_cuckoo_past_broadcast_ceiling(
        self, spark, tmp_path, monkeypatch
    ):
        """use_bloom='auto' self-selects the maintained cuckoo store the
        first wave after committed seen crosses BROADCAST_SEEN_MAX, and
        the upgraded crawl stays order- and seen-identical to exact mode
        — including across an engine restart (store re-adoption)."""
        from literature_crawler_spark.operators import cuckoo as cuckoo_mod
        from literature_crawler_spark.operators import frontier as fr
        from literature_crawler_spark.plans.crawl import CrawlEngine
        from literature_crawler_spark.plans.state import SnapshotStore
        from literature_crawler_spark.sources import synthetic as syn

        monkeypatch.setattr(fr, "BROADCAST_SEEN_MAX", 30)
        pages = syn.generate_pages(spark, 300, 8, with_images=False)
        seeds = syn.generate_seeds(spark, 25, 300, 8)

        store = SnapshotStore(str(tmp_path / "auto"))
        eng = CrawlEngine(spark, store, pages, use_bloom="auto", n_buckets=8)
        eng.run(seeds, max_waves=2)
        # 25 seeds + wave-1 discoveries >> 30: the store must exist now
        assert isinstance(eng._bloom_store, cuckoo_mod.BucketedCuckooStore)
        assert eng._bloom_store.watermark() is not None

        # resume in a fresh engine: the store is re-adopted, still cuckoo
        eng2 = CrawlEngine(spark, store, pages, use_bloom="auto", n_buckets=8)
        assert isinstance(eng2._bloom_store, cuckoo_mod.BucketedCuckooStore)
        eng2.run_wave(3)

        exact = SnapshotStore(str(tmp_path / "exact"))
        enge = CrawlEngine(spark, exact, pages, use_bloom=False)
        enge.run(seeds, max_waves=3)
        got = {r.canon_url for r in eng2.seen().collect()}
        want = {r.canon_url for r in enge.seen().collect()}
        assert got == want
        got_order = [
            (r.wave, r.seq, r.canon_url)
            for r in eng2.crawl_order().orderBy("seq").collect()
        ]
        want_order = [
            (r.wave, r.seq, r.canon_url)
            for r in enge.crawl_order().orderBy("seq").collect()
        ]
        assert got_order == want_order
