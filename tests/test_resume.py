"""Resume semantics: kill after wave k, restart from snapshots, identical
final state (FIXTURES.md invariant 4; reference analogue: frozen Redis
crawl_list reload, nature_protocol_crawl.py:67-88)."""

import pytest

from literature_crawler_spark.plans.crawl import CrawlEngine
from literature_crawler_spark.plans.state import SnapshotStore
from literature_crawler_spark.sources import synthetic as syn

N_PAGES, N_HOSTS, N_SEEDS = 300, 8, 25


@pytest.fixture(scope="module")
def corpus(spark):
    return {
        "pages": syn.generate_pages(spark, N_PAGES, N_HOSTS, with_images=False),
        "seeds": syn.generate_seeds(spark, N_SEEDS, N_PAGES, N_HOSTS),
        "robots": syn.generate_robots(spark),
        "politeness": syn.generate_politeness(spark, N_HOSTS),
    }


def _mk_engine(spark, corpus, path):
    return CrawlEngine(
        spark, SnapshotStore(path), corpus["pages"], corpus["robots"], corpus["politeness"]
    )


def _state(eng):
    seen = {r.canon_url for r in eng.seen().collect()}
    order = [(r.wave, r.seq, r.canon_url) for r in eng.crawl_order().orderBy("wave", "seq").collect()]
    return seen, order


def test_resume_equals_straight_run(spark, corpus, tmp_path):
    straight = _mk_engine(spark, corpus, str(tmp_path / "straight"))
    straight.run(corpus["seeds"], max_waves=3)

    # interrupted: run 1 wave, drop the engine, build a NEW engine on the
    # same store (process restart), continue
    p = str(tmp_path / "resumed")
    first = _mk_engine(spark, corpus, p)
    first.run(corpus["seeds"], max_waves=1)
    del first
    resumed = _mk_engine(spark, corpus, p)
    assert resumed.last_wave() == 1  # state recovered from manifests
    resumed.run(max_waves=2)

    assert _state(straight) == _state(resumed)


def test_rollback_then_rerun(spark, corpus, tmp_path):
    """truncate_after() rewinds to a snapshot; re-running reproduces the
    same downstream state (idempotent replay)."""
    p = str(tmp_path / "rb")
    eng = _mk_engine(spark, corpus, p)
    eng.run(corpus["seeds"], max_waves=2)
    want = _state(eng)

    # rewind every state table to its wave-1 snapshot, then re-run wave 2
    store = eng.store
    for table in ("frontier", "seen", "order", "outcomes", "metrics", "lineage"):
        keep = [m["id"] for m in store.snapshots(table) if (m["wave"] or 0) <= 1]
        store.truncate_after(table, max(keep))
    eng2 = _mk_engine(spark, corpus, p)
    assert eng2.last_wave() == 1
    eng2.run(max_waves=1)
    assert _state(eng2) == want


def test_compaction_preserves_state(spark, corpus, tmp_path):
    """compact_every folds the frontier's merge-delta chain into a replace
    base without changing the reconciled state, and resume keeps working
    on top of the compacted base."""
    plain = _mk_engine(spark, corpus, str(tmp_path / "plain"))
    plain.run(corpus["seeds"], max_waves=3)

    p = str(tmp_path / "cmp")
    eng = CrawlEngine(
        spark, SnapshotStore(p), corpus["pages"], corpus["robots"],
        corpus["politeness"], compact_every=2,
    )
    eng.run(corpus["seeds"], max_waves=2)
    modes = [m["mode"] for m in eng.store.snapshots("frontier")]
    assert modes.count("replace") >= 2, modes  # bootstrap base + compaction
    # restart on the compacted base and finish
    eng2 = CrawlEngine(
        spark, SnapshotStore(p), corpus["pages"], corpus["robots"],
        corpus["politeness"], compact_every=2,
    )
    eng2.run(max_waves=1)
    assert _state(plain) == _state(eng2)


def test_per_partition_lineage(spark, corpus, tmp_path):
    """Each wave commits fetch-shard and dedup-bucket lineage whose totals
    reconcile with the wave metrics (north rule: per-partition lineage)."""
    eng = _mk_engine(spark, corpus, str(tmp_path / "lin"))
    metrics = eng.run(corpus["seeds"], max_waves=2)
    lineage = eng.store.read(spark, "lineage")
    assert lineage is not None
    rows = lineage.collect()
    by_wave_kind = {}
    for r in rows:
        by_wave_kind.setdefault((r.wave, r.kind), 0)
        by_wave_kind[(r.wave, r.kind)] += r.n
    for m in metrics:
        w = m["wave"]
        assert by_wave_kind.get((w, "fetch_salt"), 0) == m["scheduled"]
        assert by_wave_kind.get((w, "dedup_bucket"), 0) == m["new_urls"]


def test_bucketed_bloom_staleness_remerge(spark, corpus, tmp_path):
    """A pre-existing bucketed Bloom store BEHIND the committed seen set
    (interleaved runs with a different use_bloom mode) must be detected on
    engine open and re-merged — a stale store gives Bloom false negatives,
    re-crawling seen URLs and appending duplicates to seen."""

    def mk(path, mode):
        return CrawlEngine(
            spark, SnapshotStore(path), corpus["pages"],
            corpus["robots"], corpus["politeness"], use_bloom=mode,
        )

    straight = mk(str(tmp_path / "s"), "bucketed")
    straight.run(corpus["seeds"], max_waves=3)

    p = str(tmp_path / "x")
    first = mk(p, "bucketed")  # store created, watermark at wave-1 seen
    first.run(corpus["seeds"], max_waves=1)
    mid = mk(p, False)  # plain anti-join: seen advances, store does NOT
    mid.run(max_waves=1)
    resumed = mk(p, "bucketed")  # open must detect store-behind-seen
    assert (
        resumed._bloom_store.watermark()
        == resumed.store.latest("seen")["id"]
    )
    resumed.run(max_waves=1)
    assert _state(straight) == _state(resumed)


def test_crash_window_heal(spark, corpus, tmp_path):
    """A wave commits frontier (merge) BEFORE seen (append); a crash
    between the two leaves the wave's discoveries pending-but-unseen. On
    resume the engine must heal the window — re-admitting those keys to
    seen under their EXISTING seqs — and the finished crawl must equal an
    uninterrupted run exactly (no double-numbering, no re-fetch)."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    straight = _mk_engine(spark, corpus, str(tmp_path / "cw_straight"))
    straight.run(corpus["seeds"], max_waves=3)

    crashed = _mk_engine(spark, corpus, str(tmp_path / "cw_crash"))
    crashed.run(corpus["seeds"], max_waves=2)
    # simulate the kill between wave 2's frontier and seen commits: drop
    # seen's latest snapshot (manifest + pointer — what a death before the
    # manifest write leaves behind; the orphan data dir is irrelevant, the
    # reader keys off manifests)
    tdir = os.path.join(str(tmp_path / "cw_crash"), "seen")
    with open(os.path.join(tdir, "_LATEST")) as f:
        sid = int(f.read().strip())
    with open(os.path.join(tdir, f"s{sid:06d}.json")) as f:
        dropped = json.load(f)
    assert dropped["meta"].get("added", 0) > 0  # the wave discovered URLs
    os.unlink(os.path.join(tdir, f"s{sid:06d}.json"))
    shutil.rmtree(os.path.join(tdir, f"s{sid:06d}"), ignore_errors=True)
    with open(os.path.join(tdir, "_LATEST"), "w") as f:
        f.write(str(sid - 1))

    resumed = _mk_engine(spark, corpus, str(tmp_path / "cw_crash"))
    # pre-heal: pending frontier rows missing from seen (the bug window)
    pending = resumed.frontier().filter(F.col("status") == "pending")
    n_missing = pending.join(
        resumed.seen().select("url_hash"), "url_hash", "left_anti"
    ).count()
    assert n_missing > 0
    resumed.run(max_waves=1)
    # healed: the invariant holds again ...
    pending2 = resumed.frontier().filter(F.col("status") == "pending")
    assert (
        pending2.join(resumed.seen().select("url_hash"), "url_hash", "left_anti").count()
        == 0
    )
    # ... the heal commit is recorded ...
    heals = [
        m for m in resumed.store.snapshots("seen") if m["meta"].get("healed")
    ]
    assert len(heals) == 1 and heals[0]["meta"]["added"] == dropped["meta"]["added"]
    # ... and the final state equals the uninterrupted run exactly
    assert _state(resumed) == _state(straight)
