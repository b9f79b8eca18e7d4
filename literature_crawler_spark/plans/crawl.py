"""Wave-loop crawl scheduler: the end-to-end frontier pipeline.

Per wave (reference's per-URL loop ``protocol_io_crawl.py:97-271``
re-expressed as one DataFrame pass):

    frontier(pending) -> politeness rank (per-host quota) -> fetch
    (join against the pages corpus) -> extract links (explode) ->
    canonicalize -> robots filter -> first-seen dedup -> Bloom+anti-join
    vs seen -> assign dense seq -> commit snapshots (frontier, seen,
    order, outcomes, metrics)

Every wave ends in atomic snapshot commits, so a killed run resumes from
the latest committed wave (reference analogue: frozen Redis
``crawl_list_{task}`` reload, ``nature_protocol_crawl.py:67-88``).

Determinism contract (shared with oracle.crawl_oracle): seq is a dense
global counter; new URLs are numbered in (parent_seq, link_pos) order;
scheduling takes the per-host (priority, seq)-lowest rows up to the host
budget; priority of a URL = the wave that discovered it (BFS depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from literature_crawler_spark.operators import frontier as fr
from literature_crawler_spark.operators import politeness as pol
from literature_crawler_spark.plans.state import SnapshotStore

FRONTIER_COLS = ["canon_url", "url_hash", "bucket", "host", "priority", "seq", "wave", "status"]

# two_phase='auto': engage the supernode pre-rank when a tracked host's
# estimated pending backlog reaches this many times its per-wave budget —
# the single-window-task sort is ~backlog log backlog, so 32x budget is
# where it visibly outweighs the extra pending shuffle (politeness.py:44-53).
AUTO_TWO_PHASE_RATIO = 32
# bound on the driver-side hot-host dict (auto two_phase estimate)
MAX_TRACKED_HOSTS = 10_000


def assign_global_seq(
    df: DataFrame,
    order_cols: list[str],
    start: int,
    return_count: bool = False,
    released: list | None = None,
) -> DataFrame | tuple[DataFrame, int]:
    """Dense global sequence numbers in (order_cols) order, two-phase:

    1. range-repartition + sort on the order key (ranges are disjoint, so
       global order = (partition range order, within-partition order));
    2. per-partition row_number + a tiny collected offset map (one count
       per partition, broadcast back as a literal map).

    This is the scalable replacement for a single-partition window — the
    per-partition windows run in parallel, and only ~n_partitions longs hit
    the driver. Requires order_cols to be a unique key.

    ``return_count=True`` also returns the total row count — it falls out
    of the offset map for free, so callers need no separate count() pass.
    ``released``: when given, the repartitioned input is persisted (the
    counts pass and the downstream consumers then share one
    materialization of the upstream pipeline) and the handle appended for
    the caller to unpersist.
    """
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parts = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    if released is not None:
        parts = parts.persist()
        released.append(parts)
    counts = {r["_pid"]: r["cnt"] for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc - start
    if not offsets:
        out = df.withColumn("seq", F.lit(None).cast("long"))
        return (out, 0) if return_count else out
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    out = (
        parts.withColumn("seq", (omap[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid")
    )
    return (out, total) if return_count else out


class CrawlEngine:
    """Drives the wave loop over SnapshotStore-backed state tables."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        robots: DataFrame | None = None,
        politeness: DataFrame | None = None,
        default_budget: int = pol.DEFAULT_BUDGET,
        n_buckets: int = fr.DEFAULT_N_BUCKETS,
        use_bloom: bool | str = "auto",
        fetcher=None,
        compact_every: int | None = 8,
        two_phase: bool | str = "auto",
        expire_on_compact: bool = True,
        compact_seen_every: int | None = 32,
    ) -> None:
        self.spark = spark
        self.store = store
        self.robots = robots
        self.politeness = politeness
        self.default_budget = default_budget
        self.n_buckets = n_buckets
        # fold the frontier's merge-delta chain back into a replace base
        # every N waves (Iceberg-style table maintenance);
        # expire_on_compact then reclaims the folded pre-base snapshots
        # (expire-snapshots) so frontier storage is O(frontier), not
        # O(frontier x compactions). Turn off to keep full time travel.
        self.compact_every = compact_every
        self.expire_on_compact = expire_on_compact
        # seen is append-only (one snapshot dir per wave); folding it into
        # a replace base bounds the reader's union width (file listing /
        # planning cost at 10^4+ waves) at the price of an O(seen) rewrite
        # — so its cadence is SLOWER than the frontier's merge-chain
        # compaction (rewrite cost amortizes over more waves; Iceberg's
        # analogue is data-file bin-packing on a maintenance schedule)
        self.compact_seen_every = compact_seen_every
        # use_bloom='bucketed' maintains a BucketedBloomStore next to the
        # state tables (one bitmap file per url_hash bucket, executor-built)
        # and probes it instead of building a bitmap per wave — the 10^10
        # path. use_bloom='cuckoo' maintains a BucketedCuckooStore instead
        # (same probe/merge duck-type, lower FPR, and DELETABLE — the
        # recrawl/retract path a Bloom bitmap cannot serve). 'auto' uses
        # broadcast/per-wave plans while seen is small, then SELF-UPGRADES
        # to a maintained cuckoo store the first wave after committed seen
        # crosses fr.BROADCAST_SEEN_MAX (the measured-best at-scale path,
        # BENCH.md), and re-adopts an existing store on resume. Invariant
        # for every maintained mode: deltas merge into the store BEFORE
        # the seen commit, so the store is always a superset of committed
        # seen (false positives only).
        self.use_bloom = use_bloom
        self._bloom_store = None
        import os

        self._store_root = os.path.join(store.root, "bloom")
        if use_bloom in ("bucketed", "cuckoo"):
            from literature_crawler_spark.operators import bloom as bloom_mod
            from literature_crawler_spark.operators import cuckoo as cuckoo_mod

            kind = bloom_mod.BucketedBloomStore if use_bloom == "bucketed" else (
                cuckoo_mod.BucketedCuckooStore
            )
            root = self._store_root
            self._bloom_store = kind.open(root)
            seen_latest = self.store.latest("seen")
            if self._bloom_store is None:
                self._bloom_store = kind.create(
                    root, expected_items=2_000_000, n_buckets=n_buckets
                )
                seen = self.seen()
                if seen is not None:  # resume from a pre-bucketed-state run
                    self._store_merge(seen.select("url_hash"))
                    self._bloom_store.set_watermark(seen_latest["id"])
            elif seen_latest is not None:
                self._refresh_adopted_store(seen_latest)
        elif use_bloom == "auto":
            # A previous run (auto past the broadcast ceiling, or explicit
            # bucketed/cuckoo) may have left a maintained store next to the
            # state tables — adopt it so a resumed crawl keeps the
            # fused-probe path instead of regressing to per-wave bitmaps.
            # If nothing is committed yet the orphan is ignored; the
            # threshold upgrade in run_wave rebuilds from scratch.
            from literature_crawler_spark.operators import bloom as bloom_mod
            from literature_crawler_spark.operators import cuckoo as cuckoo_mod

            st = cuckoo_mod.BucketedCuckooStore.open(self._store_root)
            if st is None:
                st = bloom_mod.BucketedBloomStore.open(self._store_root)
            seen_latest = self.store.latest("seen")
            if st is not None and seen_latest is not None:
                self._bloom_store = st
                self._refresh_adopted_store(seen_latest)
        # Optional Arrow-UDF fetch path (operators.fetch.Fetcher): when set,
        # waves fetch via mapInPandas over salt-spread partitions (the live
        # deploy path) instead of hash-joining the pages corpus table. Both
        # paths produce the identical fetched set on the synthetic corpus
        # (tests/test_fetch.py).
        self.fetcher = fetcher
        # two_phase scheduling (pol.schedule_wave): 'auto' turns the
        # supernode pre-rank on only when a tracked host's estimated
        # pending backlog exceeds AUTO_TWO_PHASE_RATIO x its budget —
        # the regime where a single per-host window task becomes the
        # Amdahl cap (politeness.py:44-53). The estimate comes from the
        # per-wave new-URL counts of hosts that net-grow (> budget new
        # rows in a wave), drained by ~budget per wave; the tracking dict
        # is bounded (only net-growing hosts enter, shrunk when it
        # exceeds MAX_TRACKED_HOSTS), so the driver holds O(hot hosts),
        # never O(all hosts).
        self.two_phase = two_phase
        self._hot_backlog: dict[str, int] = {}
        # dense-seq high-water mark, carried across waves so run_wave
        # never re-scans the frontier for max(seq); None = recompute on
        # the next wave (fresh engine / resume).
        self._max_seq: int | None = None
        # the fetchable web: canonical url -> (host, links, caption, image_id)
        self.pages = pages.select(
            F.col("url").alias("page_url"),
            F.col("host").alias("page_host"),
            "links",
            "caption",
            "image_id",
        )

    # ------------------------------------------------------------ state ----
    def _refresh_adopted_store(self, seen_latest: dict) -> None:
        """Staleness check for a pre-existing membership store: a store
        BEHIND the committed seen set (e.g. interleaved runs with a
        different use_bloom mode) would give false negatives ->
        re-crawled URLs. Bloom stores re-merge in place (OR is
        idempotent). Cuckoo insert is NOT idempotent: re-merging keys
        already present would ~double occupancy and trip an overflow
        rebuild, and a crash loop between merge and set_watermark would
        repeat that rebuild each start — so cuckoo rebuilds fresh at
        current capacity instead (bounded, restart-idempotent)."""
        from literature_crawler_spark.operators import cuckoo as cuckoo_mod

        wm = self._bloom_store.watermark()
        if wm is not None and wm >= seen_latest["id"]:
            return
        keys = self.seen().select("url_hash").dropDuplicates(["url_hash"])
        if hasattr(self._bloom_store, "delete"):
            # Size the rebuild from the ACTUAL key count (we scan seen for
            # the merge anyway) — sizing from slot capacity is not a fixed
            # point of rows_for (1024-row buckets re-create as 2048), so
            # repeated adoptions would double the table every restart with
            # zero key growth. One count() here is engine-init only, never
            # per-wave; bucket-skew overflow still grows via _store_merge.
            st = self._bloom_store
            keys = keys.persist()
            n_keys = keys.count()
            self._bloom_store = cuckoo_mod.BucketedCuckooStore.create(
                st.root, expected_items=max(n_keys, 1), n_buckets=st.n_buckets
            )
            self._store_merge(keys)
            keys.unpersist()
        else:
            self._store_merge(keys)
        self._bloom_store.set_watermark(seen_latest["id"])

    def _store_merge(self, delta: DataFrame) -> None:
        """Merge a url_hash delta into the membership store.

        A cuckoo store that overflows is rebuilt at doubled capacity from
        the AUTHORITATIVE key set (committed seen + this delta) — the
        resize contract in operators/cuckoo.py: fingerprints cannot
        recover keys, so growth must re-insert from source. Bloom stores
        never raise (bitmaps OR at any density; fpp degrades instead).
        """
        from literature_crawler_spark.operators import cuckoo as cuckoo_mod

        try:
            self._bloom_store.merge(delta)
            return
        except cuckoo_mod.CuckooOverflow:
            pass
        full = delta.select("url_hash")
        seen = self.seen()
        if seen is not None:
            full = seen.select("url_hash").unionByName(full).dropDuplicates(["url_hash"])
        full = full.persist()
        try:
            st = self._bloom_store
            cap = st.bucket_rows * cuckoo_mod.SLOTS * st.n_buckets
            while True:
                cap *= 2
                self._bloom_store = cuckoo_mod.BucketedCuckooStore.create(
                    st.root, expected_items=cap, n_buckets=st.n_buckets
                )
                try:
                    self._bloom_store.merge(full)
                    return
                except cuckoo_mod.CuckooOverflow:
                    continue
        finally:
            full.unpersist()

    def seen(self) -> DataFrame | None:
        return self.store.read(self.spark, "seen")

    def retract(self, to_retract: DataFrame, url_col: str = "url", requeue: bool = False) -> dict:
        """Make URLs crawlable again — the recrawl-after-expiry path
        (reference analogue: a protocol whose ``version_id`` changed
        re-enters the crawl, ``protocol_io_crawl.py`` update branch).

        ``requeue=True`` (recrawl): the URL KEEPS its seen/store
        membership — it is still in the frontier, so link re-discovery
        must keep deduping against it — and only its frontier row flips
        back to ``pending`` (keeping its seq), so the next wave
        re-schedules it. Removing it from seen here would let the same
        URL re-enter as "new" with a fresh seq in the same wave that
        also writes its fetch outcome (two rows under one merge
        snapshot, nondeterministic reader tie-break) and re-fetch it a
        third time on any later link hit. This mirrors the reference,
        whose update branch re-fetches an EXISTING row without deleting
        it, and preserves the invariant the crash-window reconciler
        relies on: every pending frontier row is in seen.

        ``requeue=False`` (forget): seen is rewritten without the keys
        (copy-on-write delete; an Iceberg deploy writes position deletes
        instead — same semantics, same reader contract), so a later link
        re-discovery recrawls the URL from scratch under a NEW seq.
        Only FETCHED rows are forgettable: a still-pending row has not
        been crawled (there is nothing to forget), and removing its seen
        key while the row stays scheduled would break the ``pending
        frontier rows ⊆ seen`` invariant — the next wave would fetch it
        under its old seq while link re-discovery re-admits it under a
        new one (two frontier rows in one merge snapshot,
        nondeterministic reader tie-break). In-flight rows are silently
        excluded; recrawling one is ``requeue=True``'s job.
        Store maintenance follows the commit: a cuckoo store DELETEs the
        keys in place (its reason to exist); a Bloom store is rebuilt
        from the new seen (bitmaps cannot delete). Ordering keeps the
        superset invariant: the store is never behind seen — between
        commit and store maintenance it holds extra keys, which only
        cost wasted exact-join probes.

        Returns ``{"matched": keys found eligible, "retracted": keys
        removed from seen (0 under requeue), "requeued": frontier rows
        flipped back to pending (0 under forget)}``.
        """
        seen = self.seen()
        if seen is None:
            return {"retracted": 0, "matched": 0, "requeued": 0}
        cand = fr.canonicalize_candidates(to_retract.select(F.col(url_col).alias("url")))
        keys = (
            cand.select("url_hash")
            .dropDuplicates(["url_hash"])
            .join(seen.select("url_hash"), "url_hash", "left_semi")
        )
        if not requeue:
            frontier = self.frontier()
            if frontier is not None:
                keys = keys.join(
                    frontier.filter(F.col("status") == "pending").select("url_hash"),
                    "url_hash",
                    "left_anti",
                )
        keys = keys.persist()
        n = keys.count()
        if n == 0:
            keys.unpersist()
            return {"retracted": 0, "matched": 0, "requeued": 0}
        if requeue:
            frontier = self.frontier()
            # only rows whose status actually changes count toward the
            # pending meta — seeds/new rows are in seen while still
            # 'pending', so flipping them too would double-count
            flip = (
                frontier.join(keys, "url_hash", "left_semi")
                .filter(F.col("status") != "pending")
                .drop("status")
                .withColumn("status", F.lit("pending"))
                .select(*FRONTIER_COLS)
                .persist()
            )
            n_requeued = flip.count()
            prev_meta = (self.store.latest("frontier") or {}).get("meta", {})
            pending = prev_meta.get("pending", 0) + n_requeued
            self.store.commit(
                "frontier", flip, mode="merge", wave=self.last_wave(),
                meta={"pending": pending, "delta_rows": n_requeued},
                merge_key=["url_hash"],
            )
            flip.unpersist()
            keys.unpersist()
            return {"retracted": 0, "matched": n, "requeued": n_requeued}
        remaining = seen.join(keys, "url_hash", "left_anti")
        prev_total = (self.store.latest("seen") or {}).get("meta", {}).get("total")
        if prev_total is None:
            prev_total = seen.count()
        sid = self.store.commit(
            "seen", remaining, mode="replace", wave=self.last_wave(),
            meta={"total": prev_total - n, "retracted": n},
        )
        if self._bloom_store is not None:
            if hasattr(self._bloom_store, "delete"):  # cuckoo: in-place
                self._bloom_store.delete(keys)
            else:  # bloom: rebuild from the new seen
                from literature_crawler_spark.operators import bloom as bloom_mod

                st = self._bloom_store
                self._bloom_store = bloom_mod.BucketedBloomStore.create(
                    st.root,
                    expected_items=max(prev_total - n, 2_000_000),
                    n_buckets=st.n_buckets,
                )
                self._store_merge(self.seen().select("url_hash"))
            self._bloom_store.set_watermark(sid)
        keys.unpersist()
        return {"retracted": n, "matched": n, "requeued": 0}

    def frontier(self) -> DataFrame | None:
        return self.store.read(self.spark, "frontier")

    def crawl_order(self) -> DataFrame | None:
        return self.store.read(self.spark, "order")

    def last_wave(self) -> int | None:
        m = self.store.latest("frontier")
        return None if m is None else m["wave"]

    # -------------------------------------------------------- bootstrap ----
    def bootstrap(self, seeds: DataFrame) -> int:
        """Wave 0: canonicalize + robots-filter + first-seen-dedup the seed
        list, number it densely, commit as the initial pending frontier."""
        cand = fr.canonicalize_candidates(seeds.select(F.col("url"), F.col("seq").alias("seed_seq")))
        if self.robots is not None:
            cand = fr.apply_robots(cand, self.robots)
        cand = fr.first_seen_dedup(cand, ["seed_seq"])
        released: list[DataFrame] = []
        cand, n = assign_global_seq(
            cand, ["seed_seq"], start=0, return_count=True, released=released
        )
        frontier0 = cand.select(
            "canon_url", "url_hash", "bucket", "host",
            F.lit(0).alias("priority"), "seq",
            F.lit(0).alias("wave"), F.lit("pending").alias("status"),
        )
        self.store.commit(
            "frontier", frontier0, mode="replace", wave=0,
            meta={"pending": n, "total": n},
        )
        if self._bloom_store is not None:  # superset invariant: bloom first
            self._store_merge(frontier0.select("url_hash"))
        sid = self.store.commit(
            "seen",
            frontier0.select("url_hash", "canon_url", "bucket", "wave"),
            mode="append", wave=0, meta={"added": n, "total": n},
        )
        if self._bloom_store is not None:
            self._bloom_store.set_watermark(sid)
        for h in released:
            h.unpersist()
        self._max_seq = n - 1
        return n

    # ------------------------------------------------------------- wave ----
    def _use_two_phase(self) -> bool:
        if self.two_phase == "auto":
            cut = AUTO_TWO_PHASE_RATIO * self.default_budget
            return any(v >= cut for v in self._hot_backlog.values())
        return bool(self.two_phase)

    def _update_hot_backlog(self, new_rows: DataFrame, n_new: int) -> None:
        """Maintain the bounded hot-host backlog estimate (auto two_phase).

        Hosts gaining more than one budget of NEW pending URLs in a wave
        net-grow (they drain at most budget/wave), so only those enter the
        dict; every tracked host is drained by budget each wave and
        evicted at zero. One tiny job over the already-cached new_rows.
        """
        budget = self.default_budget
        for h in list(self._hot_backlog):
            self._hot_backlog[h] -= budget
            if self._hot_backlog[h] <= 0:
                del self._hot_backlog[h]
        if not n_new:
            return
        hot = (
            new_rows.groupBy("host").agg(F.count("*").alias("n"))
            .filter(F.col("n") > budget)
            .collect()
        )
        for r in hot:
            self._hot_backlog[r["host"]] = self._hot_backlog.get(r["host"], 0) + r["n"]
        if len(self._hot_backlog) > MAX_TRACKED_HOSTS:  # keep the hottest
            keep = sorted(self._hot_backlog.items(), key=lambda kv: -kv[1])
            self._hot_backlog = dict(keep[:MAX_TRACKED_HOSTS])

    def run_wave(self, wave: int) -> dict:
        from pyspark.sql import Observation

        frontier = self.frontier()
        pending = frontier.filter(F.col("status") == "pending")

        # 1. politeness: per-host quota ranking (one shuffle on host);
        #    two_phase='auto' engages the supernode pre-rank only when a
        #    tracked host's backlog estimate crosses the ratio cut
        scheduled = pol.schedule_wave(
            pending, self.politeness, self.default_budget,
            two_phase=self._use_two_phase(),
        )
        scheduled = scheduled.persist()
        n_scheduled = scheduled.count()  # driver action 1 (early-exit gate)
        if n_scheduled == 0:
            scheduled.unpersist()
            return {"wave": wave, "scheduled": 0, "done": True}

        # 2. fetch: either the Arrow-UDF fetcher over salt-spread partitions
        #    (live deploy path) or a hash-join vs the pages corpus table
        #    (cheaper when the "web" is itself a table, as in tests/bench).
        #    n_fetched rides an Observation — collected as a side effect of
        #    the frontier commit instead of its own count() action
        #    (VERDICT r02 item 6).
        obs = Observation()
        if self.fetcher is not None:
            from literature_crawler_spark.operators import fetch as fetch_mod

            fetched = (
                fetch_mod.fetch_extract(scheduled, self.fetcher)
                .withColumn(
                    "page_url",
                    F.when(F.col("fetch_status") == "fetched", F.col("canon_url")),
                )
                .withColumn("page_host", F.col("host"))
            )
        else:
            fetched = scheduled.join(
                self.pages, scheduled.canon_url == self.pages.page_url, "left"
            )
        fetched = fetched.observe(
            obs, F.count(F.col("page_url")).alias("n_fetched")
        ).persist()

        # 3. extract + canonicalize candidate links (posexplode keeps the
        #    in-document order the first-seen dedup needs — A4 semantics)
        links = fetched.filter(F.col("page_url").isNotNull()).select(
            F.col("seq").alias("parent_seq"),
            F.col("page_host").alias("base_host"),
            F.posexplode("links").alias("pos", "link"),
        )
        # auto-upgrade: once the committed seen set outgrows the broadcast
        # anti-join (fr.BROADCAST_SEEN_MAX keys), 'auto' switches from
        # per-wave plans to a MAINTAINED cuckoo store — the measured-best
        # at-scale membership structure (BENCH.md: cuckoo probe 2.6-3.8M
        # URLs/s at local[32] vs 0.6-1.7M bucketed-Bloom, ~50x lower FPR,
        # O(1) delete for retract). Built once from committed seen, then
        # merged incrementally per wave like the explicit modes.
        seen_meta = self.store.latest("seen")
        seen_total = (seen_meta or {}).get("meta", {}).get("total") or 0
        if (
            self.use_bloom == "auto"
            and self._bloom_store is None
            and seen_total > fr.BROADCAST_SEEN_MAX
        ):
            from literature_crawler_spark.operators import cuckoo as cuckoo_mod

            self._bloom_store = cuckoo_mod.BucketedCuckooStore.create(
                self._store_root,
                expected_items=2 * seen_total,
                n_buckets=self.n_buckets,
            )
            self._store_merge(
                self.seen().select("url_hash").dropDuplicates(["url_hash"])
            )
            self._bloom_store.set_watermark(seen_meta["id"])
        # when a maintained membership store exists, the seen-probe runs
        # INSIDE the canonicalize Arrow kernel (one Python crossing for
        # canonicalize+hash+membership-test instead of two — the local-mode
        # Arrow lane is the kernel's ceiling, BENCH.md); dedup_against_seen
        # then just splits on the carried _maybe_seen flag
        cand = fr.canonicalize_candidates(
            links.withColumnRenamed("link", "url"), base_host_col="base_host",
            probe_store=self._bloom_store,
        )
        if self.robots is not None:
            cand = fr.apply_robots(cand, self.robots)
        cand = fr.first_seen_dedup(cand, ["parent_seq", "pos"])

        # 4. membership test: Bloom prefilter + exact anti-join vs seen.
        #    released collects every cache this wave creates (Bloom-probe
        #    materialization, seq-assignment repartition) so nothing
        #    strands across waves.
        released: list[DataFrame] = []
        seen = self.seen()
        new = fr.dedup_against_seen(
            self.spark, cand, seen,
            use_bloom=True if self._bloom_store is not None else self.use_bloom,
            expected_seen=(seen_meta or {}).get("meta", {}).get("total"),
            bloom_store=self._bloom_store,
            released=released,
        )

        # 5. dense numbering in (parent_seq, pos) order. The high-water
        #    seq is carried across waves (one frontier agg only on the
        #    first wave after engine start / resume), and n_new falls out
        #    of the numbering's offset map — no count() pass.
        if self._max_seq is None:
            self._max_seq = frontier.agg(F.max("seq")).collect()[0][0] or 0
        max_seq = self._max_seq
        new, n_new = assign_global_seq(
            new, ["parent_seq", "pos"], start=max_seq + 1,
            return_count=True, released=released,
        )
        self._max_seq = max_seq + n_new
        new_rows = new.select(
            "canon_url", "url_hash", "bucket", "host",
            F.lit(wave).alias("priority"), "seq",
            F.lit(wave).alias("wave"), F.lit("pending").alias("status"),
        ).persist()

        # 6. commit snapshots: frontier (MERGE delta: only the status flips
        #    of scheduled rows + newly discovered rows — O(scheduled + new)
        #    per wave, never a full-frontier rewrite), seen/order/outcomes/
        #    metrics (append). The reader reconciles last-writer-wins on
        #    url_hash; periodic compaction bounds the delta chain.
        outcome = fetched.select(
            *FRONTIER_COLS[:-1],
            F.when(F.col("page_url").isNotNull(), "fetched").otherwise("missing").alias("status"),
        )
        frontier_delta = outcome.select(*FRONTIER_COLS).unionByName(
            new_rows.select(*FRONTIER_COLS)
        )
        # pending-before comes from the previous frontier commit's meta
        # (bootstrap and every merge write it) — no frontier re-scan; the
        # count() fallback only fires on stores written before this field.
        prev_meta = (self.store.latest("frontier") or {}).get("meta", {})
        pending_before = prev_meta.get("pending")
        if pending_before is None:
            pending_before = pending.count()
        n_pending_next = n_new + (pending_before - n_scheduled)
        self.store.commit(
            "frontier", frontier_delta, mode="merge", wave=wave,
            meta={"pending": n_pending_next, "delta_rows": n_scheduled + n_new},
            merge_key=["url_hash"],
        )
        if self.compact_every and wave % self.compact_every == 0:
            if self.store.compact("frontier") is not None and self.expire_on_compact:
                # reclaim the folded pre-base history (Iceberg
                # expire-snapshots): without this, a long crawl's frontier
                # storage grows by a full table copy per compaction
                self.store.expire_snapshots("frontier")
        # the frontier merge commit above scanned `fetched`, so the
        # observation is already resolved — this get() does not block
        n_fetched = int(obs.get["n_fetched"])
        seen_total = ((seen_meta or {}).get("meta", {}).get("total") or 0) + n_new
        if self._bloom_store is not None and n_new:  # bloom BEFORE seen commit
            self._store_merge(new_rows.select("url_hash"))
        sid = self.store.commit(
            "seen", new_rows.select("url_hash", "canon_url", "bucket", "wave"),
            mode="append", wave=wave, meta={"added": n_new, "total": seen_total},
        )
        if self._bloom_store is not None:
            self._bloom_store.set_watermark(sid)
        if self.compact_seen_every and wave % self.compact_seen_every == 0:
            csid = self.store.compact("seen")
            if csid is not None:
                if self.expire_on_compact:
                    self.store.expire_snapshots("seen")
                if self._bloom_store is not None:
                    # membership is unchanged by compaction, so the store
                    # is still a superset — advance the watermark so the
                    # next engine start does not see a "stale" store and
                    # rebuild for nothing (a crash before this line only
                    # costs that spurious rebuild, never correctness)
                    self._bloom_store.set_watermark(csid)
        self.store.commit(
            "order",
            scheduled.select(F.lit(wave).alias("wave"), "seq", "host", "canon_url"),
            mode="append", wave=wave, meta={"scheduled": n_scheduled},
        )
        self.store.commit(
            "outcomes",
            outcome.select("url_hash", "canon_url", F.lit(wave).alias("wave"), "status"),
            mode="append", wave=wave,
        )
        metrics = {
            "wave": wave, "scheduled": n_scheduled, "fetched": n_fetched,
            "missing": n_scheduled - n_fetched, "new_urls": n_new,
            "pending_next": n_pending_next, "done": n_pending_next == 0,
        }
        self.store.commit(
            "metrics",
            self.spark.createDataFrame(
                [(wave, n_scheduled, n_fetched, n_new, n_pending_next)],
                "wave int, scheduled long, fetched long, new_urls long, pending_next long",
            ),
            mode="append", wave=wave,
        )
        # per-partition lineage (north rule): which fetch shard (politeness
        # salt) scheduled how much, and which url_hash bucket admitted how
        # many new URLs — the partition-level audit trail a 1000-executor
        # run needs to localize skew/dedup anomalies per wave.
        fetch_lineage = scheduled.groupBy("salt").agg(
            F.count("*").alias("n"), F.countDistinct("host").alias("n_hosts")
        ).select(
            F.lit(wave).alias("wave"), F.lit("fetch_salt").alias("kind"),
            F.col("salt").cast("int").alias("key"), "n", "n_hosts",
        )
        dedup_lineage = new_rows.groupBy("bucket").agg(
            F.count("*").alias("n")
        ).select(
            F.lit(wave).alias("wave"), F.lit("dedup_bucket").alias("kind"),
            F.col("bucket").cast("int").alias("key"), "n",
            F.lit(None).cast("long").alias("n_hosts"),
        )
        self.store.commit(
            "lineage", fetch_lineage.unionByName(dedup_lineage),
            mode="append", wave=wave,
        )
        if self.two_phase == "auto":
            self._update_hot_backlog(new_rows, n_new)
        scheduled.unpersist()
        fetched.unpersist()
        new_rows.unpersist()
        for h in released:
            h.unpersist()
        return metrics

    # -------------------------------------------------------------- run ----
    def _reconcile_crash_window(self) -> int:
        """Heal the non-atomic multi-table commit window on resume.

        A wave commits frontier (merge) BEFORE seen (append); a crash
        between the two leaves wave W's newly discovered URLs pending in
        the frontier but absent from seen — on resume they would be
        scheduled AND re-admittable via links as "new" with fresh seqs
        (double-numbered, double-fetched). The invariant to restore is
        ``pending frontier rows ⊆ seen`` (every URL enters the frontier
        only when admitted into seen; ``retract(requeue=False)`` removes
        non-pending rows only). Detection is O(1): the wave recorded by
        the latest frontier manifest is ahead of the latest seen
        manifest's exactly and only inside this window (every clean wave,
        bootstrap, compaction, and both retract paths leave them equal).
        The heal appends the missing pending keys to seen — store merge
        first, preserving the store-superset invariant. Audit tables
        (order/outcomes/metrics/lineage) committed after seen may still
        miss wave W's rows; they are observability, not inputs, so a gap
        there cannot corrupt the crawl.
        """
        f_latest = self.store.latest("frontier")
        if f_latest is None:
            return 0
        s_latest = self.store.latest("seen")
        if s_latest is not None and s_latest["wave"] >= f_latest["wave"]:
            return 0
        frontier = self.frontier()
        missing = frontier.filter(F.col("status") == "pending").select(
            "url_hash", "canon_url", "bucket", "wave"
        )
        seen = self.seen()
        if seen is not None:
            missing = missing.join(seen.select("url_hash"), "url_hash", "left_anti")
        missing = missing.persist()
        n = missing.count()
        if n and self._bloom_store is not None:  # superset invariant: store first
            delta = missing.select("url_hash")
            if hasattr(self._bloom_store, "delete"):
                # cuckoo insert is NOT idempotent, and the crash may have
                # landed on EITHER side of the wave's pre-commit store
                # merge — re-merging keys the store already holds would
                # add duplicate fingerprints (occupancy creep, and a later
                # retract delete() would remove only one copy). Insert
                # only keys the store does not already hold; skipping a
                # false positive is safe because the key is committed to
                # seen right below, so the exact anti-join keeps covering
                # it (the probe stage runs before the fold's writes —
                # stage barrier — so probes always read pre-merge files).
                delta = delta.filter(
                    ~self._bloom_store.might_contain_col(F.col("url_hash"))
                )
            self._store_merge(delta)
        # commit even when n == 0 so seen's wave catches up — otherwise a
        # crashed zero-discovery wave would re-trigger this scan on every
        # resume forever
        prev_total = (s_latest or {}).get("meta", {}).get("total") or 0
        sid = self.store.commit(
            "seen", missing, mode="append", wave=f_latest["wave"],
            meta={"added": n, "total": prev_total + n, "healed": True},
        )
        if self._bloom_store is not None:
            self._bloom_store.set_watermark(sid)
        missing.unpersist()
        return n

    def run(self, seeds: DataFrame | None = None, max_waves: int = 10) -> list[dict]:
        """Run (or resume) the crawl. If the store has committed state the
        seed bootstrap is skipped and the loop continues from the last
        committed wave — the resume contract (including the crash-window
        heal: a run killed between a wave's frontier and seen commits
        resumes without double-numbering its discovered URLs)."""
        if self.last_wave() is None:
            assert seeds is not None, "first run needs a seed list"
            self.bootstrap(seeds)
        else:
            self._reconcile_crash_window()
        out = []
        start = (self.last_wave() or 0) + 1
        for wave in range(start, start + max_waves):
            m = self.run_wave(wave)
            out.append(m)
            if m.get("done"):
                break
        return out
