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

from literature_crawler_spark.functions import hashing, urls
from literature_crawler_spark.operators import frontier as fr
from literature_crawler_spark.operators import politeness as pol
from literature_crawler_spark.plans.state import SnapshotStore

FRONTIER_COLS = ["canon_url", "url_hash", "bucket", "host", "priority", "seq", "wave", "status"]


def assign_global_seq(df: DataFrame, order_cols: list[str], start: int) -> DataFrame:
    """Dense global sequence numbers in (order_cols) order, two-phase:

    1. range-repartition + sort on the order key (ranges are disjoint, so
       global order = (partition range order, within-partition order));
    2. per-partition row_number + a tiny collected offset map (one count
       per partition, broadcast back as a literal map).

    This is the scalable replacement for a single-partition window — the
    per-partition windows run in parallel, and only ~n_partitions longs hit
    the driver. Requires order_cols to be a unique key.
    """
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parts = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = {r["_pid"]: r["cnt"] for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return df.withColumn("seq", F.lit(None).cast("long"))
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        parts.withColumn("seq", (omap[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid")
    )


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
    ) -> None:
        self.spark = spark
        self.store = store
        self.robots = robots
        self.politeness = politeness
        self.default_budget = default_budget
        self.n_buckets = n_buckets
        # fold the frontier's merge-delta chain back into a replace base
        # every N waves (Iceberg-style table maintenance)
        self.compact_every = compact_every
        # use_bloom='bucketed' maintains a BucketedBloomStore next to the
        # state tables (one bitmap file per url_hash bucket, executor-built)
        # and probes it instead of building a bitmap per wave — the 10^10
        # path. Invariant: deltas merge into the store BEFORE the seen
        # commit, so the store is always a superset of committed seen
        # (false positives only).
        self.use_bloom = use_bloom
        self._bloom_store = None
        if use_bloom == "bucketed":
            import os

            from literature_crawler_spark.operators import bloom as bloom_mod

            root = os.path.join(store.root, "bloom")
            self._bloom_store = bloom_mod.BucketedBloomStore.open(root)
            if self._bloom_store is None:
                self._bloom_store = bloom_mod.BucketedBloomStore.create(
                    root, expected_items=2_000_000, n_buckets=n_buckets
                )
                seen = self.seen()
                if seen is not None:  # resume from a pre-bucketed-state run
                    self._bloom_store.merge(seen.select("url_hash"))
        # Optional Arrow-UDF fetch path (operators.fetch.Fetcher): when set,
        # waves fetch via mapInPandas over salt-spread partitions (the live
        # deploy path) instead of hash-joining the pages corpus table. Both
        # paths produce the identical fetched set on the synthetic corpus
        # (tests/test_fetch.py).
        self.fetcher = fetcher
        # the fetchable web: canonical url -> (host, links, caption, image_id)
        self.pages = pages.select(
            F.col("url").alias("page_url"),
            F.col("host").alias("page_host"),
            "links",
            "caption",
            "image_id",
        )

    # ------------------------------------------------------------ state ----
    def seen(self) -> DataFrame | None:
        return self.store.read(self.spark, "seen")

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
        cand = assign_global_seq(cand, ["seed_seq"], start=0)
        frontier0 = cand.select(
            "canon_url", "url_hash", "bucket", "host",
            F.lit(0).alias("priority"), "seq",
            F.lit(0).alias("wave"), F.lit("pending").alias("status"),
        )
        n = frontier0.count()
        self.store.commit("frontier", frontier0, mode="replace", wave=0, meta={"pending": n})
        if self._bloom_store is not None:  # superset invariant: bloom first
            self._bloom_store.merge(frontier0.select("url_hash"))
        self.store.commit(
            "seen",
            frontier0.select("url_hash", "canon_url", "bucket", "wave"),
            mode="append", wave=0, meta={"added": n},
        )
        return n

    # ------------------------------------------------------------- wave ----
    def run_wave(self, wave: int) -> dict:
        frontier = self.frontier()
        pending = frontier.filter(F.col("status") == "pending")

        # 1. politeness: per-host quota ranking (one shuffle on host)
        scheduled = pol.schedule_wave(pending, self.politeness, self.default_budget)
        scheduled = scheduled.persist()
        n_scheduled = scheduled.count()
        if n_scheduled == 0:
            scheduled.unpersist()
            return {"wave": wave, "scheduled": 0, "done": True}

        # 2. fetch: either the Arrow-UDF fetcher over salt-spread partitions
        #    (live deploy path) or a hash-join vs the pages corpus table
        #    (cheaper when the "web" is itself a table, as in tests/bench)
        if self.fetcher is not None:
            from literature_crawler_spark.operators import fetch as fetch_mod

            fetched = (
                fetch_mod.fetch_extract(scheduled, self.fetcher)
                .withColumn(
                    "page_url",
                    F.when(F.col("fetch_status") == "fetched", F.col("canon_url")),
                )
                .withColumn("page_host", F.col("host"))
                .persist()
            )
        else:
            fetched = scheduled.join(
                self.pages, scheduled.canon_url == self.pages.page_url, "left"
            ).persist()
        n_fetched = fetched.filter(F.col("page_url").isNotNull()).count()

        # 3. extract + canonicalize candidate links (posexplode keeps the
        #    in-document order the first-seen dedup needs — A4 semantics)
        links = fetched.filter(F.col("page_url").isNotNull()).select(
            F.col("seq").alias("parent_seq"),
            F.col("page_host").alias("base_host"),
            F.posexplode("links").alias("pos", "link"),
        )
        cand = fr.canonicalize_candidates(
            links.withColumnRenamed("link", "url"), base_host_col="base_host"
        )
        if self.robots is not None:
            cand = fr.apply_robots(cand, self.robots)
        cand = fr.first_seen_dedup(cand, ["parent_seq", "pos"])

        # 4. membership test: Bloom prefilter + exact anti-join vs seen
        seen = self.seen()
        seen_meta = self.store.latest("seen")
        new = fr.dedup_against_seen(
            self.spark, cand, seen,
            use_bloom=True if self.use_bloom == "bucketed" else self.use_bloom,
            expected_seen=(seen_meta or {}).get("meta", {}).get("total"),
            bloom_store=self._bloom_store,
        )

        # 5. dense numbering in (parent_seq, pos) order
        max_seq = frontier.agg(F.max("seq")).collect()[0][0] or 0
        new = assign_global_seq(new, ["parent_seq", "pos"], start=max_seq + 1)
        new_rows = new.select(
            "canon_url", "url_hash", "bucket", "host",
            F.lit(wave).alias("priority"), "seq",
            F.lit(wave).alias("wave"), F.lit("pending").alias("status"),
        ).persist()
        n_new = new_rows.count()

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
        n_pending_next = n_new + (pending.count() - n_scheduled)
        self.store.commit(
            "frontier", frontier_delta, mode="merge", wave=wave,
            meta={"pending": n_pending_next, "delta_rows": n_scheduled + n_new},
            merge_key=["url_hash"],
        )
        if self.compact_every and wave % self.compact_every == 0:
            self.store.compact("frontier")
        seen_total = ((seen_meta or {}).get("meta", {}).get("total") or 0) + n_new
        if self._bloom_store is not None and n_new:  # bloom BEFORE seen commit
            self._bloom_store.merge(new_rows.select("url_hash"))
        self.store.commit(
            "seen", new_rows.select("url_hash", "canon_url", "bucket", "wave"),
            mode="append", wave=wave, meta={"added": n_new, "total": seen_total},
        )
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
        scheduled.unpersist()
        fetched.unpersist()
        new_rows.unpersist()
        return metrics

    # -------------------------------------------------------------- run ----
    def run(self, seeds: DataFrame | None = None, max_waves: int = 10) -> list[dict]:
        """Run (or resume) the crawl. If the store has committed state the
        seed bootstrap is skipped and the loop continues from the last
        committed wave — the resume contract."""
        if self.last_wave() is None:
            assert seeds is not None, "first run needs a seed list"
            self.bootstrap(seeds)
        out = []
        start = (self.last_wave() or 0) + 1
        for wave in range(start, start + max_waves):
            m = self.run_wave(wave)
            out.append(m)
            if m.get("done"):
                break
        return out
