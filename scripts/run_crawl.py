"""spark-submit entry point for the crawl engine (north-rule launch path).

Package the library and submit — the same invocation works on a
multi-executor cluster (set --master / executor confs as usual):

    cd /root/repo && zip -qr /tmp/lcs.zip literature_crawler_spark
    spark-submit --master local[8] --py-files /tmp/lcs.zip \
        scripts/run_crawl.py --state /tmp/crawl_state --waves 3 \
        --pages 2000 --hosts 20 --budget 10

Re-running with the same --state resumes from the last committed
snapshot (the resume contract); pass --fresh to wipe and restart.
Prints one JSON line per wave plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import shutil

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True, help="snapshot store root dir")
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--hosts", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=50)
    ap.add_argument("--budget", type=int, default=10)
    ap.add_argument("--fresh", action="store_true", help="wipe state first")
    ap.add_argument("--fetch", choices=["join", "udf", "rendered"], default="join",
                    help="fetch stage: pages-table hash-join, Arrow-UDF fetcher, "
                         "or the browser-rendered fetcher (S6)")
    args = ap.parse_args()

    # spark-submit owns master/executor config; only app-level knobs here
    spark = (
        SparkSession.builder.appName("literature-crawler-spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # imports resolved from --py-files on executors
    from literature_crawler_spark.plans.crawl import CrawlEngine
    from literature_crawler_spark.plans.state import SnapshotStore
    from literature_crawler_spark.sources import synthetic as syn

    if args.fresh:
        shutil.rmtree(args.state, ignore_errors=True)
    store = SnapshotStore(args.state)
    fetcher = None
    if args.fetch == "udf":
        from literature_crawler_spark.operators import fetch as fetch_mod

        fetcher = fetch_mod.make_synthetic_fetcher(args.pages, args.hosts)
    elif args.fetch == "rendered":
        from literature_crawler_spark.operators import browser as browser_mod

        fetcher = browser_mod.as_fetcher(
            browser_mod.make_synthetic_renderer(args.pages, args.hosts)
        )
    engine = CrawlEngine(
        spark,
        store,
        pages=syn.generate_pages(spark, args.pages, args.hosts, with_images=True),
        robots=syn.generate_robots(spark),
        politeness=syn.generate_politeness(spark, args.hosts, args.budget),
        fetcher=fetcher,
    )
    seeds = None
    if engine.last_wave() is None:
        seeds = syn.generate_seeds(spark, args.seeds, args.pages, args.hosts)
    metrics = engine.run(seeds, max_waves=args.waves)
    for m in metrics:
        print(json.dumps(m))
    seen = engine.seen()
    order = engine.crawl_order()
    print(
        json.dumps(
            {
                "summary": True,
                "waves_run": len(metrics),
                "last_wave": engine.last_wave(),
                "seen_total": seen.count() if seen is not None else 0,
                "scheduled_total": order.count() if order is not None else 0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
