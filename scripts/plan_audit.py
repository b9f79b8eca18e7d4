"""Physical-plan audit: verify every headline query compiles to the plan
we want at 100 TB — filters pushed to the parquet scan, column-pruned
ReadSchema, broadcast joins for dimension tables, whole-stage codegen on
the hot path.

Writes PLANS.md with one section per query: the audit flags plus the
formatted plan. Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod
from literature_crawler_spark.session import get_spark

# queries over parquet tables where a filter must reach the scan
EXPECT_PUSHED = {
    "q1_pricing_summary",
    "q3_shipping_priority",
    "event_window_counts",
    "customers_with_big_orders",
}
# queries that must contain a broadcast join
EXPECT_BROADCAST = {
    "q3_shipping_priority",
    "q5_region_revenue",
    "crawl_canonicalize_counts",
    "crawl_seen_antijoin",
    "dim_link_counts",
    "ann_cosine_topk",
}
# generated-corpus / stream-shaped queries with no parquet scan
NO_SCAN = {
    "image_decode_stats", "image_resize_stats", "video_frame_sample",
    "audio_feature_extract", "crawl_wave_e2e", "ris_seed_parse",
    "browser_rendered_stats",
    "time_window_split",
}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if name not in NO_SCAN:
        reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        if reads:
            widths = [len(r.split(",")) for r in reads]
            flags.append(f"read-cols={widths}")
        if "PushedFilters: [" in plan:
            pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
            nonempty = [p for p in pushed if p.strip()]
            flags.append(f"pushed-filters={'yes' if nonempty else 'NONE'}")
            if name in EXPECT_PUSHED and not nonempty:
                flags.append("!! expected pushed filters, found none")
    has_bcast = "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    if name in EXPECT_BROADCAST and not has_bcast:
        flags.append("!! expected broadcast join, found none")
    elif has_bcast:
        flags.append("broadcast=yes")
    if "HashAggregate" in plan and "partial_" in plan:
        flags.append("partial-agg=yes")
    n_exchange = plan.count("Exchange")
    flags.append(f"exchanges={n_exchange}")
    if "InMemoryTableScan" in plan:
        flags.append("uses-cache")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    queries = entry_mod.queries()
    sections = []
    summary = []
    for name, fn in sorted(queries.items()):
        if name == "crawl_wave_e2e":  # stateful; audited via its components
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # pragma: no cover
            summary.append(f"| {name} | ERROR: {str(e).splitlines()[0][:120]} |")
            continue
        flags = audit(name, plan)
        bad = any(f.startswith("!!") for f in flags)
        summary.append(f"| {name} | {'⚠ ' if bad else ''}{'; '.join(flags)} |")
        sections.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
    lines = [
        "# PLANS — physical-plan audit of the driver-contract queries",
        "",
        f"Input: `{sf_dir}`. Checks: filters reach the parquet scan",
        "(PushedFilters), scans are column-pruned (ReadSchema width),",
        "dimension joins broadcast, map-side partial aggregation present.",
        "(AQE pre-execution plans do not print codegen ids; whole-stage",
        "codegen spans were verified on executed plans during the frontier",
        "kernel profiling — see operators/frontier.py plan-shape notes.)",
        "",
        "| query | audit |",
        "|---|---|",
        *summary,
        "",
        *sections,
    ]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(summary))
    spark.stop()


if __name__ == "__main__":
    main()
