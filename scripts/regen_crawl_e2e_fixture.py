"""Regenerate tests/fixtures/crawl_e2e_expected.parquet — the DuckDB twin
for the crawl_wave_e2e driver entry (VERDICT r03 item 3).

The entry's wave loop is deterministic (engine == single-threaded crawl
oracle, tests/test_crawl_parity.py), so its full crawl-order ledger can be
value-gated: this script runs the exact entry once and freezes the result;
oracle_sql() reads the frozen parquet back in DuckDB, giving the driver a
rows+schema+hash check instead of the r3 rows-only gate.
tests/test_entry_parity.py fails if the live entry ever drifts from the
fixture, so the fixture cannot go silently stale.

Usage: python scripts/regen_crawl_e2e_fixture.py
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod
from literature_crawler_spark.session import get_spark


def main() -> None:
    spark = get_spark("regen_fixture", master="local[8]", shuffle_partitions=8)
    df = entry_mod.queries()["crawl_wave_e2e"](spark, "/root/testdata/sf0.001")
    pdf = df.toPandas()
    out = os.path.join(REPO, "tests", "fixtures", "crawl_e2e_expected.parquet")
    pdf.to_parquet(out, index=False)
    print(f"wrote {out}: {len(pdf)} rows, cols={list(pdf.columns)}")
    spark.stop()


if __name__ == "__main__":
    main()
