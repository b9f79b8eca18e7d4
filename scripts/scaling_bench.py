"""Two-parallelism scaling evidence (north rule: efficiency >= 0.8 N -> 4N).

Runs bench.py in SEQUENTIAL subprocesses at local[8] and local[32] on the
same input and reports throughput at both plus scaling efficiency
(= rate_32 / (4 * rate_8) for the frontier kernel; wall-clock speedup for
the query suite). Writes BENCH.md.

Usage: python scripts/scaling_bench.py [sf_dir] [n_urls]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str, n_urls: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_URLS=str(n_urls),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    r8 = run(8, sf_dir, n_urls)
    r32 = run(32, sf_dir, n_urls)
    f8, f32 = r8["frontier"], r32["frontier"]
    eff = (f32["urls_per_sec"] / f8["urls_per_sec"]) / 4.0
    suite8 = sum(r8["queries"].values())
    suite32 = sum(r32["queries"].values())
    suite_speedup = suite8 / suite32 if suite32 else float("nan")
    lines = [
        "# BENCH — measured throughput + scaling evidence",
        "",
        f"Input: `{sf_dir}` + synthetic frontier of {n_urls:,} URLs (same input",
        "at both parallelism levels; `local[8]` vs `local[32]` is the sandbox",
        "surrogate for N vs 4N executors — no real cluster available here).",
        "",
        "| parallelism | frontier URLs/s | frontier sec | query suite sec |",
        "|---|---|---|---|",
        f"| local[8]  | {f8['urls_per_sec']:,} | {f8['sec']} | {round(suite8, 2)} |",
        f"| local[32] | {f32['urls_per_sec']:,} | {f32['sec']} | {round(suite32, 2)} |",
        "",
        f"**Frontier scaling efficiency (8 -> 32 cores): {eff:.2f}**",
        f"(rate_32 / (4 x rate_8); north-rule target >= 0.8)",
        "",
        f"Query-suite wall-clock speedup 8 -> 32: {suite_speedup:.2f}x",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r8),
        json.dumps(r32),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:14]))


if __name__ == "__main__":
    main()
