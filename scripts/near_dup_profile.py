"""Profile doc_embedding_near_dups at sf0.1 (VERDICT r03 item 8).

Breaks the 1.8 s entry into stages — signature UDF, candidate
generation, verify joins — and times A/B variants:
  v0  shipped plan (post-threshold pair dedup)
  v1  pre-verify candidate-pair dedup (dropDuplicates before the joins)
  v2  signature bits as JVM HOF folds (no Python crossing)

Usage: python scripts/near_dup_profile.py   (one Spark JVM at a time)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from literature_crawler_spark.operators import similarity as sim
from literature_crawler_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=3):
    fn()  # warm
    best = min(fn() for _ in range(reps))
    print(f"{label:42s} {best:7.3f}s", flush=True)
    return best


def main():
    spark = get_spark("nearprof", master="local[32]")
    q = entry_mod.queries()["doc_embedding_near_dups"]

    def full():
        t0 = time.time()
        _mat(q(spark, SF_DIR))
        return time.time() - t0

    timed("v0 full entry", full)

    # stage decomposition on the same input the entry uses
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    dups = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    both = emb.unionByName(dups)
    n = both.count()
    n_planes = sim.default_near_dup_planes(n)
    n_tables = sim.default_near_dup_tables(0.9, n_planes)
    print(f"rows={n} planes={n_planes} tables={n_tables}", flush=True)

    base = both.select(F.col("vec_id").alias("_id"), F.col("embedding").alias("_v"))
    keys = sim._add_multi_buckets(base, "_v", 64, n_planes, n_tables, seed=42).select(
        "_id", "tbl", "bucket"
    )

    def sig_only():
        t0 = time.time()
        _mat(keys)
        return time.time() - t0

    timed("  signature UDF + explode", sig_only)

    cand = (
        keys.groupBy("tbl", "bucket")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
    )

    def cand_only():
        t0 = time.time()
        _mat(cand)
        return time.time() - t0

    timed("  + candidate pairs", cand_only)
    n_cand = cand.count()
    n_cand_uniq = cand.dropDuplicates(["id_a", "id_b"]).count()
    print(f"candidate pairs={n_cand} unique={n_cand_uniq}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
