"""Distributed Bloom filters over a 64-bit hash column.

The frontier's seen-membership test (reference: per-row
``query.filter_by(...).first()``, ``protocol_io_crawl.py:100``) needs a cheap
prefilter so the exact LEFT ANTI join only shuffles the candidates that
*might* be seen. This PySpark build lacks the JVM ``bloom_filter_agg``
(not registered in 4.1 local), so the filters are NumPy bitmaps moved as
Arrow batches. Two layouts:

* ``BloomFilter`` (single bitmap) — the SMALL path (seen < ~10^7 keys,
  bitmap ~1-12 MB): partitions fold local bitmaps (``mapInPandas``), a
  coalesced second fold tree-merges them so the driver only ORs a handful
  of bitmaps, then the result broadcasts for a vectorized probe UDF.
* ``BucketedBloomStore`` — the 10^10 path: ONE bitmap file per
  ``pmod(url_hash, n_buckets)`` bucket, built/merged entirely on
  executors (``applyInPandas`` over the bucket key writes each bucket's
  file directly — the driver only ever sees per-bucket row counts), and
  probed by a pandas UDF that lazily loads the buckets it touches through
  a process-local cache. This is the same sidecar shape as Iceberg Puffin
  blobs: state lives next to the table, partition-pruned by the same key
  the ``seen`` table is bucketed by, and per-wave deltas OR into the
  existing files instead of rebuilding.

Correctness invariant: the store must always be a SUPERSET of the
committed ``seen`` table (merge bloom BEFORE committing seen) — false
positives only cost a wasted exact-join probe; a stale/missing key would
be a false negative and skip the exact join. Enforced two ways: deltas
merge into the store BEFORE each seen commit, and the store records a
seen-snapshot watermark (``set_watermark``) that CrawlEngine checks on
open — a store behind the committed seen set is re-merged (idempotent
OR) before any probe runs.
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Multiply-shift constants for deriving k probe positions from one 64-bit
# hash (Kirsch-Mitzenmacher double hashing: pos_i = h1 + i*h2).
_KM_MULT1 = np.uint64(0x9E3779B97F4A7C15)
_KM_MULT2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _probe_positions(hashes: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(len(hashes), k) array of bit positions, fully vectorized.

    h1/h2 take the HIGH 32 bits of the multiplicative mix: with a
    power-of-2 modulus, low product bits depend only on low input bits,
    which would collapse the probe pattern space to ~2^19 and inflate the
    false-positive rate ~20x (observed before this fix).

    ``n_bits`` is always a power of two (optimal_params rounds up), so the
    reduction is a mask, not a modulo — uint64 division was the single
    hottest instruction of the fused frontier probe (k=12 divides/row x
    8M rows/wave; measured ~2x whole-probe speedup from this change).
    """
    # a real raise, not an assert: python -O must not let a foreign or
    # hand-edited _params.json mask positions with a wrong (n_bits-1) —
    # that would be Bloom false negatives, i.e. silent re-crawls
    if n_bits & (n_bits - 1) != 0:
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")
    h = hashes.astype(np.int64).view(np.uint64)
    h1 = (h * _KM_MULT1) >> np.uint64(32)
    h2 = ((h * _KM_MULT2) >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) & np.uint64(n_bits - 1)).astype(np.int64)


def probe_bucketed(hn: np.ndarray, n_buckets: int, bucket_test) -> np.ndarray:
    """Per-bucket membership-probe skeleton shared by the Bloom and cuckoo
    stores (each bucket's filter lives in its own file keyed by
    ``pmod(url_hash, n_buckets)``): zero-init output, Spark-pmod bucket
    derivation, one ``bucket_test(bucket, sub_hashes)`` call per distinct
    bucket. ``bucket_test`` returns a bool array, or None when the bucket
    file is absent — no keys were ever merged there, so definitely not
    contained."""
    out = np.zeros(len(hn), dtype=bool)
    if len(hn) == 0:
        return out
    buckets = np.mod(hn.astype(np.int64), n_buckets)  # == Spark pmod
    for b in np.unique(buckets):
        mask = buckets == b
        res = bucket_test(int(b), hn[mask])
        if res is not None:
            out[mask] = res
    return out


def optimal_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, k) for a target false-positive rate."""
    n = max(expected_items, 1)
    n_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    n_bits = 1 << (n_bits - 1).bit_length()  # pow2 -> cheap modulo
    k = max(1, round(n_bits / n * math.log(2)))
    return n_bits, min(k, 16)


class BloomFilter:
    """Immutable bitmap + params; picklable for Spark broadcast."""

    def __init__(self, bitmap: np.ndarray, n_bits: int, k: int) -> None:
        self.bitmap = bitmap  # uint8 array, n_bits/8 long
        self.n_bits = n_bits
        self.k = k

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = _probe_positions(np.asarray(hashes), self.k, self.n_bits)
        bits = (self.bitmap[pos >> 3] >> (pos & 7)) & 1
        return bits.all(axis=1)


def build_bloom(
    df: DataFrame, hash_col: str, expected_items: int, fpp: float = 0.01
) -> BloomFilter:
    """Build a single-bitmap BloomFilter from a 64-bit hash column.

    Partition-parallel with a TREE merge: executors fold hashes into local
    bitmaps, a coalesced second stage ORs those partials executor-side, and
    the driver only ORs the <= ``_MERGE_FANIN`` survivors — driver memory is
    bounded by a constant number of bitmaps regardless of input partitions.
    (This is the < ~10^7-key path; above that use ``BucketedBloomStore``.)
    """
    n_bits, k = optimal_params(expected_items, fpp)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bool scatter + packbits is ~50x faster than np.bitwise_or.at
        # (unbuffered fancy indexing); n_bits/8 bytes per partition bitmap
        bits = np.zeros(n_bits, dtype=bool)
        saw = False
        for pdf in batches:
            h = pdf[hash_col].to_numpy()
            if len(h) == 0:
                continue
            saw = True
            bits[_probe_positions(h, k, n_bits).ravel()] = True
        if saw:
            yield pd.DataFrame(
                {"bitmap": [np.packbits(bits, bitorder="little").tobytes()]}
            )

    def or_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            for blob in pdf["bitmap"]:
                m = np.frombuffer(blob, dtype=np.uint8)
                acc = m.copy() if acc is None else acc | m
        if acc is not None:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    partials = df.select(hash_col).mapInPandas(fold, "bitmap binary")
    parts = partials.coalesce(_MERGE_FANIN).mapInPandas(or_merge, "bitmap binary").collect()
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bitmap, dtype=np.uint8)
    return BloomFilter(out, n_bits, k)


_MERGE_FANIN = 8


def might_contain_col(
    spark: SparkSession, bloom: BloomFilter, hash_col: Column
) -> Column:
    """Vectorized membership-test Column against a broadcast BloomFilter."""
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf(T.BooleanType())
    def _probe(h: pd.Series) -> pd.Series:
        return pd.Series(bc.value.might_contain(h.to_numpy()))

    return _probe(hash_col)


# ----------------------------------------------------- bucketed store ----

# Process-local cache of loaded bucket bitmaps, keyed by (path, mtime_ns)
# so a merged (rewritten) bucket file invalidates its stale entry. Bounded:
# oldest entries evicted so executor memory stays ~cap x bucket bitmap.
_BUCKET_CACHE: dict[tuple[str, int], np.ndarray] = {}
_BUCKET_CACHE_CAP = 256


def _load_bucket(path: str) -> np.ndarray | None:
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return None
    key = (path, mtime)
    hit = _BUCKET_CACHE.get(key)
    if hit is not None:
        return hit
    bm = np.fromfile(path, dtype=np.uint8)
    # drop stale versions of the same path, then bound total entries
    for old in [kk for kk in _BUCKET_CACHE if kk[0] == path]:
        del _BUCKET_CACHE[old]
    while len(_BUCKET_CACHE) >= _BUCKET_CACHE_CAP:
        del _BUCKET_CACHE[next(iter(_BUCKET_CACHE))]
    _BUCKET_CACHE[key] = bm
    return bm


class BucketedBloomStore:
    """One Bloom bitmap FILE per ``pmod(url_hash, n_buckets)`` bucket.

    The 10^10-scale layout the round-1 docstring promised: built and merged
    entirely on executors (the driver never materializes a bitmap), probed
    through a per-process lazy cache. On a cluster ``root`` is shared
    storage (the same place the ``seen`` table lives — an Iceberg Puffin
    sidecar in spirit); in local mode it is a directory.
    """

    def __init__(self, root: str, n_buckets: int, n_bits: int, k: int) -> None:
        self.root = root
        self.n_buckets = n_buckets
        self.n_bits = n_bits
        self.k = k

    # ------------------------------------------------------- lifecycle ----
    @classmethod
    def create(
        cls,
        root: str,
        expected_items: int,
        n_buckets: int = 64,
        fpp: float = 0.01,
    ) -> "BucketedBloomStore":
        """Size each bucket's bitmap for expected_items/n_buckets keys."""
        per_bucket = max(expected_items // n_buckets, 1)
        n_bits, k = optimal_params(per_bucket, fpp)
        os.makedirs(root, exist_ok=True)
        # a fresh store must not inherit bitmaps (possibly differently
        # sized/keyed) from an earlier run in the same root
        import glob as _glob

        for stale in _glob.glob(os.path.join(root, "b*.bloom")):
            os.remove(stale)
        try:
            os.remove(os.path.join(root, "_watermark.json"))
        except OSError:
            pass
        with open(os.path.join(root, "_params.json"), "w") as f:
            json.dump({"n_buckets": n_buckets, "n_bits": n_bits, "k": k}, f)
        return cls(root, n_buckets, n_bits, k)

    @classmethod
    def open(cls, root: str) -> "BucketedBloomStore | None":
        try:
            with open(os.path.join(root, "_params.json")) as f:
                p = json.load(f)
        except OSError:
            return None
        # a root previously created by a DIFFERENT store kind (e.g.
        # use_bloom='cuckoo' writes {kind:'cuckoo',...} without n_bits)
        # must read as absent so the engine recreates a bloom store,
        # mirroring BucketedCuckooStore.open's kind guard
        if p.get("kind") not in (None, "bloom"):
            return None
        try:
            return cls(root, p["n_buckets"], p["n_bits"], p["k"])
        except KeyError:
            return None

    def bucket_path(self, bucket: int) -> str:
        return os.path.join(self.root, f"b{bucket:05d}.bloom")

    # ------------------------------------------------------- watermark ----
    # The superset invariant (store ⊇ committed seen) only holds if the
    # store was maintained alongside every seen commit. The watermark
    # records the last seen-snapshot id the store provably covers, so a
    # reopened store that is BEHIND the seen table (e.g. earlier runs with
    # a different use_bloom mode) is detected and re-merged instead of
    # silently producing false negatives. OR-merges are idempotent, so
    # re-merging after a crash between merge and watermark write is safe.
    def watermark(self) -> int | None:
        try:
            with open(os.path.join(self.root, "_watermark.json")) as f:
                return json.load(f)["seen_snapshot"]
        except (OSError, KeyError, ValueError):
            return None

    def set_watermark(self, seen_snapshot: int) -> None:
        path = os.path.join(self.root, "_watermark.json")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"seen_snapshot": seen_snapshot}, f)
        os.replace(tmp, path)

    # ----------------------------------------------------------- merge ----
    def merge(self, df: DataFrame, hash_col: str = "url_hash") -> dict[int, int]:
        """OR a delta of hash keys into the per-bucket bitmap files.

        One shuffle of (hash) keys on the bucket id; each bucket's group is
        folded into a bitmap and OR-written to its file IN THE EXECUTOR
        TASK (atomic tmp+rename). Returns {bucket: n_keys_merged} — the only
        thing that ever reaches the driver.
        """
        root, n_bits, k, n_buckets = self.root, self.n_bits, self.k, self.n_buckets

        def fold(key, pdf):
            b = int(key[0])
            h = pdf[hash_col].to_numpy()
            bits = np.zeros(n_bits, dtype=bool)
            bits[_probe_positions(h, k, n_bits).ravel()] = True
            packed = np.packbits(bits, bitorder="little")
            path = os.path.join(root, f"b{b:05d}.bloom")
            if os.path.exists(path):
                packed |= np.fromfile(path, dtype=np.uint8)
            tmp = f"{path}.tmp.{os.getpid()}"
            packed.tofile(tmp)
            os.replace(tmp, path)
            return pd.DataFrame({"bucket": [b], "n_keys": [len(h)]})

        keyed = df.select(
            F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int").alias("_bb"),
            F.col(hash_col),
        )
        rows = (
            keyed.groupBy("_bb")
            .applyInPandas(fold, "bucket int, n_keys long")
            .collect()
        )
        return {r["bucket"]: r["n_keys"] for r in rows}

    # ----------------------------------------------------------- probe ----
    def probe_np(self, hn: np.ndarray) -> np.ndarray:
        """Vectorized membership test of an int64 hash array — the numpy
        core shared by the ``pandas_udf`` probe and the fused canonicalize
        kernel (``frontier.canonicalize_candidates(probe_store=...)``),
        which calls it in-process to avoid a second Arrow crossing.
        Missing bucket file = no keys ever merged = definitely not
        contained. The instance is picklable (root + 3 ints), so it ships
        inside UDF closures; bitmaps load lazily through the process cache.
        """
        def test(b: int, sub: np.ndarray) -> np.ndarray | None:
            bm = _load_bucket(os.path.join(self.root, f"b{b:05d}.bloom"))
            if bm is None:
                return None
            pos = _probe_positions(sub, self.k, self.n_bits)
            bits = (bm[pos >> 3] >> (pos & 7)) & 1
            return bits.all(axis=1)

        return probe_bucketed(hn, self.n_buckets, test)

    def might_contain_col(self, hash_col: Column) -> Column:
        """Membership-test Column: a pandas UDF over ``probe_np``."""
        store = self

        @F.pandas_udf(T.BooleanType())
        def _probe(h: pd.Series) -> pd.Series:
            return pd.Series(store.probe_np(h.to_numpy()))

        return _probe(hash_col)
