"""Bucketed cuckoo-filter URL-seen store — the deletable alternative to
``bloom.BucketedBloomStore`` (the north rule names "bloom/cuckoo" as the
two admissible seen-set structures).

Why a second structure: a Bloom bitmap can only ever grow, so retracting
a URL from the seen set (recrawl-after-expiry — the reference re-enters a
protocol when its ``version_id`` changes, ``protocol_io_crawl.py``'s
update path — or un-committing a failed wave) forces a full rebuild. A
cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT 2014 — public) supports O(1) delete of previously-inserted
keys at comparable space and a LOWER false-positive rate, so the seen
store can follow the seen table's MERGE deltas in both directions.

Layout mirrors the Bloom store (one file per ``pmod(url_hash,
n_buckets)`` bucket, executor-side single-writer merge, lazy process-
cache probe, seen-snapshot watermark), so ``CrawlEngine`` and
``frontier.dedup_against_seen`` accept either store through the same
``might_contain_col`` / ``merge`` duck-type.

Per-bucket file format: a uint16 array of shape (m, SLOTS) where 0 =
empty slot. The two candidate rows for hash h are

    i1 = high-mixed(h) mod m
    i2 = i1 XOR mix(fingerprint) mod m      (partial-key cuckooing)

so relocation needs only the stored fingerprint, never the key. m is a
power of two; fingerprints are 16-bit (0 remaps to 1 so 0 can mean
"empty"), giving FPR ~ 2*SLOTS/2^16 ~ 0.02% per probe — ~50x below the
Bloom default fpp=0.01.

Resize contract: tables are sized at ``create(expected_items)`` exactly
like the Bloom store. Fingerprints cannot recover their keys, so a
bucket that overflows CANNOT grow in place without risking the superset
invariant (a dropped key = false negative = re-crawled duplicate).
Overflow therefore surfaces as ``CuckooOverflow`` on the driver, and the
owner (CrawlEngine holds the authoritative committed ``seen`` table)
rebuilds: ``create(root, 2x)`` + ``merge(seen ∪ delta)``. This is the
standard production answer to cuckoo resize — rebuild from source.

Deletion caveat (inherent, same as counting Bloom): deleting a key that
was never inserted can evict another key's identical fingerprint and
create a false negative. The engine only ever deletes keys read back
from the committed ``seen`` table, which the merge path inserted.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4  # slots per table row (the paper's b=4 sweet spot)
MAX_KICKS = 500
MAX_LOAD = 0.95  # the paper's achievable load at b=4

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
_FP_MIX = np.uint64(0x5BD1E9955BD1E995)


class CuckooOverflow(RuntimeError):
    """A bucket exceeded its capacity; rebuild from the authoritative key
    set: ``BucketedCuckooStore.create(root, 2 * expected)`` then
    ``merge(all_keys)``. Raised on the DRIVER after the merge action."""


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from 64-bit hashes (high bits of a
    multiplicative mix; 0 remaps to 1 so 0 can mean 'empty slot')."""
    f = ((h.astype(np.int64).view(np.uint64) * _MIX1) >> np.uint64(48)).astype(np.uint16)
    f[f == 0] = 1
    return f


def _index1(h: np.ndarray, m: int) -> np.ndarray:
    return (
        ((h.astype(np.int64).view(np.uint64) * _MIX2) >> np.uint64(32))
        % np.uint64(m)
    ).astype(np.int64)


def _alt_index(i: np.ndarray, f: np.ndarray, m: int) -> np.ndarray:
    """Partial-key alternate row: i XOR mix(f), mod power-of-two m (the
    XOR-then-mask form keeps i1/i2 a symmetric pair: alt(alt(i)) == i)."""
    return (
        (i.astype(np.uint64) ^ ((f.astype(np.uint64) * _FP_MIX) >> np.uint64(32)))
        % np.uint64(m)
    ).astype(np.int64)


def rows_for(n_keys: int) -> int:
    """Power-of-two row count for n_keys at MAX_LOAD and SLOTS per row."""
    rows = max(4, int(n_keys / (SLOTS * MAX_LOAD)) + 1)
    return 1 << (rows - 1).bit_length()


class _Table:
    """In-memory (m, SLOTS) uint16 cuckoo table for ONE bucket file."""

    def __init__(self, arr: np.ndarray) -> None:
        self.arr = arr  # shape (m, SLOTS)

    @property
    def m(self) -> int:
        return self.arr.shape[0]

    def _try_place(self, row: int, f: int) -> bool:
        slots = self.arr[row]
        empty = np.flatnonzero(slots == 0)
        if len(empty):
            slots[empty[0]] = f
            return True
        return False

    def insert_one(self, i1: int, f: int) -> bool:
        i2 = int(_alt_index(np.array([i1]), np.array([f], dtype=np.uint16), self.m)[0])
        if self._try_place(i1, f) or self._try_place(i2, f):
            return True
        # eviction walk; deterministic victim choice keeps runs reproducible
        row, fp = i2, f
        for kick in range(MAX_KICKS):
            victim_slot = kick % SLOTS
            fp, self.arr[row, victim_slot] = int(self.arr[row, victim_slot]), int(fp)
            row = int(
                _alt_index(np.array([row]), np.array([fp], dtype=np.uint16), self.m)[0]
            )
            if self._try_place(row, fp):
                return True
        return False

    def insert_batch(self, h: np.ndarray) -> int:
        """Insert hashes until the first placement failure; returns 0 on
        full success, nonzero on overflow. The caller discards the file
        and rebuilds bigger on ANY overflow, so continuing past the
        first failure is pure waste — and pathological: every insert
        into a full table walks MAX_KICKS evictions, so a badly
        undersized bucket would burn minutes before reporting what the
        first failure already proved."""
        f = _fingerprints(h)
        i1 = _index1(h, self.m)
        for j in range(len(h)):
            if not self.insert_one(int(i1[j]), int(f[j])):
                return len(h) - j
        return 0

    def contains(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        f = _fingerprints(h)
        i1 = _index1(h, self.m)
        i2 = _alt_index(i1, f, self.m)
        hit1 = (self.arr[i1] == f[:, None]).any(axis=1)
        hit2 = (self.arr[i2] == f[:, None]).any(axis=1)
        return hit1 | hit2

    def delete_batch(self, h: np.ndarray) -> int:
        """Remove ONE stored copy per requested key (keys must have been
        inserted). Returns how many were found and removed."""
        removed = 0
        f = _fingerprints(h)
        i1 = _index1(h, self.m)
        i2 = _alt_index(i1, f, self.m)
        for j in range(len(h)):
            for row in (int(i1[j]), int(i2[j])):
                slots = self.arr[row]
                hit = np.flatnonzero(slots == f[j])
                if len(hit):
                    slots[hit[0]] = 0
                    removed += 1
                    break
        return removed


# Process-local probe cache, keyed by (path, mtime_ns) like the Bloom one.
_TABLE_CACHE: dict[tuple[str, int], np.ndarray] = {}
_TABLE_CACHE_CAP = 256


def _load_table(path: str) -> np.ndarray | None:
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return None
    key = (path, mtime)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    arr = np.fromfile(path, dtype=np.uint16).reshape(-1, SLOTS)
    for old in [kk for kk in _TABLE_CACHE if kk[0] == path]:
        del _TABLE_CACHE[old]
    while len(_TABLE_CACHE) >= _TABLE_CACHE_CAP:
        del _TABLE_CACHE[next(iter(_TABLE_CACHE))]
    _TABLE_CACHE[key] = arr
    return arr


class BucketedCuckooStore:
    """One cuckoo-filter FILE per ``pmod(url_hash, n_buckets)`` bucket.

    Same lifecycle/merge/probe/watermark surface as BucketedBloomStore,
    plus ``delete`` — built and probed entirely on executors; the driver
    only ever sees per-bucket counts.
    """

    def __init__(self, root: str, n_buckets: int, bucket_rows: int) -> None:
        self.root = root
        self.n_buckets = n_buckets
        self.bucket_rows = bucket_rows

    # ------------------------------------------------------- lifecycle ----
    @classmethod
    def create(
        cls, root: str, expected_items: int, n_buckets: int = 64
    ) -> "BucketedCuckooStore":
        """Size each bucket's table for expected_items/n_buckets keys."""
        bucket_rows = rows_for(max(expected_items // n_buckets, 1))
        os.makedirs(root, exist_ok=True)
        import glob as _glob

        for stale in _glob.glob(os.path.join(root, "b*.cuckoo")):
            os.remove(stale)
        try:
            os.remove(os.path.join(root, "_watermark.json"))
        except OSError:
            pass
        with open(os.path.join(root, "_params.json"), "w") as f:
            json.dump(
                {
                    "kind": "cuckoo",
                    "n_buckets": n_buckets,
                    "bucket_rows": bucket_rows,
                    "slots": SLOTS,
                },
                f,
            )
        return cls(root, n_buckets, bucket_rows)

    @classmethod
    def open(cls, root: str) -> "BucketedCuckooStore | None":
        try:
            with open(os.path.join(root, "_params.json")) as f:
                p = json.load(f)
        except OSError:
            return None
        if p.get("kind") != "cuckoo":
            return None
        return cls(root, p["n_buckets"], p["bucket_rows"])

    def bucket_path(self, bucket: int) -> str:
        return os.path.join(self.root, f"b{bucket:05d}.cuckoo")

    # ------------------------------------------------------- watermark ----
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
        """Insert a delta of hash keys into the per-bucket files.

        One shuffle of keys on the bucket id; each bucket group inserts
        into its table IN THE EXECUTOR TASK (atomic tmp+rename, single
        writer per bucket). An overflowing bucket leaves its existing
        file UNTOUCHED and reports failure; the driver then raises
        ``CuckooOverflow`` so the owner rebuilds from the authoritative
        key set (see module docstring) — committing a partial table would
        silently drop keys, i.e. manufacture false negatives.
        """
        root, bucket_rows = self.root, self.bucket_rows

        def fold(key, pdf):
            b = int(key[0])
            h = pdf[hash_col].to_numpy()
            path = os.path.join(root, f"b{b:05d}.cuckoo")
            existing = _load_table(path)
            if existing is not None:
                table = _Table(existing.copy())
            else:
                table = _Table(np.zeros((bucket_rows, SLOTS), dtype=np.uint16))
            failed = table.insert_batch(h)
            if failed == 0:
                tmp = f"{path}.tmp.{os.getpid()}"
                table.arr.tofile(tmp)
                os.replace(tmp, path)
            return pd.DataFrame(
                {"bucket": [b], "n_keys": [len(h)], "n_failed": [failed]}
            )

        rows = self._fold_by_bucket(
            df, hash_col, fold, out="bucket int, n_keys long, n_failed long"
        )
        overflowed = [r["bucket"] for r in rows if r["n_failed"]]
        if overflowed:
            raise CuckooOverflow(
                f"buckets {overflowed} over capacity "
                f"({self.bucket_rows} rows x {SLOTS} slots); rebuild: "
                f"create(root, 2x expected) + merge(full key set)"
            )
        return {r["bucket"]: r["n_keys"] for r in rows}

    def delete(self, df: DataFrame, hash_col: str = "url_hash") -> dict[int, int]:
        """Remove previously-inserted keys (the retract/recrawl path Bloom
        cannot serve). Same single-writer-per-bucket shape as merge."""
        root = self.root

        def fold(key, pdf):
            b = int(key[0])
            h = pdf[hash_col].to_numpy()
            path = os.path.join(root, f"b{b:05d}.cuckoo")
            existing = _load_table(path)
            removed = 0
            if existing is not None and len(h):
                table = _Table(existing.copy())
                removed = table.delete_batch(h)
                tmp = f"{path}.tmp.{os.getpid()}"
                table.arr.tofile(tmp)
                os.replace(tmp, path)
            return pd.DataFrame({"bucket": [b], "n_removed": [removed]})

        rows = self._fold_by_bucket(
            df, hash_col, fold, out="bucket int, n_removed long"
        )
        return {r["bucket"]: r["n_removed"] for r in rows}

    def _fold_by_bucket(
        self, df: DataFrame, hash_col: str, fold, out: str
    ) -> list[Any]:
        keyed = df.select(
            F.pmod(F.col(hash_col), F.lit(self.n_buckets)).cast("int").alias("_cb"),
            F.col(hash_col),
        )
        return keyed.groupBy("_cb").applyInPandas(fold, out).collect()

    # ----------------------------------------------------------- probe ----
    def probe_np(self, hn: np.ndarray) -> np.ndarray:
        """Vectorized membership test of an int64 hash array (same contract
        as BucketedBloomStore.probe_np — shared by the pandas_udf probe and
        the fused canonicalize kernel). Picklable instance, lazy per-bucket
        table loads through the process cache."""
        from literature_crawler_spark.operators.bloom import probe_bucketed

        def test(b: int, sub: np.ndarray) -> np.ndarray | None:
            arr = _load_table(os.path.join(self.root, f"b{b:05d}.cuckoo"))
            return None if arr is None else _Table(arr).contains(sub)

        return probe_bucketed(hn, self.n_buckets, test)

    def might_contain_col(self, hash_col: Column) -> Column:
        """Membership-test Column (same contract as the Bloom store's)."""
        store = self

        @F.pandas_udf(T.BooleanType())
        def _probe(h: pd.Series) -> pd.Series:
            return pd.Series(store.probe_np(h.to_numpy()))

        return _probe(hash_col)
