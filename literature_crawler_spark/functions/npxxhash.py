"""Vectorized XXH64 (Spark-exact) over variable-length strings in numpy.

Why this exists: the frontier hot path pays one Arrow crossing for the
canonicalize kernel (``operators/frontier.py``) and — before round 4 — a
SECOND crossing for the seen-store probe ``pandas_udf``. A local-mode JVM's
Arrow serialize/deserialize lane is flat at ~4-5M rows/s regardless of
cores (BENCH.md probe isolation), so each extra crossing halves the
achievable frontier rate. Computing ``xxhash64(canon_url)`` INSIDE the
canonicalize kernel (and probing the store there too) removes that second
crossing entirely — but only if the Python-side hash is bit-identical to
Spark's ``F.xxhash64``, because the same hash keys the committed ``seen``
state tables, the bucket layout, and every anti-join.

This module is that hash: the standard XXH64 algorithm (same layout Spark's
``XxHash64``/``sql.catalyst.expressions.XxHash64`` implements for UTF8String
input, default seed 42), vectorized across a batch of variable-length byte
strings with masked numpy lane ops. Equality with ``F.xxhash64`` is
property-tested in ``tests/test_npxxhash.py`` (random unicode, all length
classes, boundary lengths 0/4/8/31/32/33).

Reference semantics being served: the per-URL seen lookup
(``/root/reference/app/service/protocol_io/process_task/protocol_io_crawl.py:100``)
keyed here by a 64-bit hash instead of a DB primary key.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_U64 = np.uint64


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


# Padded-matrix budget per dense sub-batch. The dense kernel allocates
# (n_rows, padded_max_len) — without a cap, ONE pathological row (a ~1 MB
# data:/javascript: pseudo-URL in a 10k-row Arrow batch) would densify to
# ~10 GB and OOM the Python worker. Rows are length-sorted and chunked so
# each chunk's matrix stays under this budget; typical URL batches
# (10k x ~160 B padded ~= 1.6 MB) take the single-chunk fast path.
_DENSE_BYTES_CAP = 1 << 26  # 64 MiB


def _pad32(length: int) -> int:
    return max(((int(length) + 31) // 32) * 32, 32)


def xxhash64_concat(data: np.ndarray, offsets: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of each slice ``data[offsets[i]:offsets[i+1]]`` (uint8 bytes).

    Matches Spark's ``xxhash64`` on the UTF-8 bytes of a string column.
    Returns int64 (Spark's signed view of the hash). Fully vectorized:
    strings are scattered into a zero-padded (n, width) matrix and every
    XXH64 step runs as masked lane ops across the whole batch — the loop
    counts are bounded by max_len/8, not by n. Memory is bounded by
    ``_DENSE_BYTES_CAP``: when one long outlier would blow up the padded
    matrix, rows are length-sorted and hashed in width-homogeneous chunks.
    """
    offsets = offsets.astype(np.int64, copy=False)
    n = len(offsets) - 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    lens = np.diff(offsets)
    if n * _pad32(lens.max()) <= _DENSE_BYTES_CAP:
        return _xxh64_dense(data, offsets, lens, seed)
    # slow path: length-sort, chunk so each chunk's (rows x padded-max)
    # matrix fits the budget, hash each chunk densely, scatter back
    order = np.argsort(lens, kind="stable")
    out = np.empty(n, dtype=np.int64)
    start = 0
    while start < n:
        end = start + 1
        while (
            end < n
            and (end - start + 1) * _pad32(lens[order[end]]) <= _DENSE_BYTES_CAP
        ):
            end += 1
        idx = order[start:end]
        sub_lens = lens[idx]
        sub_off = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(sub_lens, out=sub_off[1:])
        gather = np.repeat(offsets[:-1][idx], sub_lens) + (
            np.arange(sub_off[-1], dtype=np.int64) - np.repeat(sub_off[:-1], sub_lens)
        )
        out[idx] = _xxh64_dense(data[gather], sub_off, sub_lens, seed)
        start = end
    return out


def _xxh64_dense(
    data: np.ndarray, offsets: np.ndarray, lens: np.ndarray, seed: int
) -> np.ndarray:
    old = np.seterr(over="ignore")
    try:
        n = len(offsets) - 1
        width = _pad32(lens.max())
        buf = np.zeros((n, width), dtype=np.uint8)
        if len(data):
            # scatter each string's bytes to the start of its padded row
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            col_idx = np.arange(offsets[0], offsets[-1], dtype=np.int64) - np.repeat(
                offsets[:-1], lens
            )
            buf.reshape(-1)[row_idx * width + col_idx] = data[offsets[0] : offsets[-1]]
        lanes64 = buf.view("<u8")
        lanes32 = buf.view("<u4")
        rows = np.arange(n)

        seed_u = _U64(seed)
        h = np.full(n, seed_u + _P5, dtype=np.uint64)
        long_mask = lens >= 32
        if long_mask.any():
            v1 = np.full(n, seed_u + _P1 + _P2, dtype=np.uint64)
            v2 = np.full(n, seed_u + _P2, dtype=np.uint64)
            v3 = np.full(n, seed_u, dtype=np.uint64)
            v4 = np.full(n, seed_u - _P1, dtype=np.uint64)
            n_stripes = lens // 32
            for s in range(int(n_stripes.max())):
                m = n_stripes > s
                base = 4 * s
                for j, v in enumerate((v1, v2, v3, v4)):
                    nv = _rotl(v + lanes64[:, base + j] * _P2, 31) * _P1
                    v[m] = nv[m]
            acc = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                acc ^= _rotl(v * _P2, 31) * _P1
                acc = acc * _P1 + _P4
            h[long_mask] = acc[long_mask]
        h += lens.astype(np.uint64)

        # tail: 8-byte words (done is a per-row byte cursor, multiple of 8)
        done = (lens // 32) * 32
        remaining = lens - done
        for _ in range(int((remaining // 8).max())):
            m = remaining >= 8
            lane = lanes64[rows, np.minimum(done >> 3, width // 8 - 1)]
            nh = _rotl(h ^ (_rotl(lane * _P2, 31) * _P1), 27) * _P1 + _P4
            h[m] = nh[m]
            done = np.where(m, done + 8, done)
            remaining = lens - done
        # one 4-byte word
        m = remaining >= 4
        if m.any():
            lane32 = lanes32[rows, np.minimum(done >> 2, width // 4 - 1)].astype(
                np.uint64
            )
            nh = _rotl(h ^ (lane32 * _P1), 23) * _P2 + _P3
            h[m] = nh[m]
            done = np.where(m, done + 4, done)
            remaining = lens - done
        # single bytes (at most 3 left after the 4-byte step... but a <4
        # string skips that step, so up to 3; lens%4 of the 8-byte-aligned
        # tail caps the loop at 3 iterations)
        for _ in range(int(remaining.max()) if n else 0):
            m = remaining >= 1
            byte = buf[rows, np.minimum(done, width - 1)].astype(np.uint64)
            nh = _rotl(h ^ (byte * _P5), 11) * _P1
            h[m] = nh[m]
            done = np.where(m, done + 1, done)
            remaining = lens - done

        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
        return h.view(np.int64)
    finally:
        np.seterr(**old)


def xxhash64_arrow(arr, seed: int = 42) -> np.ndarray:
    """XXH64 of a pyarrow string array (zero-copy over its offsets+data
    buffers). Null slots hash as empty strings (their offsets are
    zero-length), which DIFFERS from Spark's null semantics (xxhash64
    passes nulls through to the seed) — callers on the frontier path never
    pass nulls (invalid URLs canonicalize to "" and are filtered on host).
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(
        0, dtype=np.uint8
    )
    return xxhash64_concat(data, offsets.astype(np.int64), seed=seed)
