"""Hashing building blocks: url keys, minhash, simhash — all Spark expressions.

The seen-set at 10^10-URL scale must be hash-only (8-16 B/row); these
expressions keep hashing JVM-side (xxhash64 is codegen'd). ``md5_hex`` exists
for cross-engine (DuckDB) comparable oracles — md5 is the one hash both
engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: modulus for the minhash permutation family.
# 31-bit params keep (a*h + b) < 2^62, inside signed-long range (ANSI mode).
_MERSENNE31 = (1 << 31) - 1
# Deterministic (a, b) parameters for h_i(x) = (a*x + b) mod p, seeded.
def _perm_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    # LCG-derived deterministic sequence; no RNG import keeps it stable.
    params = []
    state = seed * 2654435761 % _MERSENNE31
    for _ in range(n):
        state = (state * 1103515245 + 12345) % _MERSENNE31
        a = (state % (_MERSENNE31 - 1)) + 1
        state = (state * 1103515245 + 12345) % _MERSENNE31
        b = state
        params.append((a, b))
    return params


def url_hash(url: Column) -> Column:
    """64-bit key for the seen set (xxhash64, JVM-side)."""
    return F.xxhash64(url)


def md5_hex(col: Column) -> Column:
    """Hex md5 — identical in Spark and DuckDB; used by comparable oracles."""
    return F.md5(col.cast("string"))


def bucket_of(hash_col: Column, n_buckets: int) -> Column:
    """Non-negative bucket id for hash-partitioned state tables.

    At cluster scale this is the Iceberg ``bucket(n, url_hash)`` partition
    transform; anti-joins against ``seen`` then prune to matching buckets.
    """
    return F.pmod(hash_col, F.lit(n_buckets)).cast("int")


def minhash_signature(shingle_hashes: Column, n_perm: int = 64, seed: int = 42) -> Column:
    """MinHash signature: for each of ``n_perm`` universal-hash permutations,
    the minimum of ``(a*h + b) mod p`` over the document's shingle hashes.

    ``shingle_hashes`` is ``array<bigint>`` (e.g. xxhash64 of each shingle).
    Pure Catalyst expression: ``transform`` + ``aggregate`` — no Python.
    Empty arrays yield a signature of p (sentinel max).
    """
    sig = []
    for a, b in _perm_params(n_perm, seed):
        # fold the signed 64-bit hash to 31 bits, then universal-hash:
        # a,b,h31 < 2^31 so a*h31 + b < 2^62 — no long overflow under ANSI.
        h = F.transform(
            shingle_hashes,
            lambda x: (F.pmod(x, F.lit(_MERSENNE31)) * F.lit(a) + F.lit(b))
            % F.lit(_MERSENNE31),
        )
        # coalesce implements the documented empty-array sentinel:
        # array_min([]) is NULL, and NULL signature slots would silently
        # drop empty docs from element-wise comparisons (NULL = NULL ->
        # NULL) while concat_ws-based band keys skipped them to ''
        sig.append(F.coalesce(F.array_min(h), F.lit(_MERSENNE31)))
    return F.array(*sig)


def lsh_bands(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """Split a minhash signature into band keys: array of (band_id, band_hash).

    Documents sharing any band key are LSH candidates; the join on band key
    replaces the O(n^2) pair enumeration.
    """
    bands = []
    for bnd in range(n_bands):
        chunk = F.slice(signature, bnd * rows_per_band + 1, rows_per_band)
        bands.append(
            F.struct(
                F.lit(bnd).alias("band"),
                F.xxhash64(F.concat_ws(",", F.transform(chunk, lambda x: x.cast("string")))).alias(
                    "band_hash"
                ),
            )
        )
    return F.array(*bands)


def simhash64(token_hashes: Column) -> Column:
    """64-bit SimHash from an ``array<bigint>`` of token hashes.

    For each bit position, count tokens with that bit set vs unset; bit in
    the output = majority. Expressed as 64 aggregate expressions over the
    array (Catalyst folds them into one projection).
    """
    def _bit_counter(b: int):
        # closure factory: pyspark derives lambda arity from the signature,
        # so the bit index must not appear as a defaulted parameter
        return lambda acc, x: acc + F.shiftrightunsigned(x, b).bitwiseAND(
            F.lit(1)
        ).cast("int")

    n = F.size(token_hashes)
    out = F.lit(0).cast("long")
    for bit in range(64):
        ones = F.aggregate(token_hashes, F.lit(0), _bit_counter(bit))
        bit_value = 2**bit if bit < 63 else -(2**63)
        out = out + F.when(ones * 2 >= n, F.lit(bit_value).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
