"""Hashing & fingerprint expressions for the dedup/similarity operators.

Two hash families, chosen deliberately:

* **Portable** (md5-based): identical results in Spark and in the DuckDB
  correctness oracle, so MinHash signatures and fingerprints are
  oracle-checkable end-to-end. md5 is overkill cryptographically but it is
  the one rich hash both engines expose with identical semantics; MinHash
  only needs a uniform total order, and fixed-width lowercase hex strings
  compare lexicographically as a valid one.
* **Fast** (xxhash64, Spark-only): for operators whose oracle is weaker
  anyway (SimHash) or that never leave Spark (salting, bucketing).

Everything here is built-in expression composition (higher-order functions
on arrays) — no Python UDFs; the whole shingle→hash→min pipeline stays
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def shingles(text: str | Column, k: int = 4) -> Column:
    """Character k-shingles of a string as ``array<string>``.

    ``substr`` with column offsets inside ``transform`` keeps generation
    JVM-side. A string shorter than ``k`` yields a single whole-string
    shingle so no document hashes to an empty signature.
    """
    c = _c(text)
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))


def minhash_sig(shingle_arr: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: ``array<string>`` of ``num_hashes`` hex minima.

    Hash family h_s(x) = md5(s || ':' || x) for seed s — portable to the
    DuckDB oracle verbatim (same md5, same lexicographic min over
    fixed-width hex). Jaccard(A,B) ≈ fraction of matching signature slots.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(shingle_arr, lambda x, s=s: F.md5(F.concat(F.lit(f"{s}:"), x)))
            )
            for s in range(num_hashes)
        ]
    )


def portable_hash64(col: str | Column, bits: int = 60) -> Column:
    """Deterministic non-negative int64 from md5 (portable to DuckDB).

    Takes the first ``bits``/4 hex chars of md5 and base-converts — DuckDB
    can mirror this with the same md5 + hex parse. For Spark-internal
    hashing prefer :func:`fast_hash64`.
    """
    nhex = bits // 4
    return F.conv(F.substring(F.md5(_c(col)), 1, nhex), 16, 10).cast("long")


def fast_hash64(*cols: str | Column, seed: int = 42) -> Column:
    """xxhash64 — Spark's fast 64-bit hash (not portable; internal use)."""
    return F.xxhash64(*[_c(c) for c in cols], F.lit(seed))


def simhash64(token_arr: Column) -> Column:
    """64-bit SimHash over a token array, as a signed long.

    Per bit position b: sum over tokens of ±1 by token-hash bit b, then
    sign. Expressed with ``aggregate`` over the token array accumulating a
    64-slot counter array, then folded to a bitmask — all built-in
    higher-order functions, no UDF. Near-duplicates have small Hamming
    distance between simhashes.
    """
    # counters[b] += (hash(token) >> b) & 1 ? 1 : -1
    zero = F.array_repeat(F.lit(0), 64)
    counters = F.aggregate(
        token_arr,
        zero,
        lambda acc, tok: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.shiftright(F.xxhash64(tok), b).bitwiseAND(F.lit(1)),
            ),
            lambda a, bit: a + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    # fold sign bits into one long: sum over b of (counters[b] > 0) << b
    return F.aggregate(
        F.zip_with(
            counters,
            F.sequence(F.lit(0), F.lit(63)),
            lambda cnt, b: F.when(cnt > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),  # slots are disjoint bits: XOR == sum
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 bitmasks via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))
