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
    def seeded(seed: int):
        prefix = f"{seed}:"
        # NB: single-arg lambda — a 2-arg lambda would make Spark pass the
        # array index as the second argument.
        return lambda x: F.md5(F.concat(F.lit(prefix), x))

    return F.array(
        *[F.array_min(F.transform(shingle_arr, seeded(s))) for s in range(num_hashes)]
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
    # counters[b] += (hash(token) >> b) & 1 ? 1 : -1   (bit positions
    # unrolled with Python ints — shiftright/shiftleft take literal counts)
    zero = F.array_repeat(F.lit(0), 64)

    def token_bits(tok):
        h = F.xxhash64(tok)
        return F.array(*[F.shiftright(h, b).bitwiseAND(F.lit(1)) for b in range(64)])

    counters = F.aggregate(
        token_arr,
        zero,
        lambda acc, tok: F.zip_with(
            acc,
            token_bits(tok),
            lambda a, bit: a + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    # fold sign bits into one long; disjoint bit values make + equal to OR
    # (bit 63 is the sign bit: its set-value is -(2^63) in two's complement)
    bit_vals = [1 << b for b in range(63)] + [-(1 << 63)]
    terms = [
        F.when(counters[b] > 0, F.lit(bit_vals[b]).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 bitmasks via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))
