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


MINHASH_P = (1 << 61) - 1  # Mersenne prime 2^61-1; keeps a*h+c < 2^63


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, c) pairs for the integer minhash family.

    Fixed LCG so Spark and the DuckDB oracle interpolate the *same*
    literals. ``a`` is odd and < 2^14, so a*h < 2^62 for 48-bit h (no
    int64 overflow under ANSI mode); ``c`` < 2^61-1.
    """
    x = 0x5DEECE66D
    out = []
    for _ in range(num_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = ((x >> 17) % 8191) * 2 + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        c = x % MINHASH_P
        out.append((a, c))
    return out


def shingle_hash48(shingle_arr: Column) -> Column:
    """``array<string>`` → ``array<long>``: one md5 per element, first 12
    hex chars parsed as a 48-bit int. The ONLY md5 pass in the minhash
    pipeline — signature slots derive from these ints arithmetically.
    Portable: DuckDB mirrors with ``('0x' || substr(md5(x),1,12))::BIGINT``.
    """
    return F.transform(
        shingle_arr,
        lambda x: F.conv(F.substring(F.md5(x), 1, 12), 16, 10).cast("long"),
    )


def minhash_sig(hash_arr: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: ``array<long>`` of ``num_hashes`` minima over the
    universal-hash family h_i(v) = (a_i*v + c_i) mod 2^61-1 applied to
    pre-hashed 48-bit shingle ints (:func:`shingle_hash48`).

    One md5 pass total (vs one per slot in the naive family) — at 100 TB
    the md5 over every shingle dominates; the integer slots are ~free.
    Jaccard(A,B) ≈ fraction of matching signature slots.
    """
    def slot(hv: Column, a: int, c: int) -> Column:
        # ((v*a) % P + c) % P: v*a < 2^62 and (v*a)%P + c < 2^62, so every
        # intermediate fits int64 even under ANSI overflow checking.
        return F.array_min(
            F.transform(
                hv,
                lambda v: ((v * F.lit(a)) % F.lit(MINHASH_P) + F.lit(c)) % F.lit(MINHASH_P),
            )
        )

    # Bind hash_arr as a lambda variable (transform over a 1-element array)
    # so it is structurally evaluated ONCE for all slots. Plain column
    # references get re-inlined by CollapseProject, and higher-order
    # functions are interpreted (no codegen subexpression elimination) —
    # without this the md5 pass runs num_hashes times.
    coeffs = minhash_coeffs(num_hashes)
    return F.transform(
        F.array(hash_arr),
        lambda hv: F.array(*[slot(hv, a, c) for a, c in coeffs]),
    )[0]


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
    zero = F.array_repeat(F.lit(0).cast("long"), 64)  # match BIGINT lambda

    def token_bits(tok):
        h = F.xxhash64(tok)
        return F.array(*[F.shiftright(h, b).bitwiseAND(F.lit(1)) for b in range(64)])

    counters = F.aggregate(
        token_arr,
        zero,
        lambda acc, tok: F.zip_with(
            acc,
            token_bits(tok),
            lambda a, bit: a + bit + bit - F.lit(1),  # branchless ±1
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
