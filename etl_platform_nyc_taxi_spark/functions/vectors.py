"""Vector math over ``array<float>`` embedding columns — pure expressions.

The fixture ``embeddings.embedding`` column is ``array<float>``
(FIXTURES.md §B) — the engine's similarity operators need dot/norm/cosine.
Higher-order functions (``zip_with`` + ``aggregate``) keep the arithmetic
JVM-side; no UDF, no ml.linalg conversion, fully codegen'd. DuckDB mirrors
with list_dot_product / list_cosine_similarity for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """‖a‖₂ as double."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL on zero-norm inputs (SQL-division NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return dot(a, b) / F.when(denom != 0.0, denom)


def l2_normalize(a: Column) -> Column:
    """a / ‖a‖₂ as array<double> (zero vectors pass through unchanged —
    NULLing them would poison downstream dot products).

    Normalizing at INGEST is the standard ANN prep: cosine then reduces
    to a plain dot product, saving two norm computations per scored pair
    (the dominant per-pair cost in brute_force_topk's inner loop). The
    norm binds as a lambda variable via a 1-element transform so it
    evaluates once per row, not once per element."""
    return F.transform(
        F.array(l2_norm(a)),
        lambda n: F.transform(
            a, lambda x: F.when(n != 0.0, x.cast("double") / n).otherwise(x.cast("double"))
        ),
    )[0]


def mean_center(a: Column) -> Column:
    """a - mean(a) elementwise, as array<double>.

    Removes the per-vector DC component. This is the standard prep before
    direction-based (hyperplane) LSH on feature families whose vectors all
    share a large common offset — e.g. byte histograms of natural text,
    which otherwise all point in nearly the same direction, collapse into
    ONE bucket per table, and turn the bucket self-join into the all-pairs
    product LSH exists to avoid. The mean binds via a 1-element transform
    so it evaluates once per row (same idiom as :func:`l2_normalize`)."""
    mean = (
        F.aggregate(
            F.transform(a, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size(a)
    )
    return F.transform(
        F.array(mean),
        lambda m: F.transform(a, lambda x: x.cast("double") - m),
    )[0]


def quantize_int8(a: Column) -> Column:
    """Symmetric per-vector int8 quantization: round(x · 127 / max|x|) as
    array<tinyint> — 4× smaller than float32 (the storage/bandwidth lever
    for billion-vector ANN corpora; recall loss is negligible at 8 bits
    for cosine search). All-zero vectors quantize to zeros.

    Pair with the per-vector scale (max|x| / 127, exposed via
    :func:`quantize_scale`) to dequantize: x ≈ q · scale."""
    absmax = F.aggregate(
        F.transform(a, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return F.transform(
        F.array(absmax),
        lambda m: F.transform(
            a,
            lambda x: F.when(
                m != 0.0, F.round(x.cast("double") * 127.0 / m)
            )
            .otherwise(F.lit(0.0))
            .cast("tinyint"),
        ),
    )[0]


def quantize_scale(a: Column) -> Column:
    """Dequantization scale for :func:`quantize_int8`: max|x| / 127."""
    absmax = F.aggregate(
        F.transform(a, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return absmax / F.lit(127.0)
