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
