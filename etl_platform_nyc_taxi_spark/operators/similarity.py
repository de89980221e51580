"""Embedding similarity search over ``array<float>`` columns.

Two paths, per the north star:

* **brute-force cosine top-k** — the exact baseline: broadcast the query
  set against the corpus, cosine via higher-order functions (JVM-side, no
  UDF), partitioned window for per-query top-k. Cost O(|Q|·|corpus|) but
  embarrassingly parallel: the corpus never shuffles, queries broadcast.
* **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (sign of dot with deterministic seeded hyperplanes) bucket the corpus;
  probing only matching buckets (± multi-probe) turns top-k into an
  equi-join + local top-k. Approximate; recall measured in tests against
  the brute-force baseline.

At 100 TB the corpus side is bucketed+written once (partitioned by bucket
prefix) and queries only touch matching partitions — the same plan shape
shown here, with partition pruning doing the bucket selection.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.vectors import cosine_similarity
from etl_platform_nyc_taxi_spark.operators.windows import top_k_per_group


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cosine, rank).

    Queries are broadcast (small side by definition); ranking uses a
    deterministic (cosine desc, vec_id asc) total order. ``round_digits``
    quantizes the ranking key so results are stable across engines/float
    paths; pass None for raw doubles."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    cos = cosine_similarity(F.col("__qvec"), F.col(vec_col))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = corpus.join(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cos.alias("cosine"),
    )
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("cosine").desc(), F.col(id_col).asc()],
        k=k,
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (driver-side constants, broadcast in
    the plan as literals — tiny: num_planes × dim doubles)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(num_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def _signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Bit-signature: sign of ⟨v, plane_i⟩ packed into a long."""
    bits = []
    for i, plane in enumerate(planes):
        lit = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseXOR(b)  # disjoint bits: XOR == OR == sum
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH buckets + exact
    rerank inside matching buckets.

    ``multiprobe`` ≥ 1 also probes buckets at Hamming distance 1 from the
    query's signature (flipping each of ``num_planes`` bits), trading
    compute for recall. Output schema matches :func:`brute_force_topk`;
    rows may be missing vs exact (that's the deal)."""
    planes = _hyperplanes(dim, num_planes, seed)
    c = corpus.withColumn("__bucket", _signature(F.col(vec_col), planes))
    q = queries.withColumn("__sig", _signature(F.col(vec_col), planes))
    if multiprobe:
        probes = F.array(
            F.col("__sig"),
            *[
                F.col("__sig").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(num_planes)
            ],
        )
    else:
        probes = F.array(F.col("__sig"))
    q = q.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(probes).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), on="__bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_similarity(F.col("__qvec"), F.col(vec_col)), 6).alias("cosine"),
    ).dropDuplicates([query_id_col, id_col])
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("cosine").desc(), F.col(id_col).asc()],
        k=k,
    )


def embedding_norm(vec_col: str | Column = "embedding") -> Column:
    """L2 norm of an embedding column (re-export for registry use)."""
    from etl_platform_nyc_taxi_spark.functions.vectors import l2_norm

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return l2_norm(c)
