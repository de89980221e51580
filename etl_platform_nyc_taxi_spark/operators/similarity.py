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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)
from etl_platform_nyc_taxi_spark.operators.windows import top_k_per_group


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int | None = 6,
    partitions: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cosine, rank).

    Queries are broadcast (small side by definition); ranking uses a
    deterministic (cosine desc, vec_id asc) total order. ``round_digits``
    quantizes the ranking key so results are stable across engines/float
    paths; pass None for raw doubles.

    Norms bind ONCE per vector before the pair expansion (r12, guide
    §4.1 — one interpreted HOF fold per scored pair instead of three;
    bit-exact factorization of ``cosine_similarity``). ``partitions``
    spreads a few-split corpus scan across cores — the scoring is
    CPU-big/byte-small (callers reading a well-partitioned 100 TB layout
    leave it None)."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.repartition(partitions) if partitions else corpus
    c = c.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__cn")
    )
    denom = F.col("__qn") * F.col("__cn")
    cos = dot(F.col("__qvec"), F.col(vec_col)) / F.when(denom != 0.0, denom)
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = c.join(F.broadcast(q)).select(
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


def table_signatures_udf(
    num_planes: int, num_tables: int, dim: int, seed: int = 42
):
    """Vectorized signature stage shared by :func:`lsh_topk` and
    :func:`embedding_near_dups_lsh`: all per-table bucket signatures in
    one Arrow batch — an (n, dim) × (dim, T·r) matmul + sign + bit-pack.
    ~15× the interpreted zip_with/aggregate path; this is the
    vectorized-UDF exception the engine otherwise avoids (T·r dot
    products/row is matmul work)."""
    all_planes = _hyperplanes(dim, num_planes * num_tables, seed)
    plane_mat = np.array(all_planes)  # (num_tables*num_planes, dim)
    bit_weights = 1 << np.arange(num_planes)

    @F.pandas_udf("array<long>")
    def _table_sigs(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(embs.to_numpy())
        bits = (m @ plane_mat.T) >= 0  # (n, T*r)
        buckets = (bits.reshape(len(m), num_tables, num_planes) * bit_weights).sum(
            axis=2
        )
        return pd.Series(list(buckets.astype("int64")))

    return _table_sigs


def _lsh_query_probes(
    queries: DataFrame,
    query_id_col: str,
    vec_col: str,
    table_sigs,
    num_planes: int,
    num_tables: int,
    multiprobe: int,
) -> DataFrame:
    """(query_id, __qvec, __table, __bucket) probe rows: each query's
    per-table signature plus, with ``multiprobe`` ≥ 1, every Hamming-1
    neighbor bucket. Shared by the in-memory and materialized-index serve
    paths so both probe identical cells."""
    flips = [0] + ([1 << i for i in range(num_planes)] if multiprobe else [])
    return (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            table_sigs(F.col(vec_col)).alias("__s"),
        )
        .select(
            query_id_col,
            "__qvec",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            F.col("__s")[t].bitwiseXOR(F.lit(f).cast("long")).alias("b"),
                        )
                        for t in range(num_tables)
                        for f in flips
                    ]
                )
            ).alias("__tb"),
        )
        .select(
            query_id_col,
            "__qvec",
            F.col("__tb.t").alias("__table"),
            F.col("__tb.b").alias("__bucket"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH + exact
    rerank inside matching buckets.

    ``num_tables`` independent tables of ``num_planes`` bits each — the
    classic recall lever: a neighbor is a candidate if ANY table buckets
    it with the query (P = 1-(1-p^r)^L for per-bit agreement p), without
    coarsening any single table. ``multiprobe`` ≥ 1 additionally probes
    the Hamming-1 buckets of each table. Corpus rows explode to
    ``num_tables`` (table, bucket) rows — at 100 TB that layout is
    written once, partitioned by (table, bucket-prefix), and queries
    touch only matching partitions. Output schema matches
    :func:`brute_force_topk`; rows may be missing vs exact (that's the
    deal — recall floor pinned in tests/test_similarity.py)."""
    _table_sigs = table_signatures_udf(num_planes, num_tables, dim, seed)

    if partitions:
        # signature + rerank compute dwarfs row bytes; small files read as
        # 1-2 splits would serialize it (same rationale as dedup ops)
        corpus = corpus.repartition(partitions)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(_table_sigs(F.col(vec_col))).alias("__table", "__bucket"),
    )

    q = _lsh_query_probes(
        queries, query_id_col, vec_col, _table_sigs, num_planes, num_tables,
        multiprobe,
    )
    scored = (
        c.join(F.broadcast(q), on=["__table", "__bucket"])
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(cosine_similarity(F.col("__qvec"), F.col(vec_col)), 6).alias(
                "cosine"
            ),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("cosine").desc(), F.col(id_col).asc()],
        k=k,
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    max_train_rows: int = 100_000,
) -> list[list[float]]:
    """Train the IVF coarse quantizer ONCE (ingest-time, not query-time).

    KMeans on a ``limit``-bounded slice — ``limit`` instead of
    count-then-sample avoids an extra full pass over the corpus just to
    compute a fraction (a coarse quantizer needs rough centroids from any
    large-enough slice, not an unbiased sample; recall comes from nprobe,
    pinned in tests/test_similarity.py). The slice is cached because
    KMeans is iterative (~10 passes); bounded maxIter keeps cost flat.
    Returns plain Python lists — persist them (they're nlist × dim
    floats) and hand to :func:`ivf_topk` / :func:`assign_ivf_lists`.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    if max_train_rows:
        train = train.limit(max_train_rows)
    train = train.cache()
    try:
        model = KMeans(
            k=nlist, seed=seed, featuresCol="features", maxIter=10
        ).fit(train)
    finally:
        train.unpersist()
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _dist2_arr(vec: Column, center: Column) -> Column:
    """Squared L2 between an ``array<float>`` column and an
    ``array<double>`` centroid COLUMN — identical IEEE ops in identical
    order as the retired literal form (``(cast(a) - b)²`` folded
    sequentially), so the migration is bit-exact."""
    return F.aggregate(
        F.zip_with(vec, center, lambda a, b: (a.cast("double") - b) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def centroids_relation(spark, centroids: list[list[float]]) -> DataFrame:
    """The trained coarse quantizer as a ONE-ROW broadcast relation
    carrying the whole codebook in an ``array<array<double>>`` column
    (VERDICT r11 task 6). The first cut compiled every centroid into the
    plan as literal expression trees (`_nearest_lists`, the shape
    operators/pq.py abandoned for relations): codegen cost grew with
    every nlist/dim knob — ~10 s/query at pq's ksub=16. As DATA in a
    column, the scoring expression is one generic higher-order-function
    loop whose compiled size is constant regardless of nlist; the join
    is a broadcast-nested-loop against a single metadata-sized row, so
    assignment keeps its no-shuffle pure-projection property (unlike
    pq.py's exploded groupBy form, which pays a shuffle per assignment —
    right for per-subspace PQ codes, overkill for one coarse id)."""
    rows = [([[float(x) for x in c] for c in centroids],)]
    return spark.createDataFrame(rows, "__cents array<array<double>>")


def _nearest_lists_col(vec: Column, cents: Column, n: int) -> Column:
    """ids of the n closest centroids from an ``array<array<double>>``
    codebook COLUMN, via sort of (dist, id) structs — same (distance,
    lowest-id) tie order as the literal form it replaces."""
    d = F.zip_with(
        cents,
        F.sequence(F.lit(0), F.size(cents) - 1),
        lambda c, i: F.struct(
            _dist2_arr(vec, c).alias("d"), i.alias("i")
        ),
    )
    return F.slice(F.transform(F.array_sort(d), lambda s: s["i"]), 1, n)


def assign_ivf_lists(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
) -> DataFrame:
    """Ingest-time inverted-list assignment: nearest-centroid id per row.

    At 100 TB run this once and write the corpus partitioned by
    ``list_col`` (sources/parquet.write_partitioned) — queries then scan
    nprobe/nlist of the data with partition pruning doing the list
    selection. The codebook arrives as a one-row broadcast relation
    (:func:`centroids_relation`) — still no shuffle, no UDF, and the
    compiled expression no longer grows with nlist."""
    crel = centroids_relation(corpus.sparkSession, centroids)
    return (
        corpus.join(F.broadcast(crel))
        .withColumn(
            list_col, _nearest_lists_col(F.col(vec_col), F.col("__cents"), 1)[0]
        )
        .drop("__cents")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    max_train_rows: int = 100_000,
    partitions: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans coarse quantizer + nprobe search.

    Pass ``centroids`` from :func:`fit_ivf_centroids` (the ingest-time
    path — the query plan then contains no action besides the final one);
    omitting them self-trains as a convenience. Every corpus vector is
    assigned to its nearest centroid — the inverted list — then only the
    ``nprobe`` closest lists per query are searched with exact cosine
    rerank. The codebook travels as a one-row broadcast relation
    (:func:`centroids_relation` — nlist × dim doubles of DATA, not
    literal expression trees), so assignment is generic higher-order
    expression work whose compiled size is constant in nlist: no UDF, no
    shuffle beyond the bucket join. Approximate like
    :func:`lsh_topk`; recall floor pinned in tests/test_similarity.py."""
    if centroids is None:
        centroids = fit_ivf_centroids(corpus, vec_col, nlist, seed, max_train_rows)
    if partitions:
        corpus = corpus.repartition(partitions)

    crel = centroids_relation(corpus.sparkSession, centroids)
    c = assign_ivf_lists(corpus, centroids, vec_col, "__list").select(
        F.col(id_col), F.col(vec_col), F.col("__list")
    )
    q = queries.join(F.broadcast(crel)).select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(
            _nearest_lists_col(F.col(vec_col), F.col("__cents"), nprobe)
        ).alias("__list"),
    )
    scored = (
        c.join(F.broadcast(q), on="__list")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(cosine_similarity(F.col("__qvec"), F.col(vec_col)), 6).alias(
                "cosine"
            ),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("cosine").desc(), F.col(id_col).asc()],
        k=k,
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_cols: tuple[str, ...] = (),
    threshold: float = 0.99,
    partitions: int | None = None,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold) within blocking-key groups — the vector twin of
    ``dedup.ngram_jaccard_pairs``.

    Blocked-exact is the oracle-checkable shape; at 100 TB swap the
    blocking key for LSH buckets from :func:`lsh_topk`'s signature
    (same join structure, data-dependent candidate count). The
    size-prefilter trick has no analog here, so blocks must be kept
    small by the caller. Like its text twins, empty ``block_cols`` is
    refused unless ``allow_unblocked=True`` — the unblocked shape is a
    full O(n²) cross join, valid only for small eval corpora."""
    if not block_cols and not allow_unblocked:
        raise ValueError(
            "empty block_cols plans a full O(n^2) cross join; pass "
            "blocking keys or allow_unblocked=True for a small eval corpus"
        )
    src = df
    if partitions:
        src = src.repartition(partitions)
    # norm bound ONCE per vector before the pair join (r12, guide §4.1 —
    # the embedding_near_dups_lsh prenorm precedent): the per-pair verify
    # folds one interpreted HOF (the dot) instead of three; bit-exact
    # factorization of cosine_similarity (same IEEE sqrt/mul/div tree).
    base = src.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    denom = F.col("a.__n") * F.col("b.__n")
    cos = dot(F.col("a.__v"), F.col("b.__v")) / F.when(denom != 0.0, denom)
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dups_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    num_planes: int = 8,
    num_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    partitions: int | None = None,
    max_bucket: int | None = 128,
) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs — the 100 TB path that
    :func:`embedding_near_dups`'s blocked-exact shape points to.

    Candidates form ONLY inside matching (table, bucket) cells of the
    multi-table hyperplane signature (:func:`table_signatures_udf`), so
    no all-pairs join ever appears in the plan; the exact cosine verify
    runs on candidates alone. For a pair at cosine ≥ t the per-plane
    split probability is arccos(t)/π, so recall ≈
    1-(1-(1-θ/π)^planes)^tables — at t=0.999 with 8×6 that is ≈1-2e-6;
    the floor is pinned vs blocked-exact in tests/test_similarity.py.
    Output matches :func:`embedding_near_dups`: (id_a, id_b, cosine).

    ``max_bucket``: hot-bucket guard (operators/dedup.salt_hot_buckets) —
    the signature space is FIXED (num_tables × 2^num_planes cells), so at
    a growing corpus the average cell grows linearly and within-cell pair
    generation quadratically (SCALE_BENCH r3: dedup_image 69.5× at ×10
    data). Cells over this occupancy are salt-split by a hash of the
    FEATURE VECTOR itself: identical vectors share a salt in every
    table, so exact duplicates (the cosine=1.0 contract of dedup_image)
    are never separated; sub-threshold-distinct near-dups inside a hot
    cell may be lost. ``None`` disables."""
    from etl_platform_nyc_taxi_spark.operators.dedup import salt_hot_buckets

    sigs = table_signatures_udf(num_planes, num_tables, dim, seed)
    src = df.repartition(partitions) if partitions else df
    # Norm bound ONCE per vector BEFORE the bucket explode and the pair
    # join (the hard_triplets prenorm precedent, r12, guide §4.1): the
    # candidate verify then folds one interpreted HOF (the dot) per pair
    # instead of three — bit-exact factorization of cosine_similarity.
    base = src.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
    ).select(
        "__id",
        "__v",
        "__n",
        F.posexplode(sigs(F.col("__v"))).alias("__table", "__bucket"),
    )
    join_keys = ["__table", "__bucket"]
    if max_bucket is not None:
        base = salt_hot_buckets(
            base, ("__table", "__bucket"), F.col("__v"), max_bucket
        )
        join_keys.append("__salt")
    a, b = base.alias("a"), base.alias("b")
    denom = F.col("a.__n") * F.col("b.__n")
    cos = dot(F.col("a.__v"), F.col("b.__v")) / F.when(denom != 0.0, denom)
    return (
        a.join(b, on=join_keys)
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def write_lsh_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Materialize the LSH layout ONCE at ingest: the corpus exploded to
    (table, bucket) rows, hive-partitioned by both — the 100 TB serving
    path :func:`lsh_topk`'s docstring describes. A query then reads
    ONLY its probe cells via partition pruning
    (:func:`lsh_topk_from_index`); everything else never leaves disk.

    Directory count = num_tables × 2^num_planes (8 × 64 = 512 here) —
    size num_planes so that stays filesystem-friendly; beyond ~10 bits
    partition on a bucket PREFIX and filter the remainder in-file."""
    sigs = table_signatures_udf(num_planes, num_tables, dim, seed)
    (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            F.posexplode(sigs(F.col(vec_col))).alias("lsh_table", "lsh_bucket"),
        )
        # shuffle on the partition cols BEFORE the partitioned write: each
        # output directory is then produced by exactly one task (≤1 file
        # per dir) instead of every input split writing into every dir —
        # num_input_splits × num_dirs tiny files is the classic
        # dynamic-partition write blowup at any scale
        .repartition("lsh_table", "lsh_bucket")
        .write.mode(mode)
        .partitionBy("lsh_table", "lsh_bucket")
        .parquet(path)
    )


def _open_index(spark, index) -> DataFrame:
    """Accept a path (opened fresh — pays partition discovery) or a
    pre-opened index DataFrame (the serving pattern: open once per
    process, serve many queries; discovery cost amortizes to zero)."""
    if isinstance(index, str):
        from etl_platform_nyc_taxi_spark.sources.parquet import read_parquet_auto

        return read_parquet_auto(spark, index)
    return index


def _collect_queries(queries: DataFrame, query_id_col: str, vec_col: str):
    """Driver-side (ids, float64 matrix, raw rows) for a query set — the
    serve-time premise is that queries are SMALL (the corpus stays
    distributed); collecting them here lets probe cells be computed in
    numpy with zero Spark jobs and no Python-worker spin-up."""
    rows = queries.select(query_id_col, vec_col).collect()
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return rows, mat


def lsh_topk_from_index(
    spark,
    index,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Serve ANN from a :func:`write_lsh_index` layout with STATIC
    partition pruning: probe cells are computed driver-side in numpy
    (queries are small by definition at serve time — no pandas UDF, no
    extra Spark job) and compiled into a partition-column predicate, so
    the scan touches only matching directories — the corpus itself is
    never collected, shuffled, or re-signed. ``index`` may be a path or a
    pre-opened DataFrame (open once, serve many). Same hyperplane params
    as the writer or buckets won't match; result parity with
    :func:`lsh_topk` is pinned in tests/test_similarity.py."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    rows, mat = _collect_queries(queries, query_id_col, vec_col)
    planes = np.array(_hyperplanes(dim, num_planes * num_tables, seed))
    flips = [0] + ([1 << i for i in range(num_planes)] if multiprobe else [])
    probe_rows: list[tuple] = []
    by_table: dict[int, set[int]] = {}
    if rows:
        # same float64 matmul + sign + bit-pack as table_signatures_udf
        bits = (mat @ planes.T) >= 0
        buckets = (
            bits.reshape(len(rows), num_tables, num_planes)
            * (1 << np.arange(num_planes))
        ).sum(axis=2).astype("int64")
        for i, r in enumerate(rows):
            vec = list(r[1])
            for t in range(num_tables):
                for f in flips:
                    b = int(buckets[i, t]) ^ f
                    probe_rows.append((r[0], vec, t, b))
                    by_table.setdefault(t, set()).add(b)
    schema = StructType(
        [
            StructField(query_id_col, queries.schema[query_id_col].dataType),
            StructField("__qvec", queries.schema[vec_col].dataType),
            StructField("lsh_table", IntegerType()),
            StructField("lsh_bucket", LongType()),
        ]
    )
    q = spark.createDataFrame(probe_rows, schema)
    idx = _open_index(spark, index)
    # One OR-term per table carrying a bucket isin: shallow expression
    # tree (a flat per-cell OR chain overflows the JVM stack beyond a few
    # hundred cells) and a pure partition-column predicate, so static
    # pruning holds.
    cells = None
    for tbl, bs in sorted(by_table.items()):
        cell = (F.col("lsh_table") == tbl) & F.col("lsh_bucket").isin(sorted(bs))
        cells = cell if cells is None else cells | cell
    pruned = idx.filter(cells if cells is not None else F.lit(False))
    scored = (
        pruned.join(F.broadcast(q), on=["lsh_table", "lsh_bucket"])
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(cosine_similarity(F.col("__qvec"), F.col(vec_col)), 6).alias(
                "cosine"
            ),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("cosine").desc(), F.col(id_col).asc()],
        k=k,
    )


def write_ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF inverted lists at ingest: corpus partitioned by
    nearest-centroid id (:func:`assign_ivf_lists`). With nprobe/nlist
    probing, a query scans nprobe/nlist of the data via partition pruning
    (:func:`ivf_topk_from_index`)."""
    (
        assign_ivf_lists(corpus, centroids, vec_col, "ivf_list")
        # one task per inverted list → ≤1 file per list dir (see
        # write_lsh_index note on the dynamic-partition write blowup)
        .repartition("ivf_list")
        .write.mode(mode)
        .partitionBy("ivf_list")
        .parquet(path)
    )


def ivf_topk_from_index(
    spark,
    index,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nprobe: int = 4,
) -> DataFrame:
    """Serve IVF ANN from a :func:`write_ivf_index` layout: each query's
    nprobe nearest lists are computed driver-side in numpy (queries are
    small at serve time; EXACT ties broken by list id, matching
    :func:`_nearest_lists_col`'s struct sort) and their union compiles into
    a static partition filter — the scan prunes to those directories and
    the exact cosine rerank runs inside them. ``index`` may be a path or
    a pre-opened DataFrame. Result parity with :func:`ivf_topk` (same
    centroids) is pinned in tests/test_similarity.py, with one honest
    caveat: numpy's pairwise summation and Spark's sequential
    ``F.aggregate`` fold can differ in the last ulp of a squared
    distance, so a query sitting within float rounding of equidistant
    between the nprobe-th and (nprobe+1)-th centroids could probe a
    different list than the in-plan path — rerank results still agree
    whenever the true neighbors live in the shared probed lists."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    rows, mat = _collect_queries(queries, query_id_col, vec_col)
    probe_rows: list[tuple] = []
    lists: set[int] = set()
    if rows:
        cents = np.array(centroids, dtype=np.float64)  # (nlist, dim)
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        for i, r in enumerate(rows):
            vec = list(r[1])
            # stable argsort == order by (distance, list id), the exact
            # tie semantics of _nearest_lists_col's struct sort
            for lid in np.argsort(d2[i], kind="stable")[:nprobe]:
                probe_rows.append((r[0], vec, int(lid)))
                lists.add(int(lid))
    schema = StructType(
        [
            StructField(query_id_col, queries.schema[query_id_col].dataType),
            StructField("__qvec", queries.schema[vec_col].dataType),
            StructField("ivf_list", IntegerType()),
        ]
    )
    q = spark.createDataFrame(probe_rows, schema)
    idx = _open_index(spark, index)
    pruned = idx.filter(
        F.col("ivf_list").isin(sorted(lists)) if lists else F.lit(False)
    )
    scored = (
        pruned.join(F.broadcast(q), on="ivf_list")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(cosine_similarity(F.col("__qvec"), F.col(vec_col)), 6).alias(
                "cosine"
            ),
        )
        .dropDuplicates([query_id_col, id_col])
    )
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


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (VERDICT r9 task 2)
# ---------------------------------------------------------------------------


def semdedup_seeds(
    corpus: DataFrame,
    num_seeds: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic cluster seeds for :func:`semdedup`: the
    ``num_seeds`` corpus members with the smallest ``md5(id)`` — a
    portable pseudo-random medoid sample that any engine can replay
    (the registry's standing md5-determinism rule: no ``rand()``).

    SemDeDup (Abbas et al. 2023, arXiv:2303.09540) observes that the
    clustering step only needs to be a coarse partitioner — pruning
    quality comes from the intra-cluster cosine threshold, not from
    centroid optimality — so data-point medoids are a sound stand-in
    for KMeans centroids wherever cross-engine determinism matters.
    Production can swap in :func:`fit_ivf_centroids` output via
    :func:`semdedup`'s ``centroids`` parameter.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: a
    per-partition top-k merged on the driver, no global sort."""
    return (
        corpus.select(
            F.col(id_col).alias("seed_id"),
            F.col(vec_col).alias("__seed_vec"),
            F.md5(F.col(id_col).cast("string")).alias("__rk"),
        )
        .orderBy("__rk", "seed_id")
        .limit(num_seeds)
        .drop("__rk")
    )


def semdedup(
    corpus: DataFrame,
    num_seeds: int | None = 8,
    eps: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
    centroids: list[list[float]] | None = None,
    round_digits: int = 6,
    target_occupancy: int = 320,
    pair_partitions: int | None = None,
) -> DataFrame:
    """SemDeDup semantic near-dup pruning (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings coarsely, compare pairs ONLY
    inside a cluster, and above the cosine threshold ``eps`` keep the
    member FARTHEST from its centroid (lowest centroid similarity —
    the paper's diversity-preserving keep rule; ties remove the larger
    id). Returns one row per corpus member:
    ``(id, cluster, sim_centroid, removed)``.

    Plan shape, 100 TB posture:

    * **normalize once** — every vector L2-normalizes in a single
      projection, so every similarity afterwards is a plain dot (one
      array traversal per pair instead of dot + two norms — the pair
      stage is the hot loop, and this is a ~4× cut measured at sf0.1).
      Normalization divides by a power-of-2-free norm, but a ×2 scaled
      mutant still normalizes to the BITWISE-identical vector (2x/2n =
      x/n exactly in IEEE), preserving exact tie semantics.
    * **assign** — corpus × broadcast(seeds): a ×num_seeds row
      expansion scored with HOF dots (JVM-side, no UDF), then one
      keyed aggregate picking ``min(struct(-dot, seed_id))`` — map-side
      combinable, one shuffle on (id, nv). The corpus never collects.
    * **pairs** — self-equi-join keyed on the cluster id; nothing
      all-pairs. Intra-cluster quadratic cost is intrinsic to
      SemDeDup's definition; the scale knob is ``num_seeds`` (the paper
      runs 50k clusters for 5B examples — size num_seeds so expected
      cluster occupancy stays bounded, exactly like nlist in IVF).
    * **prune** — pair → loser projection, distinct, one anti-join
      back. No window over the full corpus.

    ``seeds`` (a (seed_id, __seed_vec) DataFrame) or ``centroids``
    (plain vectors, e.g. :func:`fit_ivf_centroids` output — seed_id is
    the centroid index) override the deterministic md5 medoids of
    :func:`semdedup_seeds`.

    ``num_seeds=None`` derives the seed count from the corpus:
    ``max(8, ceil(n / target_occupancy))`` (one bounded count) — the
    paper's own recipe of scaling CLUSTERS with the corpus so expected
    occupancy, and with it per-cluster pair work, stays constant and
    total pair cost grows linearly. A fixed num_seeds on a growing
    corpus is quadratic-per-cluster by definition — never ship that
    shape to a 100 TB run. Smaller ``target_occupancy`` trades recall
    at the cluster boundary for pair work; 320 keeps the expression-
    eval pair stage comfortably under the suite's per-query budget
    while exact duplicates (identical cosine profiles) always
    co-locate regardless."""
    from etl_platform_nyc_taxi_spark.functions.vectors import (
        dot,
        l2_normalize,
    )

    if num_seeds is None:
        n = corpus.count()  # bounded scalar; sizes the quantizer
        num_seeds = max(8, (n + target_occupancy - 1) // target_occupancy)
    if centroids is not None:
        seeds = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "seed_id long, __seed_vec array<double>",
        )
    elif seeds is None:
        seeds = semdedup_seeds(
            corpus, num_seeds=num_seeds, id_col=id_col, vec_col=vec_col
        )
    normed = corpus.select(
        F.col(id_col), l2_normalize(F.col(vec_col)).alias("__nv")
    )
    seeds_n = seeds.select(
        "seed_id", l2_normalize(F.col("__seed_vec")).alias("__snv")
    )
    # dot of normalized vectors = cosine; never NULL (zero vectors pass
    # through l2_normalize unchanged and dot to 0.0), coalesce kept as
    # a belt against NULL array elements
    cs = F.coalesce(dot(F.col("__nv"), F.col("__snv")), F.lit(-2.0))
    expanded = normed.join(F.broadcast(seeds_n)).select(
        F.col(id_col),
        F.col("__nv"),
        F.col("seed_id"),
        cs.alias("__cs"),
    )
    # argmax cosine with seed_id tie-break, via lexicographic struct min
    # (map-side combinable — a window would shuffle-sort the expansion)
    assigned = (
        expanded.groupBy(id_col, "__nv")
        .agg(
            F.min(
                F.struct(
                    (-F.col("__cs")).alias("n"), F.col("seed_id").alias("s")
                )
            ).alias("__p")
        )
        .select(
            F.col(id_col),
            F.col("__nv"),
            F.col("__p.s").alias("cluster"),
            (-F.col("__p.n")).alias("__simc"),
        )
    )
    if pair_partitions:
        # One explicit hash repartition on the join key before the pair
        # self-join (r12, guide §2.2/§2.5): the assignment aggregate's
        # output is byte-small, so AQE coalesces it to 1-2 partitions —
        # but the intra-cluster pair stage is CPU-quadratic in occupancy,
        # not byte-bound. The explicit width spreads that compute across
        # cores AND both join sides plus the final left join project off
        # the SAME exchange (ReuseExchange), so the assignment argmin
        # runs once instead of once per consumer.
        assigned = assigned.repartition(pair_partitions, "cluster")
    a = assigned.select(
        F.col(id_col).alias("__ida"),
        "cluster",
        F.col("__nv").alias("__va"),
        F.col("__simc").alias("__sa"),
    )
    b = assigned.select(
        F.col(id_col).alias("__idb"),
        "cluster",
        F.col("__nv").alias("__vb"),
        F.col("__simc").alias("__sb"),
    )
    dups = (
        a.join(b, "cluster")
        .where(F.col("__ida") < F.col("__idb"))
        .where(
            F.round(dot(F.col("__va"), F.col("__vb")), round_digits)
            >= F.lit(eps)
        )
    )
    removed = dups.select(
        F.when(F.col("__sa") > F.col("__sb"), F.col("__ida"))
        .when(F.col("__sb") > F.col("__sa"), F.col("__idb"))
        .otherwise(F.greatest(F.col("__ida"), F.col("__idb")))
        .alias(id_col)
    ).distinct()
    return (
        assigned.join(
            removed.withColumn("__rm", F.lit(True)), id_col, "left"
        )
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.round(F.col("__simc"), round_digits).alias("sim_centroid"),
            F.coalesce(F.col("__rm"), F.lit(False)).alias("removed"),
        )
    )


def embedding_dispersion(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic diversity per group via the centroid trick: the mean
    pairwise cosine of the group's L2-normalized embeddings — the
    collapse/mode-coverage signal SemDeDup-style curation watches (a
    source whose documents all embed alike contributes redundancy, not
    coverage) — computed EXACTLY in two linear aggregates, never a pair
    join: for unit vectors, Σ_{i≠j} cos(vᵢ,vⱼ) = ‖Σv̂‖² − n, so
    mean = (‖Σv̂‖² − n)/(n(n−1)).

    Returns ``(group, n_vecs, mean_pair_cos_micro, dispersion_micro)``
    with ``dispersion = 1 − mean`` in integer micro units. Groups with a
    single (non-zero) vector are omitted (no pairs); zero-norm vectors
    are excluded on both engines.

    Exactness discipline (the vector_normalize/label_centroid_sim
    pattern): the squared norm folds in DECIMAL(28,14) (exact), the
    normalize divide is one IEEE op on identical doubles, each
    normalized coordinate re-quantizes to DECIMAL(28,14) before the
    per-dimension sum (exact), and the final ‖S‖² accumulates per-term
    decimal casts of identical doubles — no order-dependent float SUM
    anywhere.

    Scale shape: explode to (group, dim) — d rows per vector — then two
    map-side-combinable aggregates; the pair semantics come for free
    from algebra, so cost is O(n·d) at any corpus size where the naive
    definition is O(n²·d)."""
    xd = lambda x: x.cast("double")  # noqa: E731
    ss = F.aggregate(
        vec_col,
        F.lit(0).cast("decimal(28,14)"),
        lambda acc, x: (acc + (xd(x) * xd(x)).cast("decimal(28,14)")).cast(
            "decimal(28,14)"
        ),
    )
    norm = F.sqrt(ss.cast("double"))
    # Bind the norm ONCE per row via the 1-element-transform trick
    # (functions/vectors.l2_normalize): inlining `norm` into the inner
    # lambda re-evaluates the full decimal fold PER ELEMENT — measured
    # 64× blowup (19 s for 5k vectors). The when-guard keeps the divide
    # off zero-norm rows even when codegen evaluates the projection
    # alongside the filter (ANSI divide-by-zero).
    qarr = F.transform(
        F.array(norm),
        lambda nm: F.transform(
            vec_col,
            lambda x: F.when(nm > 0, xd(x) / nm)
            .otherwise(F.lit(0.0))
            .cast("decimal(28,14)"),
        ),
    )[0]
    nz = df.filter(ss.cast("double") > 0).select(
        F.col(group_col).alias("grp"), qarr.alias("__q")
    )
    exploded = nz.select("grp", F.posexplode("__q").alias("pos", "q"))
    sums = exploded.groupBy("grp", "pos").agg(F.sum("q").alias("S"))
    ssq = (
        sums.select(
            "grp",
            (F.col("S").cast("double") * F.col("S").cast("double"))
            .cast("decimal(38,12)")
            .alias("s2"),
        )
        .groupBy("grp")
        .agg(F.sum("s2").alias("ssq"))
    )
    counts = nz.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n"))
    mean = (F.col("ssq").cast("double") - F.col("n")) / (
        F.col("n") * (F.col("n") - 1)
    ).cast("double")
    mean_micro = F.floor(mean * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        ssq.join(counts, "grp")
        .filter(F.col("n") >= 2)
        .select(
            F.col("grp").alias(group_col),
            F.col("n").alias("n_vecs"),
            mean_micro.alias("mean_pair_cos_micro"),
            (F.lit(1000000) - mean_micro).cast("long").alias(
                "dispersion_micro"
            ),
        )
    )


def hard_triplets(
    df: DataFrame,
    anchors: DataFrame | None = None,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
    partitions: int | None = None,
) -> DataFrame:
    """Batch-hard triplet mining for contrastive/metric training
    (Hermans et al. 2017, "In Defense of the Triplet Loss"): for every
    anchor, the hardest positive (LEAST-similar same-label vector) and
    the hardest negative (MOST-similar different-label vector), plus
    the triplet margin — the example-selection step a contrastive
    training-data pipeline runs before building (anchor, pos, neg)
    batches, and the curriculum signal (mine the violated triplets
    first).

    Output per anchor: ``(anchor_id, label, pos_id, pos_cos, neg_id,
    neg_cos, margin, violates)`` with ``margin = pos_cos − neg_cos``
    and ``violates = margin <= 0`` (the un-margined triplet constraint
    already broken). Anchors whose label has no second member are
    omitted (no positive exists).

    ``anchors`` optionally restricts the anchor side (eval-slice
    mining — the dedup_pr_curve contract: exact truth over a slice,
    the ANN form over the full corpus); candidates are always all of
    ``df``.

    Determinism: cosines are rounded to ``round_digits`` (the
    brute_force_topk discipline — one exactly-rounded double per pair,
    portable across engines), and both argmins break ties by smallest
    candidate id via a (key, id) window order.

    Scale shape: this is the EXACT form — an anchors × corpus join
    scored at O(|anchors|·n/p) like brute_force_topk. Norms are
    computed ONCE per vector before the join (one interpreted HOF fold
    per pair instead of three — measured 3× on the pair-scoring
    stage). Both argmins reduce in ONE conditional aggregate over the
    scored pairs (r12 optimization, guide §2.3/§2.4): struct ordering
    compares (cos, cand_id) exactly like the previous per-branch
    row_number windows — min(struct(cos, id)) is the (cos asc, id asc)
    argmin, max(struct(cos, −id)) the (cos desc, id asc) argmax — but
    the partial aggregation is map-side (the windows shuffled pair
    rows), ONE pass scores the pairs (the two filtered window branches
    re-ran the whole scored join per branch), and the pos⋈neg join
    disappears. At 100 TB the negative side swaps in ANN candidates
    (:func:`hard_triplets_lsh` — hardest negatives are near-anchors by
    definition) and the positive side stays a label-blocked join
    (label blocks are bounded by class balance); the reduction and
    margin algebra are unchanged."""
    a = (anchors if anchors is not None else df).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).alias("__avec"),
        l2_norm(F.col(vec_col)).alias("__an"),
    )
    b = df.select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col).alias("cand_label"),
        F.col(vec_col).alias("__bvec"),
        l2_norm(F.col(vec_col)).alias("__bn"),
    )
    # ``partitions`` spreads the STREAMED candidate side of the
    # nested-loop scoring join (r13, guide §2.5 — the brute_force_topk
    # precedent): a few-split fixture scan otherwise runs the whole
    # |anchors|·n pair scoring as ONE task (measured 5.2 s of
    # single-task CPU at sf0.1). The explicit broadcast pins the
    # anchor side as the build side so the spread survives planning;
    # inner-join output is identical either way.
    if partitions:
        b = b.repartition(partitions)
    denom = F.col("__an") * F.col("__bn")
    cos = F.round(
        dot(F.col("__avec"), F.col("__bvec"))
        / F.when(denom != 0.0, denom),
        round_digits,
    )
    pairs = (
        b.join(F.broadcast(a), F.col("anchor_id") != F.col("cand_id"))
        .select(
            "anchor_id",
            "label",
            "cand_id",
            "cand_label",
            cos.alias("cos"),
        )
    )
    same = F.col("cand_label") == F.col("label")
    red = (
        pairs.groupBy("anchor_id", "label")
        .agg(
            F.min(
                F.when(same, F.struct(F.col("cos"), F.col("cand_id")))
            ).alias("__p"),
            F.max(
                F.when(~same, F.struct(F.col("cos"), (-F.col("cand_id")).alias("cand_id")))
            ).alias("__n"),
        )
        .filter(F.col("__p").isNotNull() & F.col("__n").isNotNull())
    )
    pos_cos, neg_cos = F.col("__p.cos"), F.col("__n.cos")
    return red.select(
        "anchor_id",
        "label",
        F.col("__p.cand_id").alias("pos_id"),
        pos_cos.alias("pos_cos"),
        (-F.col("__n.cand_id")).alias("neg_id"),
        neg_cos.alias("neg_cos"),
        (pos_cos - neg_cos).alias("margin"),
        (pos_cos - neg_cos <= F.lit(0.0)).alias("violates"),
    )


def hard_triplets_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    num_planes: int = 4,
    num_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    round_digits: int = 6,
    partitions: int | None = None,
) -> DataFrame:
    """:func:`hard_triplets` with the negative side mined from LSH
    candidate buckets instead of all pairs — the 100 TB path the exact
    form documents. ``partitions`` spreads the two CPU-bound pair
    scorings (candidate-negative and label-blocked positive joins) that
    a few-split fixture scan otherwise runs 1-8 tasks wide (r13, guide
    §2.5 — the hard_triplets/brute_force precedent).

    Hardest negatives are near-anchors by definition, so the candidate
    set only needs recall at MODERATE cosine — hence fewer planes per
    table than the near-dup configuration (wider buckets; occupancy is
    held constant at scale by growing ``num_planes`` with log(corpus),
    the standard LSH sizing). Negative candidates form ONLY inside
    matching (table, bucket) cells; the positive side stays the exact
    label-blocked join (bounded by class balance), so the triplet
    margin's positive term is exact and only the negative term is a
    lower bound (a missed negative can only make the reported margin
    LARGER — the conservative direction for violation mining is
    documented, not hidden: ``n_cand_neg`` exposes per-anchor candidate
    coverage).

    Output adds ``n_cand_neg`` to the :func:`hard_triplets` schema;
    anchors with no positive or no candidate negative are omitted.
    Deterministic: seeded hyperplanes (replayed in the registry
    oracle), round-6 cosines, (key, id) tie-breaks."""
    sigs = table_signatures_udf(num_planes, num_tables, dim, seed)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).alias("__lab"),
        F.col(vec_col).alias("__v"),
        F.posexplode(sigs(F.col(vec_col))).alias("__table", "__bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    cand = (
        a.join(b, on=["__table", "__bucket"])
        .filter(F.col("a.__id") != F.col("b.__id"))
        .select(
            F.col("a.__id").alias("anchor_id"),
            F.col("b.__id").alias("cand_id"),
        )
        .distinct()
    )
    if partitions:
        # explicit respread is exempt from AQE coalescing: the per-pair
        # dot below is CPU-bound while candidate rows are tiny in bytes
        cand = cand.repartition(partitions)
    vecs = df.select(
        F.col(id_col).alias("__jid"),
        F.col(label_col).alias("__jlab"),
        F.col(vec_col).alias("__jv"),
        l2_norm(F.col(vec_col)).alias("__jn"),
    )
    denom = F.col("__anorm") * F.col("__bnorm")
    scored = (
        cand.join(
            vecs.select(
                F.col("__jid").alias("anchor_id"),
                F.col("__jlab").alias("label"),
                F.col("__jv").alias("__av"),
                F.col("__jn").alias("__anorm"),
            ),
            "anchor_id",
        )
        .join(
            vecs.select(
                F.col("__jid").alias("cand_id"),
                F.col("__jlab").alias("cand_label"),
                F.col("__jv").alias("__bv"),
                F.col("__jn").alias("__bnorm"),
            ),
            "cand_id",
        )
        .filter(F.col("cand_label") != F.col("label"))
        .select(
            "anchor_id",
            "label",
            "cand_id",
            F.round(
                dot(F.col("__av"), F.col("__bv"))
                / F.when(denom != 0.0, denom),
                round_digits,
            ).alias("cos"),
        )
    )
    # (cos desc, id asc) argmax + per-anchor count in ONE aggregate (r12
    # optimization, guide §2.3): max(struct(cos, -id)) orders exactly like
    # the previous row_number window (null cos sorts below any value in
    # both forms), and the count folds into the same map-side partials
    # instead of a second WindowExec pass over shuffled candidate rows.
    neg = (
        scored.groupBy("anchor_id")
        .agg(
            F.max(
                F.struct(F.col("cos"), (-F.col("cand_id")).alias("cand_id"))
            ).alias("__n"),
            F.count(F.lit(1)).alias("n_cand_neg"),
        )
        .select(
            "anchor_id",
            (-F.col("__n.cand_id")).alias("neg_id"),
            F.col("__n.cos").alias("neg_cos"),
            F.col("n_cand_neg").cast("long").alias("n_cand_neg"),
        )
    )
    p1 = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).alias("__av"),
        l2_norm(F.col(vec_col)).alias("__pan"),
    )
    if partitions:
        p1 = p1.repartition(partitions)
    p2 = df.select(
        F.col(id_col).alias("pos_id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).alias("__bv"),
        l2_norm(F.col(vec_col)).alias("__pbn"),
    )
    pdenom = F.col("__pan") * F.col("__pbn")
    # (cos asc, id asc) argmin as min(struct(cos, id)) — same ordering as
    # the previous window, map-side partial aggregation instead of a
    # shuffle+sort of every label-blocked pair (r12 optimization).
    pos = (
        p1.join(p2, "label")
        .filter(F.col("anchor_id") != F.col("pos_id"))
        .select(
            "anchor_id",
            "label",
            "pos_id",
            F.round(
                dot(F.col("__av"), F.col("__bv"))
                / F.when(pdenom != 0.0, pdenom),
                round_digits,
            ).alias("pos_cos"),
        )
        .groupBy("anchor_id", "label")
        .agg(
            F.min(F.struct(F.col("pos_cos"), F.col("pos_id"))).alias("__p")
        )
        .select(
            "anchor_id",
            "label",
            F.col("__p.pos_id").alias("pos_id"),
            F.col("__p.pos_cos").alias("pos_cos"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "label",
        "pos_id",
        "pos_cos",
        "neg_id",
        "neg_cos",
        "n_cand_neg",
        (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
        (F.col("pos_cos") - F.col("neg_cos") <= F.lit(0.0)).alias(
            "violates"
        ),
    )
