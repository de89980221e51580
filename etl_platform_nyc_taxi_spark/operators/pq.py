"""IVF-PQ: product-quantized ANN serving (VERDICT r10 task 4).

The textbook IVF-PQ pipeline (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) split into its
ingest-time and query-time halves:

* **ingest**: train a coarse quantizer (``nlist`` centroids over the
  full vector) and ``m`` per-subspace PQ codebooks (``ksub`` codewords
  over each ``dsub``-dim slice); assign every corpus vector to its
  nearest coarse list and encode it as ``m`` uint8-range codes — the
  vector is stored as ``m`` bytes instead of ``dim`` floats (16× smaller
  at dim 64 / m 8), which is the property that makes 100 TB of
  embeddings servable from RAM-sized inverted lists.
* **query**: find the ``nprobe`` nearest coarse lists, build the
  per-subspace **ADC lookup table** (distance from the query's slice to
  each codeword — ``m × ksub`` entries, computed once per query), then
  score every candidate in the probed lists as a sum of ``m`` table
  lookups — no float vector is ever touched at scan time.

**Determinism contract** — everything here must replay exactly in the
DuckDB oracle (the driver's value-hash gate), so training is NOT
``pyspark.ml`` KMeans (float means are order-sensitive): it is Lloyd's
algorithm over **milli-quantized integer** vectors —
``floor(x·1000 + 0.5) + OFFSET`` per component — with

* integer squared-L2 distances (exact, order-free),
* argmin ties broken by lowest centroid id,
* centroid update = element-wise ``sum div count`` (integer floor
  division; the uniform ``OFFSET`` keeps every value positive so
  truncating and flooring division agree across engines),
* empty clusters keeping their previous centroid,
* a fixed, unrolled iteration count.

The quantization costs <0.1% relative distance error at embedding scale
(|x| ≲ 1) — irrelevant to ANN ranking quality — and buys an exact
integer ADC score the oracle can assert value-for-value, a strictly
stronger correctness surface than the verdict-style recall oracle the
float IVF path (similarity.ivf_topk) uses.

Scale notes: training is bounded by ``max_train_rows`` (a coarse/PQ
codebook needs a large-enough slice, not the corpus); each Lloyd
iteration is one pass over ``rows × dim`` exploded elements with two
map-combinable aggregations; codebooks are tiny driver-side artifacts
(``m·ksub·dsub`` ints) compiled into serving plans as literals — the
bounded-scalar class (BPE-argmax precedent). Encoding and ADC are pure
expressions: no UDF, no Python rows, one broadcast join corpus×queries
restricted to probed lists.

Reference parity: the reference engine has no ANN at all
(/root/reference is two batch taxi jobs); this module is part of the
brief's LLM-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.windows import top_k_per_group

#: Uniform shift applied after milli-quantization so every component is
#: positive: integer division semantics (floor vs truncate) then agree
#: between Spark and DuckDB, and no engine-specific negative-division
#: rule can leak into centroid updates. Distances are shift-invariant.
MILLI_OFFSET = 1_048_576


def quantize_milli(vec_col: str | Column, offset: int = MILLI_OFFSET) -> Column:
    """``array<float>`` → ``array<bigint>`` in milli units, shifted
    positive: ``floor(x·1000 + 0.5) + offset`` per component. float32 →
    float64 widening, the ×1000, and the floor are all IEEE-exact and
    identical across engines — the replay anchor for everything else."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c,
        lambda x: (F.floor(x.cast("double") * 1000 + F.lit(0.5))).cast(
            "long"
        )
        + F.lit(offset),
    )


def _int_dist2(vec: Column, center: list[int]) -> Column:
    """Exact integer squared L2 between an ``array<bigint>`` column and a
    literal integer centroid."""
    clit = F.array(*[F.lit(int(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, clit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_nearest(vec: Column, centroids: list[list[int]], n: int) -> Column:
    """ids of the ``n`` closest centroids under exact integer L2, ties to
    the lowest id — centroids compile into the plan as literals (the
    similarity._nearest_lists shape, integer edition)."""
    d = F.array(
        *[
            F.struct(_int_dist2(vec, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.transform(F.array_sort(d), lambda s: s["i"]), 1, n)


def fit_int_kmeans(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    dsub: int = 8,
    k: int = 16,
    iters: int = 2,
    max_train_rows: int = 100_000,
    id_col: str = "vec_id",
) -> list[list[list[int]]]:
    """Deterministic integer Lloyd's over ``m`` subspaces at once;
    returns ``codebooks[s][j] = dsub ints`` in milli+offset space.

    Init: codeword ``j`` of every subspace = the slice of the training
    row with ``id_col == j`` (rows ``0..k-1`` — deterministic, present in
    every fixture, and exactly what the oracle replays). Each iteration
    runs ONE job: explode to ``(s, pos, x)`` elements, assign under the
    current literal codebooks, re-aggregate means map-side. The ``m×k``
    centroid rows collected per iteration are the bounded-scalar class.

    With ``m=1, dsub=dim`` this trains the coarse quantizer — one
    routine, both quantizers, one replay discipline."""
    base = corpus.select(
        F.col(id_col).alias("__id"), quantize_milli(vec_col).alias("__mv")
    )
    if max_train_rows:
        # Deterministic slice, replayable: lowest ids, not limit().
        base = base.filter(F.col("__id") < F.lit(max_train_rows))
    sub = base.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(F.col("__mv"), s * dsub + 1, dsub).alias("v"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select("__id", F.col("e.s").alias("s"), F.col("e.v").alias("v"))
    sub = sub.cache()
    try:
        init = (
            sub.filter(F.col("__id") < k)
            .collect()
        )
        books: list[list[list[int]]] = [[None] * k for _ in range(m)]  # type: ignore[list-item]
        for r in init:
            books[r["s"]][r["__id"]] = [int(x) for x in r["v"]]
        for _ in range(iters):
            # assignment under current codebooks (literal, per-s via CASE
            # over the exploded subspace id)
            assigned = sub.select(
                "s",
                "v",
                _assign_expr(books).alias("j"),
            )
            newc = (
                assigned.select(
                    "s", "j", F.posexplode("v").alias("p", "x")
                )
                .groupBy("s", "j", "p")
                .agg(
                    F.sum("x").alias("__sx"),
                    F.count(F.lit(1)).alias("__n"),
                )
                .select(
                    "s",
                    "j",
                    "p",
                    F.expr("__sx div __n").alias("cx"),
                )
                .groupBy("s", "j")
                .agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("p", "cx"))
                        ),
                        lambda t: t["cx"],
                    ).alias("c")
                )
                .collect()
            )
            nxt = [list(row) for row in books]  # empty clusters keep old
            for r in newc:
                nxt[r["s"]][r["j"]] = [int(x) for x in r["c"]]
            books = nxt
    finally:
        sub.unpersist()
    return books


def _assign_expr(books: list[list[list[int]]]) -> Column:
    """argmin codeword id for the exploded ``(s, v)`` relation under
    literal codebooks — a CASE over the subspace id, each arm an integer
    ``int_nearest(…, 1)[0]``."""
    expr = None
    for s, cb in enumerate(books):
        arm = int_nearest(F.col("v"), cb, 1)[0]
        expr = (
            F.when(F.col("s") == s, arm)
            if expr is None
            else expr.when(F.col("s") == s, arm)
        )
    return expr


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    dsub: int | None = None,
) -> DataFrame:
    """Ingest-time PQ encoding: ``array<int>`` of length ``m`` — the
    nearest codeword id per subspace (uint8 range; stored small). Pure
    expressions over literal codebooks: no UDF, no shuffle, codegen."""
    m = len(codebooks)
    d = dsub if dsub is not None else len(codebooks[0][0])
    mv = quantize_milli(vec_col)
    return corpus.withColumn(
        code_col,
        F.array(
            *[
                int_nearest(F.slice(mv, s * d + 1, d), codebooks[s], 1)[0]
                for s in range(m)
            ]
        ),
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: list[list[int]],
    codebooks: list[list[list[int]]],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    partitions: int | None = None,
) -> DataFrame:
    """IVF-PQ search: probe the ``nprobe`` nearest inverted lists, score
    candidates by exact-integer ADC, return per-query top-k as
    ``(query_id, vec_id, adc_dist2)`` ordered by ``(adc, vec_id)``.

    ADC here is expressed as the sum over subspaces of the squared-L2
    between the query's milli slice and the candidate's ASSIGNED CODEWORD
    (a literal lookup via ``element_at`` on the compiled codebook) — the
    classical per-query lookup table evaluated in-plan, broadcast with
    the (tiny) query set. The corpus side carries only its list id and
    its ``m`` codes: at 100 TB the encoded corpus is written partitioned
    by ``ivf_list`` (sources/parquet.write_partitioned) and a query scans
    ``nprobe/nlist`` of the bytes with partition pruning; the float
    vectors never travel."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    if partitions:
        corpus = corpus.repartition(partitions)
    mvq = quantize_milli(vec_col)
    c = pq_encode(corpus, codebooks, vec_col, "__codes", d).select(
        F.col(id_col),
        F.col("__codes"),
        int_nearest(mvq, coarse, 1)[0].alias("__list"),
    )
    q = queries.select(
        F.col(query_id_col),
        mvq.alias("__qmv"),
        F.explode(int_nearest(mvq, coarse, nprobe)).alias("__list"),
    )
    # codebook literal: cb[s+1][j+1] = array<long> codeword
    cb_lit = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(int(x)) for x in cw])
                    for cw in codebooks[s]
                ]
            )
            for s in range(m)
        ]
    )
    adc_terms = [
        F.aggregate(
            F.zip_with(
                F.slice(F.col("__qmv"), s * d + 1, d),
                F.element_at(
                    F.element_at(cb_lit, s + 1),
                    F.col("__codes")[s] + 1,
                ),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for s in range(m)
    ]
    adc = adc_terms[0]
    for t in adc_terms[1:]:
        adc = adc + t
    scored = (
        c.join(F.broadcast(q), on="__list")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            adc.alias("adc_dist2"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("adc_dist2").asc(), F.col(id_col).asc()],
        k=k,
    )
