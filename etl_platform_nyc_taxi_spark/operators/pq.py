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
* argmin ties broken by lowest centroid id (``min(struct(d, j))``),
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

**Physical form (r11 rework)**: codebooks travel as BROADCAST RELATIONS
(``m·ksub`` rows), never as literal expression trees — the first cut
compiled each codeword into the plan (the similarity._nearest_lists
shape) and the resulting thousand-node expressions spent ~10 s/query in
codegen at ksub=16, a cost that would grow with every codebook knob.
Assignment = exploded-subvector ⋈ broadcast codebook + one
``min_by``-shaped aggregate; ADC = candidate codes ⋈ broadcast
per-query lookup table + one map-combinable sum. Every join side that
isn't the corpus is metadata-sized.

Scale notes: training is bounded by ``max_train_rows`` (a coarse/PQ
codebook needs a large-enough slice, not the corpus); each Lloyd
iteration is one pass over ``rows × dim`` exploded elements with two
map-combinable aggregations; codebooks are tiny driver-side artifacts
(``m·ksub·dsub`` ints). Encoding and ADC are equi-joins against
broadcast relations: no UDF, no Python rows, shuffles keyed on the
corpus id only.

Reference parity: the reference engine has no ANN at all
(/root/reference is two batch taxi jobs); this module is part of the
brief's LLM-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.windows import top_k_per_group

#: Uniform shift applied after milli-quantization so every component is
#: positive: integer division semantics (floor vs truncate) then agree
#: between Spark and DuckDB, and no engine-specific negative-division
#: rule can leak into centroid updates. Distances are shift-invariant.
MILLI_OFFSET = 1_048_576


def _quantize_milli_sql(vec_col: str, offset: int = MILLI_OFFSET) -> str:
    """SQL text of :func:`quantize_milli` over a NAMED column — one
    ``F.expr`` parse instead of a nested Column build (r13: each Column
    operation is a py4j round-trip; plan-construction chatter was ~2.5 s
    of the ann_ivfpq_drift wall). Identical expression tree."""
    return (
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000"
        f" + 0.5D) AS BIGINT) + CAST({offset} AS BIGINT))"
    )


def quantize_milli(vec_col: str | Column, offset: int = MILLI_OFFSET) -> Column:
    """``array<float>`` → ``array<bigint>`` in milli units, shifted
    positive: ``floor(x·1000 + 0.5) + offset`` per component. float32 →
    float64 widening, the ×1000, and the floor are all IEEE-exact and
    identical across engines — the replay anchor for everything else."""
    if isinstance(vec_col, str):
        return F.expr(_quantize_milli_sql(vec_col, offset))
    c = vec_col
    return F.transform(
        c,
        lambda x: (F.floor(x.cast("double") * 1000 + F.lit(0.5))).cast(
            "long"
        )
        + F.lit(offset),
    )


def _int_dist2(vec: Column, center: list[int]) -> Column:
    """Exact integer squared L2 between an ``array<bigint>`` column and a
    literal integer centroid (kept for tiny centroid sets; large
    codebooks go through the broadcast-relation path instead)."""
    clit = F.array(*[F.lit(int(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, clit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_nearest(vec: Column, centroids: list[list[int]], n: int) -> Column:
    """ids of the ``n`` closest centroids under exact integer L2, ties to
    the lowest id — centroids compile into the plan as literals. Use only
    for SMALL centroid sets (the literal tree grows with every codeword;
    see the module note on the broadcast-relation form)."""
    d = F.array(
        *[
            F.struct(_int_dist2(vec, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.transform(F.array_sort(d), lambda s: s["i"]), 1, n)


def _col_dist2(v: Column | str, cw: Column | str) -> Column:
    """Exact integer squared L2 between two ``array<bigint>`` COLUMNS —
    the join-side twin of :func:`_int_dist2`. Pass column NAMES to build
    the expression as one SQL parse (the r13 py4j-chatter fix; same
    expression tree either way)."""
    if isinstance(v, str) and isinstance(cw, str):
        return F.expr(
            f"aggregate(zip_with({v}, {cw}, (a, b) -> (a - b) * (a - b)),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(v, cw, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def codebook_df(
    spark: SparkSession, codebooks: list[list[list[int]]]
) -> DataFrame:
    """Materialize trained codebooks as the ``(s, j, cw)`` relation the
    serving joins broadcast — ``m·ksub`` rows of ``dsub`` longs."""
    rows = [
        (s, j, [int(x) for x in cw])
        for s, book in enumerate(codebooks)
        for j, cw in enumerate(book)
    ]
    return spark.createDataFrame(rows, "s int, j int, cw array<bigint>")


def _explode_subspaces(
    df: DataFrame, vec_col: str, id_cols: list[str], m: int, dsub: int
) -> DataFrame:
    """One row per (id, subspace): ``(*id_cols, s, v array<bigint>)``.

    Built as ONE ``F.expr`` parse (r13): the per-struct Column build was
    ~m·dsub py4j round-trips per call and this helper runs several times
    per IVF-PQ query construction. The parsed tree — quantize inlined
    per slice, INT ``s`` literals — matches the former build exactly."""
    mv = _quantize_milli_sql(vec_col)
    arr = ", ".join(
        f"struct(CAST({s} AS INT) AS s, slice({mv}, {s * dsub + 1},"
        f" {dsub}) AS v)"
        for s in range(m)
    )
    return df.select(
        *id_cols,
        F.expr(f"explode(array({arr}))").alias("__e"),
    ).select(*id_cols, F.col("__e.s").alias("s"), F.col("__e.v").alias("v"))


def _assign(
    sub: DataFrame, cb: DataFrame, id_cols: list[str]
) -> DataFrame:
    """Nearest codeword per (id, subspace): exploded subvectors ⋈
    broadcast codebook, argmin via ``min(struct(d, j))`` — lexicographic
    struct ordering IS the ties-to-lowest-j rule."""
    return (
        sub.join(F.broadcast(cb), "s")
        .select(
            *id_cols,
            "s",
            F.struct(_col_dist2("v", "cw").alias("d"),
                     F.col("j").alias("j")).alias("__dj"),
        )
        .groupBy(*id_cols, "s")
        .agg(F.min("__dj").alias("__m"))
        .select(*id_cols, "s", F.col("__m.j").alias("j"),
                F.col("__m.d").alias("d"))
    )


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
    every fixture, and exactly what the oracle replays). Each iteration:
    assignment via the broadcast-codebook join (:func:`_assign`), then
    element-wise integer means re-aggregated map-side. The ``m×k``
    centroid rows collected per iteration are the bounded-scalar class.

    With ``m=1, dsub=dim`` this trains the coarse quantizer — one
    routine, both quantizers, one replay discipline."""
    spark = corpus.sparkSession
    base = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col))
    if max_train_rows:
        # Deterministic slice, replayable: lowest ids, not limit().
        base = base.filter(F.col("__id") < F.lit(max_train_rows))
    sub = _explode_subspaces(base, vec_col, ["__id"], m, dsub).cache()
    try:
        init = sub.filter(F.col("__id") < k).collect()
        books: list[list[list[int]]] = [[None] * k for _ in range(m)]  # type: ignore[list-item]
        for r in init:
            books[r["s"]][r["__id"]] = [int(x) for x in r["v"]]
        # Init contract (ADVICE r11): rows with id 0..k-1 must ALL exist —
        # a gap would leave a None codeword that surfaces as an opaque
        # TypeError inside codebook_df an iteration later, while the SQL
        # replay (_lloyd_sql's init CTE) would silently train with fewer
        # centroids: a Spark-vs-oracle divergence armed by any corpus
        # whose ids don't start at 0. Fail loudly, naming the gaps.
        missing = sorted(
            {j for book in books for j, cw in enumerate(book) if cw is None}
        )
        if missing:
            raise ValueError(
                f"fit_int_kmeans init requires rows with {id_col} in "
                f"0..{k - 1}; missing ids: {missing} — reindex the "
                "training slice to a dense 0-based id first"
            )
        for _ in range(iters):
            cb = codebook_df(spark, books)
            assigned = _assign(sub, cb, ["__id"]).select("__id", "s", "j")
            newc = (
                assigned.join(sub, ["__id", "s"])
                .select("s", "j", F.posexplode("v").alias("p", "x"))
                .groupBy("s", "j", "p")
                .agg(
                    F.sum("x").alias("__sx"),
                    F.count(F.lit(1)).alias("__n"),
                )
                .select("s", "j", "p", F.expr("__sx div __n").alias("cx"))
                .groupBy("s", "j")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("p", "cx"))),
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


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    dsub: int | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Ingest-time PQ encoding: ``array<int>`` of length ``m`` — the
    nearest codeword id per subspace (uint8 range; stored small).
    Broadcast-codebook join + one aggregate; the code array reassembles
    via subspace-sorted structs (order-insensitive)."""
    m = len(codebooks)
    d = dsub if dsub is not None else len(codebooks[0][0])
    ids = id_cols or ["vec_id"]
    cb = codebook_df(corpus.sparkSession, codebooks)
    sub = _explode_subspaces(corpus, vec_col, ids, m, d)
    codes = (
        _assign(sub, cb, ids)
        .groupBy(*ids)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "j"))),
                lambda t: t["j"].cast("int"),
            ).alias(code_col)
        )
    )
    return corpus.join(codes, ids)


def _query_probe_lists(
    queries: DataFrame,
    coarse_cb: DataFrame,
    dim: int,
    nprobe: int,
    query_id_col: str,
    vec_col: str,
) -> DataFrame:
    """``(query_id, ivf_list)`` — each query's ``nprobe`` nearest coarse
    lists under exact integer L2, ties to lowest list id (array_sort of
    (d, j) structs — the lexicographic tie rule everywhere else)."""
    q_full = _explode_subspaces(queries, vec_col, [query_id_col], 1, dim)
    return (
        q_full.join(F.broadcast(coarse_cb), "s")
        .select(
            query_id_col,
            F.struct(
                _col_dist2("v", "cw").alias("d"),
                F.col("j").alias("j"),
            ).alias("__dj"),
        )
        .groupBy(query_id_col)
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list("__dj")), lambda t: t["j"]
                ),
                1,
                nprobe,
            ).alias("__probes")
        )
        .select(query_id_col, F.explode("__probes").alias("ivf_list"))
    )


def _query_lut(
    queries: DataFrame,
    pq_cb: DataFrame,
    m: int,
    d: int,
    query_id_col: str,
    vec_col: str,
) -> DataFrame:
    """The per-query ADC lookup table: ``(query_id, s, j, __d)`` —
    ``|Q|·m·ksub`` rows, broadcast into the candidate scoring join."""
    q_sub = _explode_subspaces(queries, vec_col, [query_id_col], m, d)
    return q_sub.join(F.broadcast(pq_cb), "s").select(
        query_id_col,
        "s",
        "j",
        _col_dist2("v", "cw").alias("__d"),
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
    ``(query_id, vec_id, adc_dist2, rank)`` ordered by ``(adc, vec_id)``.

    Relational ADC: the per-query lookup table is the (tiny) query set
    joined to the broadcast codebook — ``|Q|·m·ksub`` rows — and every
    candidate's score is one broadcast equi-join on ``(query, s, j)``
    plus a map-combinable sum over its ``m`` code rows. The corpus side
    carries only its list id and codes: at 100 TB the encoded corpus is
    written partitioned by list id (sources/parquet.write_partitioned)
    and a query scans ``nprobe/nlist`` of the bytes; the float vectors
    never travel."""
    spark = corpus.sparkSession
    m = len(codebooks)
    d = len(codebooks[0][0])
    dim = len(coarse[0])
    if partitions:
        corpus = corpus.repartition(partitions)
    coarse_cb = codebook_df(spark, [coarse])  # s = 0, j = list id
    pq_cb = codebook_df(spark, codebooks)

    # corpus: coarse list + per-subspace codes (exploded form — the ADC
    # join consumes (id, s, j) rows directly, no array reassembly)
    c_full = _explode_subspaces(corpus, vec_col, [id_col], 1, dim)
    lists = _assign(c_full, coarse_cb, [id_col]).select(
        id_col, F.col("j").alias("__list")
    )
    c_sub = _explode_subspaces(corpus, vec_col, [id_col], m, d)
    codes = _assign(c_sub, pq_cb, [id_col]).select(id_col, "s", "j")

    # queries: nprobe nearest lists + the ADC lookup table
    q_lists = _query_probe_lists(
        queries, coarse_cb, dim, nprobe, query_id_col, vec_col
    ).withColumnRenamed("ivf_list", "__list")
    lut = _query_lut(queries, pq_cb, m, d, query_id_col, vec_col)

    cand = lists.join(F.broadcast(q_lists), "__list").select(
        query_id_col, id_col
    )
    scored = (
        cand.join(codes, id_col)
        .join(F.broadcast(lut), [query_id_col, "s", "j"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__d").cast("long").alias("adc_dist2"))
    )
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("adc_dist2").asc(), F.col(id_col).asc()],
        k=k,
    )


def ivfpq_encode(
    corpus: DataFrame,
    coarse: list[list[int]],
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """Encode vectors against FROZEN artifacts (VERDICT r11 task 4): the
    ingest/append half of IVF-PQ as one relation —

        ``(id_col, ivf_list, s, j)`` — m rows per vector

    i.e. the coarse inverted-list id joined to the exploded PQ codes, the
    exact shape :func:`ivfpq_topk_encoded`'s scoring join consumes. At
    100 TB this relation IS the serving index: write it partitioned by
    ``ivf_list`` (sources/parquet.write_partitioned) so a query scans
    ``nprobe/nlist`` of the bytes; appends (:func:`ivfpq_append`) land as
    new files inside existing list directories — no retraining, no
    rewrite of prior rows. Training stays a separate, bounded job
    (:func:`fit_int_kmeans`); encoding is two broadcast-codebook assigns
    plus one id-keyed join."""
    spark = corpus.sparkSession
    m = len(codebooks)
    d = len(codebooks[0][0])
    dim = len(coarse[0])
    if partitions:
        corpus = corpus.repartition(partitions)
    coarse_cb = codebook_df(spark, [coarse])
    pq_cb = codebook_df(spark, codebooks)
    c_full = _explode_subspaces(corpus, vec_col, [id_col], 1, dim)
    lists = _assign(c_full, coarse_cb, [id_col]).select(
        id_col, F.col("j").alias("ivf_list")
    )
    c_sub = _explode_subspaces(corpus, vec_col, [id_col], m, d)
    codes = _assign(c_sub, pq_cb, [id_col]).select(id_col, "s", "j")
    return lists.join(codes, id_col).select(id_col, "ivf_list", "s", "j")


def ivfpq_append(
    index: DataFrame,
    new_vectors: DataFrame,
    coarse: list[list[int]],
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """Incremental index maintenance: encode ``new_vectors`` against the
    SAME frozen artifacts the base index was built with and append. The
    codebooks never move, so an appended index is exactly the index a
    full re-encode would produce — the invariance
    tests/test_pq.py pins — while the marginal cost is the new rows
    only. What frozen codebooks canNOT guarantee is that they still FIT
    a drifted corpus: measure with the staleness audit
    (queries_registry ann_ivfpq_drift) and retrain when the recall gap
    crosses the serving budget."""
    fresh = ivfpq_encode(
        new_vectors, coarse, codebooks, id_col, vec_col, partitions
    )
    return index.select(id_col, "ivf_list", "s", "j").unionByName(fresh)


def ivfpq_topk_encoded(
    index: DataFrame,
    queries: DataFrame,
    coarse: list[list[int]],
    codebooks: list[list[list[int]]],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Serve IVF-PQ from a prebuilt encoded relation
    (:func:`ivfpq_encode` / :func:`ivfpq_append`): same output contract
    as :func:`ivfpq_topk` — ``(query_id, vec_id, adc_dist2, rank)`` by
    ``(adc, vec_id)`` — but the corpus side is the m-bytes-per-vector
    index, so no float vector and no assignment work appears at query
    time. The probe-list relation and the ADC lookup table are both
    query-sized and broadcast; scoring is one equi-join on
    ``(ivf_list)`` + one on ``(query, s, j)`` + a map-combinable sum."""
    spark = index.sparkSession
    m = len(codebooks)
    d = len(codebooks[0][0])
    dim = len(coarse[0])
    coarse_cb = codebook_df(spark, [coarse])
    pq_cb = codebook_df(spark, codebooks)
    q_lists = _query_probe_lists(
        queries, coarse_cb, dim, nprobe, query_id_col, vec_col
    )
    lut = _query_lut(queries, pq_cb, m, d, query_id_col, vec_col)
    scored = (
        index.join(F.broadcast(q_lists), "ivf_list")
        .join(F.broadcast(lut), [query_id_col, "s", "j"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__d").cast("long").alias("adc_dist2"))
    )
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order=[F.col("adc_dist2").asc(), F.col(id_col).asc()],
        k=k,
    )


def coarse_probe_lists(
    vectors: DataFrame,
    coarse: list[list[int]],
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id_col, ivf_list)`` — each vector's ``nprobe`` nearest coarse
    lists under exact integer L2 (ties to lowest list id). The public
    face of the probe helper for composers outside this module: with
    ``nprobe=1`` it is the ingest-time list ASSIGNMENT, with higher
    nprobe the query-time probe set — one deterministic, SQL-replayable
    routine for both (streaming/ingest.py's semantic gate builds its
    corpus index and its per-batch probes from exactly this)."""
    cb = codebook_df(vectors.sparkSession, [coarse])
    return _query_probe_lists(
        vectors, cb, len(coarse[0]), nprobe, id_col, vec_col
    )
