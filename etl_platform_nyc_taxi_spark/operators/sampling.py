"""Deterministic sampling / dataset assembly for training-data pipelines.

Three operations every LLM-corpus build needs, all expressed as pure
hash-bucket expressions (no ``rand()``, no shuffle, no state):

* **hash_split** — train/val/test assignment by content-stable hash of the
  document id. Reproducible across runs/engines/cluster layouts, stable
  under re-partitioning (``rand()`` is none of those), and joins never
  split a document across sets.
* **weighted_sample** — per-stratum keep-rates (the "data mixing" knob:
  upweight books, downsample web) via the same bucket trick.
* **bernoulli_sample** — a single global rate.

All use the md5-portable hash family (functions/hashing.py), so every
assignment is replicable in the DuckDB correctness oracle — and, more
importantly, in any OTHER engine a team migrates to later: the split is a
property of the data, not of Spark.

Scale: the hash is a scan-speed projection; filters on it push into the
scan stage. Nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.hashing import portable_hash64

#: Bucket granularity: weights resolve to 1/10000ths.
BUCKETS = 10_000


def _bucket(id_col: str | Column, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS): md5-prefix hash of
    ``salt:id``. Different salts give independent assignments from the
    same ids (split vs sample vs mix must not correlate). NULL ids hash
    the literal string '<null>' instead of null-propagating — otherwise
    every ``bucket < threshold`` test is NULL=false and all null-id rows
    silently fall through to the LAST split label (code-review r7:
    100% of null-id docs landed in 'test')."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat(F.lit(salt + ":"), F.coalesce(c.cast("string"), F.lit("<null>")))
    return portable_hash64(key, 60) % BUCKETS


def split_column(
    id_col: str | Column,
    weights: dict[str, float],
    salt: str = "split",
) -> Column:
    """Split-label expression from cumulative weight thresholds.

    ``weights`` maps label → fraction (must sum to ≤ 1; any remainder
    falls into the LAST label, so exact coverage is typical:
    ``{"train": .9, "val": .05, "test": .05}``)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    b = _bucket(id_col, salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        acc += w
        cond = b < int(round(acc * BUCKETS))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1][0])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic train/val/test column (default 90/5/5)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn(out_col, split_column(id_col, weights, salt))


def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row with its stratum's rate — the corpus-mixing knob.

    A row survives iff ``bucket(id) < rate(stratum) * BUCKETS``; with a
    content-stable id the SAME documents survive on every run and every
    engine. Per-stratum sampled sizes are binomial around rate·n (this is
    per-row Bernoulli, not exact-count stratified sampling — see
    ``exact_stratified_counts`` in the tests for the audit query shape)."""
    b = _bucket(id_col, salt)
    s = F.col(stratum_col)
    # thresholds resolve to integer literals driver-side — float→int cast
    # semantics differ across engines (truncate vs round), integers don't
    thr = None
    for k, v in rates.items():
        cond = s == F.lit(k)
        t = F.lit(int(round(v * BUCKETS)))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = F.lit(int(round(default_rate * BUCKETS)))
    thr = default_t if thr is None else thr.otherwise(default_t)
    return df.filter(b < thr)


def bernoulli_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic global sample: keep iff bucket(id) < rate·BUCKETS."""
    return df.filter(_bucket(id_col, salt) < int(round(rate * BUCKETS)))


def shard_shuffle(
    df: DataFrame,
    num_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
) -> DataFrame:
    """Deterministic global shuffle into ``num_shards`` training shards.

    The scale-correct form of "shuffle a 100 TB corpus before training":
    a single global ``ORDER BY rand()`` serializes in one partition and
    isn't reproducible; instead each row gets ``shard = hash(id) %
    num_shards`` (scan-speed projection — this IS the random permutation
    across shards) and ``pos_in_shard`` from a PARTITIONED window over the
    hash order, so the sort parallelizes per shard. Writers then emit one
    file per shard, already in read order. Same md5-portable family as
    :func:`hash_split`: the permutation is a property of the data, not of
    the engine, so it replays in the oracle and any future engine."""
    from pyspark.sql import Window

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = portable_hash64(F.concat(F.lit(salt + ":"), c.cast("string")), 60)
    out = df.withColumn("__h", h).withColumn(
        shard_col, (F.col("__h") % num_shards).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("__h").asc(), c.asc())
    return out.withColumn(pos_col, F.row_number().over(w)).drop("__h")


def stratified_cap(
    df: DataFrame,
    cap: int,
    stratum_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """At most ``cap`` rows per stratum, chosen by deterministic hash
    order — exact-count stratified downsampling (the rebalancing knob
    when one source/language dwarfs the rest; Bernoulli rates only hit
    quotas in expectation). Partitioned window, so each stratum sorts in
    parallel; skewed strata sort ``cap`` winners out of their partition
    rather than collapsing to the driver."""
    from pyspark.sql import Window

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = portable_hash64(F.concat(F.lit(salt + ":"), c.cast("string")), 60)
    w = Window.partitionBy(*stratum_cols).orderBy(h.asc(), c.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    token_count_col,
    capacity: int = 512,
    group_cols: tuple[str, ...] = (),
    order_cols: tuple[str, ...] = ("doc_id",),
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Concat-and-cut sequence packing: assign each document to the
    training chunk its START offset falls in when the (deterministically
    ordered) group is concatenated and cut every ``capacity`` tokens —
    the GPT-style packing that wastes no pad tokens; boundary documents
    simply span the cut.

    ``token_count_col`` may be a column name or expression (e.g.
    ``operators.text.token_count("text")``). The running offset is a
    window cumsum over ``order_cols`` WITHIN ``group_cols`` — packing
    whole corpora through one global window would serialize at scale, so
    group by a partition-grained key (language, source, shard) and pack
    each group independently; chunk ids are then (group, chunk_id) pairs.
    Deterministic by construction: same data → same chunks, any cluster
    layout."""
    from pyspark.sql import Window

    tc = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    )
    # Explicit ROWS frame: the default frame for an ordered window is
    # RANGE, under which rows TIED on order_cols are peers sharing one
    # inclusive cumsum — start offsets would collide/overlap. ROWS gives
    # each row its own prefix; order_cols should still carry a unique
    # tiebreak for run-to-run determinism of WHICH tied row packs first.
    w = (
        Window.partitionBy(*group_cols).orderBy(*order_cols)
        if group_cols
        else Window.orderBy(*order_cols)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_end = F.sum(tc).over(w)  # inclusive cumsum: offset AFTER this doc
    start = (cum_end - tc).cast("long")
    return df.withColumns(
        {
            "n_tokens": tc.cast("long"),
            "start_offset": start,
            chunk_col: (start / F.lit(capacity)).cast("long"),
        }
    )


def assign_range_shards(
    df: DataFrame,
    value_col: str,
    k: int = 8,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Range-shard assignment by explicit quantile cut points — the
    scale-safe form of "write the corpus sorted/clustered by X": a global
    ``orderBy`` serializes through a range exchange whose sampled
    boundaries are nondeterministic run-to-run, while this computes k−1
    EXACT percentile cuts on the aggregate (one reduce over a single
    column), broadcasts that one row, and assigns each row its shard with
    a pure projection (shard = #cuts strictly below the value). Output
    shards are the range partitions; rows never shuffle to get their
    label, and the same data always yields the same layout.

    Cuts are rounded to 4 dp so the shard boundaries are reproducible
    across engines (the DuckDB oracle replays the same quantile_cont +
    round). Interior shards hold ~n/k rows; heavy duplicate mass at a cut
    value lands in one shard (ties don't split)."""
    ps = [i / k for i in range(1, k)]
    cuts = df.agg(
        F.transform(
            F.percentile(value_col, F.array(*[F.lit(p) for p in ps])),
            lambda x: F.round(x, 4),
        ).alias("__cuts")
    )
    shard = F.size(
        F.filter("__cuts", lambda c: c < F.col(value_col))
    ).cast("int")
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(shard_col, shard)
        .drop("__cuts")
    )


def assign_zorder_cells(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 4,
    cell_col: str = "z_cell",
) -> DataFrame:
    """Z-order (Morton) cell assignment over two columns — the
    multi-column generalization of :func:`assign_range_shards` for
    data-skipping layouts: writing files clustered by ``z_cell`` gives
    every file a tight min/max envelope on BOTH dimensions, so scans
    filtered on either column (or both) prune files, which a one-column
    sort can only do for its leading column.

    Same scale shape as range sharding: each dimension reduces to
    ``2^bits − 1`` exact quantile cuts (one aggregate over two columns),
    the cut row broadcasts, and the cell id is a pure projection —
    bucket each value (#cuts strictly below), then interleave the
    bucket bits with shift/or arithmetic (whole-stage codegen; x takes
    even bit positions, y odd). Quantile bucketing makes cells
    equi-populated regardless of each column's distribution — Z-order
    on raw values degenerates when one dimension is skewed.

    Cuts round to 4 dp for cross-engine reproducibility (the oracle
    replays quantile_cont + round + the same bit arithmetic)."""
    n_cuts = (1 << bits) - 1
    ps = [i / (1 << bits) for i in range(1, n_cuts + 1)]
    p_arr = F.array(*[F.lit(p) for p in ps])
    cuts = df.agg(
        F.transform(F.percentile(col_x, p_arr), lambda v: F.round(v, 4)).alias("__cx"),
        F.transform(F.percentile(col_y, p_arr), lambda v: F.round(v, 4)).alias("__cy"),
    )
    bx = F.size(F.filter("__cx", lambda c: c < F.col(col_x)))
    by = F.size(F.filter("__cy", lambda c: c < F.col(col_y)))
    out = (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("__bx", bx)
        .withColumn("__by", by)
    )
    z = F.lit(0)
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright("__bx", b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright("__by", b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return (
        out.withColumn(cell_col, z.cast("int"))
        .drop("__cx", "__cy", "__bx", "__by")
    )


def hash_reservoir_per_key(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic fixed-``k``-per-key uniform sample: rank each key's
    rows by a cryptographic hash of the row id and keep the first k —
    the reproducible replacement for rand()-based reservoir sampling in
    training-mix construction (same data → same sample, on ANY engine,
    across reruns and repartitions; salt the id upstream to reseed).

    Scale shape: one shuffle on the key; Spark compiles the bounded
    rank into WindowGroupLimit, so each map task pre-truncates its
    partition to k candidates before the exchange — the shuffle carries
    O(tasks·k) rows per key, not the key's full population. md5 is a
    built-in codegen expression on both engines (no UDF)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*key_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def plan_compaction_bins(
    files: DataFrame,
    size_col: str,
    order_cols: list[str],
    target_size: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Greedy cumulative-sum bin packing of file-level METADATA into
    ~``target_size`` bins — the planning half of small-file compaction
    (the chronic lakehouse failure mode: a streaming writer leaves
    thousands of KB-scale files and every scan pays per-file open cost).

    bin = floor(exclusive_prefix_sum / target): consecutive files (in
    ``order_cols`` order, so time/partition locality survives the
    rewrite) land in the same bin until it overflows. The window is
    GLOBAL but runs over the manifest relation — one row per FILE
    (~1M rows at 100 TB), which is driver-scale the same way query
    planners treat manifests; the data itself only moves when the
    rewrite job executes the plan, one task per bin. Integer prefix
    sums are exact on every engine."""
    from pyspark.sql import Window

    if target_size < 1:
        raise ValueError(f"target_size must be >= 1, got {target_size}")
    w = (
        Window.orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.withColumn(
        bin_col,
        F.floor(cum_before.cast("double") / F.lit(float(target_size))).cast(
            "long"
        ),
    )


def pps_systematic_per_key(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic probability-proportional-to-size sample: per key,
    lay the rows on a line in hash order with segment length = weight,
    and keep every row whose segment crosses one of the ``k`` evenly
    spaced picks — systematic PPS sampling (Madow), the standard design
    for size-weighted corpus subsampling (long docs proportionally more
    likely, short docs never starved past 1/k granularity).

    Engine-portable by construction: the randomization is the md5 hash
    order (seedable by salting the id upstream) and the crossing test
    ``(cum·k) DIV total > ((cum−w)·k) DIV total`` is EXACT integer
    arithmetic — no floating point, no rand(), so the identical SQL on
    any engine picks the identical rows. A row heavier than total/k may
    cross several picks; it is kept once (sampling without replacement —
    the certainty-item convention).

    Scale shape: one shuffle on the key; both window frames (running sum
    and per-key total) run over the same partitioning, so Catalyst
    evaluates them in a single Window exchange. Weights must be
    non-negative integers (use a scaled-int column for fractional
    weights — exactness is the point)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.col(id_col).cast("string"))
    order = Window.partitionBy(*key_cols).orderBy(h.asc(), F.col(id_col).asc())
    whole = Window.partitionBy(*key_cols)
    # backtick-quote so the whole name resolves literally (bare F.col
    # parses '.' as struct-field access)
    w = F.col("`" + weight_col.replace("`", "``") + "`").cast("bigint")
    cum = F.sum(w).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(w).over(whole)
    # integer DIV, not float division: expr() because the Column API has
    # no floor-div operator. Only the temp columns this function created
    # appear inside the expr strings — the caller's weight_col is staged
    # through __w first, so names needing backticks can't break the
    # parse or resolve to the wrong expression (ADVICE r4).
    return (
        df.withColumn("__w", w)
        .withColumn("__cum", cum)
        .withColumn("__tot", total)
        .filter(
            # DECIMAL(38,0) product: __cum * k in int64 silently wraps
            # once a per-key weight total reaches 2^63/k (weights scaled
            # to integers get there fast), corrupting the crossing test
            # (code-review r7); 38 digits hold any int64 × int32 exactly
            F.expr(f"CAST(__cum AS DECIMAL(38,0)) * {k} DIV __tot")
            > F.expr(f"CAST(__cum - __w AS DECIMAL(38,0)) * {k} DIV __tot")
        )
        .drop("__w", "__cum", "__tot")
    )


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    partitions: int | None = None,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how much its hashed n-gram features look
    like the TARGET distribution versus the RAW pool, so a pipeline can
    resample raw data toward a high-quality / in-domain target without
    training a classifier.

    Features are whitespace unigrams + bigrams hashed into ``buckets``
    bins (the md5-portable family — oracle-replicable). Both feature
    distributions get add-one smoothing over the bins:
    ``p(b) = (c_b + 1) / (total + buckets)``. A document's weight is the
    sum over its feature OCCURRENCES of ``ln p_target(b) − ln p_raw(b)``
    — positive means target-like.

    Engine-portable determinism: the per-bin log-ratio is quantized to
    integer MICRO-NATS once per bin (two exactly-rounded IEEE divisions
    and two ``ln`` calls, then one FLOOR), and per-doc totals are
    order-independent BIGINT sums of ``occurrences × delta`` — the same
    discipline as the perplexity filter and the exact-decimal pagerank.

    Output: (id, is_target, n_feats, weight_micro, selected) where
    ``selected`` marks RAW docs with positive weight — the resampling
    keep-set. Docs with no tokens score (0, 0, false).

    Scale shape (100 TB): feature extraction is a higher-order-function
    projection at scan speed; the feature stream is aggregated exactly
    TWICE — once into the per-bin conditional counts (map-side
    combinable, at most ``buckets`` groups) and once into per-doc bin
    counts — and the grand totals come from summing the ``buckets``-row
    bins table itself, not a third corpus pass; the per-doc scoring join
    broadcasts the bin table (a few KB at any corpus size); totals join
    as a 1-row broadcast. Nothing quadratic, nothing driver-side."""
    from etl_platform_nyc_taxi_spark.operators.text import tokens_ws

    base = df.select(
        F.col(id_col), is_target.alias("__tgt"), tokens_ws(text_col).alias("__t")
    )
    if partitions:
        base = base.repartition(partitions)
    # offset-explode (r12, guide §4.1): one generator over 2·size−1
    # feature slots — slot i ≤ size is unigram i, slot i > size is the
    # bigram starting at i−size — replaces the interpreted per-doc
    # transform/concat that BUILT the feature array before exploding.
    # Identical feature MULTISET (consumers only aggregate); tokenless
    # docs are filtered here and restored by the final left join's
    # coalesce, exactly as before (explode of an empty array).
    n = F.size("__t")
    feats = (
        base.filter(n > 0)
        .select(
            F.col(id_col),
            "__tgt",
            "__t",
            F.explode(F.sequence(F.lit(1), 2 * n - 1)).alias("__i"),
        )
        .select(
            F.col(id_col),
            "__tgt",
            F.when(
                F.col("__i") <= F.size("__t"),
                F.element_at("__t", F.col("__i")),
            )
            .otherwise(
                F.concat_ws(
                    " ",
                    F.element_at("__t", F.col("__i") - F.size("__t")),
                    F.element_at("__t", F.col("__i") - F.size("__t") + 1),
                )
            )
            .alias("__f"),
        )
        .select(
            F.col(id_col),
            "__tgt",
            F.pmod(
                F.conv(F.substring(F.md5("__f"), 1, 12), 16, 10).cast("long"),
                F.lit(buckets),
            ).alias("__b"),
        )
    )
    doc_bins = feats.groupBy(id_col, "__tgt", "__b").agg(
        F.count(F.lit(1)).alias("__k")
    )
    bins = feats.groupBy("__b").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__ct"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).alias("__cr"),
    )
    # Totals are derived from the (at most ``buckets``-row) bins table,
    # NOT re-aggregated from ``feats``: sum-over-bins of the per-bin
    # counts IS the total occurrence count, and re-using ``bins`` keeps
    # the corpus to exactly two feature-stream passes (bin counts +
    # per-doc counts) instead of three (advisor r8 — each aggregate
    # shuffles differently, so a separate totals agg re-executed the
    # whole tokenize+hash subtree).
    totals = bins.agg(
        F.sum("__ct").alias("__T"),
        F.sum("__cr").alias("__R"),
    )
    delta = (
        bins.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.floor(
                (
                    F.log(
                        (F.col("__ct") + F.lit(1))
                        / (F.col("__T") + F.lit(buckets)).cast("double")
                    )
                    - F.log(
                        (F.col("__cr") + F.lit(1))
                        / (F.col("__R") + F.lit(buckets)).cast("double")
                    )
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__d"),
        )
    )
    scored = doc_bins.join(F.broadcast(delta), "__b").groupBy(id_col).agg(
        F.sum("__k").cast("long").alias("n_feats"),
        F.sum(F.col("__k") * F.col("__d")).cast("long").alias("weight_micro"),
    )
    return (
        df.select(F.col(id_col), is_target.alias("is_target"))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            "is_target",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("weight_micro", F.lit(0))
            .cast("long")
            .alias("weight_micro"),
            (
                (~F.col("is_target"))
                & (F.coalesce("weight_micro", F.lit(0)) > 0)
            ).alias("selected"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled multi-source mixing (VERDICT r9 task 5)
# ---------------------------------------------------------------------------


def temperature_quotas(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    weight_milli_expr: Column | None = None,
) -> DataFrame:
    """Per-source document quotas under temperature-scaled mixing — the
    standard multi-source LLM recipe (mT5 / XLM-R: sample source ``s``
    with probability ∝ n_s^τ, τ < 1 upweights small sources relative to
    proportional sampling).

    Returns one row per source: ``(source, n_docs, weight_milli,
    quota)`` where ``quota = min(n_s, budget · w_s / Σw)``.

    Exactness discipline (cross-engine, same as the DSIR micro-nats):
    τ = 0.5 by default because IEEE ``sqrt`` is correctly rounded —
    bit-identical in every engine — and the weight quantizes to MILLI
    units (``floor(sqrt(n) · 1000)``: one exactly-rounded multiply, one
    floor) before any arithmetic that could drift; quota math is then
    pure BIGINT (multiply, integer divide). No double ever crosses an
    engine boundary. Pass ``weight_milli_expr`` (a Column over
    ``n_docs``) for other temperature laws — keep it
    quantized-integer for oracle parity.

    Scale shape: one map-side-combinable count per source (|sources|
    rows), a 1-row total broadcast — nothing corpus-sized moves."""
    sizes = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        weight_milli_expr
        if weight_milli_expr is not None
        else F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000)
    ).cast("long")
    sized = sizes.withColumn("weight_milli", w)
    total = sized.agg(F.sum("weight_milli").alias("__tw"))
    return (
        sized.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            "weight_milli",
            F.least(
                F.col("n_docs"),
                F.expr(f"({budget}L * weight_milli) div __tw"),
            ).alias("quota"),
        )
    )


def temperature_mix(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "tmix",
    order_by: Column | None = None,
    quotas: DataFrame | None = None,
) -> DataFrame:
    """Select each source's temperature quota of documents — the mixing
    step a multi-source corpus build runs after per-source cleaning.

    Selection is deterministic: within a source, rows rank by
    ``order_by`` (default: the portable md5 hash of the salted id — an
    unbiased shuffle both engines replay; pass e.g. DSIR's
    ``weight_micro`` descending to compose quality-aware mixing) and
    the first ``quota`` rows survive. One partitioned window keyed on
    source — skewed sources sort inside their partition, nothing
    global; quotas broadcast (|sources| rows).

    Returns the input rows + ``kept`` boolean (filter on it to
    materialize the mix; keeping the flag makes the accounting query
    and the oracle replay exact)."""
    from pyspark.sql import Window

    q = quotas if quotas is not None else temperature_quotas(
        df, budget, source_col=source_col
    )
    # order_by may already carry a sort direction (e.g. .desc()) — use
    # it verbatim; only the default hash key gets an explicit .asc()
    rank_key = (
        order_by
        if order_by is not None
        else portable_hash64(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")), 60
        ).asc()
    )
    w = Window.partitionBy(source_col).orderBy(rank_key, F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(
            F.broadcast(q.select(source_col, "quota")), source_col
        )
        .withColumn("kept", F.col("__rn") <= F.col("quota"))
        .drop("__rn", "quota")
    )


def unimax_allocation(
    sizes: DataFrame,
    key_cols: list[str],
    n_col: str = "n_tok",
    epoch_cap: int = 2,
    budget: DataFrame | None = None,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023): spread a total token
    budget as UNIFORMLY as possible across strata (languages/sources),
    capping every stratum at ``epoch_cap`` epochs of its own data — the
    published alternative to temperature sampling that never over-repeats
    low-resource strata.

    ``sizes`` is the pre-aggregated strata relation ``(key_cols...,
    n_col)``; ``budget`` an optional 1-row ``(budget long)`` relation
    (default: half the total token count, computed in-plan — never a
    driver action). Returns one row per stratum: ``(key_cols..., n_col,
    cap, alloc, epochs_micro)``.

    Algorithm (closed form of the paper's waterfilling loop): sort strata
    ascending by ``cap = epoch_cap·n``; while the uniform share of the
    remaining budget exceeds the next cap, the stratum saturates at its
    cap; the first stratum whose cap exceeds the share fixes the water
    level, and every remaining stratum splits the leftover evenly. With
    real arithmetic the share is constant past that crossover, so the
    crossover row's (rank, cap-prefix) — two conditional-MIN scalars,
    valid because the cap-prefix is monotone in rank — determine every
    allocation. Integerization is largest-remainder: the leftover's
    ``mod`` spills one extra token to the first ``rem`` tail strata in
    the same deterministic order, so ``Σ alloc = budget`` exactly
    whenever the budget is feasible (≤ Σ cap). All arithmetic is BIGINT
    (div/mod) — no float crosses the engine boundary; ``epochs_micro`` =
    ``(1e6·alloc) div n`` is exact integer micro-epochs.

    Scale shape: the window and scalars run over the STRATA relation
    (|langs×sources| rows — thousands at most), never the corpus; the
    only corpus-sized work is whatever aggregation produced ``sizes``.
    The deliberately-unpartitioned window is the §7.5 safe shape (post-
    aggregate, bounded input)."""
    from pyspark.sql import Window

    n = F.col(n_col).cast("long")
    capped = sizes.select(
        *key_cols, n.alias(n_col), (n * F.lit(epoch_cap)).alias("cap")
    )
    if budget is None:
        budget = capped.agg(
            F.expr(f"CAST(sum({n_col}) div 2 AS BIGINT)").alias("budget")
        )
    n_strata = capped.agg(F.count(F.lit(1)).cast("long").alias("n_strata"))
    order = [F.col("cap").asc()] + [F.col(k).asc() for k in key_cols]
    w = Window.orderBy(*order)
    ranked = (
        capped.crossJoin(F.broadcast(budget))
        .crossJoin(F.broadcast(n_strata))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "prefix",
            F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "candidate",
            F.expr("(budget - prefix) div (n_strata - rn + 1)"),
        )
    )
    scalars = ranked.agg(
        F.min(F.when(F.col("cap") > F.col("candidate"), F.col("rn"))).alias(
            "c_rn"
        ),
        F.min(
            F.when(F.col("cap") > F.col("candidate"), F.col("prefix"))
        ).alias("c_prefix"),
    )
    tail_base = F.expr("(budget - c_prefix) div (n_strata - c_rn + 1)")
    tail_rem = F.expr("(budget - c_prefix) % (n_strata - c_rn + 1)")
    alloc = F.when(
        F.col("c_rn").isNull() | (F.col("rn") < F.col("c_rn")), F.col("cap")
    ).otherwise(
        tail_base
        + F.when(F.col("rn") - F.col("c_rn") < tail_rem, F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    return (
        ranked.crossJoin(F.broadcast(scalars))
        .withColumn("alloc", alloc.cast("long"))
        .select(
            *key_cols,
            n_col,
            "cap",
            "alloc",
            F.expr(f"(1000000 * alloc) div greatest({n_col}, 1)").alias(
                "epochs_micro"
            ),
        )
    )


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "ilv",
) -> DataFrame:
    """Deterministic proportional interleaving of N sources into one
    training order (stride scheduling): within each source, docs rank by
    the portable md5 hash (an unbiased shuffle both engines replay);
    each doc's global ORDER KEY is ``(rank-1) · total_docs div
    source_docs`` — so reading the corpus in order-key order yields
    every source at its corpus proportion in EVERY PREFIX of the stream,
    not just in expectation. This is the "mixture holds within every
    training window" property batch samplers want: a 70/20/10 corpus
    stays 70/20/10 inside any contiguous slice, instead of clumping by
    whatever order the files were written.

    Returns ``(id, source, src_rank, order_key)``; ties in order_key
    (different sources landing the same stride slot) are broken
    deterministically downstream by (order_key, source, id). Integer
    arithmetic only.

    Scale shape: one per-source window for the rank (partitioned on the
    source — skew bounded by source size), one broadcast counts join;
    the global interleave NEVER sorts globally — order_key is a pure
    projection, and a consumer ``repartitionByRange(order_key)`` writes
    the stream in training order with a range shuffle."""
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n_src")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n_tot"))
    w = Window.partitionBy(source_col).orderBy(
        F.md5(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.select(id_col, source_col)
        .withColumn("src_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(counts), source_col)
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            source_col,
            "src_rank",
            F.expr("((src_rank - 1) * __n_tot) div __n_src").alias(
                "order_key"
            ),
        )
    )


def epoch_decay_micro(max_epochs: int, decay_milli: int) -> list[int]:
    """Per-epoch value-decay weights in exact micro units:
    ``floor(1e6 · (decay_milli/1000)^(e-1))`` for e = 1..max_epochs,
    computed ONCE in exact integer arithmetic — the literals embed
    identically in the Spark plan and the DuckDB oracle, so no float
    power ever crosses an engine boundary."""
    return [
        (1_000_000 * decay_milli ** (e - 1)) // (1000 ** (e - 1))
        for e in range(1, max_epochs + 1)
    ]


def epoch_allocation(
    sizes: DataFrame,
    key_cols: list[str],
    n_col: str = "n_tok",
    q_col: str = "q_milli",
    max_epochs: int = 6,
    decay_milli: int = 500,
    budget: DataFrame | None = None,
) -> DataFrame:
    """Quality-weighted data-constrained epoch allocation (the
    Muennighoff et al. 2023, arXiv:2305.16264 regime: when the token
    budget exceeds the unique data, repeat it — but repeated epochs
    decay in value, so spend the budget where marginal utility is
    highest).

    Model: the e-th epoch of stratum s is worth ``q_s · δ^(e-1)`` per
    token (``q_s`` a milli quality weight, δ the per-epoch decay).
    The greedy optimum orders all (stratum, epoch) candidates by
    marginal utility and fills until the budget crosses; because
    utility strictly decreases in e for a fixed stratum, greedy never
    takes epoch e before e-1 — feasibility is free.

    Everything is exact integer: decay weights are precomputed micro
    literals (:func:`epoch_decay_micro`), the sort key is
    ``q_milli · decay_micro`` (BIGINT, total-ordered with (key, e)
    tie-breaks), the running token cost is a cumulative window, and
    the budget-crossing candidate gets the exact remainder, so
    ``Σ alloc = min(budget, capacity)`` token-exactly.

    Returns one row per stratum: ``(key_cols..., n_tok, q_milli,
    epochs_full, alloc_tok, epochs_micro, eff_tok_micro)`` where
    ``eff_tok_micro = Σ_e alloc_e · decay_micro_e`` is the
    effective-unique-token account (the paper's diminishing-returns
    ledger) and ``epochs_micro = 1e6·alloc div n``.

    ``budget``: optional 1-row ``(budget long)`` relation; default
    1.5× the total unique tokens, computed in-plan. Scale shape: the
    candidate relation is |strata|·max_epochs rows (metadata-sized);
    the deliberately-unpartitioned cumulative window is the §7.5 safe
    shape; nothing corpus-sized appears anywhere."""
    from pyspark.sql import Window

    decays = epoch_decay_micro(max_epochs, decay_milli)
    if budget is None:
        budget = sizes.agg(
            F.expr(f"CAST(SUM({n_col}) * 3 DIV 2 AS BIGINT)").alias("budget")
        )
    decay_case = "CASE e " + " ".join(
        f"WHEN {e} THEN CAST({d} AS BIGINT)"
        for e, d in enumerate(decays, start=1)
    ) + " END"
    cand = (
        sizes.select(
            *key_cols,
            F.col(n_col).cast("long").alias("n_tok"),
            F.col(q_col).cast("long").alias("q_milli"),
        )
        .where(F.col(q_col) > 0)
        .select(
            "*", F.explode(F.expr(f"sequence(1, {max_epochs})")).alias("e")
        )
        .withColumn("decay_micro", F.expr(decay_case))
        .withColumn("util", F.col("q_milli") * F.col("decay_micro"))
    )
    w = Window.orderBy(
        F.col("util").desc(), *[F.col(k) for k in key_cols], F.col("e")
    )
    cum = (
        cand.withColumn("cum", F.sum("n_tok").over(w))
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "alloc_e",
            F.when(F.col("cum") <= F.col("budget"), F.col("n_tok"))
            .when(
                F.col("cum") - F.col("n_tok") < F.col("budget"),
                F.col("budget") - (F.col("cum") - F.col("n_tok")),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return (
        cum.groupBy(*key_cols)
        .agg(
            F.max("n_tok").alias("n_tok"),
            F.max("q_milli").alias("q_milli"),
            F.sum(F.when(F.col("alloc_e") == F.col("n_tok"), 1).otherwise(0))
            .cast("long")
            .alias("epochs_full"),
            F.sum("alloc_e").cast("long").alias("alloc_tok"),
            F.sum(F.col("alloc_e") * F.col("decay_micro"))
            .cast("long")
            .alias("eff_tok_micro"),
        )
        .withColumn(
            "epochs_micro",
            F.expr("CAST(alloc_tok * 1000000 DIV n_tok AS BIGINT)"),
        )
        .select(
            *key_cols,
            "n_tok",
            "q_milli",
            "epochs_full",
            "alloc_tok",
            "epochs_micro",
            "eff_tok_micro",
        )
    )
