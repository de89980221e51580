"""Warehouse-analytics operators the reference's users reach for next:
cohort retention, outlier detection, time-series gap-fill, sweep-line
concurrency, column profiling, and exact heavy hitters.

Every operator here is built for the 100 TB posture first:

* aggregations are expressed so Catalyst plans map-side partial
  aggregation (shuffle carries counts/sums, never raw rows);
* windows run only over pre-aggregated or per-key-bounded relations —
  the one unavoidable long scan (the concurrency sweep) is parallelized
  as a two-phase sharded prefix sum instead of a single-partition window;
* per-group statistics join back via broadcast (group cardinality is
  the small side by construction);
* double-typed outputs are derived from exact DECIMAL sums so results
  are order-independent and bit-identical across engines.

Ref (capability gap): the reference computes daily counts only
(dags/spark_jobs/calculate_daily_transactions.py); none of these exist
there. They are the §7 "what a production user needs next" extensions.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the week of their
    first event; for each (cohort_week, week_offset), how many of them
    were active that week.

    Plan shape (three hash shuffles, all on ``user_col``, so the exchange
    is reused between first-event and activity aggregation): min-ts per
    user → distinct active (user, week) → co-partitioned join → count per
    (cohort, offset). No windows, no skew risk beyond user-key hashing.
    """
    e = df.select(F.col(user_col).alias("u"), F.col(ts_col).alias("t")).filter(
        F.col("t").isNotNull()
    )
    firsts = e.groupBy("u").agg(
        F.date_trunc("week", F.min("t")).cast("date").alias("cohort_week")
    )
    active = e.select(
        "u", F.date_trunc("week", F.col("t")).cast("date").alias("active_week")
    ).distinct()
    j = active.join(firsts, "u")
    offset = F.floor(F.datediff("active_week", "cohort_week") / 7).cast("int")
    return (
        j.select("cohort_week", offset.alias("week_offset"), "u")
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def group_zscore_outliers(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    id_cols: Sequence[str],
    threshold: float = 3.0,
    min_group: int = 30,
) -> DataFrame:
    """Per-group z-score outliers with exact, engine-portable arithmetic.

    Group mean/variance are derived from exact DECIMAL ``SUM(x)`` and
    ``SUM(x*x)`` (order-independent), converted to DOUBLE only for the
    final ``(x - mean)/stddev`` — the identical IEEE expression replays
    bit-for-bit on any engine, so the result is value-hash stable.

    Plan: one grouped aggregate (map-side combined), then the per-group
    stats — the SMALL side by construction — broadcast back onto the fact
    rows; no window, no second fact shuffle.
    """
    v = F.col(value_col)
    stats = df.groupBy(*key_cols).agg(
        F.count(v).alias("__n"),
        F.sum(v.cast("decimal(18,4)")).alias("__s1"),
        F.sum(v.cast("decimal(18,4)") * v.cast("decimal(18,4)")).alias("__s2"),
    )
    mean = F.col("__s1").cast("double") / F.col("__n")
    ex2 = F.col("__s2").cast("double") / F.col("__n")
    stats = (
        stats.filter(F.col("__n") >= min_group)
        .withColumn("__mean", mean)
        .withColumn("__var", ex2 - F.col("__mean") * F.col("__mean"))
        .filter(F.col("__var") > 1e-18)
        .withColumn("__std", F.sqrt("__var"))
    )
    z = (v - F.col("__mean")) / F.col("__std")
    return (
        df.join(F.broadcast(stats), list(key_cols))
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= threshold)
        .select(*id_cols, *key_cols, value_col, "zscore")
    )


def gapfill_forward(
    daily: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_col: str,
    out_col: str = "value_filled",
    gap_col: str = "was_gap",
) -> DataFrame:
    """Regularize a per-key daily series to a dense date spine and
    forward-fill missing days (standard time-series resample/ffill).

    ``daily`` must already be aggregated to one row per (key, day) — the
    spine explode and the fill window then run on the AGGREGATE, whose
    size is |keys| × day-span, not the fact row count; this is the
    engine's scale rule for windows. The spine is generated per key from
    that key's own [min, max] day bounds (``sequence`` + ``explode``), so
    no global calendar table and no cross join against the fact.
    """
    keys = [F.col(k) for k in key_cols]
    bounds = daily.groupBy(*keys).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    spine = bounds.select(
        *keys, F.explode(F.sequence("__d0", "__d1")).alias(date_col)
    )
    j = spine.join(daily, [*key_cols, date_col], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        *keys,
        F.col(date_col),
        F.last(value_col, ignorenulls=True).over(w).alias(out_col),
        F.col(value_col).isNull().alias(gap_col),
    )


def sweep_max_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    cohort_col: str = "day",
    shard_trunc: str = "hour",
) -> DataFrame:
    """Max concurrent intervals per cohort via a SHARDED sweep line —
    the scale-safe replacement for both the O(n²) interval self-join and
    the single-partition running-sum window.

    Classic sweep: emit (+1 at start, −1 at end), order by time, running
    sum, take the max. The running sum is a prefix scan, so it
    parallelizes exactly like one: (1) within each (cohort, time-shard)
    compute the local running sum and the shard total; (2) cumulate the
    shard totals per cohort — a relation with one row per shard, tiny —
    into carry-in offsets; (3) local max + carry-in, then max per cohort.
    No partition ever sees more than one shard's deltas, and the only
    full-data operations are hash aggregations with map-side combine.

    Tie semantics: at equal timestamps ends sort before starts
    (``delta`` ascending), i.e. half-open [start, end) intervals. Equal
    rows commute inside the prefix sum, so the per-cohort max is
    deterministic regardless of physical order.
    """
    s, e = F.col(start_col), F.col(end_col)
    starts = intervals.select(
        F.col(cohort_col), s.alias("t"), F.lit(1).alias("delta")
    )
    ends = intervals.select(
        F.col(cohort_col), e.alias("t"), F.lit(-1).alias("delta")
    )
    deltas = starts.unionAll(ends).withColumn(
        # Truncated-timestamp shards sort identically to t itself, so the
        # shard boundary respects the sweep order (and works for both
        # TIMESTAMP and TIMESTAMP_NTZ, unlike epoch arithmetic).
        "__shard", F.date_trunc(shard_trunc, F.col("t"))
    )
    in_shard = (
        Window.partitionBy(cohort_col, "__shard")
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = deltas.withColumn("__run", F.sum("delta").over(in_shard))
    local_max = local.groupBy(cohort_col, "__shard").agg(
        F.max("__run").alias("__lmax"), F.sum("delta").alias("__ltot")
    )
    # Carry-in = sum of totals of all STRICTLY EARLIER shards. One row per
    # shard — cumulating this with a window is windows-on-aggregates.
    shard_w = (
        Window.partitionBy(cohort_col)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = local_max.withColumn(
        "__carry", F.coalesce(F.sum("__ltot").over(shard_w), F.lit(0))
    )
    return offs.groupBy(cohort_col).agg(
        F.max(F.col("__lmax") + F.col("__carry")).cast("int").alias("max_concurrent")
    )


#: profile_columns type normalizers: native min/max rendered to a single
#: portable string per type family (doubles via DECIMAL(18,2) so the
#: text form is engine-independent; timestamps via an explicit pattern).
_REPR = {
    "long": lambda c: c.cast("string"),
    "int": lambda c: c.cast("string"),
    "string": lambda c: c,
    "double": lambda c: c.cast("decimal(18,2)").cast("string"),
    "timestamp": lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss"),
}

#: Spark dtype-string synonyms accepted by profile_columns, so feeding
#: ``df.dtypes`` output directly works (code-review r7: 'bigint' raised
#: a bare KeyError because the map spells it 'long').
_REPR_SYNONYMS = {
    "bigint": "long",
    "integer": "int",
    "smallint": "int",
    "tinyint": "int",
    "varchar": "string",
    "float": "double",
    "date": "timestamp",
}


def _repr_for(name: str, kind: str):
    k = _REPR_SYNONYMS.get(kind, kind)
    if k not in _REPR:
        raise ValueError(
            f"profile_columns: unsupported type {kind!r} for column "
            f"{name!r}; supported kinds: "
            f"{sorted(set(_REPR) | set(_REPR_SYNONYMS))}"
        )
    return _REPR[k]


def profile_columns(
    df: DataFrame, cols: Sequence[tuple[str, str]]
) -> DataFrame:
    """Column-level profile (the warehouse ``DESCRIBE ANALYZE``): per
    column — row count, null count, exact distinct count, min/max
    rendered portably per type family.

    Two aggregate passes over the relation, deliberately split (r12
    optimization): the multi-column DISTINCT aggregates plan through
    Catalyst's Expand (cost ≈ n_cols × scan — the honest price of EXACT
    ndv; the approximate twin is ``approx_count_distinct`` under
    agg_approx), and mixing min/max(string) into the SAME aggregate
    forced the whole Expand output through SortAggregate (string agg
    buffers are not hash-aggregable), i.e. full sorts of n_cols × rows
    wide expanded rows on every profiled column. Split, the NDV pass is
    pure HashAggregate over the Expand and the min/max/count pass is a
    keyless single-pass aggregate with no sort; the two 1-row results
    recombine with a trivial broadcast cross join. The 1×(6·n_cols)
    result row is unpivoted driver-free with an explode-of-structs
    projection.
    """
    # Aggregates alias POSITIONALLY (__nn_0, …) and profiled column names
    # appear only as string LITERALS in the unpivot structs — a column
    # named with spaces/dots/quotes (legal in ingested parquet) profiles
    # fine instead of blowing up a generated stack() expression.
    mm_aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    nd_aggs: list[Column] = []
    for i, (name, kind) in enumerate(cols):
        # backtick-quote so dots resolve as the literal column name, not
        # struct-field access
        c = F.col("`" + name.replace("`", "``") + "`")
        mm_aggs.append(F.count(c).alias(f"__nn_{i}"))
        nd_aggs.append(F.count_distinct(c).alias(f"__nd_{i}"))
        # min/max on the NATIVE type (string min of a formatted double
        # would compare lexicographically); rendering happens after.
        mm_aggs.append(F.min(c).alias(f"__rawmin_{i}"))
        mm_aggs.append(F.max(c).alias(f"__rawmax_{i}"))
    one = df.agg(*mm_aggs).crossJoin(df.agg(*nd_aggs))
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"),
                        F.col("__rows").alias("n_rows"),
                        (F.col("__rows") - F.col(f"__nn_{i}")).alias("n_nulls"),
                        F.col(f"__nd_{i}").alias("n_distinct"),
                        _repr_for(name, kind)(F.col(f"__rawmin_{i}")).alias("min_repr"),
                        _repr_for(name, kind)(F.col(f"__rawmax_{i}")).alias("max_repr"),
                    )
                    for i, (name, kind) in enumerate(cols)
                ]
            )
        ).alias("__p")
    ).select("__p.*")


def transition_matrix(
    events: DataFrame,
    seq_col: str,
    state_col: str,
    order_cols: Sequence[str],
    src_name: str = "src_type",
    dst_name: str = "dst_type",
) -> DataFrame:
    """First-order Markov transition counts + probabilities over per-key
    ordered sequences: (src_state, dst_state, cnt, p) where p is the
    row-normalized transition probability.

    Scale shape: the lead window shuffles ONCE on ``seq_col`` (each
    sequence sorts locally within its key partition — never a global
    sort), the pair count reduces with map-side combine, and the
    normalizing window runs over the |states|²-row aggregate only.
    p = cnt/total is a single IEEE division of exact longs, so the
    output is engine-portable with no decimal staging."""
    w = Window.partitionBy(seq_col).orderBy(*order_cols)
    pairs = (
        events.select(
            F.col(state_col).alias(src_name),
            F.lead(state_col).over(w).alias(dst_name),
        )
        .filter(F.col(dst_name).isNotNull())
        .groupBy(src_name, dst_name)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = Window.partitionBy(src_name)
    return pairs.select(
        src_name,
        dst_name,
        "cnt",
        (F.col("cnt").cast("double") / F.sum("cnt").over(total)).alias("p"),
    )


def _rank_quantile(q: float, n: Column) -> Column:
    """Discrete-quantile rank index ceil(q*n) — the row_number a rank
    window must hit to yield the q-quantile VALUE (an actual data point,
    no interpolation arithmetic to diverge between engines). The q*n
    product is evaluated in IEEE double on both engines, so even its
    representation error reproduces identically."""
    return F.ceil(F.lit(q) * n).cast("long")


def winsorized_mean(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group winsorized mean: clip values at the discrete lo_q/hi_q
    quantiles, then average — the robust location estimate for reward /
    quality-score columns where a trimmed tail would bias downstream
    thresholds.

    Plan: one rank window on the group key finds the bound VALUES
    (discrete quantiles — rank-selected real data points), the per-group
    bounds broadcast back onto the facts, and the clipped sum
    accumulates in exact DECIMAL so the mean is summation-order-free.
    At 100 TB swap the exact rank for approx_percentile bounds on the
    same skeleton; the oracle pins the exact variant. NULL values are
    excluded up front — ranked, they'd sort first and shift every
    quantile rank while still counting into ``n`` (code-review r7)."""
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(value_col, id_col)
    r = df.select(
        F.col(key_col).alias("pri"),
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("n"),
    )
    bounds = r.groupBy("pri").agg(
        F.max(F.when(F.col("rn") == _rank_quantile(lo_q, F.col("n")), F.col("v"))).alias("lo"),
        F.max(F.when(F.col("rn") == _rank_quantile(hi_q, F.col("n")), F.col("v"))).alias("hi"),
        F.max("n").alias("n"),
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("lo")), F.col("hi"))
    return (
        df.join(F.broadcast(bounds), df[key_col] == bounds["pri"])
        .groupBy("pri", "n", "lo", "hi")
        .agg(
            (
                F.sum(clipped.cast("decimal(18,2)")).cast("double")
                / F.col("n")
            ).alias("winsorized_mean")
        )
        .select(
            "pri",
            F.col("n").alias("n_rows"),
            "lo",
            "hi",
            F.col("winsorized_mean").cast("double").alias("winsorized_mean"),
        )
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median-absolute-deviation outliers per group: rows where
    |v − median| > k·1.4826·MAD — the robust alternative to z-scores
    (:func:`group_zscore_outliers`): a handful of extreme values inflate
    a standard deviation until they hide themselves, while the median
    and MAD have a 50% breakdown point.

    Two rank windows (median of v, then median of |v − med|), both
    shuffling only on the group key; both medians are DISCRETE
    (rank-selected data points) and every per-row test is single-op
    IEEE arithmetic, so the oracle replays bit-identically. Groups with
    MAD = 0 (majority-constant) are excluded rather than flagging every
    non-modal value. NULL values are excluded up front — they'd rank
    first in both median windows and shift or null the selected median
    (code-review r7)."""
    df = df.filter(F.col(value_col).isNotNull())
    kc, vc = F.col(key_col), F.col(value_col)
    w = Window.partitionBy(key_col).orderBy(value_col, id_col)
    r = df.select(
        kc.alias("__k"),
        vc.alias("__v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("n"),
    )
    med = r.groupBy("__k").agg(
        F.max(F.when(F.col("rn") == _rank_quantile(0.5, F.col("n")), F.col("__v"))).alias("med")
    )
    dev = df.join(
        F.broadcast(med), df[key_col] == med["__k"]
    ).withColumn("d", F.abs(vc - F.col("med")))
    wd = Window.partitionBy("__k").orderBy("d", id_col)
    dr = dev.select(
        "__k",
        "d",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("__k")).alias("n"),
    )
    mad = dr.groupBy("__k").agg(
        F.max(F.when(F.col("rn") == _rank_quantile(0.5, F.col("n")), F.col("d"))).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "__k")
        .filter(
            (F.col("mad") > 0)
            & (F.col("d") > F.lit(k) * F.lit(1.4826) * F.col("mad"))
        )
        .select(
            F.col(key_col),
            F.col(id_col),
            vc.alias(value_col),
            "med",
            "mad",
        )
    )


def heavy_hitters(
    tokens: DataFrame,
    token_col: str,
    total_count: int,
    threshold: int,
    max_capacity: int = 1_000_000,
) -> DataFrame:
    """EXACT frequent items above an absolute ``threshold`` without ever
    shuffling the full token stream: per-partition Misra–Gries candidate
    generation, then an exact recount of the (tiny) candidate set.

    Guarantee: with k = N // T + 1 counters per partition, the batched
    decrement (subtract the k-th largest count, drop non-positives)
    removes ≥ k·cut mass per trigger, so any item's undercount is
    ≤ n_p/k and every item with local count > n_p/k survives its
    partition's sketch. By pigeonhole over partition totals, an item
    with global count C ≥ T > N/k exceeds n_p/k in at least one
    partition. False positives are harmless (the
    recount filters them); false negatives are impossible. The shuffle
    after candidate generation carries ≤ partitions × k rows; the
    recount semi-joins the stream against the BROADCAST candidate set
    and aggregates with map-side combine — at 100 TB the full-token
    groupBy this replaces is the dominant shuffle of any corpus job.
    """
    import pandas as pd

    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    k = total_count // threshold + 1
    if k > max_capacity:
        raise ValueError(
            f"Misra-Gries capacity {k} (= N/T + 1) exceeds max_capacity "
            f"{max_capacity}; raise the threshold or the cap"
        )

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, c in pdf[token_col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                # MG decrement step, batched: subtract the (len-k)-th
                # largest count from everything and drop the non-positive.
                cut = sorted(counters.values(), reverse=True)[k - 1]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({token_col: list(counters.keys())})

    candidates = tokens.mapInPandas(mg, schema=f"{token_col} string").distinct()
    return (
        tokens.join(F.broadcast(candidates), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


def activity_islands(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse each key's active DAYS into maximal
    consecutive runs and report (n_streaks, longest_streak,
    total_active_days) per key — the retention/engagement-streak shape
    (and the generic contiguity detector: sensor uptime, SLA windows).

    The classic trick, kept exact: for days ranked 1..n per key,
    ``day − rank`` is CONSTANT within a consecutive run — a pure date/
    int subtraction, so the anchor is engine-portable with no floats.
    Two shuffles, both on the key: one Window (rank) + one two-level
    aggregate; day-distinct first so the window sees |active days| rows
    per key, not raw events."""
    days = (
        df.filter(F.col(ts_col).isNotNull())
        .select(key_col, F.col(ts_col).cast("date").alias("__day"))
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("__day")
    anchored = days.withColumn(
        "__anchor", F.date_sub(F.col("__day"), F.row_number().over(w))
    )
    runs = anchored.groupBy(key_col, "__anchor").agg(
        F.count(F.lit(1)).alias("__len")
    )
    return runs.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("__len").cast("bigint").alias("longest_streak"),
        F.sum("__len").cast("bigint").alias("total_active_days"),
    )


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    nbins: int,
) -> DataFrame:
    """Equal-width histogram of ``value_col`` in ``nbins`` bins:
    (bin, bin_lo, n) with the top edge closed (max lands in the last
    bin). The distribution-profiling primitive behind data-quality
    drift checks and bin-packed visualizations.

    Two passes, the canonical shape: a 1-row (lo, hi) aggregate
    broadcast against the scan, then a group-by on the computed bin —
    map-side combinable, shuffle carries ≤ nbins rows per task. Bin
    arithmetic is floor((v−lo)/step) — single correctly-rounded IEEE
    ops, so any engine bins identically (ties at bin edges included)."""
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    v = F.col(value_col)
    # NULL/NaN values are excluded BEFORE the bounds pass (a NaN max
    # poisons step into NaN and collapses every row into one bin; a
    # NULL value would ride F.least's null-skipping into the top bin —
    # code-review r7). A histogram counts values, not holes.
    df = df.filter(v.isNotNull() & ~F.isnan(v.cast("double")))
    bounds = df.agg(
        F.min(v).cast("double").alias("__lo"), F.max(v).cast("double").alias("__hi")
    )
    step = (F.col("__hi") - F.col("__lo")) / F.lit(float(nbins))
    # Degenerate span (all values equal → step 0) binned explicitly to 0:
    # the floor expression would yield NaN→null, which F.least silently
    # skips, dumping every row in bin nbins-1 while a SQL oracle errors
    # on CAST(NaN AS INT). (ADVICE r4.)
    binned = df.join(F.broadcast(bounds)).select(
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((v.cast("double") - F.col("__lo")) / step).cast("int"),
                F.lit(nbins - 1),
            )
        )
        .alias("bin"),
        F.col("__lo"),
        (F.col("__hi") - F.col("__lo")).alias("__span"),
    )
    return (
        binned.groupBy("bin", "__lo", "__span")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (
                F.col("__lo")
                + F.col("bin").cast("double") * (F.col("__span") / F.lit(float(nbins)))
            ).alias("bin_lo"),
            "n",
        )
    )


def key_skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Shuffle-key skew diagnosis: for each candidate join/group key,
    (n_keys, n_rows, max_rows, skew_ratio = max / mean) — the number
    you read BEFORE picking a partitioning strategy (skew_ratio >> 1 →
    salt or AQE skew-join; ≈1 → plain hash exchange is fine). This is
    the engine's own medicine as a query: the salted-join and
    hot-bucket-guard thresholds in operators/joins.py and
    similarity.py are set from exactly this statistic.

    One group-by per key column (map-side combinable) reduced to a
    4-number summary each, unioned — scan cost n_cols × one pass, never
    held in memory. skew_ratio is two IEEE divisions of exact longs:
    engine-portable."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    outs = []
    for kc in key_cols:
        per_key = df.groupBy(F.col(kc)).agg(F.count(F.lit(1)).alias("__c"))
        outs.append(
            per_key.agg(
                F.lit(kc).alias("key_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum("__c").cast("bigint").alias("n_rows"),
                F.max("__c").cast("bigint").alias("max_rows"),
                (
                    F.max("__c").cast("double")
                    / (F.sum("__c").cast("double") / F.count(F.lit(1)).cast("double"))
                ).alias("skew_ratio"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def group_regression_stats(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    scale: int = 2,
) -> DataFrame:
    """Per-group OLS line + Pearson correlation from exact moment sums:
    (n, corr, beta, intercept) — the drift/trend primitive (price
    elasticity per segment, throughput-vs-load slopes) computed the way
    a 100 TB engine must: ONE map-side-combinable aggregate pass
    collecting (n, Σx, Σy, Σxy, Σx², Σy²), then the closed-form
    formulas on the per-group summary row.

    Determinism contract: inputs with ≤``scale`` decimal places are
    cast to DECIMAL exactly; all six moments accumulate in exact
    decimal (summation-order-free); each moment is converted to double
    ONCE and the formulas run as a fixed sequence of correctly-rounded
    IEEE ops — identical on any engine. (The moment formula squares the
    condition number vs Welford — fine for well-scaled business data,
    the documented trade for one-pass combinability; ill-conditioned
    inputs want a two-pass centered variant on the same skeleton.)"""
    x = F.col(x_col).cast(f"decimal(18,{scale})")
    y = F.col(y_col).cast(f"decimal(18,{scale})")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum((x * y).cast("decimal(38,6)")).alias("__sxy"),
        F.sum((x * x).cast("decimal(38,6)")).alias("__sxx"),
        F.sum((y * y).cast("decimal(38,6)")).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    cov_n = n * sxy - sx * sy  # n² × covariance
    var_x_n = n * sxx - sx * sx
    var_y_n = n * syy - sy * sy
    # zero-variance guard (code-review r7): a constant-x group (or n=1)
    # gives 0/0 = NaN for corr/beta/intercept under IEEE float division
    # (ANSI mode does not change float division) — emit NULL instead,
    # the same convention as group_zscore_outliers' variance gate.
    ok_x = var_x_n > F.lit(0.0)
    ok_xy = ok_x & (var_y_n > F.lit(0.0))
    return agg.select(
        group_col,
        F.col("n"),
        F.when(ok_xy, cov_n / (F.sqrt(var_x_n) * F.sqrt(var_y_n))).alias("corr"),
        F.when(ok_x, cov_n / var_x_n).alias("beta"),
        F.when(ok_x, (sy - (cov_n / var_x_n) * sx) / n).alias("intercept"),
    )


def rolling_distinct(
    df: DataFrame,
    entity_col: str,
    day_col: str,
    window_days: int = 7,
    out_col: str = "active_entities",
) -> DataFrame:
    """Exact N-day rolling COUNT(DISTINCT entity) per day, computed by
    day-expansion instead of sliding-window state.

    A windowed ``COUNT(DISTINCT)`` cannot be expressed as a mergeable
    window aggregate — engines either reject it or keep a per-row set
    (quadratic state on long partitions). The scalable shape: collapse to
    distinct (entity, day) first — the only stage that touches raw
    events — then explode each day of presence into the ``window_days``
    window-end days it contributes to, and run a plain distinct-count
    group-by on the window day. Explode factor = window length (a
    constant), every stage map-side combinable, no per-row set state.
    Window-end days beyond the observed calendar are clipped by a
    broadcast semi-join against the distinct observed days (tiny: one row
    per day).
    """
    ud = df.select(entity_col, day_col).distinct()
    days = ud.select(F.col(day_col).alias("window_day")).distinct()
    expanded = ud.select(
        entity_col,
        F.explode(
            F.sequence(
                F.col(day_col), F.date_add(F.col(day_col), window_days - 1)
            )
        ).alias("window_day"),
    )
    return (
        expanded.join(F.broadcast(days), "window_day", "left_semi")
        .groupBy("window_day")
        .agg(F.countDistinct(entity_col).alias(out_col))
    )


def binned_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    scale: int = 16,
) -> DataFrame:
    """Mergeable binned-histogram quantile sketch: one (groups…, bin, cnt)
    row per occupied dyadic bin, bin = floor(value · scale).

    With ``scale`` a power of two the bin id is EXACT IEEE arithmetic
    (×2^k and floor are error-free), so the sketch is engine-portable and
    deterministic — unlike t-digest/KLL whose internals are
    implementation-defined. Quantiles read from the sketch are lower
    bounds with error ≤ 1/scale in value — the classic fixed-width
    histogram trade. The sketch is a plain relation: store it per
    ingest batch and re-aggregate with :func:`sketch_quantiles` —
    rollups never re-read the raw events."""
    b = F.floor(F.col(value_col) * F.lit(float(scale))).cast("long")
    return df.groupBy(*group_cols, b.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def sketch_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    scale: int = 16,
) -> DataFrame:
    """Merge a binned sketch to coarser groups and read rank-selected
    quantile lower bounds.

    Merge = SUM over bins (associative/commutative — the definition of a
    mergeable sketch). The cumulative pass windows over DISTINCT BINS of
    the merged groups only (the post-aggregate window exception: a few
    thousand rows per group, never the raw events). Quantile q = value of
    the first bin whose cumulative count reaches ceil(q·n) — integer
    comparisons plus one ×2^-k at the end, exact on any engine."""
    merged = sketch.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = merged.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w_cum).alias("__cum"),
        F.sum("cnt").over(w_all).alias("__n"),
    )
    sel_aggs = [F.max("__cum").alias("n_events")]
    out_cols = list(group_cols) + ["n_events"]
    for q in quantiles:
        tag = f"p{int(round(q * 100)):02d}"
        target = F.ceil(F.lit(q) * F.col("__n")).cast("long")
        sel_aggs.append(
            F.min(
                F.when(F.col("__cum") >= target, F.col("bin"))
            ).alias(f"__{tag}_bin")
        )
        out_cols.append(tag)
    sel = cum.groupBy(*group_cols).agg(*sel_aggs)
    for q in quantiles:
        tag = f"p{int(round(q * 100)):02d}"
        sel = sel.withColumn(
            tag, F.col(f"__{tag}_bin") / F.lit(float(scale))
        )
    return sel.select(*out_cols)


def missing_ranges(
    df: DataFrame, id_col: str, bucket_size: int = 4096
) -> DataFrame:
    """Gaps in an integer key sequence as (gap_start, gap_end) ranges —
    the sequence-completeness DQ check (dropped batches, lost ids) —
    WITHOUT a global sort.

    The naive lead-over-everything window needs one partition holding
    every distinct id. Sharded shape: (1) within each id-range bucket
    (id div bucket_size) a partitioned lead finds interior gaps; (2) a
    per-bucket (min, max) summary — ONE ROW per non-empty bucket, a
    bucket_size-fold reduction — feeds a lead over bucket order to stitch
    boundary gaps, which also yields runs of entirely-empty buckets for
    free. Exactly reproduces the global-lead answer: every gap either
    lies inside one bucket or spans the max/min of adjacent non-empty
    buckets. For keyspaces where n/bucket_size itself overwhelms one
    partition, raise bucket_size or apply the same trick once more to
    the summary."""
    ids = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    b = ids.withColumn(
        "__b", F.floor(F.col("id") / F.lit(bucket_size)).cast("long")
    )
    w_in = Window.partitionBy("__b").orderBy("id")
    intra = (
        b.withColumn("__next", F.lead("id").over(w_in))
        .filter(F.col("__next") > F.col("id") + 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("__next") - 1).alias("gap_end"),
        )
    )
    bs = b.groupBy("__b").agg(
        F.min("id").alias("__mn"), F.max("id").alias("__mx")
    )
    w_b = Window.orderBy("__b")
    inter = (
        bs.withColumn("__nmn", F.lead("__mn").over(w_b))
        .filter(F.col("__nmn") > F.col("__mx") + 1)
        .select(
            (F.col("__mx") + 1).alias("gap_start"),
            (F.col("__nmn") - 1).alias("gap_end"),
        )
    )
    return intra.unionByName(inter)


def cm_sketch_audit(
    df: DataFrame,
    item_col: str = "tok",
    d: int = 4,
    w: int = 1024,
    k_top: int = 50,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over an item
    stream, audited against exact counts — the fixed-memory frequency
    structure a 100 TB pipeline uses where per-key exact counts don't
    fit: d=4 hash rows × w=1024 counters here, built RELATIONALLY (the
    sketch is the (row, position, count) relation) with the portable md5
    family so the whole structure — and therefore the estimate —
    replays bit-for-bit in the DuckDB oracle.

    Returns the top ``k_top`` items by true count (tie-break: item asc):
    ``(item, true_count, cm_estimate, overestimate)``. Count-min's
    contract is one-sided error — estimate ≥ truth always (collisions
    only ADD) — so ``overestimate`` is provably ≥ 0; the audit is the
    measurement that tells you whether w is wide enough for your key
    distribution (Σ overestimate grows as heavy keys collide).

    Scale shape: exact counts aggregate map-side (the sketch SUMS the
    count relation, not the raw stream — associativity means building
    from pre-aggregated counts is identical to streaming inserts); the
    sketch itself is ≤ d·w rows (broadcast-sized); the estimate join is
    item→position equi. The top-k window runs over the vocab relation
    pre-aggregated to one row per item."""
    items = df.select(F.col(item_col).alias("__it"))
    true = items.groupBy("__it").agg(F.count(F.lit(1)).alias("__c"))
    js = F.array([F.lit(j) for j in range(1, d + 1)])
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cm"),
                        F.col("__j").cast("string"),
                        F.lit(":"),
                        F.col("__it"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(w)
    )
    placed = true.select(
        "__it", "__c", F.explode(js).alias("__j")
    ).withColumn("__pos", pos)
    sketch = placed.groupBy("__j", "__pos").agg(
        F.sum("__c").alias("__cell")
    )
    est = (
        placed.join(sketch, ["__j", "__pos"])
        .groupBy("__it")
        .agg(
            F.min("__cell").cast("long").alias("cm_estimate"),
            F.first("__c").cast("long").alias("true_count"),
        )
    )
    topk = (
        est.withColumn(
            "__rn",
            F.row_number().over(
                Window.orderBy(
                    F.col("true_count").desc(), F.col("__it").asc()
                )
            ),
        )
        .filter(F.col("__rn") <= k_top)
        .drop("__rn")
    )
    return topk.select(
        F.col("__it").alias(item_col),
        "true_count",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("true_count"))
        .cast("long")
        .alias("overestimate"),
    )


def hll_portable_estimate(
    df: DataFrame,
    group_col: str,
    item_col: str,
    p: int = 6,
    with_merged: bool = True,
) -> DataFrame:
    """Portable HyperLogLog (Flajolet et al. 2007) distinct estimate per
    group, built from the md5 hash family so the ESTIMATE ITSELF — not
    just an error bound — replays exactly in any engine (the existing
    sketch_rollup/agg_approx queries use Spark's native HLL whose
    internals can't be oracled; this is the cross-engine twin).

    m = 2^p registers; for each distinct item, h = int48(md5(item)),
    bucket = h mod m, and the register keeps max(ρ) where ρ = leading
    zeros of the remaining 42 bits + 1 (computed as 43 − len(bin(w)),
    w=0 → 43 — bin() is identical in Spark and DuckDB). The indicator
    sum Σ2^−M is EXACT in doubles regardless of order (≤ 2^p terms,
    each a power of two ≥ 2^−43: 53-bit mantissa holds the whole span),
    so no decimal discipline is needed. Standard bias constant for
    m=64 (α=0.709) and the small-range linear-counting correction.

    Returns ``(group, true_distinct, hll_estimate_milli, err_ppm)``;
    ``with_merged`` appends an ``__ALL__`` row whose registers are the
    bucket-wise MAX across groups — HLL's mergeability, the property
    that makes it the 100 TB distinct-count structure (daily registers
    roll up to weekly without re-reading events).

    Scale shape: one distinct aggregate, one 2^p-row register relation
    per group, scalar math — nothing corpus-sized past the distinct."""
    if p != 6:
        raise ValueError("alpha constant wired for p=6 (m=64) only")
    m = 1 << p
    alpha = 0.709
    items = df.select(
        F.col(group_col).alias("grp"), F.col(item_col).alias("__it")
    ).distinct()
    h = F.conv(F.substring(F.md5(F.col("__it")), 1, 12), 16, 10).cast("long")
    hashed = items.select(
        "grp", (h % F.lit(m)).alias("b"), h.alias("__h")
    ).select("grp", "b", F.expr(f"__h div {m}").alias("wv"))
    rho = F.when(F.col("wv") == 0, F.lit(43)).otherwise(
        F.lit(43) - F.length(F.bin(F.col("wv")))
    )
    regs = hashed.select("grp", "b", rho.alias("rho")).groupBy(
        "grp", "b"
    ).agg(F.max("rho").alias("M"))
    truth = items.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("true_distinct")
    )
    parts = [regs]
    if with_merged:
        merged = regs.groupBy("b").agg(F.max("M").alias("M")).select(
            F.lit("__ALL__").alias("grp"), "b", "M"
        )
        parts.append(merged)
        truth = truth.unionByName(
            items.agg(
                F.countDistinct("__it").cast("long").alias("true_distinct")
            ).select(F.lit("__ALL__").alias("grp"), "true_distinct")
        )
    allregs = parts[0]
    for x in parts[1:]:
        allregs = allregs.unionByName(x)
    agg = allregs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("S_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    S = F.col("S_present") + (F.lit(m) - F.col("n_present"))  # empty regs: 2^0
    V = (F.lit(m) - F.col("n_present")).cast("double")  # zero registers
    e_raw = F.lit(alpha * m * m) / S
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (V > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / V),
    ).otherwise(e_raw)
    scored = agg.select(
        "grp",
        F.floor(est * F.lit(1000) + F.lit(0.5)).cast("long").alias(
            "hll_estimate_milli"
        ),
    )
    return scored.join(truth, "grp").select(
        F.col("grp").alias(group_col),
        "true_distinct",
        "hll_estimate_milli",
        F.floor(
            (
                F.col("hll_estimate_milli").cast("double") / 1000.0
                - F.col("true_distinct")
            )
            / F.col("true_distinct").cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("err_ppm"),
    )


def journey_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion: str = "purchase",
) -> DataFrame:
    """First-order journey transition counts ``(src, dst, c, n)`` for
    Markov attribution: per user, the touch sequence before the FIRST
    conversion event (ordered by (ts, id) — a total order, so ties are
    stable), framed by START and absorbed into CONV (converted) or
    NULLSTATE (never converted). ``n`` is the src's total out-degree.

    One window pass over the touch relation builds every interior
    edge; START edges come from the rank-1 rows; converted users with
    no prior touches contribute START→CONV directly."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.struct(F.col(ts_col), F.col(id_col)).alias("o"),
    )
    fp = (
        ev.filter(F.col("t") == conversion)
        .groupBy("u")
        .agg(F.min("o").alias("fp"))
    )
    touches = (
        ev.filter(F.col("t") != conversion)
        .join(fp, "u", "left")
        .filter(F.col("fp").isNull() | (F.col("o") < F.col("fp")))
    )
    w = Window.partitionBy("u").orderBy("o")
    seq = touches.select(
        "u",
        "t",
        F.col("fp").isNotNull().alias("conv"),
        F.row_number().over(w).alias("rn"),
        F.lead("t").over(w).alias("nxt"),
    )
    interior = seq.select(
        F.col("t").alias("src"),
        F.coalesce(
            "nxt",
            F.when(F.col("conv"), F.lit("CONV")).otherwise(
                F.lit("NULLSTATE")
            ),
        ).alias("dst"),
    )
    start = seq.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("t").alias("dst")
    )
    touchless = (
        fp.join(touches.select("u").distinct(), "u", "left_anti")
        .select(
            F.lit("START").alias("src"), F.lit("CONV").alias("dst")
        )
    )
    edges = interior.unionByName(start).unionByName(touchless)
    counts = edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    outdeg = counts.groupBy("src").agg(F.sum("c").cast("long").alias("n"))
    return counts.join(outdeg, "src")


def markov_removal_attribution(
    events: DataFrame,
    channels: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion: str = "purchase",
    rounds: int = 8,
) -> DataFrame:
    """Data-driven multi-touch attribution by Markov removal effects
    (Anderl et al. 2014's absorbing-chain model, the standard
    alternative to position heuristics like first-touch/linear): build
    the first-order journey chain, compute the conversion-absorption
    probability from START, then for each channel recompute it with
    that channel KNOCKED OUT (its incoming edges redirected to the
    null absorber); a channel's credit is proportional to how much the
    conversion probability drops without it.

    All arithmetic is exact BIGINT: absorption probabilities iterate
    ``rounds`` fixed value-iteration steps in integer micro units —
    ``p_{k+1}(s) = (Σ_t c(s,t)·p_k(t)) div n(s)`` with CONV pinned at
    1e6 and the null state at 0 — the decimal-quantized pagerank
    discipline, so the DuckDB oracle replays every round bit-for-bit.
    Every removal variant iterates SIMULTANEOUSLY as one (variant ×
    state) relation — one chain of ``rounds`` joins over a
    metadata-sized table, not |channels| separate chains. The
    out-degree ``n`` stays the FULL out-degree in every variant
    (redirected edges lead to the null absorber, contributing zero
    mass — dropping them from the denominator would leak probability).

    Returns one row per channel: ``(channel, p_full_micro,
    p_removed_micro, removal_effect_micro, share_micro)`` with effects
    floored at 0 (integer flooring can produce ±1-micro noise on a
    truly zero effect) and shares an exact integer split of 1e6.

    Scale shape: the corpus-sized work is the one window pass in
    :func:`journey_transitions`; the value iteration folds over the
    per-variant collected edge row — at most (|channels|+1)² edges per
    variant — as ``rounds`` map projections (r12; see the inline
    comment for the CollapseProject guard).

    Cardinality bound (ADVICE r12, the bradley_terry twin): the fold
    collects one (|channels|+1)²-edge row per variant and each round is
    O(edges·states) inside that row's task — sized for marketing-channel
    alphabets (≲10³ channels). Above that, revert to the retired
    distributed join loop (git history, pre-r12); ``channels`` is an
    explicit tuple argument, so the bound is visible at the call site."""
    tcounts = journey_transitions(
        events, user_col, type_col, ts_col, id_col, conversion
    ).localCheckpoint(eager=False)
    spark = events.sparkSession
    variants = spark.createDataFrame(
        [("__full__",)] + [(c,) for c in channels], "variant string"
    )
    tv = (
        tcounts.crossJoin(F.broadcast(variants))
        .filter((F.col("src") != F.col("variant")) & (F.col("dst") != F.col("variant")))
    )
    # r12 (guide §1.2/§2.4): the iteration relation is METADATA-sized by
    # construction (≤ (|channels|+1)² edges per variant), so the whole
    # value iteration folds over ONE collected row per variant — each
    # round is a projection mapping the per-state probability map
    # ``__p{k} → __p{k+1}`` with the same exact-BIGINT arithmetic
    # (``SUM(c·pd) DIV n`` — the per-edge fold sums in BIGINT, order-free,
    # and ``n`` is the carried FULL out-degree, identical per src-edge).
    # The former shape ran the 8 rounds as shuffle-aggregate/broadcast
    # stages — ~43 AQE micro-stages whose scheduling was the whole wall
    # (measured 4.8 s → 2.4 s at sf0.1; compute is the 2 journey-framing
    # window passes either way). Two guard rails: each round is a
    # SEPARATE named column (Catalyst analysis linear in ``rounds``), and
    # the round's domain comes from ``map_keys(__p{k-1})`` so the
    # previous map is referenced twice — CollapseProject then never
    # inlines round k−1 into round k (single-reference chaining measured
    # exponential past 4 rounds — the bpe.py nested-fold lesson).
    one = tv.groupBy("variant").agg(
        F.expr(
            "collect_list(named_struct('src', src, 'dst', dst, 'c', c,"
            " 'n', n)) AS __es"
        )
    ).select(
        "variant",
        "__es",
        F.expr("array_distinct(transform(__es, e -> e.src)) AS __sts"),
    )
    prev = False
    for k in range(1, rounds + 1):
        pd = (
            "CASE WHEN e.dst = 'CONV' THEN CAST(1000000 AS BIGINT) "
            f"ELSE coalesce(element_at(__p{k - 1}, e.dst),"
            " CAST(0 AS BIGINT)) END"
            if prev
            else "CASE WHEN e.dst = 'CONV' THEN CAST(1000000 AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        )
        dom = f"map_keys(__p{k - 1})" if prev else "__sts"
        one = one.select(
            "*",
            F.expr(
                f"map_from_arrays({dom}, transform({dom}, st ->"
                f" aggregate(filter(__es, e -> e.src = st),"
                f" CAST(0 AS BIGINT), (acc, e) -> acc + e.c * ({pd}))"
                f" div element_at(filter(__es, e -> e.src = st), 1).n"
                f" )) AS __p{k}"
            ),
        )
        prev = True
    # variants-sized; flat lineage for the 3-consumer tail below
    start = one.select(
        "variant", F.expr(f"element_at(__p{rounds}, 'START') AS p")
    ).localCheckpoint(eager=False)
    full = start.filter(F.col("variant") == "__full__").select(
        F.col("p").alias("p_full_micro")
    )
    chan = spark.createDataFrame([(c,) for c in channels], "channel string")
    removed = (
        chan.join(
            start.select(F.col("variant").alias("channel"), F.col("p").alias("p_removed_micro")),
            "channel",
            "left",
        )
        .crossJoin(F.broadcast(full))
        .select(
            "channel",
            "p_full_micro",
            # a variant with NO surviving START edges has zero
            # conversion probability (every journey began with the
            # removed channel) — never default to p_full here
            F.coalesce("p_removed_micro", F.lit(0))
            .cast("long")
            .alias("p_removed_micro"),
        )
        .withColumn(
            "removal_effect_micro",
            F.greatest(
                F.col("p_full_micro") - F.col("p_removed_micro"), F.lit(0)
            ).cast("long"),
        )
    )
    tot = removed.agg(
        F.sum("removal_effect_micro").cast("long").alias("tot")
    )
    return removed.crossJoin(F.broadcast(tot)).select(
        "channel",
        "p_full_micro",
        "p_removed_micro",
        "removal_effect_micro",
        F.when(F.col("tot") == 0, F.lit(0))
        .otherwise(
            F.expr("CAST(removal_effect_micro * 1000000 DIV tot AS BIGINT)")
        )
        .cast("long")
        .alias("share_micro"),
    )


def km_survival(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    entry_type: str = "signup",
    event_type: str = "purchase",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-conversion with right
    censoring — the estimator churn/activation analyses need when many
    subjects have not converted YET (dropping them, as a naive
    time-to-convert percentile does, biases the curve optimistic).

    Cohort: each user's FIRST ``entry_type`` event starts the clock;
    the first ``event_type`` at-or-after entry converts at duration
    ``t``; users with no such conversion are censored at their last
    observed event. Durations bucket to ``bucket_us`` (default hours),
    which also bounds the curve relation by the calendar span — not
    the corpus — at any scale.

    Estimator: S(t) = Π_{dᵢ ≤ t} (1 − dᵢ/nᵢ) over conversion times,
    with the product carried in LOG space as exact prefix sums: each
    step's factor quantizes ONCE — ``floor(ln((nᵢ−dᵢ)/nᵢ)·1e6)``,
    one exactly-rounded IEEE division of two exact BIGINTs — and the
    cumulative sum is an ordered window over the bucketed-duration
    relation (order-deterministic, engine-portable; the float product
    a textbook implementation carries is summation-order-dependent).
    ``surv_ppm = floor(exp(log_surv/1e6)·1e6 + 0.5)`` maps back for
    display. Steps where every at-risk subject converts (nᵢ = dᵢ)
    drop the survival to 0 and are emitted with NULL log (ln 0).

    Returns one row per conversion-time bucket: ``(dur_bucket,
    n_risk, n_events, n_censored, log_surv_micro, surv_ppm)``.

    Scale shape: two corpus-sized aggregations (per-user entry /
    conversion / censor reductions); everything after runs on the
    bucketed-duration relation. The unpartitioned prefix-sum window is
    the §7.5 post-aggregate safe shape."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    entry = (
        ev.filter(F.col("t") == entry_type)
        .groupBy("u")
        .agg(F.min("ts").alias("t0"))
    )
    conv = (
        ev.filter(F.col("t") == event_type)
        .join(entry, "u")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("u")
        .agg(F.min("ts").alias("tc"))
    )
    last = ev.groupBy("u").agg(F.max("ts").alias("tl"))
    dur_us = lambda a, b: (  # noqa: E731
        F.unix_micros(F.col(a).cast("timestamp"))
        - F.unix_micros(F.col(b).cast("timestamp"))
    )
    subjects = (
        entry.join(conv, "u", "left")
        .join(last, "u")
        .select(
            "u",
            F.col("tc").isNotNull().alias("converted"),
            F.when(F.col("tc").isNotNull(), dur_us("tc", "t0"))
            .otherwise(dur_us("tl", "t0"))
            .alias("__dur_us"),
        )
        .withColumn(
            "dur_bucket",
            F.expr(f"CAST(__dur_us DIV {bucket_us} AS BIGINT)"),
        )
        .drop("__dur_us")
    )
    steps = subjects.groupBy("dur_bucket").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0))
        .cast("long")
        .alias("n_events"),
        F.sum(F.when(F.col("converted"), 0).otherwise(1))
        .cast("long")
        .alias("n_censored"),
    )
    n_total = subjects.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    w = Window.orderBy("dur_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    at_risk = (
        steps.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            (
                F.col("n_tot")
                - F.coalesce(
                    F.sum(F.col("n_events") + F.col("n_censored")).over(w),
                    F.lit(0),
                )
            ).cast("long"),
        )
        .filter(F.col("n_events") > 0)
    )
    step_log = F.when(
        F.col("n_risk") > F.col("n_events"),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1e6)
        ).cast("long"),
    )
    wc = Window.orderBy("dur_bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = at_risk.withColumn("step_log", step_log).withColumn(
        "log_surv_micro",
        F.when(
            F.max(F.col("step_log").isNull().cast("int")).over(wc) == 0,
            F.sum("step_log").over(wc),
        ).cast("long"),
    )
    return curve.select(
        "dur_bucket",
        "n_risk",
        "n_events",
        "n_censored",
        "log_surv_micro",
        F.when(
            F.col("log_surv_micro").isNull(), F.lit(0)
        )
        .otherwise(
            F.floor(
                F.exp(F.col("log_surv_micro").cast("double") / F.lit(1e6))
                * F.lit(1e6)
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("surv_ppm"),
    )
