"""Window / ranking / top-k operators (SURVEY.md §2.5 W1, §2.6 O2).

The reference's ranking is a GLOBAL window —
``dense_rank().over(Window.orderBy(count desc))`` with no partitionBy
(reference: dags/spark_jobs/calculate_top_taxi_zones.py:34) — which forces
every row through ONE partition. Harmless for ≤265 taxi zones, fatal for
high-cardinality keys at 100 TB. The engine keeps the reference's exact
tie semantics (dense_rank + ``rank <= k`` can return MORE than k rows and
skips no rank numbers — deliberately not ``LIMIT k``) but gets scale safety
from structure:

* :func:`top_k_by_count` pre-aggregates (shuffle-parallel two-phase count)
  BEFORE ranking, so the single-partition window only ever sees one row per
  key — the 100 TB-safe shape of the reference's query.
* For high-cardinality keys, :func:`top_k_global` adds a per-partition
  pre-prune: any row not in its partition's top-k by count cannot be in the
  global top-k, so each task keeps k rows and the final window ranks
  ~k × num_partitions rows instead of num_keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    order: Sequence[Column],
    partition_by: Sequence[str | Column] = (),
    method: str = "dense_rank",
    out: str = "rank",
) -> DataFrame:
    """Attach a rank column. method: dense_rank | rank | row_number.

    A window with no ``partition_by`` is a deliberate scale hazard (single
    partition); only use it on pre-aggregated, provably-small inputs.
    """
    fn = {"dense_rank": F.dense_rank, "rank": F.rank, "row_number": F.row_number}[method]
    w = Window.partitionBy(*partition_by).orderBy(*order) if partition_by else Window.orderBy(*order)
    return df.withColumn(out, fn().over(w))


def top_k_by_count(
    df: DataFrame,
    key: str | Column,
    k: int = 5,
    count_name: str = "cnt",
    rank_name: str = "rank",
    method: str = "dense_rank",
) -> DataFrame:
    """The corrected reference top-k (its defect D1 fixed): ONE global
    aggregation over all input, then rank, then ``rank <= k``.

    Plan shape: scan → partial count (map-side) → shuffle on key → final
    count → exchange-to-1 window over |distinct keys| rows → filter. The
    window input is the aggregate, never the fact rows, so this holds at
    any fact-table scale while preserving dense_rank tie semantics
    (>k rows on ties, no skipped ranks).
    """
    counted = df.groupBy(key).agg(F.count(F.lit(1)).alias(count_name))
    return ranked(
        counted, order=[F.col(count_name).desc()], method=method, out=rank_name
    ).filter(F.col(rank_name) <= k)


def top_k_global(
    df: DataFrame,
    order_col: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Global top-k over high-cardinality input without a global sort.

    One global ``row_number() <= k`` window: Spark's WindowGroupLimit
    rule (3.5+) prunes each map partition to its local top-k BEFORE the
    exchange, so the single-partition shuffle the partition-less window
    still requires moves only the ≤ k·P survivors (k rows per map
    partition), not the input — a TakeOrderedAndProject-shaped cost
    even though the physical plan keeps one exchange + final window
    (code-review r8: the earlier claim of "no exchange at all" was
    wrong about the plan shape, right about the data volume). The
    earlier hand-built two-phase form (a spark_partition_id-keyed local
    prune) actually planned WORSE: Catalyst cannot prove __pid matches
    the existing partitioning, so EnsureRequirements inserted a hash
    exchange on __pid plus a second window — code-review r7 finding.
    """
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    return (
        df.withColumn("__gr", F.row_number().over(Window.orderBy(order)))
        .filter(F.col("__gr") <= k)
        .drop("__gr")
    )


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str | Column],
    order: Sequence[Column],
    k: int,
    method: str = "row_number",
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k within each group (partitioned window — shuffle-parallel,
    scale-safe as long as single groups fit a partition; salt skewed
    groups upstream if not)."""
    return ranked(df, order=order, partition_by=group_by, method=method, out=rank_name).filter(
        F.col(rank_name) <= k
    )


def lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str | Column],
    order: Sequence[Column],
    offset: int = 1,
) -> DataFrame:
    """lag/lead pair over a partitioned ordering (sessionization building
    block)."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumns(
        {
            f"{col}_lag": F.lag(col, offset).over(w),
            f"{col}_lead": F.lead(col, offset).over(w),
        }
    )


def running_agg(
    df: DataFrame,
    value: str | Column,
    partition_by: Sequence[str | Column],
    order: Sequence[Column],
    agg: str = "sum",
    out: str = "running",
) -> DataFrame:
    """Cumulative aggregate (rows unbounded-preceding → current)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = F.col(value) if isinstance(value, str) else value
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}[agg]
    return df.withColumn(out, fn(c).over(w))


def _epoch_s(col: Column) -> Column:
    """Epoch seconds (truncated) for TIMESTAMP or TIMESTAMP_NTZ columns.

    NTZ can't cast straight to long in Spark 4; routing through TIMESTAMP is
    exact because the engine pins the session TZ to UTC (session.py D4 fix).
    """
    return col.cast("timestamp").cast("long")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: Sequence[str | Column] = (),
    session_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization: a new session starts whenever the time
    since the user's previous event exceeds ``gap_seconds``.

    Classic lag + cumulative-sum construction — one shuffle on ``user_col``
    shared by both window passes (same partitioning), no Python in the hot
    path. Session ids are per-user ordinals (1, 2, ...), deterministic given
    the (ts, tiebreak) total order. At 100 TB this scales with the number of
    users (each user's history must sort within one partition); for
    pathological single-user skew, split by (user, day) first and stitch
    boundary sessions.

    The streaming equivalent (arbitrary stateful processing instead of a
    sort over history) is streaming/sessions.py.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() if isinstance(c, str) else c for c in tiebreak]]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = _epoch_s(F.col(ts_col)) - F.lag(_epoch_s(F.col(ts_col))).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Strict-order conversion funnel: stage ``i`` counts the users whose
    first ``stages[i]`` event at-or-after their stage ``i-1`` entry time
    exists. Output: one row per stage — (stage_idx, stage, n_users).

    Plan shape: ONE pass over the event log. Stage entry times are nested
    per-user analytic mins — ``tᵢ = min(ts) over (partition by user)
    where type = stageᵢ and ts >= tᵢ₋₁`` — K window operators that all
    share one unordered user partitioning, so Catalyst plans a single
    exchange and no sort; then one row per user and one tiny global
    aggregate unpivoted to K rows. The naive alternative (K chained
    filter→agg→join rounds unioned per-stage) re-evaluates every earlier
    stage per count branch — DataFrame branches get no common-
    subexpression elimination — and measured 8× slower at sf0.01.
    """
    w = Window.partitionBy(user_col)
    cur = df.select(user_col, ts_col, type_col)
    tcols: list[str] = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if tcols:
            cond = cond & (F.col(ts_col) >= F.col(tcols[-1]))
        tcol = f"__t{i}"
        cur = cur.withColumn(tcol, F.min(F.when(cond, F.col(ts_col))).over(w))
        tcols.append(tcol)
    per_user = cur.groupBy(user_col).agg(
        *[F.min(t).alias(t) for t in tcols]
    )
    counts = per_user.agg(
        *[
            F.sum(F.col(t).isNotNull().cast("long")).alias(f"__n{i}")
            for i, t in enumerate(tcols)
        ]
    )
    stack_args = ", ".join(
        "CAST({} AS INT), '{}', __n{}".format(i, s.replace("'", "''"), i)
        for i, s in enumerate(stages)
    )
    return counts.select(
        F.expr(
            f"stack({len(stages)}, {stack_args}) AS (stage_idx, stage, n_users)"
        )
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    state_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change/event log:
    collapse consecutive identical states per key, emit one validity
    interval per state run — (keys…, state, valid_from, valid_to,
    is_current), where ``valid_to`` is the next run's start (NULL = open).

    Two window passes over the SAME (key → ts, tiebreak) partitioned
    ordering — one shuffle total: the lag pass marks run starts on the
    full log, the lead pass runs on the collapsed (much smaller) run-start
    relation. The companion compaction (keep only the newest state) is
    joins.latest_per_key; this keeps the full history a warehouse
    dimension needs. Deterministic for any total order: ties in ``ts``
    are broken by ``tiebreak``.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # a bare lag(state) conflates "no previous row" with "previous state
    # was NULL": for a key whose FIRST state is NULL, eqNullSafe(NULL,
    # NULL) is true and the initial interval vanishes. Detect row
    # existence separately from the state value.
    has_prev = F.lag(F.lit(1)).over(w).isNotNull()
    run_start = ~has_prev | ~F.lag(F.col(state_col)).over(w).eqNullSafe(
        F.col(state_col)
    )
    changes = (
        df.withColumn("__chg", run_start)
        .filter(F.col("__chg"))
        .select(
            *key_cols,
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            *[F.col(c) for c in tiebreak],
        )
    )
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col("valid_from").asc(), *[F.col(c).asc() for c in tiebreak]
    )
    return (
        changes.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*tiebreak)
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: Sequence[str | Column] = (),
) -> DataFrame:
    """Per-session aggregates (start, end, duration, event count) over
    :func:`sessionize` output. Group-by reuses the sessionize shuffle
    partitioning (user_col prefix), so AQE plans one exchange total."""
    s = sessionize(df, user_col, ts_col, gap_seconds, tiebreak)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(_epoch_s(F.col(ts_col))) - F.min(_epoch_s(F.col(ts_col)))).alias(
            "duration_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
