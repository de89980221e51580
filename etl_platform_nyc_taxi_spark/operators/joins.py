"""Join family (SURVEY.md §2.3 — absent from the reference, required by the
verification harness and every extension operator).

Scale discipline per join shape:

* dimension joins (**join_dim**): explicit ``broadcast()`` of the small
  side — zero shuffle of the fact table. The canonical case the reference
  skipped: the ≤265-row taxi-zone lookup against billions of trips.
* fact-fact joins (**join_facts**): let Catalyst/AQE pick sort-merge vs
  shuffled-hash; optionally pre-repartition both sides on the key so a
  chain of joins/aggs on the same key reuses one exchange.
* existence checks (**semi/anti**): left-semi/anti instead of
  join+distinct — no row multiplication, the probe side streams.
* **range_join**: bucketized equi-join bridge so Catalyst gets an equality
  key instead of a cross-product with a range filter.
* **asof_join**: most-recent-match via union + partitioned window — no
  per-key loop, no ``merge_asof`` UDF; pure shuffle-parallel operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Broadcast-hash join for a small dimension side (no fact shuffle)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def join_facts(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    copartition_on: Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Large-large join. With ``copartition_on``, both sides are hash
    repartitioned on the key first — worthwhile when the same key feeds
    several downstream joins/aggs (one exchange, reused)."""
    if copartition_on:
        n = num_partitions or left.sparkSession.conf.get("spark.sql.shuffle.partitions")
        left = left.repartition(int(n), *copartition_on)
        right = right.repartition(int(n), *copartition_on)
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """Rows of ``left`` with ≥1 match — EXISTS, no right columns, no dup
    amplification."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """Rows of ``left`` with no match — NOT EXISTS."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Value-in-interval join: left.v ∈ [right.lo, right.hi].

    Naive form is a broadcast-nested-loop/cartesian with a filter. Here
    each interval is exploded to the buckets it overlaps and the probe row
    to its single bucket, so Catalyst sees an equi-join on
    (bucket, *extra_on); the exact range predicate re-filters afterwards.
    Shuffle-parallel; bucket_width tunes duplication vs selectivity
    (choose ≈ median interval width).
    """
    lb = F.floor(F.col(left_value) / bucket_width)
    probe = left.withColumn("__bucket", lb.cast("long"))
    build = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width).cast("long"),
                F.floor(F.col(right_hi) / bucket_width).cast("long"),
            )
        ),
    )
    joined = probe.join(build, on=["__bucket", *extra_on], how="inner")
    return joined.filter(
        (F.col(left_value) >= F.col(right_lo)) & (F.col(left_value) <= F.col(right_hi))
    ).drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (backward; forward symmetric)
    within the same ``on`` keys. ``tolerance_seconds`` bounds the match
    distance (pandas ``merge_asof`` tolerance): a nearest match farther
    than the bound nulls out like no-match.

    Implementation: tag + union both sides, one window partitioned by the
    keys ordered by time carrying the last (or next) right-side ROW
    forward as one struct, then keep left rows. One shuffle on the keys,
    no driver loops, no pandas — scales with key parallelism. Right
    payload columns come back nullable (no match ⇒ NULL), matching SQL
    ASOF LEFT JOIN. The whole payload travels as a SINGLE struct so the
    matched row is atomic: filling each column independently with
    last(ignorenulls) would let a NULL in one payload column inherit
    that column's value from an OLDER right row — a frankenrow belonging
    to no actual right record. The tolerance is a pure post-projection
    on the already-joined row (no second window, no extra shuffle).
    """
    on = list(on)
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = [c for c in payload if c in left.columns]
    if clash:
        raise ValueError(
            f"right payload columns collide with left columns: {clash}; "
            "rename them — the union-based fill would otherwise mix left "
            "values into the as-of match"
        )
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    merged = lhs.unionByName(rhs, allowMissingColumns=True)
    # the matched right row as ONE value: payload + its ts, atomically
    row_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            *[F.col(c) for c in payload], F.col("__ts").alias("__mts")
        ),
    )

    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last(row_struct, ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first(row_struct, ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    out = merged.withColumn("__match", match).filter(F.col("__side") == 1)
    ok = F.col("__match").isNotNull()
    if tolerance_seconds is not None:
        # NTZ timestamps can't cast straight to double; the session TZ is
        # pinned UTC so the NTZ->LTZ hop is wall-clock preserving
        def _secs(c: Column) -> Column:
            return c.cast("timestamp").cast("double")

        gap = F.abs(_secs(F.col("__ts")) - _secs(F.col("__match.__mts")))
        ok = ok & (gap <= F.lit(float(tolerance_seconds)))
    out = out.withColumns(
        {
            **{c: F.when(ok, F.col(f"__match.{c}")) for c in payload},
            "__match_ts": F.when(ok, F.col("__match.__mts")),
        }
    )
    keep = [c for c in left.columns] + payload + ["__match_ts"]
    return out.select(*keep).withColumnRenamed("__match_ts", f"{right_ts}_matched")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_col: str | Column,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the fact side, replicate the dim side.

    A hot key (one zone, one power user) funnels every matching fact row
    through ONE reduce task in a plain shuffle join; AQE's skew-join split
    handles sort-merge cases, but salting is the explicit, always-works
    form. Each fact row gets ``__salt = salt_col % buckets`` (pass any
    well-distributed DETERMINISTIC column — an event id, a row hash;
    rand() would break retry idempotence); the dim side is exploded
    ``buckets``× so every (key, salt) pair finds its match. Result equals
    the unsalted join exactly — pinned by the DuckDB oracle, which runs
    the PLAIN join.

    Dim-side cost: buckets× replication, so keep buckets ≈ the skew
    factor, not the cluster size; broadcast-able dims should use
    :func:`join_dim` instead (no salt needed — no shuffle at all).

    Only ``inner``/``left``/``left_semi`` are supported: the dim side is
    replicated ``buckets``-fold, so right/full outer variants would emit
    each unmatched dim row ``buckets`` times — not equal to the unsalted
    join. Rejected explicitly rather than silently wrong."""
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi only (dim side is "
            f"replicated {buckets}x; outer variants would duplicate unmatched "
            f"dim rows), got how={how!r}"
        )
    sc = F.col(salt_col) if isinstance(salt_col, str) else salt_col
    # NULL-safe salt: pmod(NULL) is NULL, which matches none of the
    # dim's exploded 0..buckets-1 salts — the fact row would silently
    # drop (inner) or null out (left), breaking the equals-unsalted-join
    # contract. NULL salts all land in bucket 0; only pathological NULL
    # density in salt_col would re-create skew there.
    f = fact.withColumn(
        "__salt", F.coalesce(F.pmod(sc, F.lit(buckets)).cast("int"), F.lit(0))
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, on=[key, "__salt"], how=how).drop("__salt")


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_keys: bool = False,
) -> DataFrame:
    """MERGE INTO semantics on immutable storage: apply a change batch
    (insert / update / delete rows tagged in ``op_col``) to ``base`` and
    return the merged relation — delete rows vanish, update/insert rows
    replace-or-add by key.

    The copy-on-write shape every parquet-lake merge reduces to (what
    Delta/Iceberg do under MERGE INTO, minus the file-level pruning their
    transaction logs add): an anti-join evicts every changed key from the
    base, then the surviving change rows union in. Two scale properties:
    the base table never shuffles when ``broadcast_keys=True`` (change
    batches are typically tiny vs the base — broadcast the distinct key
    set and the anti-join is map-side); and the union is append-only, so
    the plan is one pass over base + one over changes. ``changes`` must be
    pre-compacted to one row per key (compose with
    :func:`latest_per_key` for multi-change batches) — enforced here by
    contract, not a shuffle."""
    keys = changes.select(*key_cols).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    kept = base.join(keys, on=list(key_cols), how="left_anti")
    # null-safe op test: the key was already evicted above, so a change
    # row with a NULL/dirty op must survive as an upsert — a plain
    # ``op != 'D'`` filter is NULL for it, silently turning dirty ops
    # into deletes (key vanishes from the merge with no error)
    applied = changes.filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).drop(op_col)
    return kept.unionByName(applied)


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order: Sequence[Column],
    keep: int = 1,
) -> DataFrame:
    """CDC-style latest-state materialization: the newest row per key
    under a DETERMINISTIC total order (always include a unique tiebreak —
    e.g. ``[ts.desc(), event_id.desc()]`` — or replayed upserts flap).

    The workhorse of change-data-capture compaction: a stream of upserts
    reduces to current state with one shuffle on the key and a partitioned
    window (never a global sort). ``keep > 1`` retains per-key history
    depth instead."""
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )
