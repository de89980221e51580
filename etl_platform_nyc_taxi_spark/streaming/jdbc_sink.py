"""Streaming → JDBC keyed upsert: ``foreachBatch`` + delete-then-append.

The reference loads its daily aggregate into Postgres with a bare append
(calculate_daily_transactions.py:77), which double-writes on retry — the
D2 defect. The engine's batch fix is :func:`sources.jdbc.write_jdbc_upsert`
(delete the key window this run owns, then append). This module is the
STREAMING twin: each micro-batch's aggregate rows are upserted under the
key window the batch actually contains, so the at-least-once
``foreachBatch`` contract composes into exactly-once TABLE STATE the same
way the CDC fold does (streaming/cdc.py): a replayed batch deletes and
rewrites the same keys to the same values instead of appending duplicates.

Contract: the streamed relation must be a KEYED AGGREGATE whose rows carry
final values for their keys within the batch (e.g. one input file per day
→ per-day totals). The delete window is enumerated from the batch's
distinct keys — valid because aggregate outputs have few keys per batch;
a fact-grained stream should go through the CDC fold or an append sink
instead.

Scale notes: the only driver-side materialization is the distinct KEY set
of one micro-batch of aggregate rows (bounded by design); row data flows
executor→database through Spark's JDBC writer with its usual batching and
``numPartitions`` parallelism.

Ref (capability parity + D2 fix): dags/spark_jobs/
calculate_daily_transactions.py:70-77, daily_transactions_dag.py:30-37.
"""

from __future__ import annotations

import datetime as _dt
import shutil
import tempfile

from pyspark.sql import DataFrame

from etl_platform_nyc_taxi_spark.sources.jdbc import (
    JdbcConfig,
    write_jdbc_upsert,
)


def sql_literal(v) -> str:
    """Render one key value as a dialect-portable SQL literal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dt.datetime):
        # CAST form, not the ANSI TIMESTAMP '...' literal: Derby rejects
        # the latter; CAST parses on Derby AND Postgres
        return f"CAST('{v.strftime('%Y-%m-%d %H:%M:%S')}' AS TIMESTAMP)"
    if isinstance(v, _dt.date):
        return f"CAST('{v.isoformat()}' AS DATE)"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def batch_key_predicate(batch: DataFrame, key_cols: list[str]) -> str | None:
    """OR-of-conjunctions predicate covering the batch's distinct keys
    (identifiers double-quoted — ANSI, valid on Derby and Postgres).

    Returns None for an empty batch. The distinct collect is bounded by
    the aggregate contract above (keys per micro-batch, not rows).
    """
    keys = batch.select(*key_cols).distinct().collect()
    if not keys:
        return None
    terms = []
    for r in keys:
        conj = " AND ".join(
            f'"{c}" = {sql_literal(r[c])}'
            if r[c] is not None
            else f'"{c}" IS NULL'
            for c in key_cols
        )
        terms.append(f"({conj})")
    return " OR ".join(terms)


def stream_upsert_jdbc(
    stream: DataFrame,
    cfg: JdbcConfig,
    table: str,
    key_cols: list[str],
    checkpoint_dir: str | None = None,
    output_mode: str = "update",
) -> None:
    """Run the stream to completion (Trigger.AvailableNow), upserting each
    micro-batch into ``table`` under its own key window.

    Default ``output_mode='update'``: for a streaming aggregate, each
    micro-batch then carries the CHANGED keys with their latest
    cumulative values — exactly the rows whose table state must move,
    and the last write per key is the final aggregate. Pass ``'append'``
    for a stateless keyed relation.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")

    def apply(batch: DataFrame, batch_id: int) -> None:
        pred = batch_key_predicate(batch, key_cols)
        if pred is None:
            return
        write_jdbc_upsert(batch, cfg, table, pred)

    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_jdbc_upsert_")
    try:
        q = (
            stream.writeStream.foreachBatch(apply)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if owned:
            shutil.rmtree(ckpt, ignore_errors=True)
