"""Streaming CDC apply: a stream of keyed upserts folded into current
state via ``foreachBatch`` — the continuous twin of the batch
latest-state compaction (operators/joins.latest_per_key) and the MERGE
apply (operators/joins.merge_changes).

Per micro-batch: state ← latest_per_key(state ∪ batch). Because
latest_per_key is idempotent and order-insensitive under a
DETERMINISTIC total order (ts + unique tiebreak), replayed batches
converge to the same state — the at-least-once foreachBatch contract is
enough for exactly-once STATE.

State lives as generation-numbered parquet snapshots
(``state_dir/gen=K``): each batch writes gen K+1 from gen K, then
retires gen K. Generational overwrite (never read-and-overwrite the
same files) keeps every write atomic-by-rename at the directory level
and leaves a consistent snapshot for readers at all times. On a real
deployment the same fold targets a transactional keyed store — a JDBC
upsert (sources/jdbc.upsert_sql_postgres) or a lakehouse MERGE — and
this module's parquet generations are the minimal-dependency stand-in
with the same convergence semantics.

Scale notes: the fold shuffles only on the key; state stays partitioned
by the key across generations, so at 100 TB the union reads the prior
snapshot bucket-aligned with the incoming batch. Compaction of the
retired generations is the same job as small-file compaction
(operators/sampling.plan_compaction_bins).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (column exprs in callers)

from etl_platform_nyc_taxi_spark.operators.joins import latest_per_key


class CdcState:
    """Generation-numbered parquet state for a streaming CDC fold."""

    #: engine-owned commit marker, written AFTER the parquet write
    #: completes — independent of Spark's optional _SUCCESS
    _MARKER = "_COMMITTED"

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        # Resume from the highest COMPLETE generation: on restart with a
        # persistent state_dir + checkpoint_dir, the streaming checkpoint
        # skips already-committed batches, so starting at gen=0 would
        # silently discard all previously folded state (ADVICE r4). A
        # generation only counts if a commit marker landed — a crash mid
        # write_next leaves a torn gen=K+1 dir that must not shadow the
        # intact gen=K (ADVICE r5). write_next drops its OWN marker
        # (_COMMITTED) because Spark's _SUCCESS is optional
        # (marksuccessfuljobs=false is common with cloud committers);
        # _SUCCESS is accepted too for state dirs written before r6.
        marked, unmarked = [], []
        for name in os.listdir(state_dir):
            if name.startswith("gen="):
                try:
                    g = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                d = os.path.join(state_dir, name)
                if os.path.isfile(
                    os.path.join(d, self._MARKER)
                ) or os.path.isfile(os.path.join(d, "_SUCCESS")):
                    marked.append(g)
                else:
                    unmarked.append(g)
        if marked:
            self.gen = max(marked)
        elif unmarked:
            # Legacy pre-marker state dir (ADVICE r6): written before the
            # marker scheme, under marksuccessfuljobs=false, so NO gen has
            # either marker — yet its committed state must not be dropped
            # as torn. Safe to distinguish from a torn write because any
            # post-upgrade write leaves a marked gen (handled above).
            #
            # When MULTIPLE legacy gens exist, the HIGHEST is suspect and
            # is skipped even if its parquet reads: write_next retires
            # gen K only AFTER gen K+1 completes, so K and K+1 coexisting
            # means the K+1 write never finished — and a task-commit
            # committer can leave a readable-but-incomplete part subset
            # (footer validation cannot detect missing part files).
            # Adopting K is always safe: the streaming checkpoint marks a
            # batch committed only after foreachBatch returns, so the
            # batch that was building K+1 is uncommitted and will replay
            # onto K (the fold is idempotent). With exactly one legacy
            # gen, adopt it if readable; backfill _COMMITTED once either
            # way. An unreadable candidate falls through to the next
            # lower gen.
            self.gen = 0
            candidates = sorted(unmarked, reverse=True)
            if len(candidates) > 1:
                candidates = candidates[1:]  # drop the suspect tail
            for g in candidates:
                d = self._gen_path(g)
                try:
                    self.spark.read.parquet(d).schema  # footer validation
                except Exception:
                    continue
                with open(os.path.join(d, self._MARKER), "w"):
                    pass
                self.gen = g
                break
        else:
            self.gen = 0

    def _gen_path(self, gen: int) -> str:
        return os.path.join(self.state_dir, f"gen={gen}")

    def read(self) -> DataFrame | None:
        path = self._gen_path(self.gen)
        if not os.path.isdir(path):
            return None
        return self.spark.read.parquet(path)

    def write_next(self, df: DataFrame) -> None:
        nxt = self.gen + 1
        path = self._gen_path(nxt)
        df.write.mode("overwrite").parquet(path)
        # marker write is the commit point: a crash before this line
        # leaves gen=nxt torn and resume stays on gen=self.gen
        with open(os.path.join(path, self._MARKER), "w"):
            pass
        old = self._gen_path(self.gen)
        self.gen = nxt
        shutil.rmtree(old, ignore_errors=True)


def apply_cdc_stream(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state: CdcState,
    checkpoint_dir: str | None = None,
) -> None:
    """Run the stream to completion (Trigger.AvailableNow), folding each
    micro-batch into ``state`` as latest-row-per-key under
    ``order_cols`` DESC (include a unique tiebreak column)."""
    import tempfile

    def fold(batch: DataFrame, batch_id: int) -> None:
        prior = state.read()
        combined = batch if prior is None else prior.unionByName(batch)
        latest = latest_per_key(
            combined,
            key_cols,
            order=[F.col(c).desc() for c in order_cols],
        )
        state.write_next(latest)

    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_cdc_")
    try:
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if owned:
            shutil.rmtree(ckpt, ignore_errors=True)
