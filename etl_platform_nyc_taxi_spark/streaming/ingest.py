"""Streaming corpus-ingest capstone (VERDICT r10 task 6): the round-10
LLM-pipeline operators composed on the INCREMENTAL path — files arrive,
each micro-batch runs

  near-dup probe (operators/dedup.minhash_probe_new, batch×corpus
  quadrant only) + benchmark decontamination
  (operators/bloom.bloom_decontaminate against a static eval Bloom) +
  quality gate (operators/text.quality_flags)

and the survivors are admitted against a FIXED per-stratum token quota
(operators/sampling.unimax_allocation over the existing corpus — the
ingest-plan artifact), folding a per-document admission ledger into
generation-numbered state (streaming/cdc.CdcState).

Batch-equivalence contract — the property the oracle checks: the final
ledger is a pure function of the SET of arrived documents, independent
of how the file source slices them into micro-batches, because

* every gate scores a document against STATIC context only (the
  existing corpus / the eval Bloom / per-doc text stats) — an arriving
  doc never gates on other arrivals, which is exactly
  minhash_probe_new's quadrant discipline (the batch×batch and
  batch×earlier-batch quadrants never form; a production pipeline
  near-dups the admitted stream against itself in the periodic BATCH
  re-dedup, not at the ingest gate);
* admission is recomputed per fold over the ACCUMULATED ledger under a
  deterministic order (doc_id within stratum), so replayed batches
  converge (idempotent via latest-per-key on doc_id) and arrival order
  cannot flip an admit decision.

Scale notes (100 TB corpus, GB/hour arrivals): the corpus side of the
probe is the banded-signature relation an ingest pipeline materializes
once as its index (operators/similarity.write_lsh_index pattern — here
it is recomputed per batch because the fixture corpus is tiny); the
Bloom positions relation broadcasts (≤1 MB); the quota relation is
strata-sized; the ledger fold shuffles on doc_id only. The admission
recompute scans the accumulated ledger — at scale that state lives in a
keyed store and the cumulative per-stratum token counters are the only
hot rows (same stand-in argument as streaming/cdc.py's parquet
generations).
"""

from __future__ import annotations

import shutil
import tempfile
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_platform_nyc_taxi_spark.operators.bloom import (
    bloom_build,
    bloom_decontaminate,
)
from etl_platform_nyc_taxi_spark.operators.dedup import (
    minhash_corpus_index,
    minhash_probe_index,
)
from etl_platform_nyc_taxi_spark.operators.joins import latest_per_key
from etl_platform_nyc_taxi_spark.operators.text import (
    QualityRules,
    quality_flags,
    token_count,
)
from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState

#: MinHash geometry shared by the index build and the per-batch probe —
#: ONE definition, because an index built under different k/hashes/bands
#: produces band keys the probe can never match (zero candidates,
#: silently: exactly the bug a split build/probe API invites).
MH_K = 6
MH_NUM_HASHES = 32
MH_BANDS = 8

#: Ledger schema the fold maintains; ``admitted`` is recomputed per fold.
LEDGER_COLS = [
    "doc_id",
    "lang",
    "source",
    "n_tok",
    "near_dup",
    "contaminated",
    "low_quality",
]


def gate_batch(
    batch: DataFrame,
    corpus_index: tuple[DataFrame, DataFrame],
    eval_bloom: DataFrame,
    rules: QualityRules,
    k: int = MH_K,
    num_hashes: int = MH_NUM_HASHES,
    bands: int = MH_BANDS,
    threshold: float = 0.6,
    flag_pct: int = 5,
    partitions: int | None = None,
    max_bucket: int | None = 128,
) -> DataFrame:
    """Score one arriving batch against the static context — a prebuilt
    corpus MinHash index (operators/dedup.minhash_corpus_index) and a
    prebuilt eval Bloom positions relation (operators/bloom.bloom_build),
    both computed ONCE per run, not per micro-batch (r11 rework: the
    first cut re-signed the whole corpus and re-inserted the eval grams
    inside every fold). Returns the ledger relation (LEDGER_COLS) for
    exactly the batch's documents.

    ``flag_pct`` is the Bloom-hit share (percent of a doc's distinct
    trigrams) above which the doc counts as contaminated — size it from
    the corpus's measured background trigram-overlap (common-phrase
    trigrams give every doc a nonzero floor; true eval near-dups sit
    near 100%).

    ``max_bucket`` forwards to :func:`minhash_probe_index`'s hot-bucket
    guard (ADVICE r11: it is a documented knob of the probe and must be
    settable from the stream, not locked to the probe's default)."""
    probe = minhash_probe_index(
        corpus_index,
        batch.select("doc_id", "text"),
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        partitions=partitions,
        max_bucket=max_bucket,
    ).select(F.col("new_id").alias("doc_id"), F.lit(True).alias("__dup"))
    bl = bloom_decontaminate(
        batch,
        eval_df=None,  # prebuilt filter below
        flag_pct=flag_pct,
        partitions=partitions,
        bloom=eval_bloom,
    ).select("doc_id", F.col("flagged").alias("__flagged"))
    q = quality_flags(batch.select("doc_id", "text"), rules=rules).select(
        "doc_id", F.col("keep").alias("__keep")
    )
    return (
        batch.select(
            "doc_id",
            "lang",
            "source",
            token_count("text").cast("long").alias("n_tok"),
        )
        .join(probe, "doc_id", "left")
        .join(bl, "doc_id", "left")
        .join(q, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tok",
            F.coalesce("__dup", F.lit(False)).alias("near_dup"),
            F.coalesce("__flagged", F.lit(False)).alias("contaminated"),
            (~F.coalesce("__keep", F.lit(False))).alias("low_quality"),
        )
    )


def admit_ledger(
    ledger: DataFrame,
    alloc: DataFrame,
    strata_cols: list[str] | None = None,
) -> DataFrame:
    """Budgeted admission over the accumulated ledger: survivors (no gate
    fired) admit in doc_id order within their stratum (``strata_cols``,
    default ``[lang, source]``) while the cumulative token count stays
    within the stratum's quota; strata with no quota row admit nothing.
    Deterministic and order-insensitive — recomputable from the ledger
    set alone. Mind the gate/quota interaction when sizing quotas: every
    survivor carries at least ``rules.min_tokens`` tokens, so a quota
    below that floor silently admits nothing."""
    strata = strata_cols or ["lang", "source"]
    surv = ledger.filter(
        ~F.col("near_dup") & ~F.col("contaminated") & ~F.col("low_quality")
    ).withColumn(
        "__cum",
        F.sum("n_tok").over(
            Window.partitionBy(*strata)
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    adm = surv.join(
        F.broadcast(alloc.select(*strata, "alloc")),
        strata,
        "left",
    ).select(
        "doc_id",
        (
            F.col("__cum") <= F.coalesce(F.col("alloc"), F.lit(0))
        ).alias("__adm"),
    )
    return ledger.join(adm, "doc_id", "left").select(
        *LEDGER_COLS,
        F.coalesce("__adm", F.lit(False)).alias("admitted"),
    )


def corpus_ingest_stream(
    stream: DataFrame,
    corpus: DataFrame,
    eval_slice: DataFrame,
    alloc: DataFrame,
    state: CdcState,
    rules: QualityRules = QualityRules(),
    checkpoint_dir: str | None = None,
    partitions: int | None = None,
    strata_cols: list[str] | None = None,
    **mh_kwargs,
) -> None:
    """Run the arriving-document stream to completion
    (Trigger.AvailableNow), folding each micro-batch's gate results into
    ``state`` and rewriting the admission ledger. At-least-once replays
    converge: the ledger dedupes on doc_id (a doc's gate verdict is a
    pure function of its text + static context) and admission is a
    deterministic function of the ledger set.

    The static context materializes ONCE before the stream starts: the
    corpus MinHash index and the eval Bloom positions are
    ``localCheckpoint``-ed so every fold probes the same computed
    relations instead of re-deriving them (the ingest-index posture; at
    100 TB these live in storage, written by the batch ingest job).
    With a prebuilt index, relation membership IS the new/old split — no
    ``is_new`` predicate exists to disagree with it (code-review r11
    removed the dead parameter)."""
    # Reject unknown gate knobs BEFORE the stream starts (ADVICE r11: a
    # bad key used to surface as a TypeError mid-stream, inside the first
    # fold, with the checkpoint dir already created).
    allowed = {"k", "num_hashes", "bands", "threshold", "flag_pct",
               "max_bucket"}
    unknown = sorted(set(mh_kwargs) - allowed)
    if unknown:
        raise TypeError(
            f"corpus_ingest_stream: unsupported gate option(s) {unknown}; "
            f"supported: {sorted(allowed)}"
        )
    mh_geo = {
        "k": mh_kwargs.get("k", MH_K),
        "num_hashes": mh_kwargs.get("num_hashes", MH_NUM_HASHES),
        "bands": mh_kwargs.get("bands", MH_BANDS),
    }
    corpus_index = tuple(
        r.localCheckpoint(eager=True)
        for r in minhash_corpus_index(
            corpus.select("doc_id", "text"), partitions=partitions, **mh_geo
        )
    )
    eval_bloom = bloom_build(eval_slice).localCheckpoint(eager=True)

    def fold(batch: DataFrame, batch_id: int) -> None:
        gates = gate_batch(
            batch,
            corpus_index,
            eval_bloom,
            rules=rules,
            partitions=partitions,
            **mh_kwargs,
        )
        prior = state.read()
        combined = (
            gates
            if prior is None
            else prior.select(*LEDGER_COLS).unionByName(gates)
        )
        # Dedupe on doc_id under a TOTAL order over the payload columns
        # (code-review r11: ordering by the partition key alone picked
        # the survivor arbitrarily, violating latest_per_key's own
        # contract). A doc re-gated identically dedupes trivially; a
        # doc whose verdict legitimately changed mid-run (rule/quota
        # reconfiguration) resolves deterministically — same winner on
        # every replay — instead of flapping.
        ledger = latest_per_key(
            combined,
            ["doc_id"],
            order=[F.col(c).desc() for c in LEDGER_COLS if c != "doc_id"],
        )
        state.write_next(admit_ledger(ledger, alloc, strata_cols))

    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_ingest_")
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
