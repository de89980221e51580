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
* admission is a deterministic function of the accumulated ledger SET
  (prefix-sum ≤ quota over survivors in doc_id order within stratum) —
  maintained INCREMENTALLY (r12, VERDICT r11 task 3): per-stratum
  (carry_tok, max_doc_id) counters ride a sibling generation-numbered
  relation, monotone arrivals admit from the carried prefix sum with a
  batch-sized window, and a late or replayed id (at or below its
  stratum's frontier) triggers a stratum-LOCAL recompute — never a
  full-ledger window. Replays therefore converge (the arriving verdict
  deterministically replaces the prior row) and arrival order cannot
  flip an admit decision; incremental-equals-recompute is pinned in
  tests/test_streaming.py.

Scale notes (100 TB corpus, GB/hour arrivals): the corpus side of the
probe is the banded-signature relation an ingest pipeline materializes
once as its index (operators/similarity.write_lsh_index pattern); the
Bloom positions relation broadcasts (≤1 MB); the quota and counter
relations are strata-sized. Per-fold ALGORITHMIC work is batch-sized on
the monotone path (r12): no window ever runs over the accumulated
ledger — the remaining ledger-sized work is a map-side stratum filter
and CdcState's whole-relation generation rewrite, the documented
parquet stand-in for a transactional keyed store (where both become a
keyed upsert), not part of the algorithm.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from concurrent.futures import ThreadPoolExecutor

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
    presalt_banded,
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
    presalt: tuple[DataFrame, DataFrame] | None = None,
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
    settable from the stream, not locked to the probe's default);
    ``presalt`` is the guard's corpus half precomputed at index-build
    time (operators/dedup.presalt_banded — r13, guide §1.2), so each
    fold salts only the batch side."""
    probe = minhash_probe_index(
        corpus_index,
        batch.select("doc_id", "text"),
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        partitions=partitions,
        max_bucket=max_bucket,
        presalt=presalt,
        # micro-batch probe: candidates are batch-sized and the verify
        # trivial — the corpus-scale candidate respread is pure latency
        # here (operators/dedup._probe_verify; r13)
        spread_cands=False,
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


def _survivor() -> "F.Column":
    """A ledgered document that no gate fired on — the only rows that
    consume quota (admitted or not: admission is prefix-sum ≤ alloc over
    ALL survivors in doc_id order, so a too-big survivor still counts
    toward the running total that blocks everything after it)."""
    return (
        ~F.col("near_dup") & ~F.col("contaminated") & ~F.col("low_quality")
    )


def counters_of_ledger(
    ledger: DataFrame, strata_cols: list[str] | None = None
) -> DataFrame:
    """The carried per-stratum admission counters (VERDICT r11 task 3):
    ``(strata…, carry_tok, max_doc_id)`` where ``carry_tok`` is the
    running survivor-token total (the prefix sum every later admission
    decision continues from) and ``max_doc_id`` is the monotonicity
    frontier over ALL ledgered docs of the stratum — any arrival at or
    below it (late or replayed) invalidates the incremental path for
    that stratum and forces a stratum-local recompute."""
    strata = strata_cols or ["lang", "source"]
    return ledger.groupBy(*strata).agg(
        F.sum(F.when(_survivor(), F.col("n_tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("carry_tok"),
        F.max("doc_id").alias("max_doc_id"),
    )


def admit_arrivals_incremental(
    arrivals: DataFrame,
    counters: DataFrame,
    alloc: DataFrame,
    strata_cols: list[str] | None = None,
) -> DataFrame:
    """Admission for arrivals PROVEN monotone (every doc_id above its
    stratum's ``max_doc_id``): the cumulative window runs over the BATCH
    only, seeded by the carried ``carry_tok`` — per-fold work is
    batch-sized, not ledger-sized. Provably equal to
    :func:`admit_ledger` over the full accumulated set for such strata:
    the prefix sum over (prior survivors ∪ new survivors) splits exactly
    into carry + batch-local running sum when every new id sorts after
    every prior id."""
    strata = strata_cols or ["lang", "source"]
    surv = (
        arrivals.filter(_survivor())
        .withColumn(
            "__cum",
            F.sum("n_tok").over(
                Window.partitionBy(*strata)
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .join(
            F.broadcast(counters.select(*strata, "carry_tok")),
            strata,
            "left",
        )
        .withColumn(
            "__cum", F.col("__cum") + F.coalesce("carry_tok", F.lit(0))
        )
    )
    adm = surv.join(
        F.broadcast(alloc.select(*strata, "alloc")), strata, "left"
    ).select(
        "doc_id",
        (F.col("__cum") <= F.coalesce(F.col("alloc"), F.lit(0))).alias(
            "__adm"
        ),
    )
    return arrivals.join(adm, "doc_id", "left").select(
        *LEDGER_COLS,
        F.coalesce("__adm", F.lit(False)).alias("admitted"),
    )


def make_ingest_fold(
    corpus: DataFrame,
    eval_slice: DataFrame,
    alloc: DataFrame,
    state: CdcState,
    rules: QualityRules = QualityRules(),
    partitions: int | None = None,
    strata_cols: list[str] | None = None,
    **mh_kwargs,
):
    """Build the per-micro-batch fold: validates the gate knobs,
    materializes the static context ONCE (corpus MinHash index + eval
    Bloom, ``localCheckpoint``-ed), opens the carried-counter state, and
    returns the ``fold(batch_df, batch_id)`` callable
    :func:`corpus_ingest_stream` hands to ``foreachBatch``. Exposed so
    the per-fold cost can be driven and measured directly
    (tools/ingest_flat_probe.py) without paying the static-context
    build per measurement."""
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

    # materialize=True checkpoints the COMBINED set+signature aggregate
    # inside the index builder, so the two outer checkpoints here only
    # re-project/explode the materialized row — the md5 trunk used to
    # execute once PER relation (2×16 s of executor per run at sf0.1;
    # r12, guide §1.2).
    def _build_index():
        return tuple(
            r.localCheckpoint(eager=True)
            for r in minhash_corpus_index(
                corpus.select("doc_id", "text"),
                partitions=partitions,
                materialize=True,
                **mh_geo,
            )
        )

    def _build_bloom():
        return bloom_build(eval_slice).localCheckpoint(eager=True)

    # The quota relation is strata-sized but its LINEAGE is a corpus-wide
    # tokenize (the UniMax sizes aggregate): un-checkpointed, every
    # admission plan in every fold re-ran that corpus pass — measured
    # ~14 s of executor time per fold at sf0.1 (r12, guide §1.2). Static
    # context, so it materializes once with the index and the Bloom.
    def _build_alloc():
        return alloc.localCheckpoint(eager=True)

    # The three static relations are INDEPENDENT jobs — overlap them
    # (r13, guide §2.6): the Bloom and quota builds back-fill executor
    # slots the index trunk's stragglers leave idle, collapsing the
    # serial 3-build wall to ~the index build alone (measured 12.8 s →
    # 2.6 s warm at sf0.1). Each build is an unchanged plan, so every
    # relation is value-identical to the serial construction.
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_idx = pool.submit(_build_index)
        f_bloom = pool.submit(_build_bloom)
        f_alloc = pool.submit(_build_alloc)
        corpus_index = f_idx.result()
        eval_bloom = f_bloom.result()
        alloc = f_alloc.result()
    # Hot-bucket guard's corpus half: bucket stats + corpus-side salt are
    # pure functions of the index — compute once per run, not per fold
    # (r13, guide §1.2; operators/dedup.presalt_banded).
    mb = mh_kwargs.get("max_bucket", 128)
    presalt = (
        presalt_banded(corpus_index[0], mb) if mb is not None else None
    )
    strata = strata_cols or ["lang", "source"]
    # Carried admission counters live as a sibling generation-numbered
    # relation under the ledger's state dir ("gen=" scanning ignores the
    # subdirectory, and cleanup of the state dir removes both).
    ctr_state = CdcState(state.spark, os.path.join(state.state_dir,
                                                   "counters"))

    def fold(batch: DataFrame, batch_id: int) -> None:
        # Dedupe the batch on doc_id under a TOTAL order over the payload
        # columns (code-review r11: a partition-key-only order picked the
        # survivor arbitrarily). Cross-fold duplicates (replays) resolve
        # below via the anti-join against the prior ledger plus the
        # monotonicity check — a replayed id sits at or below its
        # stratum's frontier, forcing the stratum-local recompute.
        gates = latest_per_key(
            gate_batch(
                batch,
                corpus_index,
                eval_bloom,
                rules=rules,
                partitions=partitions,
                presalt=presalt,
                **mh_kwargs,
            ),
            ["doc_id"],
            order=[F.col(c).desc() for c in LEDGER_COLS if c != "doc_id"],
        ).localCheckpoint(eager=True)  # consumed by several branches below
        prior = state.read()
        ctr = ctr_state.read()
        if prior is None or ctr is None:
            # First fold (or a pre-counter legacy state dir): full
            # recompute, then seed the counters.
            combined = (
                gates
                if prior is None
                else latest_per_key(
                    prior.select(*LEDGER_COLS).unionByName(gates),
                    ["doc_id"],
                    order=[
                        F.col(c).desc() for c in LEDGER_COLS
                        if c != "doc_id"
                    ],
                )
            )
            # Materialize BOTH outputs before either write: write_next
            # retires the prior generation, and a lazily-evaluated
            # counter plan would re-read the just-deleted parquet.
            out = admit_ledger(combined, alloc, strata_cols).localCheckpoint(
                eager=True
            )
            ctr_out = counters_of_ledger(out, strata_cols).localCheckpoint(
                eager=True
            )
            state.write_next(out)
            ctr_state.write_next(ctr_out)
            return
        # VERDICT r11 task 3: per-fold work is batch-sized on the happy
        # path. Classify each arriving stratum: monotone (every new id
        # above the carried frontier) admits incrementally from the
        # carried counter; non-monotone (late arrival or replay) falls
        # back to a stratum-LOCAL recompute — never the full ledger.
        frontier = F.coalesce(
            F.col("max_doc_id"), F.lit(-(1 << 62))
        )
        # The classification is STRATA-sized by construction (grouped on
        # the stratum key), so it lands on the driver as plain control
        # flow — the same single job the former localCheckpoint paid,
        # but the rows now let the fold SKIP whichever branch is
        # provably empty (r12, guide §1.2): in-order arrival makes every
        # fold all-monotone; an exact replay makes every fold
        # all-non-monotone. Each skipped branch saves an eager-checkpoint
        # job over an empty relation plus its anti-join plans. The mixed
        # case (some strata late, some fresh) keeps the general path
        # with the keys rebuilt as literal relations — value-identical
        # to the former cls.filter() split.
        cls_rows = (
            gates.groupBy(*strata)
            .agg(F.min("doc_id").alias("__min_id"))
            .join(ctr.select(*strata, "max_doc_id"), strata, "left")
            .select(*strata, (F.col("__min_id") > frontier).alias("__mono"))
            .collect()
        )
        all_mono = all(r["__mono"] for r in cls_rows)
        all_non = not any(r["__mono"] for r in cls_rows)
        key_schema = gates.select(*strata).schema

        def _keys(rows):
            return state.spark.createDataFrame(
                [tuple(r[c] for c in strata) for r in rows], key_schema
            )

        if all_mono:
            g_mono, g_non = gates, None
        elif all_non:
            g_mono, g_non = None, gates
            non_keys = _keys(cls_rows)
        else:
            non_keys = _keys([r for r in cls_rows if not r["__mono"]])
            mono_keys = _keys([r for r in cls_rows if r["__mono"]])
            g_mono = gates.join(F.broadcast(mono_keys), strata, "left_semi")
            g_non = gates.join(F.broadcast(non_keys), strata, "left_semi")
        # inc/rec feed BOTH the ledger and the counter roll-forward —
        # checkpoint them once (batch-/stratum-sized) so neither lineage
        # executes twice, and so the counter plans below cannot re-read
        # a generation write_next has already retired.
        inc = (
            admit_arrivals_incremental(
                g_mono, ctr, alloc, strata_cols
            ).localCheckpoint(eager=True)
            if g_mono is not None
            else None
        )
        if g_non is not None:
            # Stratum-local recompute: prior rows of the affected strata
            # (replayed ids dropped — the arriving verdict wins) +
            # arrivals. All-non skips the key semi-join: every prior row
            # of an arriving stratum is affected.
            prior_aff = (
                prior
                if all_non
                else prior.join(F.broadcast(non_keys), strata, "left_semi")
            )
            prior_non = prior_aff.join(
                g_non.select("doc_id"), "doc_id", "left_anti"
            ).select(*LEDGER_COLS)
            rec = admit_ledger(
                prior_non.unionByName(g_non), alloc, strata_cols
            ).localCheckpoint(eager=True)
        else:
            rec = None
        # Prior rows of untouched strata carry through unchanged. With
        # no recomputed strata that is the WHOLE prior ledger; with all
        # strata recomputed it is empty only if every prior stratum also
        # arrived — late strata absent from this batch must still carry,
        # so all_non keeps the anti-join against the arriving keys.
        prior_keep = (
            prior.select(*LEDGER_COLS, "admitted")
            if all_mono
            else prior.join(
                F.broadcast(non_keys), strata, "left_anti"
            ).select(*LEDGER_COLS, "admitted")
        )
        parts = [p for p in (inc, rec) if p is not None]
        out = prior_keep
        for p in parts:
            out = out.unionByName(p)
        # Counter roll-forward: monotone strata extend (carry += batch
        # survivors, frontier = max arriving id); recomputed strata
        # re-derive from their fresh rows; untouched strata carry over.
        ctr_parts = []
        if inc is not None:
            inc_delta = counters_of_ledger(inc, strata_cols).select(
                *strata,
                F.col("carry_tok").alias("__d_tok"),
                F.col("max_doc_id").alias("__d_max"),
            )
            ctr_keep = (
                ctr
                if all_mono
                else ctr.join(F.broadcast(non_keys), strata, "left_anti")
            )
            ctr_parts.append(
                ctr_keep.join(F.broadcast(inc_delta), strata, "left").select(
                    *strata,
                    (
                        F.col("carry_tok") + F.coalesce("__d_tok", F.lit(0))
                    ).alias("carry_tok"),
                    F.greatest(
                        F.col("max_doc_id"),
                        F.coalesce("__d_max", F.col("max_doc_id")),
                    ).alias("max_doc_id"),
                )
            )
            ctr_parts.append(
                inc_delta.join(
                    F.broadcast(ctr.select(*strata)), strata, "left_anti"
                ).select(
                    *strata,
                    F.col("__d_tok").alias("carry_tok"),
                    F.col("__d_max").alias("max_doc_id"),
                )
            )
        else:
            ctr_parts.append(
                ctr.join(F.broadcast(non_keys), strata, "left_anti")
            )
        if rec is not None:
            ctr_parts.append(counters_of_ledger(rec, strata_cols))
        ctr_out = ctr_parts[0]
        for p in ctr_parts[1:]:
            ctr_out = ctr_out.unionByName(p)
        # ledger write first: `out` reads `prior` (its generation stays
        # alive until this write completes); the counter plans read only
        # the inc/rec checkpoints and the live ctr generation.
        state.write_next(out)
        ctr_state.write_next(ctr_out)

    return fold


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
    fold_shuffle_partitions: int | None = None,
    fold_adaptive: bool | None = None,
    **mh_kwargs,
) -> None:
    """Run the arriving-document stream to completion
    (Trigger.AvailableNow), folding each micro-batch's gate results into
    ``state`` and rewriting the admission ledger. At-least-once replays
    converge: the ledger dedupes on doc_id (a doc's gate verdict is a
    pure function of its text + static context) and admission is a
    deterministic function of the ledger set — maintained incrementally
    via carried per-stratum counters (module docstring; VERDICT r11
    task 3).

    The static context materializes ONCE before the stream starts
    (:func:`make_ingest_fold`): the corpus MinHash index and the eval
    Bloom positions are ``localCheckpoint``-ed so every fold probes the
    same computed relations instead of re-deriving them (the
    ingest-index posture; at 100 TB these live in storage, written by
    the batch ingest job). With a prebuilt index, relation membership
    IS the new/old split — no ``is_new`` predicate exists to disagree
    with it (code-review r11 removed the dead parameter)."""
    fold = make_ingest_fold(
        corpus, eval_slice, alloc, state,
        rules=rules, partitions=partitions, strata_cols=strata_cols,
        **mh_kwargs,
    )

    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_ingest_")
    # Scope the fold's shuffle width to the MICRO-BATCH volume, not the
    # session (= cluster) width — the stream_join lesson generalized
    # (r12, guide §2.2): every relation inside a fold is batch- or
    # strata-sized, so a cluster-wide shuffle width only multiplies AQE
    # stage-planning round-trips and empty tasks. ``fold_adaptive=False``
    # additionally turns AQE itself off inside the fold scope (r13):
    # with KB-sized shuffles every AQE re-plan is a driver round-trip
    # that costs more than it can save — measured ~1.6 s/run at sf0.1.
    # At GB-scale micro-batches raise the width and leave AQE on. The
    # static context above deliberately builds BEFORE this scope at full
    # width + AQE (it is corpus-sized). Restored in ``finally``; ``None``
    # leaves the session untouched.
    sess = stream.sparkSession
    prev = (
        sess.conf.get("spark.sql.shuffle.partitions")
        if fold_shuffle_partitions
        else None
    )
    prev_aqe = (
        sess.conf.get("spark.sql.adaptive.enabled")
        if fold_adaptive is not None
        else None
    )
    try:
        if fold_shuffle_partitions:
            sess.conf.set(
                "spark.sql.shuffle.partitions",
                str(fold_shuffle_partitions),
            )
        if fold_adaptive is not None:
            sess.conf.set(
                "spark.sql.adaptive.enabled", str(fold_adaptive).lower()
            )
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            sess.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_aqe is not None:
            sess.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        if owned:
            shutil.rmtree(ckpt, ignore_errors=True)


# --- semantic (embedding-ANN) ingest gate (VERDICT r11 task 2) --------------
#
# The lexical gate above (MinHash + Bloom + quality) passes a PARAPHRASED
# near-dup that the batch path would catch via semdedup /
# embedding_near_dups — the one first-class gap in the LLM-pipeline
# surface at r11. This gate closes it with the same static-context
# quadrant discipline: the corpus embedding index is built ONCE before
# the stream (deterministic integer coarse quantizer, the
# operators/pq.py machinery — so the whole gate replays value-for-value
# in the DuckDB oracle, unlike a float-KMeans IVF), and every arriving
# document probes only its nprobe nearest lists with an exact rounded
# cosine verify. An arrival never gates on other arrivals, so the final
# ledger stays a pure function of the arrived SET — batch-split
# invariance by construction, same as the lexical capstone.

#: Ledger schema the semantic fold maintains.
SEM_LEDGER_COLS = ["doc_id", "nn_id", "best_cos_micro", "sem_near_dup"]


def build_semantic_index(
    corpus_emb: DataFrame,
    coarse: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """The prebuilt corpus half of the semantic gate:
    ``(id, embedding, ivf_list)`` — every corpus vector assigned to its
    nearest integer-coarse list (operators/pq.coarse_probe_lists,
    nprobe=1). Built once per run and ``localCheckpoint``-ed by the
    caller; at 100 TB it is written partitioned by ``ivf_list``
    (the write_ivf_index layout) so a probe scans nprobe/nlist of the
    bytes."""
    from etl_platform_nyc_taxi_spark.functions.vectors import l2_norm
    from etl_platform_nyc_taxi_spark.operators.pq import coarse_probe_lists

    lists = coarse_probe_lists(corpus_emb, coarse, 1, id_col, vec_col)
    # ``__cn`` = the vector's L2 norm, computed ONCE at index-build time
    # (r12, guide §4.1 — the brute_force_topk precedent): the gate's
    # per-pair cosine then folds one dot product instead of three
    # interpreted HOF passes. Bit-exact factorization of
    # cosine_similarity (same IEEE ops, earlier binding).
    out = corpus_emb.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("__cn")
    ).join(lists, id_col)
    if partitions:
        out = out.repartition(partitions, "ivf_list")
    return out


def semantic_gate(
    batch: DataFrame,
    sem_index: DataFrame,
    coarse: list[list[int]],
    nprobe: int = 3,
    threshold_micro: int = 999_000,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    corpus_id_col: str = "vec_id",
) -> DataFrame:
    """Score one arriving batch against the prebuilt corpus embedding
    index: per document, the best exact cosine (micro units, ties to the
    lowest corpus id) among the ``nprobe`` probed lists, and the
    ``sem_near_dup`` verdict at ``threshold_micro``. Returns
    ``SEM_LEDGER_COLS`` for exactly the batch's documents; documents
    probing only empty lists keep NULL neighbor columns and a FALSE
    flag.

    Scale shape: probes and batch vectors broadcast (a micro-batch is
    small by definition); the corpus index is only ever equi-joined on
    its partition column, so candidates are the batch×probed-lists
    quadrant — the corpus never reshuffles and no batch×batch pair ever
    forms."""
    from etl_platform_nyc_taxi_spark.functions.vectors import dot, l2_norm
    from etl_platform_nyc_taxi_spark.operators.pq import coarse_probe_lists
    from etl_platform_nyc_taxi_spark.operators.windows import top_k_per_group

    probes = coarse_probe_lists(batch, coarse, nprobe, id_col, vec_col)
    # Batch norms bind once per document; the index carries its norms
    # from build time — per candidate pair the cosine is ONE dot fold
    # plus a multiply (bit-exact factorization of cosine_similarity;
    # r12, guide §4.1 — see build_semantic_index).
    bvec = batch.select(
        F.col(id_col),
        F.col(vec_col).alias("__bvec"),
        l2_norm(F.col(vec_col)).alias("__bn"),
    )
    denom = F.col("__bn") * F.col("__cn")
    cos = dot(F.col("__bvec"), F.col(vec_col)) / F.when(
        denom != 0.0, denom
    )
    cand = (
        sem_index.join(F.broadcast(probes), "ivf_list")
        .join(F.broadcast(bvec), id_col)
        .select(
            F.col(id_col),
            F.col(corpus_id_col).alias("nn_id"),
            F.floor(F.round(cos, 6) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("best_cos_micro"),
        )
    )
    best = top_k_per_group(
        cand,
        group_by=[id_col],
        order=[F.col("best_cos_micro").desc(), F.col("nn_id").asc()],
        k=1,
    ).drop("rank")
    return batch.select(id_col).join(best, id_col, "left").select(
        id_col,
        "nn_id",
        "best_cos_micro",
        F.coalesce(
            F.col("best_cos_micro") >= F.lit(threshold_micro), F.lit(False)
        ).alias("sem_near_dup"),
    )


def semantic_ingest_stream(
    stream: DataFrame,
    corpus_emb: DataFrame,
    state: CdcState,
    coarse: list[list[int]] | None = None,
    nlist: int = 8,
    iters: int = 2,
    dim: int = 64,
    nprobe: int = 3,
    threshold_micro: int = 999_000,
    checkpoint_dir: str | None = None,
    partitions: int | None = None,
    fold_shuffle_partitions: int | None = None,
    fold_adaptive: bool | None = None,
) -> None:
    """Run the arriving-embedding stream to completion
    (Trigger.AvailableNow), folding each micro-batch's semantic-gate
    verdicts into ``state``. Same convergence contract as
    :func:`corpus_ingest_stream`: verdicts are pure functions of static
    context, the ledger dedupes on doc_id under a total order, so
    replays and alternative batch slicings converge to the same
    relation (pinned in tests/test_streaming.py).

    The static context materializes ONCE pre-stream: the integer coarse
    quantizer trains on the corpus (operators/pq.fit_int_kmeans, m=1 —
    pass ``coarse`` to reuse an ingest-time artifact) and the assigned
    corpus index is ``localCheckpoint``-ed."""
    from etl_platform_nyc_taxi_spark.operators.pq import fit_int_kmeans

    if coarse is None:
        coarse = fit_int_kmeans(
            corpus_emb, m=1, dsub=dim, k=nlist, iters=iters
        )[0]
    sem_index = build_semantic_index(
        corpus_emb, coarse, partitions=partitions
    ).localCheckpoint(eager=True)

    def fold(batch: DataFrame, batch_id: int) -> None:
        gates = semantic_gate(
            batch,
            sem_index,
            coarse,
            nprobe=nprobe,
            threshold_micro=threshold_micro,
        )
        prior = state.read()
        combined = (
            gates
            if prior is None
            else prior.select(*SEM_LEDGER_COLS).unionByName(gates)
        )
        ledger = latest_per_key(
            combined,
            ["doc_id"],
            order=[
                F.col(c).desc_nulls_last()
                for c in SEM_LEDGER_COLS
                if c != "doc_id"
            ],
        )
        state.write_next(ledger)

    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_sem_ingest_")
    # Batch-volume-scoped fold shuffle width + optional AQE scope,
    # restored in finally — see corpus_ingest_stream (the static index
    # above builds pre-scope).
    sess = stream.sparkSession
    prev = (
        sess.conf.get("spark.sql.shuffle.partitions")
        if fold_shuffle_partitions
        else None
    )
    prev_aqe = (
        sess.conf.get("spark.sql.adaptive.enabled")
        if fold_adaptive is not None
        else None
    )
    try:
        if fold_shuffle_partitions:
            sess.conf.set(
                "spark.sql.shuffle.partitions",
                str(fold_shuffle_partitions),
            )
        if fold_adaptive is not None:
            sess.conf.set(
                "spark.sql.adaptive.enabled", str(fold_adaptive).lower()
            )
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            sess.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_aqe is not None:
            sess.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        if owned:
            shutil.rmtree(ckpt, ignore_errors=True)
