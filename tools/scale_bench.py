"""Scaling proof for the heavy dedup/ANN family (VERDICT r2 task 2).

sf0.1 cannot distinguish bucketed-linear from blocked-quadratic; this tool
synthesizes a ~FACTOR× corpus from sf0.1 and times the heavy family at both
scales, reporting the per-query scaling ratio. An LSH/bucketed path must
scale ~linearly with the data (ratio ≈ FACTOR, tolerance for fixed
overheads); a blowup flags a bucket-size distribution problem (the
dedup_image mean-centering lesson).

Synthesis (deterministic, no RNG):
* documents: FACTOR replicas; replica 0 is the original text, replica r>0
  suffixes every whitespace token with ``r`` — same token counts and
  near-identical byte volume, but near-disjoint shingle/n-gram vocabulary
  (measured cross-replica 6-shingle Jaccard ~0.045), so replicas are NOT
  near-dups of each other and the TRUE-dup structure the queries create
  internally (base ↔ mutant) scales proportionally instead of
  quadratically (verified-pair output measures exactly 10x at FACTOR=10).
  Caveat, measured in round 6 (SCALING.md post-mortem): the suffix makes
  every word boundary inside replica r carry the same "·r " shingle
  family, so UNRELATED docs within one mutated replica are systematically
  more band-collision-prone than in the base corpus — sub-threshold LSH
  candidate work grows super-linearly (92.8x at FACTOR=10) even though
  none of those candidates verify. Ratios for the MinHash family are
  therefore an UPPER BOUND on similarity-stationary growth.
* embeddings: FACTOR replicas; replica r rotates the vector by r positions
  — preserves norms and coordinate distribution, decorrelates replicas so
  LSH bucket occupancy grows linearly.
* ids offset by r × 10_000_000 (clear of the +1_000_000 mutant offset the
  queries use internally).
* every other fixture table is symlinked from the base sf dir.

Usage: python tools/scale_bench.py [factor] [base_sf_dir] [out_json]
Timing mirrors bench.py: per query, one warm noop-sink run (builds any
session-cached index/quantizer), then the timed noop-sink run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

HEAVY = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_image",
    "dedup_embedding_lsh",
    "ann_lsh",
    "ann_lsh_served",
    "ann_ivf",
    "ann_ivf_served",
    "corpus_top_ngrams",
    "corpus_prepare",
    "heavy_hitter_tokens",
    # Round 5: iterative pagerank (edge volume scales with lineitem — here
    # only documents/embeddings are replicated, so this pins the FIXED
    # per-round cost), plus the new sequence/robust-stats/feature-prep
    # queries whose windows and folds must scale with their driving table.
    "graph_pagerank",
    "markov_transitions",
    "anomaly_mad",
    "vector_normalize",
    "reservoir_per_key",
    # Round 4 continuous build: BFS frontier expansion (lineitem-driven
    # edges), gaps-and-islands windows (events), PPS sampling windows
    # (documents), centroid-cosine explode+agg (embeddings), the bucketed
    # fact join (lineitem side scales; ingest-time bucket write happens in
    # the warm pass, the timed run measures the shuffle-free serve), and
    # the key-skew diagnosis scan (events).
    "graph_bfs",
    "activity_islands",
    "weighted_sample_pps",
    "label_centroid_sim",
    "bucketed_join",
    "skew_report",
    # Round 4 batch 13/14: inverted-index cosine (pair fan-out must stay
    # df-cap-bounded as the corpus replicates), the UNSALTED estimator
    # audit (expected near-linear on a decorrelated corpus — its contract
    # says sample-only where buckets run hot), and the vocab x sources
    # divergence (vocab growth drives the cross relation).
    "tfidf_cosine_pairs",
    "minhash_estimate_audit",
    "source_divergence",
    # Round-4 batch 23/20: BM25 postings scorer (documents-driven: tf/df
    # aggregates scale, the scorer touches only 3 terms' postings) and
    # kNN eval (8 broadcast queries x corpus — cost linear in corpus).
    # dedup_pr_curve is deliberately NOT here: its ground truth is the
    # honest within-block quadratic and replicas share (lang, source),
    # so blocks grow 10x and truth pairs 100x — the query's documented
    # contract is sample-based evaluation, not full-corpus scaling.
    "bm25_search",
    "knn_label_eval",
    # Round 5: the cluster-keyed split audit rides the full MinHash ->
    # connected-components trunk plus a pairs x assignment leak join
    # (expect dedup_clusters-like rounds x linear), and the exact-dup
    # survivor ledger is two hash aggregates + a min-id self-join
    # (expect ~linear).
    "split_leakage_audit",
    "dedup_survivor_weights",
    # Round 5b: edit-1 blocked linkage scoring (deletion-neighborhood
    # equi-join + attribute joins — replicas have disjoint title vocab,
    # so blocks and pairs grow linearly; measured 2.3x at x10).
    "record_linkage_scores",
    # Round 5c: the applyInPandas ordered scans — the Python-loop cost
    # the Arrow batching must amortize (measured 1.3x / 1.6x at x10:
    # per-group folds scale with groups, not depth, on the
    # disjoint-user replica corpus).
    "ewma_smooth",
    "capped_balance",
    # Round 6: the four-format native image decode (PPM + LZW-GIF +
    # baseline-JPEG + PackBits-TIFF through mapInPandas). A per-payload
    # kernel's honest shape is cost ∝ rows (ratio ≈ data factor); the
    # figure that must stay flat is per-payload cost. The 95-color
    # encode LUT is driver-built once and broadcast — invariant to
    # corpus size.
    "multimodal_decode_roundtrip",
    # Round 10: the Bloom decontamination pair (probe volume scales with
    # the training corpus; the positions relation grows with the eval
    # slice but stays broadcast-sized), the NB classifier (training
    # counts scale with tokens, the model join with vocab×classes), the
    # distinct-n diversity sweeps (three linear explode+count passes),
    # and two control-plane allocations whose expected profile is FLAT
    # (strata/domain relations are metadata-sized).
    "bloom_decontaminate",
    "bloom_fp_audit",
    "nb_quality_classifier",
    "corpus_distinct_ngrams",
    "unimax_allocation",
    "domain_blocklist_filter",
    "embedding_dispersion",
    "span_corruption",
    "cm_sketch_audit",
    "hll_portable_audit",
    "bpe_fertility",
    "text_token_entropy",
    "dedup_cdc_chunks",
    "dedup_jaccard_exact",
    "corpus_budget_build",
    "dataset_interleave",
    "robots_crawl_filter",
    "curriculum_stages",
    "zipf_token_fit",
    # Round 11: IVF-PQ — training is bounded (max_train_rows slice, 2
    # Lloyd passes over rows×dim elements) and re-runs per corpus; the
    # serve path (encode literals + broadcast ADC inside probed lists)
    # is linear in corpus. Recall eval adds the brute-force truth pass
    # (8 broadcast queries × corpus — linear).
    "ann_ivfpq",
    "ann_ivfpq_recall",
    # Round 11: the streaming ingest capstone — per-batch probe work
    # scales with |batch|×bucket occupancy (the minhash_probe_new
    # contract), Bloom/quality linearly with the batch, admission with
    # the accumulated ledger; corpus replication grows both sides.
    "streaming_corpus_ingest",
    # Round 11b: prefix-embedding recall eval (two brute-force passes,
    # linear) and RRF fusion (shared tokenize trunk, TakeOrderedAndProject
    # rankers — expect near-linear with slack).
    "ann_matryoshka_eval",
    "hybrid_search_rrf",
    # Round 12: incremental IVF-PQ maintenance (append = encode of the
    # newest quarter against frozen artifacts — linear in corpus; drift
    # adds a second training + brute-force truth pass), and the semantic
    # ingest gate (probe work ∝ |batch| × probed-list occupancy; corpus
    # index built once pre-stream).
    "ann_ivfpq_append",
    "ann_ivfpq_drift",
    "streaming_corpus_ingest_semantic",
    # Round 12: LPA communities — same MinHash pair trunk as
    # dedup_clusters plus 4 fixed vote rounds (join + count + node-
    # partitioned window each); expect the dedup_clusters profile.
    "dedup_communities_lpa",
    # Round 12: preference analytics — duel staging and the rater panel
    # are corpus-linear (blocked windows / hash flips); the estimation
    # loops (8 MM rounds, kappa ratios) run on items²/raters²-sized
    # relations, so their cost must stay FLAT as the corpus replicates.
    "preference_bradley_terry",
    "annotator_agreement_fleiss",
    "annotator_kappa_pairs",
    # Round 12b: the unigram tokenizer family (training cost rides the
    # DISTINCT-WORD relation — replicas suffix every token, so vocab
    # grows ~10x and the Viterbi folds/recounts with it; apply is
    # map-only), the tokenizer bake-off (adds the BPE chain on the same
    # collapsed vocab), and the backoff LM (three n-gram count aggs +
    # scoring joins, all corpus-linear with map-side combine).
    # triplet_mining is deliberately NOT here (the dedup_pr_curve
    # precedent): its exact all-pairs form is honestly quadratic by
    # contract — the oracle-provable completeness baseline — and its
    # documented scale path swaps the negative side for ANN candidates.
    "unigram_vocab",
    "unigram_tokenize",
    "tokenizer_fertility_compare",
    "lm_stupid_backoff",
    # Round 12b: growth-curve cumsums over the per-doc aggregate
    # (docs-linear windows), and the two 8-query ranking evals (cost
    # linear in corpus — queries broadcast, corpus never shuffles).
    "heaps_law_fit",
    "ann_int8_recall",
    "retrieval_ndcg",
    # Round 12c: events-driven (only documents/embeddings replicate in
    # the synthesis, so — like graph_pagerank — these rows pin the
    # FIXED cost of the Markov value-iteration rounds and the KM curve
    # windows, which run on metadata-sized relations after the
    # one-window-pass journey/risk front end).
    "attribution_markov",
    "survival_km",
]

REPLICA_STRIDE = 10_000_000


def synthesize(spark, base_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    os.makedirs(out_dir, exist_ok=True)
    docs = load_fixture(spark, base_dir, "documents")
    doc_parts = []
    for r in range(factor):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * REPLICA_STRIDE)
        )
        if r > 0:
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(str(r))),
                    ),
                    " ",
                ),
            )
        doc_parts.append(d)
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_fixture(spark, base_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    emb_parts = []
    for r in range(factor):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * REPLICA_STRIDE))
        rot = r % dim
        if rot:
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), rot + 1, dim - rot),
                    F.slice(F.col("embedding"), 1, rot),
                ),
            )
        emb_parts.append(e)
    out = emb_parts[0]
    for p in emb_parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # events: FACTOR replicas with offset event ids and DISJOINT user ids
    # per replica — sequences (the unit markov/sessionize/MAD windows
    # partition on) multiply without deepening, so a linear operator must
    # show a ~linear ratio. Values/timestamps are untouched: the per-type
    # distributions keep their shape, only their mass grows.
    ev = load_fixture(spark, base_dir, "events")
    ev_parts = []
    for r in range(factor):
        ev_parts.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(r * REPLICA_STRIDE))
            .withColumn("user_id", F.col("user_id") + F.lit(r * REPLICA_STRIDE))
        )
    out = ev_parts[0]
    for p in ev_parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # lineitem: FACTOR replicas with offset order AND supplier keys —
    # disjoint co-supplier graph copies, so graph queries (pagerank,
    # triangles) must scale with components, never densify. Other columns
    # untouched.
    li = load_fixture(spark, base_dir, "lineitem")
    li_parts = []
    for r in range(factor):
        li_parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * REPLICA_STRIDE))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(r * REPLICA_STRIDE))
        )
    out = li_parts[0]
    for p in li_parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    for t in "region nation customer supplier part orders".split():
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{base_dir}/{t}.parquet", dst)


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    """One fresh JVM per query: the heavy dedup/ANN family materializes
    localCheckpoint blocks (banded relations, CC round state) whose
    cleanup is asynchronous, so successive queries in one session measure
    their predecessors' storage-pool debris, not their own plan —
    observed swings of 3-4× on the ×10 corpus (dedup_image 12 s isolated
    vs 52 s late in a shared session) that neither forced JVM GC nor a
    bigger heap removed. A production job runs one query per application;
    per-query measurement gets the same isolation. Warm + timed runs
    happen inside the subprocess; JVM startup is not counted."""
    import subprocess

    out: dict[str, float] = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, __file__, "--one", name, sf_dir],
            capture_output=True,
            text=True,
            check=True,
        )
        out[name] = float(proc.stdout.strip().splitlines()[-1])
        print(f"  {name}: {out[name]}s", flush=True)
    return out


def time_one(name: str, sf_dir: str) -> float:
    """1 warm + 2 timed runs, report the MIN of the timed pair: the
    sandboxed host shows multi-× run-to-run swings on the heavy scaled
    queries (same deterministic plan, same fresh JVM — IO/CPU contention
    outside the guest), and the minimum is the standard estimator of
    intrinsic cost under external noise."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.session import get_spark

    from etl_platform_nyc_taxi_spark.session import SOAK_CONFS

    spark = get_spark(f"scale_one_{name}", extra_confs=SOAK_CONFS)
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(time_one(sys.argv[2], sys.argv[3]))
        return 0
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = sys.argv[3] if len(sys.argv) > 3 else "SCALE_BENCH.json"
    scaled_dir = f"/tmp/spark_graft_scale/x{factor}"

    from etl_platform_nyc_taxi_spark.session import get_spark

    from etl_platform_nyc_taxi_spark.session import SOAK_CONFS

    spark = get_spark("scale_bench", extra_confs=SOAK_CONFS)
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(scaled_dir):
        shutil.rmtree(scaled_dir)
    t0 = time.perf_counter()
    synthesize(spark, base, scaled_dir, factor)
    print(f"synthesized {factor}x corpus in {time.perf_counter()-t0:.1f}s")

    print(f"base ({base}):")
    base_times = time_queries(spark, base, HEAVY)
    print(f"scaled ({scaled_dir}, {factor}x):")
    scaled_times = time_queries(spark, scaled_dir, HEAVY)

    # Bucket-occupancy histograms for the LSH family (VERDICT r3 task 3):
    # top-10 per-bucket counts + sum(c*(c-1)/2) — the raw candidate-pair
    # integral — at both scales, so a superlinear time ratio can be
    # attributed to candidate growth vs verify cost. These probe the
    # UNGUARDED banded relations; the queries themselves run with the
    # max_bucket hot-bucket guard, so pair work is bounded by
    # ~rows×max_bucket even when pair_work here explodes.
    from tools.bucket_probe import PROBES, histogram

    histograms = {}
    for name, probe in PROBES.items():
        histograms[name] = {
            "base": histogram(probe(spark, base)),
            "scaled": histogram(probe(spark, scaled_dir)),
        }
        print(f"  buckets {name}: {json.dumps(histograms[name])}", flush=True)

    report = {
        "factor": factor,
        "base_sf_dir": base,
        "queries": {
            n: {
                "base_s": base_times[n],
                "scaled_s": scaled_times[n],
                "ratio": round(scaled_times[n] / max(base_times[n], 1e-9), 2),
            }
            for n in HEAVY
        },
        "bucket_histograms": histograms,
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
