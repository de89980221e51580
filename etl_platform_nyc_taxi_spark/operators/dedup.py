"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard
(SURVEY.md §7.2 step 5 / the LLM-data-pipeline north star).

Scale shapes (the whole point at 100 TB):

* **exact**: fingerprint → groupBy — one shuffle on a 32-byte key, fully
  parallel, no pairwise anything.
* **MinHash-LSH**: shingle → signature (narrow, per-row) → explode to
  ``bands`` rows per doc → shuffle on (band, band-key) → pairs only within
  buckets. Candidate count is data-dependent, never O(n²); the exact
  Jaccard verify runs only on candidates.
* **SimHash**: one 64-bit signature per doc; banding on bit-blocks turns
  Hamming-≤t search into equi-joins (t+1 blocks ⇒ pigeonhole guarantee).
* **n-gram Jaccard**: exact pairwise, contained by a blocking key — the
  honest quadratic fallback, only ever inside small blocks.

MinHash/Jaccard use the md5-portable hash family so the whole pipeline is
oracle-checkable in DuckDB (functions/hashing.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.hashing import (
    MINHASH_P,
    hamming64,
    minhash_coeffs,
    shingles,
)
from etl_platform_nyc_taxi_spark.operators.text import fingerprint, tokens_ws


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per normalized-text fingerprint (hash-groupBy shape —
    ``dropDuplicates`` on a derived 32-byte key, single shuffle)."""
    return df.withColumn("__fp", fingerprint(text_col)).dropDuplicates(["__fp"]).drop("__fp")


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fingerprint groups with >1 member: (fingerprint, copies,
    min_doc_id) — the audit view of exact dedup."""
    return (
        df.select(fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("copies"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("copies") > 1)
    )


def prefix_duplicate_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens: int = 32,
) -> DataFrame:
    """Duplicate groups keyed on the first ``n_tokens`` whitespace tokens:
    (prefix_fp, copies, min_doc_id) for every prefix shared by >1 doc.

    The boilerplate/mirror-page case exact dedup misses: scraped corpora
    are full of documents identical up front (headers, licence blocks,
    templated intros) that diverge in the tail. Same scale shape as
    :func:`exact_duplicate_groups` — one hash-groupBy on a 32-byte md5 of
    the prefix, single shuffle, no pairwise anything."""
    pref = F.md5(F.concat_ws(" ", F.slice(tokens_ws(text_col), 1, n_tokens)))
    return (
        df.select(pref.alias("prefix_fp"), F.col(id_col))
        .groupBy("prefix_fp")
        .agg(F.count(F.lit(1)).alias("copies"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("copies") > 1)
    )


# ---------------------------------------------------------------------------
# Hot-bucket guard (shared by every banded self-join in this family)
# ---------------------------------------------------------------------------


def salt_hot_buckets(
    banded: DataFrame,
    bucket_cols: tuple[str, ...],
    salt_src: Column,
    cap: int,
) -> DataFrame:
    """Append a ``__salt`` column that splits any bucket with more than
    ``cap`` members into ``ceil(count/cap)`` sub-buckets, so a banded
    self-join on ``bucket_cols + ("__salt",)`` never degenerates to
    all-pairs inside one hot bucket (pair work per bucket drops from
    O(c²) to O(c·cap)).

    ``salt_src`` must be a deterministic function of the ROW'S CONTENT
    (full signature / feature vector), not of its id: rows with identical
    content hash to the same salt in every bucket, so exact duplicates are
    NEVER separated regardless of cap. Near-threshold pairs inside a hot
    bucket CAN land in different salts and be lost — measured recall
    loss, which is the contract: dedup is approximate, and a capped
    bucket loses a little recall where a quadratic bucket loses the whole
    job (SCALE_BENCH r3: dedup_image 69.5× at ×10 data from exactly this
    blow-up).

    Plan shape: per-bucket counts are a partial-aggregated groupBy
    (shuffles only the key + a long), filtered to the over-cap buckets —
    by definition few — and broadcast back; the big banded relation is
    never re-shuffled to learn its salt.

    The input is materialized once (non-eager ``localCheckpoint``) before
    branching: the count subtree cannot reuse the self-join's exchange
    (different partial aggregate), so without materialization the
    upstream signature pipeline — the dominant CPU cost of every LSH
    family — executes twice per action (measured 2× on dedup_minhash_lsh
    at sf0.1). The checkpointed relation is band keys + ids, orders of
    magnitude smaller than the raw text it derives from, and is exactly
    what an ingest-time pipeline would persist anyway."""
    if cap < 2:
        raise ValueError("cap must be >= 2")
    banded = banded.localCheckpoint(eager=False)
    over = (
        banded.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > cap)
        .select(
            *bucket_cols,
            F.ceil(F.col("__c") / F.lit(cap)).cast("int").alias("__splits"),
        )
    )
    return (
        banded.join(F.broadcast(over), on=list(bucket_cols), how="left")
        .withColumn(
            "__salt",
            F.when(F.col("__splits").isNull(), F.lit(0))
            .otherwise(F.pmod(F.xxhash64(salt_src), F.col("__splits")))
            .cast("int"),
        )
        .drop("__splits")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def hashed_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """(__id, __h) rows: one 48-bit md5-derived int per character k-shingle
    OCCURRENCE (functions/hashing.py family — DuckDB-portable). The shared
    first stage of signature building and Jaccard verification.

    Repeated shingles within a doc may emit duplicate rows: every consumer
    is a set (``array_distinct(collect_list)``) or MIN aggregate, for which
    multiplicity is invisible — and skipping the per-doc dedup lets the
    whole stage run as offset-explode + substring + md5 inside ONE
    whole-stage-codegen span (r12 optimization, guide §4.1). The previous
    shape built an ``array<string>`` of shingles per doc via an interpreted
    higher-order ``transform``, hash-set-deduped it (``array_distinct``)
    and exploded — per-element interpreted eval plus an array allocation
    per doc, measured 1.3× slower on the same values."""
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    if partitions:
        base = base.repartition(partitions)
    n = F.greatest(F.length("__t") - F.lit(k - 1), F.lit(1))
    sh = base.select(
        "__id", "__t", F.explode(F.sequence(F.lit(1), n)).alias("__i")
    )
    return sh.select(
        "__id",
        F.conv(
            F.substring(F.md5(F.col("__t").substr(F.col("__i"), F.lit(k))), 1, 12),
            16,
            10,
        )
        .cast("long")
        .alias("__h"),
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 8,
    bands: int = 4,
    partitions: int | None = None,
    max_bucket: int | None = 128,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) from banded MinHash signatures.

    rows/doc after explode = ``bands``; docs sharing ALL hashes of any band
    land in one bucket. Probability of candidacy rises steeply with
    Jaccard (s-curve at ~(1/bands)^(bands/num_hashes)).

    ``partitions``: repartition the (id, text) projection before the
    signature stage. The per-row compute (md5 over every shingle) dwarfs
    the row size, so small inputs read as 1-2 file splits must be spread
    across cores; on a real cluster the scan already yields many splits
    and this can stay None.

    ``max_bucket``: hot-bucket guard (:func:`salt_hot_buckets`) — band
    buckets over this occupancy are salt-split by a hash of the FULL
    signature, capping per-bucket pair generation at O(c·max_bucket).
    Identical signatures always share a salt, so exact/very-high-Jaccard
    pairs survive any cap; near-threshold pairs inside a hot bucket may
    be lost. ``None`` disables."""
    # Same hash family as functions.hashing.minhash_sig (portable to the
    # DuckDB oracle) but computed as explode → one md5/shingle in a codegen
    # projection → num_hashes MIN aggregates, instead of interpreted
    # higher-order transforms over the shingle array. Partial aggregation
    # shrinks the shuffle to num_hashes longs per (doc × partition); the
    # separate __h projection guarantees the md5 runs once per shingle
    # regardless of subexpression-elimination behavior in the aggregate.
    coeffs = minhash_coeffs(num_hashes)
    hashed = hashed_shingles(df, id_col, text_col, k, partitions)
    h = F.col("__h")
    sig = hashed.groupBy("__id").agg(
        *[
            F.min(
                ((h * F.lit(a)) % F.lit(MINHASH_P) + F.lit(c)) % F.lit(MINHASH_P)
            ).alias(f"__m{i}")
            for i, (a, c) in enumerate(coeffs)
        ]
    )
    banded = _banded_signature(sig, num_hashes, bands)
    join_keys = ["band", "key"]
    if max_bucket is not None:
        banded = salt_hot_buckets(
            banded, ("band", "key"), F.col("__sig"), max_bucket
        )
        join_keys.append("__salt")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=join_keys, how="inner")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def _banded_signature(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Explode a (__id, __m0..__m{n-1}) signature relation to one
    (__id, band, key, __sig) row per band; ``__sig`` is the full
    concatenated signature, the content hash the hot-bucket guard salts
    by (identical docs ⇒ identical __sig ⇒ same salt in every band).

    ``bands`` must divide ``num_hashes`` exactly: a remainder would
    silently drop trailing hashes from every band key (shifting the LSH
    s-curve), and ``bands > num_hashes`` would make every band key the
    EMPTY string — one global bucket, an O(n²) self-join."""
    if bands <= 0 or num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    return sig.select(
        "__id",
        F.concat_ws("|", *[F.col(f"__m{i}") for i in range(num_hashes)]).alias(
            "__sig"
        ),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"__m{b * rows_per_band + i}")
                                for i in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "__id",
        "__sig",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )


def jaccard_shingle(
    left_text: Column, right_text: Column, k: int = 4
) -> Column:
    """Exact Jaccard over distinct character k-shingles (verify step)."""
    sa = F.array_distinct(shingles(left_text, k))
    sb = F.array_distinct(shingles(right_text, k))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return inter / union


def _minhash_relations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """The shared MinHash trunk: (hash-set relation ``(__id, __hs)``,
    signature relation ``(__id, __m0..__m{n-1})``).

    ONE md5 pass and ONE aggregate feed everything: the hash-set and all
    ``num_hashes`` signature minima are computed together in a single
    groupBy over the hashed-shingle rows (r12 optimization, guide §2.3 —
    the previous shape aggregated the set first, then re-exploded it for a
    SECOND aggregate of min slots; min over the multiset equals min over
    the distinct set, so folding both into one pass is value-identical,
    measured 1.4× on the joined trunk). The extra shuffle bytes are
    ``num_hashes`` longs per (doc × partition) partial — noise next to the
    partial hash sets. The hash set MUST be ``collect_set``, not
    ``array_distinct(collect_list(...))``: hashed_shingles emits one row
    per shingle OCCURRENCE, and collect_set dedups in the PARTIAL buffer
    (each doc's rows are co-located pre-shuffle, so the dedup completes
    map-side) where collect_list would ship every duplicate through the
    exchange — measured 1.3-1.4× on dedup_incremental /
    dedup_communities_lpa when the duplicates leaked into the shuffle.
    Every ``__hs`` consumer is order-insensitive (size / array_intersect),
    so the set's array order is free. Both relations project off the same
    aggregate, so
    every consumer sits on the same shuffle exchange, which Spark's
    ReuseExchange computes once. The SQL oracle replicates this hash
    family literal-for-literal, so this trunk must stay the single source
    of truth for both the pairwise and the incremental-probe pipelines."""
    both = _minhash_combined(df, id_col, text_col, k, num_hashes, partitions)
    hs = both.select("__id", "__hs")
    sig = both.select("__id", *[f"__m{i}" for i in range(num_hashes)])
    return hs, sig


def _minhash_combined(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    partitions: int | None,
) -> DataFrame:
    """The single-aggregate trunk itself: ``(__id, __hs, __m0..__m{n-1})``
    — the one relation both :func:`_minhash_relations` projections and
    :func:`minhash_corpus_index`'s materialized form derive from."""
    hashed = hashed_shingles(df, id_col, text_col, k, partitions)
    coeffs = minhash_coeffs(num_hashes)
    h = F.col("__h")
    return hashed.groupBy("__id").agg(
        F.collect_set("__h").alias("__hs"),
        *[
            F.min(
                ((h * F.lit(a)) % F.lit(MINHASH_P) + F.lit(c)) % F.lit(MINHASH_P)
            ).alias(f"__m{i}")
            for i, (a, c) in enumerate(coeffs)
        ],
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    partitions: int | None = None,
    max_bucket: int | None = 128,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify ≥
    threshold. Output: (id_a, id_b, jaccard).

    ``max_bucket``: hot-bucket guard — see :func:`minhash_candidates`.

    The verify computes Jaccard over each doc's DISTINCT 48-bit hashed
    shingle set (one codegen md5 pass per doc via
    :func:`hashed_shingles` + long-array intersect), not by re-building
    string shingle arrays per candidate side — measured ~2× on the verify
    stage. Hash-set Jaccard equals string-shingle Jaccard unless two
    distinct shingles collide in 48 bits (P < 1e-8 per pair at 10^3
    shingles/doc); the DuckDB oracle computes over the same hashed sets,
    so the comparison stays exact by construction either way. The
    quadratic step never materializes — only candidate pairs join."""
    hs, sig = _minhash_relations(df, id_col, text_col, k, num_hashes, partitions)
    banded = _banded_signature(sig, num_hashes, bands)
    join_keys = ["band", "key"]
    if max_bucket is not None:
        banded = salt_hot_buckets(
            banded, ("band", "key"), F.col("__sig"), max_bucket
        )
        join_keys.append("__salt")
    ba, bb = banded.alias("a"), banded.alias("b")
    cands = (
        ba.join(bb, on=join_keys, how="inner")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    if partitions:
        # The exact-Jaccard verify is CPU-bound per pair while candidate
        # rows are tiny in bytes, so AQE coalesces the candidate shuffle to
        # one task. Repartition BEFORE the set joins: an explicit
        # repartition is exempt from AQE coalescing, the (broadcast) joins
        # preserve it, and the verify predicate cannot be pushed below the
        # joins that produce its inputs — so the filter runs this wide.
        cands = cands.repartition(partitions)
    ha = hs.select(F.col("__id").alias("id_a"), F.col("__hs").alias("__ha"))
    hb = hs.select(F.col("__id").alias("id_b"), F.col("__hs").alias("__hb"))
    inter = F.size(F.array_intersect(F.col("__ha"), F.col("__hb"))).cast("double")
    union = (
        F.size(F.col("__ha")) + F.size(F.col("__hb"))
    ).cast("double") - inter
    return (
        cands.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_probe_new(
    df: DataFrame,
    is_new: Callable[[Column], Column],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    partitions: int | None = None,
    max_bucket: int | None = 128,
) -> DataFrame:
    """INCREMENTAL near-dup: which incoming docs (rows whose id
    satisfies ``is_new``, a callable id-Column → boolean-Column)
    duplicate the existing corpus (the rest)? Output: (new_id, n_matches,
    max_jaccard) for every new doc with ≥1 corpus match at ``threshold``.

    This is the ingest-time shape that matters at 100 TB: the corpus is
    NEVER re-deduped against itself — one shared signature pipeline runs
    over the union (the corpus side of it is exactly the banded relation
    an ingest pipeline materializes as its index, cf. write_lsh_index),
    and the candidate join is batch-banded × corpus-banded only, so pair
    work scales with |batch| × bucket-occupancy, not |corpus|². The
    batch×batch and corpus×corpus quadrants never form.

    ``max_bucket`` is the ASYMMETRIC hot-bucket guard: corpus rows in a
    bucket over the cap salt-split by a content hash (like
    :func:`salt_hot_buckets`), and probe rows REPLICATE across that
    bucket's salt shards — replication is cheap because the batch side
    is small by definition, and unlike the symmetric salt it is
    LOSSLESS: every probe still meets every corpus row of its bucket,
    so the result set is bit-identical to the unguarded join while
    per-task bucket joins stay bounded at ``max_bucket``."""
    hs, sig = _minhash_relations(df, id_col, text_col, k, num_hashes, partitions)
    banded = _banded_signature(sig, num_hashes, bands)
    if max_bucket is not None and max_bucket < 2:
        raise ValueError("max_bucket must be >= 2")
    if max_bucket is not None:
        banded = banded.localCheckpoint(eager=False)
    new_side = banded.filter(is_new(F.col("__id")))
    old_side = banded.filter(~is_new(F.col("__id")))
    hs_new = hs.filter(is_new(F.col("__id")))
    hs_old = hs.filter(~is_new(F.col("__id")))
    return _probe_verify(
        new_side, old_side, hs_new, hs_old, threshold, partitions, max_bucket
    )


def presalt_banded(
    old_banded: DataFrame, max_bucket: int
) -> tuple[DataFrame, DataFrame]:
    """The STATIC half of :func:`_probe_verify`'s hot-bucket guard,
    factored out so a caller probing many batches against one index (the
    streaming ingest fold) computes it ONCE per index instead of once
    per probe (r13, guide §1.2): ``(old_salted, over)``, both eagerly
    ``localCheckpoint``-ed — ``over`` is the oversized-bucket split map
    and ``old_salted`` the corpus banded relation with its ``__salt``
    already assigned. Pass the pair to :func:`minhash_probe_index` /
    :func:`_probe_verify` as ``presalt``; the expressions are identical
    (same xxhash64 salt), so candidates — and therefore results — are
    unchanged."""
    over = (
        old_banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > max_bucket)
        .select(
            "band",
            "key",
            F.ceil(F.col("__c") / F.lit(max_bucket)).cast("int").alias("__splits"),
        )
        .localCheckpoint(eager=True)
    )
    old_salted = (
        old_banded.join(F.broadcast(over), on=["band", "key"], how="left")
        .withColumn(
            "__salt",
            F.when(F.col("__splits").isNull(), F.lit(0))
            .otherwise(F.pmod(F.xxhash64("__sig"), F.col("__splits")))
            .cast("int"),
        )
        .drop("__splits")
        .localCheckpoint(eager=True)
    )
    return old_salted, over


def _probe_verify(
    new_side: DataFrame,
    old_side: DataFrame,
    hs_new: DataFrame,
    hs_old: DataFrame,
    threshold: float,
    partitions: int | None,
    max_bucket: int | None,
    presalt: tuple[DataFrame, DataFrame] | None = None,
    spread_cands: bool = True,
) -> DataFrame:
    """Shared probe tail: asymmetric hot-bucket guard, batch-banded ×
    corpus-banded candidate join, exact-Jaccard verify, per-new-doc
    rollup. Inputs are the banded and hash-set relations of each side
    (``__id/band/key/__sig`` and ``__id/__hs``). ``presalt`` supplies
    the guard's static half precomputed (:func:`presalt_banded`).
    ``spread_cands`` keeps the explicit candidate repartition that
    defeats AQE's coalesce before the CPU-bound verify — right for
    corpus-scale probes (dedup_incremental); a MICRO-BATCH probe's
    candidate set is batch-sized and its verify trivial, so the extra
    exchange is pure latency there (r13: streaming ingest passes
    False — measured ~0.35 s/fold)."""
    join_keys = ["band", "key"]
    if max_bucket is not None:
        if presalt is not None:
            old_side, over = presalt
        else:
            over = (
                old_side.groupBy("band", "key")
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > max_bucket)
                .select(
                    "band",
                    "key",
                    F.ceil(F.col("__c") / F.lit(max_bucket)).cast("int").alias("__splits"),
                )
            )
            old_side = (
                old_side.join(F.broadcast(over), on=["band", "key"], how="left")
                .withColumn(
                    "__salt",
                    F.when(F.col("__splits").isNull(), F.lit(0))
                    .otherwise(F.pmod(F.xxhash64("__sig"), F.col("__splits")))
                    .cast("int"),
                )
                .drop("__splits")
            )
        new_side = (
            new_side.join(F.broadcast(over), on=["band", "key"], how="left")
            .withColumn(
                "__salt",
                F.explode(
                    F.sequence(
                        F.lit(0), F.coalesce(F.col("__splits"), F.lit(1)) - 1
                    )
                ),
            )
            .drop("__splits")
        )
        join_keys.append("__salt")
    a, b = new_side.alias("a"), old_side.alias("b")
    cands = (
        a.join(b, on=join_keys, how="inner")
        .select(F.col("a.__id").alias("new_id"), F.col("b.__id").alias("old_id"))
        .distinct()
    )
    if partitions and spread_cands:
        cands = cands.repartition(partitions)
    ha = hs_new.select(F.col("__id").alias("new_id"), F.col("__hs").alias("__ha"))
    hb = hs_old.select(F.col("__id").alias("old_id"), F.col("__hs").alias("__hb"))
    inter = F.size(F.array_intersect(F.col("__ha"), F.col("__hb"))).cast("double")
    union = (F.size(F.col("__ha")) + F.size(F.col("__hb"))).cast("double") - inter
    return (
        cands.join(ha, "new_id")
        .join(hb, "old_id")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


def minhash_corpus_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 8,
    bands: int = 4,
    partitions: int | None = None,
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The materialized ingest-time probe index: ``(banded, hashsets)``
    relations of the EXISTING corpus, computed once and reused by every
    arriving batch (:func:`minhash_probe_index`) — the factored-out
    corpus half of :func:`minhash_probe_new`, which recomputed it per
    call. At 100 TB this pair is written to storage partitioned by
    (band, key) — the write_lsh_index pattern — and probes prune to
    matching partitions.

    ``materialize=True`` eagerly ``localCheckpoint``s the COMBINED
    set+signature aggregate BEFORE the pair projects off it (r12, guide
    §1.2): both returned relations share that one aggregate, so a caller
    who checkpoints each relation separately (the streaming fold) pays
    the whole md5 signature trunk once per relation — measured 2×16 s of
    executor time per `streaming_corpus_ingest` run at sf0.1 for a trunk
    that computes once under this flag.

    A document's signature depends only on its own text, so probing a
    prebuilt index is result-identical to the union-input form."""
    both = _minhash_combined(
        corpus, id_col, text_col, k, num_hashes, partitions
    )
    if materialize:
        both = both.localCheckpoint(eager=True)
    hs = both.select("__id", "__hs")
    sig = both.select("__id", *[f"__m{i}" for i in range(num_hashes)])
    return _banded_signature(sig, num_hashes, bands), hs


def minhash_probe_index(
    index: tuple[DataFrame, DataFrame],
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    partitions: int | None = None,
    max_bucket: int | None = 128,
    presalt: tuple[DataFrame, DataFrame] | None = None,
    spread_cands: bool = True,
) -> DataFrame:
    """Probe an arriving batch against a prebuilt corpus index
    (:func:`minhash_corpus_index` — pass the SAME k/num_hashes/bands):
    same output contract, guard, and semantics as
    :func:`minhash_probe_new`, with the corpus signature work paid once
    at index-build time instead of per probe call. ``presalt`` (r13,
    guide §1.2) additionally moves the hot-bucket guard's corpus half
    to index-build time (:func:`presalt_banded`) — per probe only the
    BATCH side salts; must be built with the same ``max_bucket``."""
    if max_bucket is not None and max_bucket < 2:
        raise ValueError("max_bucket must be >= 2")
    old_banded, hs_old = index
    if max_bucket is not None and presalt is None:
        # The guard consumes the corpus banded relation twice (bucket
        # stats + salted join): truncate its lineage so a caller who
        # didn't pre-checkpoint the index doesn't recompute the corpus
        # signature pipeline twice per probe (minhash_probe_new
        # checkpoints the same relation for the same reason; on an
        # already-checkpointed index this is a cheap no-op scan copy).
        old_banded = old_banded.localCheckpoint(eager=False)
    hs_new, sig_new = _minhash_relations(
        batch, id_col, text_col, k, num_hashes, partitions
    )
    new_banded = _banded_signature(sig_new, num_hashes, bands)
    return _probe_verify(
        new_banded, old_banded, hs_new, hs_old, threshold, partitions,
        max_bucket, presalt=presalt, spread_cands=spread_cands,
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
    nbits: int = 64,
    token_hash: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """``nbits``-bit SimHash per document over whitespace tokens.

    Same signature family as :func:`functions.hashing.simhash64`
    (per-token hash, per-bit majority vote, ties → 0) but computed as
    explode → ``nbits`` codegen'd conditional sums → fold, instead of a
    per-token slot ``aggregate``/``zip_with``. Higher-order-function
    lambdas run interpreted in Spark; the explode/groupBy shape keeps
    every expression inside whole-stage codegen and partial aggregation
    shrinks the shuffle to nbits+1 longs per (doc × input partition) —
    measured ~2× faster at sf0.1 and the gap widens with tokens/doc.

    ``token_hash`` defaults to xxhash64 (fast, Spark-only). Pass
    ``lambda c: portable_hash64(c, 60)`` with ``nbits=60`` for the
    md5-prefix family that the DuckDB oracle replicates bit-for-bit
    (functions/hashing.py)."""
    if not 1 <= nbits <= 64:
        raise ValueError("nbits must be in [1, 64]")
    base = df.select(F.col(id_col), F.col(text_col))
    if partitions:
        base = base.repartition(partitions)
    toks = base.select(
        F.col(id_col), F.explode_outer(tokens_ws(text_col)).alias("__tok")
    )
    hash_fn = token_hash or (lambda c: F.xxhash64(c))
    # Materialize the token hash in its own projection: each of the nbits
    # aggregate expressions below references it, and aggregate-update
    # expressions don't reliably get subexpression elimination — inlined,
    # an md5-family hash would run nbits× per token (measured ~3× on the
    # whole query at sf0.1).
    hashed = toks.select(
        F.col(id_col), hash_fn(F.col("__tok")).alias("__h"),
        F.col("__tok").isNull().alias("__null"),
    )
    # The per-bit sums and the signature fold are built as SQL strings
    # parsed by ONE expr() call each (r12, guide §5 driver overhead):
    # assembling ~nbits·10 Column objects through py4j measured 1.3 s of
    # driver time PER INVOCATION at nbits=60 — half this query's wall —
    # while the parsed expressions are token-identical to the Column
    # originals (same CASE/shift/sum tree, same types, same values).
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN __null THEN 0 "
            f"ELSE shiftright(__h, {b}) & 1 END)"
        ).alias(f"__b{b}")
        for b in range(nbits)
    ]
    agg = hashed.groupBy(id_col).agg(
        F.expr("sum(CAST(NOT __null AS BIGINT))").alias("__n"), *bit_sums
    )
    # bit b set iff majority vote positive: 2*ones_b > n  (ties -> 0, matching
    # simhash64's `acc > 0` on the ±1 accumulator; empty docs -> 0).
    # Bit 63, when present, is the sign bit: its set-value is -(2^63).
    bit_vals = [-(1 << 63) if b == 63 else 1 << b for b in range(nbits)]
    fold = " + ".join(
        f"(CASE WHEN __b{b} * 2 > __n THEN CAST({bit_vals[b]} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for b in range(nbits)
    )
    return agg.select(F.col(id_col), F.expr(fold).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    partitions: int | None = None,
    nbits: int = 64,
    token_hash: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via bit-block banding.

    Split the ``nbits``-bit signature into ``blocks`` equal bit-blocks; by
    pigeonhole, any pair within Hamming ≤ blocks-1 shares ≥1 exact block —
    equi-join per block, then verify with bit_count. Needs
    ``blocks > max_hamming`` for completeness. See
    :func:`simhash_signatures` for the portable (oracle-checkable)
    ``nbits=60`` + md5 token-hash configuration."""
    if blocks <= max_hamming:
        raise ValueError("need blocks > max_hamming for exact recall")
    if nbits % blocks:
        raise ValueError("nbits must divide evenly into blocks")
    width = nbits // blocks
    sigs = simhash_signatures(df, id_col, text_col, partitions, nbits, token_hash)
    banded = sigs.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        # width == 64 (blocks=1): (1<<64)-1 overflows an
                        # int64 literal; -1 is the same all-bits mask
                        F.shiftrightunsigned(F.col("simhash"), i * width)
                        .bitwiseAND(
                            F.lit(-1 if width == 64 else (1 << width) - 1)
                        )
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select("__id", "simhash", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["block", "key"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Blocked n-gram Jaccard (exact pairwise within blocks)
# ---------------------------------------------------------------------------


def _word_ngrams(text_col: str, n: int):
    """Distinct word-n-gram array. The token array is BOUND ONCE via a
    1-element-array transform (the functions/hashing.py minhash_sig
    pattern): HOF lambdas run interpreted with no common-subexpression
    elimination, so naming the split result keeps the per-gram slice
    from re-running split() once per index — without the binding, gram
    building is O(tokens² · chars) per row."""
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.array(tokens_ws(text_col)),
                lambda toks: F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                ),
            )
        )
    )


def _gram_base(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: tuple[str, ...],
    n: int,
    partitions: int | None,
) -> DataFrame:
    """Shared (block..., __id, __g, __n) gram relation for the blocked
    pair generators, materialized once: both self-join branches would
    otherwise re-execute the tokenize→gram→distinct subtree (the
    dominant per-row cost) — measured ~2× on the whole pipeline. The
    checkpointed relation is (block, id, gram-array), far smaller than
    the quadratic join it feeds."""
    src = df
    if partitions:
        src = src.repartition(partitions)
    base = src.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        _word_ngrams(text_col, n).alias("__g"),
    ).withColumn("__n", F.size("__g"))
    return base.localCheckpoint(eager=False)


def _block_match(block_cols: tuple[str, ...]):
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols] or [
        F.lit(True)
    ]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    return cond


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = (),
    n: int = 2,
    threshold: float = 0.5,
    partitions: int | None = None,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Exact word-n-gram Jaccard over all pairs WITHIN a blocking key.

    The blocking key bounds the quadratic blow-up (pairs only form inside
    one shuffle bucket). With no block_cols this is a full cross-pair —
    O(n²) in both candidate generation AND the array-intersect verify, so
    the caller must opt in explicitly with ``allow_unblocked=True``
    (provably small inputs only); otherwise an empty ``block_cols``
    raises rather than silently planning a cross-join."""
    if not block_cols and not allow_unblocked:
        raise ValueError(
            "ngram_jaccard_pairs without block_cols is a full cross-pair; "
            "pass allow_unblocked=True to opt in on provably small inputs"
        )
    base = _gram_base(df, id_col, text_col, block_cols, n, partitions)
    a, b = base.alias("a"), base.alias("b")
    cond = _block_match(block_cols)
    # Sound size prefilter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs
    # whose gram counts differ by more than the threshold ratio can never
    # reach it — prune BEFORE the O(|A|+|B|) intersect. Same result set.
    size_ok = (
        F.least(F.col("a.__n"), F.col("b.__n")).cast("double")
        >= F.lit(threshold) * F.greatest(F.col("a.__n"), F.col("b.__n"))
    )
    inter = F.size(F.array_intersect(F.col("a.__g"), F.col("b.__g"))).cast("double")
    # |A∪B| = |A| + |B| − |A∩B| on the already-distinct gram arrays —
    # the sizes are precomputed per side, so the per-pair array_union
    # hash-set build (as costly as the intersect) is pure waste (r12
    # optimization, guide §2.3). Same integers, same IEEE quotient.
    union = (
        F.col("a.__n") + F.col("b.__n")
    ).cast("double") - inter
    return (
        a.join(b, cond & (F.col("a.__id") < F.col("b.__id")) & size_ok)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = (),
    n: int = 2,
    threshold: float = 0.8,
    partitions: int | None = None,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Directed n-gram CONTAINMENT within a blocking key: pairs where the
    smaller doc's gram set is ≥``threshold`` inside the larger's —
    |A∩B| / |A| with A the smaller side. This is the near-dup mode
    symmetric Jaccard structurally misses: a tweet quoted inside an
    article has tiny Jaccard (the union is the article) but containment
    ≈ 1; boilerplate inclusion, excerpt pages, and truncated re-crawls
    all look like this in web corpora.

    Same skeleton (and the same anti-cross-join guard) as
    :func:`ngram_jaccard_pairs`: gram relation materialized once, pairs
    only form inside one shuffle bucket. Direction is canonical —
    smaller gram set (id tiebreak) is the contained candidate — so each
    unordered pair is tested exactly once. No size prefilter exists for
    containment (a 10-gram doc can sit fully inside a 10k-gram doc);
    the blocking key is the only quadratic bound, which is the honest
    statement of this metric's cost."""
    if not block_cols and not allow_unblocked:
        raise ValueError(
            "containment_pairs without block_cols is a full cross-pair; "
            "pass allow_unblocked=True to opt in on provably small inputs"
        )
    base = _gram_base(df, id_col, text_col, block_cols, n, partitions)
    a, b = base.alias("a"), base.alias("b")
    cond = _block_match(block_cols)
    canonical = (F.col("a.__n") < F.col("b.__n")) | (
        (F.col("a.__n") == F.col("b.__n")) & (F.col("a.__id") < F.col("b.__id"))
    )
    inter = F.size(F.array_intersect(F.col("a.__g"), F.col("b.__g"))).cast("double")
    return (
        a.join(b, cond & canonical)
        .select(
            F.col("a.__id").alias("contained_id"),
            F.col("b.__id").alias("container_id"),
            (inter / F.col("a.__n").cast("double")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "contained_id",
            "container_id",
            F.round("containment", 6).alias("containment"),
        )
    )


def fuzzy_pairs_edit1(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 64,
) -> DataFrame:
    """Approximate string self-join: pairs within Levenshtein distance 1,
    without an all-pairs comparison — deletion-neighborhood blocking.

    Every string generates len+1 keys: itself plus each single-character
    deletion. Two strings at edit distance ≤1 (one substitution,
    insertion, or deletion) are GUARANTEED to share a key — deleting the
    edited position on whichever side carries it lands both on the same
    variant — so an equi-join on the variant key finds every true pair
    and the exact ``levenshtein`` check discards the false ones (strings
    that share a deletion variant can be at distance 2). This is the
    classic SymSpell/FastSS decomposition.

    Scale shape: row explosion is len+1 per string — built for SHORT
    strings (titles, names, URLs, codes); ``max_len`` guards against a
    long-text caller turning the explode into the corpus × text-length.
    One shuffle on the variant key; candidate multiplicity is bounded by
    alphabet statistics, and the verify is O(len²) per candidate pair
    only. For distance ≤ 1 the neighborhood is exact — no recall loss,
    unlike MinHash/SimHash which trade recall for bigger distances.

    Output: (id_a, id_b, dist) with id_a < id_b, dist ≤ 1, distinct.
    """
    s = F.col("__s")
    variants = F.array_union(
        F.array(s),
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substr(s, F.lit(1), i - 1),
                F.substr(s, i + 1, F.length(s) - i),
            ),
        ),
    )
    # Execution-time guard, not an eager pre-scan: the operator stays
    # lazy, and a long-text caller fails loudly instead of exploding the
    # corpus by its text length.
    checked = F.when(
        F.length(s) > max_len,
        F.raise_error(
            F.format_string(
                "fuzzy_pairs_edit1 is a short-string operator: row length "
                "%d exceeds max_len "
                f"{max_len}; raise max_len only if the len+1-per-row "
                "explode cost is understood",
                F.length(s),
            )
        ),
    ).otherwise(s)
    base = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__s"))
        .withColumn("__s", checked)
        .withColumn("__var", F.explode(variants))
        .select("__id", "__s", "__var")
    )
    a, b = base.alias("a"), base.alias("b")
    dist = F.levenshtein(F.col("a.__s"), F.col("b.__s"))
    return (
        a.join(b, on="__var")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= 1)
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_estimate_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    num_hashes: int = 8,
    bands: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Estimator-quality audit: for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (matching signature slots / num_hashes) next to the
    exact hashed-shingle-set Jaccard, with the absolute error.

    This is the self-check a dedup pipeline should ship with: the
    estimate's error distribution tells you whether ``num_hashes`` is
    sized right for the dedup threshold (E[err] ~ sqrt(J(1-J)/n)) before
    trusting estimate-only pruning at full scale. Candidate generation is
    deliberately UNSALTED (no hot-bucket cap): the audit must see every
    band-bucket pair exhaustively — run it on a sample, not the full
    corpus; the production path (:func:`minhash_near_dups`) keeps the
    guard. Both the estimate and the exact value are integer-count ratios
    (correctly-rounded single divisions), so the audit replays exactly on
    any engine with the same md5 hash family.

    Output: (id_a, id_b, est_jaccard, hash_jaccard, abs_err), rounded to
    6 places after the exact-arithmetic compare.
    """
    # ONE trunk relation carries both the signature slots and the hash
    # set (r13, guide §2.4 — VERDICT r12 item 5): each candidate side
    # joins the combined aggregate ONCE instead of once for signatures
    # and once for hash sets — 4 joins of the pair relation → 2, and the
    # two per-side trunk scans collapse into one ReuseExchange subtree.
    both = _minhash_combined(df, id_col, text_col, k, num_hashes, partitions)
    sig = both.select("__id", *[f"__m{i}" for i in range(num_hashes)])
    banded = _banded_signature(sig, num_hashes, bands)
    ba, bb = banded.alias("a"), banded.alias("b")
    cands = (
        ba.join(bb, on=["band", "key"], how="inner")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    if partitions:
        cands = cands.repartition(partitions)
    sa = both.select(
        F.col("__id").alias("id_a"),
        F.col("__hs").alias("__ha"),
        *[F.col(f"__m{i}").alias(f"__a{i}") for i in range(num_hashes)],
    )
    sb = both.select(
        F.col("__id").alias("id_b"),
        F.col("__hs").alias("__hb"),
        *[F.col(f"__m{i}").alias(f"__b{i}") for i in range(num_hashes)],
    )
    matches = None
    for i in range(num_hashes):
        m = F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
        matches = m if matches is None else matches + m
    est = matches.cast("double") / F.lit(float(num_hashes))
    inter = F.size(F.array_intersect(F.col("__ha"), F.col("__hb"))).cast("double")
    union = (F.size("__ha") + F.size("__hb")).cast("double") - inter
    jac = inter / union
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("__est", est)
        .withColumn("__jac", jac)
        .select(
            "id_a",
            "id_b",
            F.round("__est", 6).alias("est_jaccard"),
            F.round("__jac", 6).alias("hash_jaccard"),
            F.round(F.abs(F.col("__est") - F.col("__jac")), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup (token-window fingerprints)
# ---------------------------------------------------------------------------


def _window_fp_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    partitions: int | None = None,
) -> DataFrame:
    """(id, __pos, __fp) — one row per stride-1 ``window``-token sliding
    window; ``__pos`` is the window's 1-based start token index, ``__fp``
    its md5 fingerprint over the single-space-joined tokens. The shared
    first stage of the whole substring-dedup family.

    r12 shape (guide §4.1, the :func:`hashed_shingles` precedent): the
    start offsets explode FIRST and each fingerprint is a plain
    slice → array_join → md5 projection, so the whole stage runs as ONE
    WholeStageCodegen span. The previous shape built the full fingerprint
    array per document with an interpreted higher-order ``transform``
    lambda — per-element interpreted eval plus one large array allocation
    per doc. Values are identical (same tokens, same join, same md5).

    Docs shorter than ``window`` emit nothing: the pre-explode filter
    replaces the CASE guard the transform needed (``sequence(1, n)``
    DESCENDS for n < 1 instead of returning empty).

    ``partitions`` spreads the pre-explode projection — the per-position
    md5 is CPU-big/byte-small, so a few-split fixture scan must fan out;
    callers reading a well-partitioned 100 TB layout leave it None."""
    t = df.select(F.col(id_col), tokens_ws(text_col).alias("__t"))
    if partitions:
        t = t.repartition(partitions)
    n = F.size("__t")
    rows = t.filter(n >= window).select(
        F.col(id_col),
        "__t",
        F.explode(F.sequence(F.lit(1), n - F.lit(window - 1))).alias("__p"),
    )
    return rows.select(
        F.col(id_col),
        F.col("__p").cast("long").alias("__pos"),
        F.md5(
            F.array_join(F.slice("__t", F.col("__p"), F.lit(window)), " ")
        ).alias("__fp"),
    )


def exact_substring_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    max_docs_per_window: int = 32,
    partitions: int | None = None,
) -> DataFrame:
    """Substring-level exact duplication report (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    VERBATIM repeated token spans shared across otherwise-distinct
    documents — the dedup modality doc-level hashing (whole-text md5)
    and near-dup families (MinHash/SimHash, which score global
    similarity) both miss: two long articles quoting the same 50-token
    boilerplate paragraph are neither exact dups nor globally similar,
    yet the span is memorization fuel.

    The published implementation builds a corpus-wide suffix array — a
    single-machine shape. The Spark-native equivalent is sharded window
    fingerprinting: every ``window``-token sliding window (stride 1,
    exactly the suffix-array granularity) is hashed to a 128-bit md5
    fingerprint; windows sharing a fingerprint across documents ARE the
    repeated spans (md5 collisions are negligible at any corpus size).
    Everything downstream is equi-join/group-by on the fingerprint —
    shuffle-parallel, nothing quadratic in the corpus.

    Hot-fingerprint guard (SCALING.md lesson 2 — any self-join key needs
    an absolute occupancy bound): a span shared by k documents creates
    k·(k−1)/2 pair rows, so fingerprints occurring in more than
    ``max_docs_per_window`` documents are classed as STOP SPANS
    (site-wide boilerplate — the published pipelines drop or
    special-case these too) and excluded from pairing. The bound is
    deterministic content arithmetic, so the DuckDB oracle replays it
    exactly.

    Returns one row per unordered document pair sharing at least one
    non-stop window: (doc_a, doc_b, shared_windows, windows_a,
    windows_b) — counts are DISTINCT window fingerprints, so
    ``shared_windows / least(windows_a, windows_b)`` is a containment
    ratio ready for a decontamination threshold.

    Scale shape (100 TB): fingerprinting is a higher-order-function
    projection at scan speed (one md5 per token position — linear in
    corpus tokens, the same cost Lee et al.'s suffix array pays);
    dedup + occupancy count + pairing are group-bys/joins keyed on the
    fingerprint; per-fingerprint pair fanout is capped at
    ``max_docs_per_window``² by the stop-span bound."""
    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    if max_docs_per_window < 2:
        raise ValueError("max_docs_per_window must be >= 2")
    fps = (
        _window_fp_rows(df, id_col, text_col, window, partitions)
        .select(F.col(id_col), "__fp")
        .distinct()
    )
    # Four consumers (pair sides a/b, occupancy counts, per-doc counts)
    # would each re-run tokenize + per-position md5 over the whole
    # corpus; materialize the fingerprint trunk once instead (non-eager
    # localCheckpoint — the house pattern, see _banded_signature). An
    # ingest-time pipeline would persist this table anyway.
    fps = fps.localCheckpoint(eager=False)
    per_doc = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("__nw"))
    ok = (
        fps.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(
            (F.col("__nd") >= 2) & (F.col("__nd") <= max_docs_per_window)
        )
        .select("__fp")
    )
    a = fps.select(F.col(id_col).alias("doc_a"), "__fp").join(ok, "__fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "__fp")
    pairs = (
        a.join(b, "__fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_windows"))
    )
    na = per_doc.select(
        F.col(id_col).alias("doc_a"), F.col("__nw").alias("windows_a")
    )
    nb = per_doc.select(
        F.col(id_col).alias("doc_b"), F.col("__nw").alias("windows_b")
    )
    return pairs.join(na, "doc_a").join(nb, "doc_b").select(
        "doc_a",
        "doc_b",
        "shared_windows",
        F.col("windows_a").cast("long").alias("windows_a"),
        F.col("windows_b").cast("long").alias("windows_b"),
    )


def substring_dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """The REMOVAL side of substring-level dedup (Lee et al. 2022): for
    every verbatim ``window``-token span that appears in more than one
    document, keep the copy in the LOWEST-doc_id owner and mark every
    other occurrence's token range for deletion. Output one row per
    maximal deletable span: (doc_id, span_start, span_end, span_tokens)
    in 1-based token coordinates — overlapping/adjacent marked windows
    are merged (gaps-and-islands), so a long shared paragraph comes back
    as ONE span, not window-count rows.

    Unlike :func:`exact_substring_pairs` this needs NO pair join and no
    stop-span bound: marking is (fingerprint → occurrence-count +
    owner) group-by, then one equi-join back — hot boilerplate spans are
    exactly what a dedup pass SHOULD mark everywhere but one place, and
    they cost one join row per occurrence, never O(k²). Policy notes:
    the owner keeps all its occurrences (including within-doc repeats —
    intra-doc repetition is the repetition filter's job,
    operators/text.repetition_stats); owner choice is min doc_id for
    determinism, matching exact-dedup survivorship.

    Scale shape (100 TB): fingerprints are linear in corpus tokens; one
    group-by on the fingerprint, one join back, one partitioned window
    per doc for the island merge. Everything keys on fingerprint or
    doc — shuffle-parallel, nothing quadratic, no driver-side state."""
    from pyspark.sql import Window

    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    wins = _window_fp_rows(df, id_col, text_col, window, partitions)
    wins = wins.localCheckpoint(eager=False)  # two consumers, one scan
    shared = (
        wins.groupBy("__fp")
        .agg(
            F.count_distinct(F.col(id_col)).alias("__nd"),
            F.min(id_col).alias("__owner"),
        )
        .filter(F.col("__nd") >= 2)
        .select("__fp", "__owner")
    )
    marked = (
        wins.join(shared, "__fp")
        .filter(F.col(id_col) != F.col("__owner"))
        .select(id_col, "__pos")
        .distinct()
    )
    w_doc = Window.partitionBy(id_col).orderBy("__pos")
    prev = F.lag("__pos").over(w_doc)
    # coverage of a window at pos p is [p, p+window-1]; a new island
    # starts when this window no longer overlaps/abuts the previous one
    new_island = F.when(
        prev.isNull() | (F.col("__pos") > prev + F.lit(window)), 1
    ).otherwise(0)
    isl = marked.withColumn(
        "__isl",
        F.sum(new_island).over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        isl.groupBy(id_col, "__isl")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.max("__pos") + F.lit(window) - 1).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def apply_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Apply the :func:`substring_dedup_spans` removal plan — the final
    stage of Lee et al. 2022's pipeline: drop every deletable span's
    tokens and return the rewritten corpus, one row per input document:
    (id, n_tokens_before, n_tokens_after, text_deduped). Documents with
    no deletable spans pass through with their token-normalized text
    (single-space joined — the rewrite is defined over tokens, so
    whitespace is canonicalized for every row, not just edited ones).

    The span plan aggregates to at most a handful of (start, end) pairs
    per document (``collect_list`` bounded by spans-per-doc, which the
    island merge already minimized); the rewrite itself is a pure
    higher-order-function projection — position-filter the token array
    against the span list, no UDF, no extra shuffle beyond the plan's
    own group-bys plus one left join back to the corpus."""
    spans = (
        substring_dedup_spans(df, id_col, text_col, window, partitions)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("__sp")
        )
    )
    base = df.select(F.col(id_col), tokens_ws(text_col).alias("__t"))
    j = base.join(spans, id_col, "left").withColumn(
        "__sp",
        F.coalesce(
            F.col("__sp"),
            F.expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)"),
        ),
    )
    kept = F.expr(
        "transform("
        "  filter("
        "    transform(__t, (tok, i) -> struct(tok AS tok, i + 1 AS p)),"
        "    x -> NOT exists(__sp, sp -> x.p >= sp.s AND x.p <= sp.e)),"
        "  x -> x.tok)"
    )
    return j.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_tokens_before"),
        F.size(kept).cast("long").alias("n_tokens_after"),
        F.array_join(kept, " ").alias("text_deduped"),
    )


def longest_shared_substring(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    max_docs_per_window: int = 32,
    partitions: int | None = None,
) -> DataFrame:
    """Longest verbatim shared token span per document pair — the
    contamination-LENGTH metric (a 200-token verbatim overlap is a leak;
    a single 16-token boilerplate hit may not be): (doc_a, doc_b,
    longest_shared_tokens, n_matched_windows).

    A run of k CONSECUTIVE matched windows (positions advancing by 1 in
    BOTH documents) certifies a shared span of exactly k + window − 1
    tokens, so the suffix-array "longest common substring" reduces to
    gaps-and-islands on the matched-window DIAGONAL (pos_a − pos_b):
    within one (pair, diagonal), consecutive pos_a values are one run.
    Same hot-fingerprint stop-span bound as
    :func:`exact_substring_pairs` (SCALING.md lesson 2).

    Scale shape (100 TB): window fingerprints are linear in corpus
    tokens; matches are an equi-join on the fingerprint with pair
    fanout capped by the occupancy bound; the island scan is one
    partitioned window over (pair, diagonal) — shuffle-parallel."""
    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    if max_docs_per_window < 2:
        raise ValueError("max_docs_per_window must be >= 2")
    from pyspark.sql import Window as W

    wins = _window_fp_rows(df, id_col, text_col, window, partitions)
    wins = wins.localCheckpoint(eager=False)
    ok = (
        wins.groupBy("__fp")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(
            (F.col("__nd") >= 2) & (F.col("__nd") <= max_docs_per_window)
        )
        .select("__fp")
    )
    a = wins.select(
        F.col(id_col).alias("doc_a"), F.col("__pos").alias("__pa"), "__fp"
    ).join(ok, "__fp")
    b = wins.select(
        F.col(id_col).alias("doc_b"), F.col("__pos").alias("__pb"), "__fp"
    )
    m = (
        a.join(b, "__fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "__pa",
            (F.col("__pa") - F.col("__pb")).alias("__diag"),
        )
    )
    w_diag = W.partitionBy("doc_a", "doc_b", "__diag").orderBy("__pa")
    prev = F.lag("__pa").over(w_diag)
    new_run = F.when(prev.isNull() | (F.col("__pa") > prev + 1), 1).otherwise(0)
    runs = m.withColumn(
        "__run",
        F.sum(new_run).over(
            w_diag.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        runs.groupBy("doc_a", "doc_b", "__diag", "__run")
        .agg(F.count(F.lit(1)).alias("__len"))
        .groupBy("doc_a", "doc_b")
        .agg(
            (F.max("__len") + F.lit(window) - 1)
            .cast("long")
            .alias("longest_shared_tokens"),
            F.sum("__len").cast("long").alias("n_matched_windows"),
        )
    )


def substring_probe_new(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Ingest-time substring-level contamination probe — the
    batch-arrival twin of :func:`exact_substring_pairs`, shaped like
    :func:`minhash_probe_new`: score each NEW document by how much of
    it is verbatim spans already present in the corpus, BEFORE it is
    admitted. Output one row per batch doc: (id, n_windows,
    n_hit_windows, longest_hit_run_tokens) — ``n_hit_windows /
    n_windows`` is the duplication fraction (Lee et al. 2022's
    dup-span share), ``longest_hit_run_tokens`` the longest verbatim
    span copied from the corpus (0 / no-window docs score (0, 0, 0)).

    Only the batch×corpus quadrant is computed: the corpus side
    collapses to its DISTINCT window-fingerprint set (the index an
    ingest pipeline persists once and reuses per batch), and the join
    is batch-windows ⋈ corpus-fingerprints — never corpus×corpus, so
    per-batch cost is O(batch tokens + matched windows) however big
    the corpus is. Longest-run detection is gaps-and-islands over the
    batch doc's hit positions (consecutive hit windows extend the
    verbatim span by one token each)."""
    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    from pyspark.sql import Window as W

    corpus_fps = (
        _window_fp_rows(corpus, id_col, text_col, window, partitions)
        .select("__fp")
        .distinct()
    )
    bw = _window_fp_rows(
        batch, id_col, text_col, window, partitions
    ).localCheckpoint(eager=False)
    hits = bw.join(corpus_fps, "__fp").select(id_col, "__pos")
    w_doc = W.partitionBy(id_col).orderBy("__pos")
    prev = F.lag("__pos").over(w_doc)
    new_run = F.when(prev.isNull() | (F.col("__pos") > prev + 1), 1).otherwise(0)
    runs = (
        hits.withColumn(
            "__run",
            F.sum(new_run).over(
                w_doc.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy(id_col, "__run")
        .agg(F.count(F.lit(1)).alias("__len"))
        .groupBy(id_col)
        .agg(
            F.sum("__len").cast("long").alias("n_hit_windows"),
            (F.max("__len") + F.lit(window) - 1)
            .cast("long")
            .alias("longest_hit_run_tokens"),
        )
    )
    per_doc = bw.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    return (
        batch.select(id_col)
        .join(per_doc, id_col, "left")
        .join(runs, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_hit_windows", F.lit(0))
            .cast("long")
            .alias("n_hit_windows"),
            F.coalesce("longest_hit_run_tokens", F.lit(0))
            .cast("long")
            .alias("longest_hit_run_tokens"),
        )
    )


def cdc_chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    divisor: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Content-defined chunking dedup (the FastCDC/rsync idea at token
    granularity): chunk boundaries are drawn where a rolling window
    fingerprint hits ``hash % divisor == 0``, so boundaries MOVE WITH
    THE CONTENT — an insertion early in a document shifts every byte
    offset but leaves all downstream chunk boundaries (and therefore
    chunk fingerprints) intact. This is the storage/transfer-level dedup
    modality the fixed-stride families can't express: exact_substring
    (stride-1 windows) finds shared spans, CDC finds shared chunks that
    survive edits elsewhere in the document.

    A chunk starts at token position j iff the md5 of the ``window``
    tokens from j maps to 0 mod ``divisor`` (expected chunk length ≈
    ``divisor`` tokens); position 1 always starts chunk 0. Production
    CDC adds min/max chunk clamps — deliberately omitted here because
    the clamp is inherently sequential (a boundary suppresses neighbors)
    and would cost the closed relational form; the unclamped variant is
    still a pure function of content with the same shift-invariance.

    Returns cross-document duplicate chunks: ``(chunk_fp, n_docs,
    n_chunks, len_tokens, min_doc_id)`` for fingerprints seen in ≥ 2
    distinct docs.

    Scale shape: one md5 per token position (same linear cost class as
    the substring-dedup fingerprint stage), a per-doc cumulative-sum
    window (partitioned on the doc id — never global), and one
    fingerprint group-by; no self-joins at all — dedup falls out of the
    hash group-by."""
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col).alias("__id"), tokens_ws(text_col).alias("__t")
    )
    if partitions:
        base = base.repartition(partitions)
    n = F.size("__t")
    # r12 (guide §4.1, the _window_fp_rows precedent): explode the token
    # positions first, then compute the boundary flag as a plain
    # slice → array_join → md5 projection per row — one WholeStageCodegen
    # span instead of an interpreted per-element transform lambda plus an
    # arrays_zip allocation per doc. Same md5 inputs → same flags.
    flag = (
        F.when(
            F.col("pos") <= F.size("__t") - F.lit(window - 1),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cdc:"),
                                F.array_join(
                                    F.slice(
                                        "__t", F.col("pos"), F.lit(window)
                                    ),
                                    " ",
                                ),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(divisor),
            )
            == 0,
        )
        .otherwise(F.lit(False))
        .cast("int")
    )
    rows = base.filter(n > 0).select(
        "__id", "__t", F.explode(F.sequence(F.lit(1), n)).alias("pos")
    ).select(
        "__id",
        "pos",
        F.element_at("__t", F.col("pos")).alias("tok"),
        flag.alias("flag"),
    )
    cum = W.partitionBy("__id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, 0
    )
    chunked = rows.withColumn("chunk_id", F.sum("flag").over(cum))
    chunks = chunked.groupBy("__id", "chunk_id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("pos", F.col("tok").alias("t")))
            ).getField("t"),
            " ",
        ).alias("chunk_text"),
        F.count(F.lit(1)).cast("long").alias("len_tokens"),
    )
    fp = chunks.select(
        "__id",
        F.md5(F.col("chunk_text")).alias("chunk_fp"),
        "len_tokens",
    )
    return (
        fp.groupBy("chunk_fp")
        .agg(
            F.countDistinct("__id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.max("len_tokens").cast("long").alias("len_tokens"),
            F.min("__id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def jaccard_prefix_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_pct: int = 60,
    ngram: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """EXACT Jaccard similarity join via prefix filtering (the
    PPJoin/AllPairs family, Bayardo et al. 2007 / Xiao et al. 2008) —
    the lossless alternative to MinHash-LSH: every pair with
    J ≥ threshold is found (no probabilistic recall), yet the candidate
    space is nowhere near all-pairs.

    The filter: order each doc's element set by GLOBAL frequency
    ascending (rarest first, ties by element); if two sets reach
    J ≥ t, they must share at least one element inside each other's
    first ``|d| − ⌈t·|d|⌉ + 1`` elements — so candidates are generated
    by an equi-join on PREFIX elements only, and rare-first ordering
    makes those join keys the least-frequent elements in the corpus
    (bucket occupancy is bounded by construction — the frequent
    elements that would explode the join never enter a prefix).
    A length filter (``100·min ≥ t_pct·max``) prunes before
    verification; exact set intersection verifies survivors.

    Elements are distinct word ``ngram``-grams (doc-level token sets are
    degenerate on small vocabularies — measured 57% of ALL pairs pass
    t=0.6 on unigrams vs the 25 true near-dup pairs on bigrams).

    Returns ``(doc_a, doc_b, n_inter, n_union, jaccard_micro)`` with
    doc_a < doc_b; all comparisons integer cross-multiplies. The DuckDB
    oracle runs the naive all-pairs join — oracle equality IS the
    completeness proof of the prefix filter.

    Scale shape: one frequency aggregate, one per-doc sort (inside the
    row, array_sort), prefix explode (≈ (1−t)·|d|+1 elements per doc),
    equi-join on rare keys, verification only on candidates. Ref for
    contrast: minhash_candidates (probabilistic, banded)."""
    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__txt")
    )
    if partitions:
        base = base.repartition(partitions)
    el = base.select(
        "__id",
        F.explode(_word_ngrams("__txt", ngram)).alias("elem"),
    )
    # Global document frequency as a COUNT window over the element
    # partition: ONE exchange of the element relation, where the former
    # groupBy + equi-join shipped it twice (once as aggregate partials,
    # once as the join probe side) — r12 optimization, guide §2.1. The
    # hot-element placement is identical (the join also co-located every
    # occurrence of an element), so no new skew. The sorted element
    # array projects its field natively (GetArrayStructFields) instead
    # of an interpreted per-element transform lambda.
    from pyspark.sql import Window

    with_df = el.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("elem"))
    )
    ordered = (
        with_df.groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__df"), F.col("elem").alias("e"))
                )
            ).getField("e").alias("arr")
        )
        .select(
            "__id", "arr", F.size("arr").cast("long").alias("sz")
        )
        # NOT localCheckpointed despite three consumers: measured 3.3 s
        # plan-shared vs 7.5 s checkpointed at sf0.1 — the materialized
        # relation carries every doc's full element array, so the
        # checkpoint blocks column pruning (the prefix branch needs only
        # a slice) and serializes wide rows three times; the recomputed
        # trunk is cheaper than reading it back (the inverse of the
        # _gram_base case, whose shared relation feeds a quadratic join)
    )
    # prefix length = sz - ceil(t*sz) + 1, all-integer
    plen = (
        F.col("sz")
        - F.expr(f"(sz * {threshold_pct} + 99) div 100")
        + F.lit(1)
    )
    prefix = ordered.select(
        "__id", "sz", F.explode(F.slice("arr", 1, plen)).alias("elem")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.elem") == F.col("b.elem"))
            & (F.col("a.__id") < F.col("b.__id"))
            # length filter: J >= t requires t*max <= min
            & (
                F.least(F.col("a.sz"), F.col("b.sz")) * 100
                >= F.greatest(F.col("a.sz"), F.col("b.sz"))
                * threshold_pct
            ),
        )
        .select(
            F.col("a.__id").alias("ida"), F.col("b.__id").alias("idb")
        )
        .distinct()
    )
    av = ordered.select(
        F.col("__id").alias("ida"),
        F.col("arr").alias("arr_a"),
        F.col("sz").alias("sz_a"),
    )
    bv = ordered.select(
        F.col("__id").alias("idb"),
        F.col("arr").alias("arr_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
    verified = (
        cand.join(av, "ida")
        .join(bv, "idb")
        .withColumn("n_inter", inter)
        .withColumn(
            "n_union", F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
        )
        .filter(F.col("n_inter") * 100 >= F.col("n_union") * threshold_pct)
    )
    return verified.select(
        F.col("ida").alias("doc_a"),
        F.col("idb").alias("doc_b"),
        "n_inter",
        "n_union",
        F.expr("(1000000 * n_inter) div n_union").alias("jaccard_micro"),
    )
