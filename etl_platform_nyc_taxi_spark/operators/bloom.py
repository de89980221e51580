"""Bloom-filter decontamination (approximate membership at corpus scale).

The exact benchmark-decontamination gate (operators/text.contamination_check)
joins every training n-gram against the full eval n-gram set. At 100 TB the
eval set itself can be large enough that shipping it as a join relation to
every probe is the bottleneck; the standard production answer (Dolma's
dedup tooling, CCNet) is a Bloom filter: insert every eval n-gram, probe
every training n-gram, accept a tunable false-positive rate in exchange for
a fixed-size membership structure.

This module implements the Bloom filter RELATIONALLY so the whole pipeline
stays oracle-checkable: the "filter" is the distinct set of bit positions
(``k`` md5-derived positions per inserted gram, modulo ``m_bits``), and a
probe hits iff all ``k`` of its positions join. Semantically identical to
the bitmap form — a position is either set or not — but every step is a
DataFrame op with an exact DuckDB replay. On a real cluster the positions
relation is at most ``min(m_bits, k·|eval grams|)`` distinct ints (~1 MB at
the default 2^17 bits), so Spark broadcasts it to every probe task: the
probe stage reads the training corpus exactly once and never shuffles it.
(Spark's native ``BloomFilter`` aggregate / runtime bloom-join pruning is
the same idea engine-side; the relational form is what makes the result
verifiable bit-for-bit.)

Hash family: position_j(gram) = int48(md5('bloom' || j || ':' || gram))
mod m_bits, j = 1..k — the repo's portable md5 family
(functions/hashing.py), replayed in DuckDB as
``CAST('0x' || substr(md5(...), 1, 12) AS BIGINT) % m_bits``.

Sizing: ``m_bits`` is a fixed power of two here (oracle determinism); in
production you size it from the eval-set cardinality (m ≈ -n·ln(p)/ln(2)²)
— the false-positive audit (:func:`bloom_fp_audit` consumers) is exactly
the measurement that tells you whether the chosen size holds at your scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.text import tokens_ws

#: Default filter size in bits (2^17). Small enough that the sf0.1 fixture
#: produces a measurable false-positive rate for the audit query; the
#: positions relation is ≤ 1 MB so the probe join always broadcasts.
DEFAULT_M_BITS = 1 << 17

#: Default hash count per gram.
DEFAULT_K = 3


def _distinct_word_ngrams(text_col: Column, n: int) -> Column:
    """DISTINCT word n-grams of a doc as array<string> (clamped like
    text.word_ngrams: docs shorter than n yield one whole-doc gram)."""
    toks = tokens_ws(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def _positions(gram: Column, j: Column, m_bits: int) -> Column:
    """j-th Bloom position of a gram — portable md5 family, 48-bit int
    modulo ``m_bits`` (always non-negative)."""
    key = F.concat(F.lit("bloom"), j.cast("string"), F.lit(":"), gram)
    return (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
        % F.lit(m_bits)
    ).alias("pos")


def bloom_build(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """Insert every distinct word n-gram of ``eval_df`` into the filter:
    returns the distinct set-bit positions as a 1-column relation
    ``(pos long)``. Bounded by ``min(m_bits, k·|grams|)`` rows — the
    broadcast side of every probe."""
    grams = eval_df.select(
        F.explode(_distinct_word_ngrams(F.col(text_col), n)).alias("__gram")
    ).distinct()
    js = F.array([F.lit(j) for j in range(1, k + 1)])
    return (
        grams.select(
            F.explode(js).alias("__j"), F.col("__gram")
        )
        .select(_positions(F.col("__gram"), F.col("__j"), m_bits))
        .distinct()
    )


def bloom_probe_grams(
    train_df: DataFrame,
    bloom: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    partitions: int | None = None,
) -> DataFrame:
    """Probe every distinct (doc, n-gram) of the training corpus against
    the filter: ``(id, __gram, bloom_hit boolean)``.

    A gram hits iff ALL ``k`` of its positions are set — implemented as a
    LEFT equi-join of the k probe positions against the (broadcast)
    positions relation, then ``count(matched j) = k`` per (doc, gram).
    The left join preserves exactly k rows per (doc, gram), so the ONE
    aggregate emits every gram with its hit flag directly — the previous
    shape inner-joined, aggregated only the hits, and then sort-merge
    joined the (doc, gram) relation back to itself to restore misses,
    re-running the n-gram explode AND shuffling gram strings twice (r12
    optimization, guide §2.1/§3). The training side is read once and
    never shuffled against itself."""
    if partitions:
        train_df = train_df.repartition(partitions)
    grams = train_df.select(
        F.col(id_col).alias("__id"),
        F.explode(_distinct_word_ngrams(F.col(text_col), n)).alias("__gram"),
    )
    js = F.array([F.lit(j) for j in range(1, k + 1)])
    probes = grams.select(
        "__id", "__gram", F.explode(js).alias("__j")
    ).select(
        "__id",
        "__gram",
        _positions(F.col("__gram"), F.col("__j"), m_bits),
    )
    return (
        probes.join(
            F.broadcast(bloom.withColumn("__set", F.lit(True))),
            "pos",
            "left",
        )
        .groupBy("__id", "__gram")
        .agg(
            F.count("__set").alias("__n_set")
        )
        .select(
            "__id",
            "__gram",
            (F.col("__n_set") == k).alias("bloom_hit"),
        )
    )


def bloom_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    flag_pct: int = 5,
    partitions: int | None = None,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """Per training doc: ``(id, n_grams, n_bloom_hits, flagged)`` where
    ``flagged`` = bloom-hit share of the doc's distinct n-grams exceeds
    ``flag_pct`` percent (pure integer cross-multiply — no float ratio, so
    the flag replays exactly in any engine).

    False positives only ever ADD hits, so a Bloom flag set is a superset
    of the exact gate's flag set at the same threshold — the safe
    direction for decontamination (you drop slightly more than needed,
    never leak eval data).

    Pass ``bloom`` (a prebuilt :func:`bloom_build` positions relation for
    the SAME n/k/m_bits — the ingest-time artifact) to skip rebuilding
    the filter per call; streaming folds build it once per run
    (streaming/ingest.py)."""
    if bloom is None:
        if eval_df is None:
            raise ValueError(
                "bloom_decontaminate needs an eval_df to build the filter "
                "from, or a prebuilt bloom positions relation — got neither"
            )
        bloom = bloom_build(eval_df, text_col, n, k, m_bits)
    probed = bloom_probe_grams(
        train_df, bloom, id_col, text_col, n, k, m_bits, partitions
    )
    return (
        probed.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.col("bloom_hit").cast("long"))
            .cast("long")
            .alias("n_bloom_hits"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            "n_bloom_hits",
            (
                F.col("n_bloom_hits") * 100 > F.col("n_grams") * flag_pct
            ).alias("flagged"),
        )
    )


def bloom_fp_audit(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    partitions: int | None = None,
) -> DataFrame:
    """Measure the filter's false-positive behavior against exact
    membership, per ``group_col``: ``(group, n_docs, n_grams,
    n_bloom_hits, n_true_hits, n_false_pos, fp_ppm)``.

    ``fp_ppm`` = false positives per million NON-member probes (the
    textbook FP rate), as an integer ``floor(1e6·fp/(probes−members))`` —
    division happens once per group on exact integer counts, so both
    engines floor the same IEEE quotient. This is the query you run after
    sizing ``m_bits``: if fp_ppm at production scale exceeds the budget,
    the filter is undersized (occupancy too high) and you double ``m``."""
    bloom = bloom_build(eval_df, text_col, n, k, m_bits)
    probed = bloom_probe_grams(
        train_df, bloom, id_col, text_col, n, k, m_bits, partitions
    )
    eval_grams = eval_df.select(
        F.explode(_distinct_word_ngrams(F.col(text_col), n)).alias("__gram")
    ).distinct()
    judged = probed.join(
        eval_grams.select("__gram", F.lit(True).alias("__member")),
        "__gram",
        "left",
    ).select(
        "__id",
        "bloom_hit",
        F.coalesce("__member", F.lit(False)).alias("true_hit"),
    )
    groups = train_df.select(
        F.col(id_col).alias("__id"), F.col(group_col).alias("grp")
    )
    per_group = judged.join(groups, "__id").groupBy("grp")
    return per_group.agg(
        F.countDistinct("__id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.col("bloom_hit").cast("long")).cast("long").alias("n_bloom_hits"),
        F.sum(F.col("true_hit").cast("long")).cast("long").alias("n_true_hits"),
        F.sum((F.col("bloom_hit") & ~F.col("true_hit")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
    ).select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_grams",
        "n_bloom_hits",
        "n_true_hits",
        "n_false_pos",
        F.floor(
            F.lit(1000000)
            * F.col("n_false_pos")
            / F.greatest(
                F.col("n_grams") - F.col("n_true_hits"), F.lit(1)
            ).cast("double")
        )
        .cast("long")
        .alias("fp_ppm"),
    )
