"""Preference & annotation analytics: Bradley-Terry strength estimation,
pairwise win matrices with Wilson confidence bounds, and inter-annotator
agreement (Fleiss' / Cohen's kappa) — the RLHF-preference-data slice of
the LLM-data-pipeline surface.

A preference pipeline at 100 TB is two very different workloads glued
together: a CORPUS-SIZED staging pass that turns raw judgments into a
per-pair win ledger (one shuffle, map-side combinable), and a
METADATA-SIZED estimation loop over the aggregated matrix (items² rows —
models/sources/annotators number in the tens, never the billions). This
module keeps that split explicit: :func:`stage_duels` /
:func:`duel_matrix` are the corpus half; :func:`bradley_terry`,
:func:`wilson_win_matrix`, :func:`fleiss_kappa`,
:func:`cohen_kappa_pairs` never touch a corpus-sized relation again.

**Determinism contract** (same discipline as operators/pq.py): every
estimate must replay value-for-value in the DuckDB oracle, so

* Bradley-Terry is the classic MM update (Hunter 2004, "MM algorithms
  for generalized Bradley-Terry models") run a FIXED number of rounds in
  exact integer arithmetic: strengths live in micro units, each pair's
  contribution ``n_ij / (s_i + s_j)`` is floored to micro
  (``n·10¹² // (s_i + s_j)``), the per-item denominator is an exact
  BIGINT sum (order-free), and the update ``W_i / denom`` is one more
  floored division. Strengths are clamped to ``[S_MIN, S_MAX]``
  (1000:1 odds saturate — the BT analogue of logit clipping), which
  also caps every intermediate below 2⁶³: exact for ledgers up to
  ~9·10⁶ wins per item; beyond that, thin the duel ledger upstream
  (deterministic mod-sampling), don't widen the integers.
* kappa statistics accumulate in exact BIGINTs (agreement counts,
  squared category marginals); the observed/expected ratios and the
  final (po−pe)/(1−pe) are a FIXED tree of correctly-rounded double
  scalar ops on those integers — portable because no float is ever
  summed, only divided/multiplied in an identical expression shape.
* Wilson bounds use only +,·,/,sqrt on values derived from exact
  integers — each correctly rounded, so portable without quantization.
* synthetic annotator noise derives from the md5-portable hash family
  (functions/hashing.portable_hash64), the same anchor the MinHash
  pipeline replays on.

Reference parity: the reference engine (/root/reference, two batch taxi
jobs) has no preference analytics; this module is part of the brief's
LLM-data-pipeline extension surface, sibling to sampling.py (mixing)
and nbayes.py (quality classification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.hashing import portable_hash64

#: Initial / unit strength in micro units (strength 1.0).
S0 = 1_000_000
#: Strength clamp in micro units: [0.001, 1000] — 1000:1 odds saturate,
#: and the cap bounds every MM intermediate below 2^63.
S_MIN = 1_000
S_MAX = 1_000_000_000
#: n·TERM_SCALE // (s_i + s_j) expresses n/(s_i+s_j) in micro units when
#: s is itself micro-scaled (1e6 · 1e6).
TERM_SCALE = 1_000_000_000_000
#: Fixed MM round count — unrolled in the oracle, looped in Spark.
BT_ITERS = 8
#: Duel staging blocks: row_number windows run inside (lang, id-block)
#: sub-partitions so no per-lang global sort exists at 100 TB.
DUEL_BLOCK = 1_024


def stage_duels(
    docs: DataFrame,
    item_col: str = "source",
    group_col: str = "lang",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Deterministic duel ledger: (item_a, item_b, win_a) — one row per
    comparison, ``item_a < item_b`` canonical.

    Staging CONTRACT (what the oracle replays): within each
    ``(group, id // DUEL_BLOCK)`` block, docs ordered by id pair up
    consecutively (rank 2k-1 vs 2k); an odd tail row sits out; same-item
    pairs are discarded; the higher ``score_col`` wins, ties to the
    lower id. Blocked windows keep the sort local — no per-group global
    row_number at corpus scale — and make the ledger reproducible
    shard-by-shard.

    Contract (ADVICE r12): ``id_col`` must be NON-NULL. The odd-tail
    sentinel is ``lead(id).isNotNull()``, so a NULL id arriving as a duel
    PARTNER would silently drop the pair (the pre-r12 rank split-join
    paired purely on row_number); NULL ids also make the window order and
    the ``__id div DUEL_BLOCK`` block assignment ill-defined. Every
    registry consumer passes a parquet primary key; filter or synthesize
    ids upstream before staging anything else.
    """
    from pyspark.sql import Window

    d = docs.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.col(item_col).alias("__item"),
        F.col(score_col).cast("long").alias("__score"),
    ).withColumn("__blk", F.expr(f"__id div {DUEL_BLOCK}"))
    w = Window.partitionBy("__g", "__blk").orderBy(F.col("__id").asc())
    # rank 2k−1 pairs with rank 2k ⇔ every odd-rank row pairs with the
    # NEXT row in the same window order: one lead() pass in the SAME
    # WindowExec as the row_number — no filtered split + self-join (r12,
    # guide §2.4: the former shape re-shuffled and sort-merge-joined the
    # two halves of a relation the window had already sorted). The odd
    # tail row's lead() is NULL ⇒ it sits out, exactly as before.
    r = d.select(
        "__item",
        "__score",
        "__id",
        F.row_number().over(w).alias("__rn"),
        F.lead("__item").over(w).alias("__i2"),
        F.lead("__score").over(w).alias("__s2"),
        F.lead("__id").over(w).alias("__id2"),
    )
    duel = (
        r.filter((F.col("__rn") % 2 == 1) & F.col("__id2").isNotNull())
        .select(
            F.col("__item").alias("__i1"),
            F.col("__score").alias("__s1"),
            F.col("__id").alias("__id1"),
            "__i2",
            "__s2",
            "__id2",
        )
        .filter(F.col("__i1") != F.col("__i2"))
        .withColumn(
            "__w1",
            (
                (F.col("__s1") > F.col("__s2"))
                | ((F.col("__s1") == F.col("__s2")) & (F.col("__id1") < F.col("__id2")))
            ).cast("int"),
        )
    )
    return duel.select(
        F.least("__i1", "__i2").alias("item_a"),
        F.greatest("__i1", "__i2").alias("item_b"),
        F.when(
            (F.col("__i1") < F.col("__i2")) & (F.col("__w1") == 1), 1
        )
        .when((F.col("__i1") > F.col("__i2")) & (F.col("__w1") == 0), 1)
        .otherwise(0)
        .alias("win_a"),
    )


def duel_matrix(duels: DataFrame) -> DataFrame:
    """(item_a, item_b, n, wins_a): the aggregated win matrix — the ONLY
    relation the estimation loop ever sees (items²-sized, map-side
    combinable from the corpus-sized ledger in one shuffle)."""
    return duels.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("win_a").cast("long").alias("wins_a"),
    )


def _bt_items(matrix: DataFrame) -> DataFrame:
    """Per-item duel totals: (item, n_duels, wins) from the matrix."""
    two = matrix.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("item"),
                    F.col("n").alias("n"),
                    F.col("wins_a").alias("w"),
                ),
                F.struct(
                    F.col("item_b").alias("item"),
                    F.col("n").alias("n"),
                    (F.col("n") - F.col("wins_a")).alias("w"),
                ),
            )
        ).alias("e")
    )
    return two.groupBy("e.item").agg(
        F.sum("e.n").cast("long").alias("n_duels"),
        F.sum("e.w").cast("long").alias("wins"),
    )


def bradley_terry(matrix: DataFrame, iters: int = BT_ITERS) -> DataFrame:
    """Bradley-Terry strengths via ``iters`` exact-integer MM rounds:
    (item, n_duels, wins, strength_micro, rnk), strengths normalized to
    mean 1.0 (sum = items·10⁶), rnk dense by strength desc (equal
    micro-strengths share a rank; rank depends only on the value
    multiset, so it is deterministic without an id tiebreak).

    Each round, per pair: ``term = n·10¹² // (s_a + s_b)`` (micro units
    of n/(s_a+s_b)); per item: ``denom = Σ term`` (exact BIGINT);
    update: ``s' = clamp(wins·10¹² // denom)``. Zero-win items pin to
    S_MIN instead of collapsing the denominator.

    Shape (r12, guide §1.2/§2.4): the matrix is items²-sized METADATA,
    so the whole MM loop folds over a single collected row — the matrix
    and item ledgers ``collect_list`` into one (``__es``, ``__its``)
    row and each round is ONE projection mapping the strength map
    ``__s{k} → __s{k+1}`` with exact-BIGINT ``div`` arithmetic (the
    per-edge term computes inside each endpoint's fold — same floored
    value, and BIGINT sums are order-free, so every strength is
    bit-identical to the former per-round join/aggregate loop; pinned
    by tests/test_preference.py). The previous shape ran 8 eager
    localCheckpoint rounds of broadcast-joins — ~40 scheduler
    round-trips and 0.4 s of actual compute (measured 5.2 s wall at
    sf0.1 → 0.7 s). Each round is a SEPARATE named column, so Catalyst
    analysis stays linear in ``iters`` (the bpe.py nested-fold lesson);
    CollapseProject keeps the rounds apart because each map is
    referenced many times by its successor. The corpus-sized staging
    stays distributed; only items²-sized ledgers ever reach this fold.

    Cardinality bound (ADVICE r12): the single collected row holds the
    items²-sized matrix and each MM round is O(items³) inside one task
    (per item, a filter over all edges), so this fold is for CATALOG-
    sized item sets — sources, models, annotators: ≲10³ items (≈10⁶
    edge structs, single-digit MB, well under the 2 GB row limit). Above
    that, stage the retired per-round broadcast-join loop (git history,
    pre-r12) which degrades gracefully; item count is known from
    ``duel_matrix``'s inputs before collecting anything.
    """
    m = matrix.localCheckpoint(eager=True)
    items = _bt_items(m)
    one = m.agg(
        F.expr(
            "collect_list(named_struct('a', item_a, 'b', item_b, 'n', n))"
            " AS __es"
        )
    ).join(
        items.agg(
            F.expr(
                "collect_list(named_struct('item', item, 'n_duels',"
                " n_duels, 'wins', wins)) AS __its"
            )
        )
    )
    one = one.select(
        "*",
        F.expr(
            f"map_from_arrays(transform(__its, x -> x.item),"
            f" transform(__its, x -> CAST({S0} AS BIGINT))) AS __s0"
        ),
    )
    for k in range(iters):
        one = one.select(
            "*",
            F.expr(
                f"map_from_arrays(transform(__its, x -> x.item),"
                f" transform(__its, x -> greatest(CAST({S_MIN} AS BIGINT),"
                f" least(CAST({S_MAX} AS BIGINT),"
                f" (x.wins * {TERM_SCALE}) div aggregate("
                f"   filter(__es, e -> e.a = x.item OR e.b = x.item),"
                f"   CAST(0 AS BIGINT),"
                f"   (acc, e) -> acc + (e.n * {TERM_SCALE}) div"
                f"     (element_at(__s{k}, e.a) + element_at(__s{k}, e.b)))"
                f" )))) AS __s{k + 1}"
            ),
        )
    from pyspark.sql import Window

    per = one.select(
        F.explode("__its").alias("x"),
        F.col(f"__s{iters}").alias("__sf"),
        F.expr(
            f"aggregate(map_values(__s{iters}), CAST(0 AS BIGINT),"
            f" (acc, v) -> acc + v) AS __tot"
        ),
        F.size("__its").cast("long").alias("__k"),
    ).select(
        F.col("x.item").alias("item"),
        F.col("x.n_duels").alias("n_duels"),
        F.col("x.wins").alias("wins"),
        F.expr(f"(element_at(__sf, x.item) * __k * {S0}) div __tot").alias(
            "strength_micro"
        ),
    )
    wr = Window.orderBy(F.col("strength_micro").desc())
    return per.select(
        "item",
        "n_duels",
        "wins",
        "strength_micro",
        F.dense_rank().over(wr).cast("long").alias("rnk"),
    )


def bt_calibration(
    matrix: DataFrame, strengths: DataFrame, buckets: int = 10
) -> DataFrame:
    """Reward-model-style calibration curve for fitted Bradley-Terry
    strengths: (decile, n_pairs, n_duels, wins, pred_avg_micro,
    emp_micro) — BT-predicted win probability vs the empirical win rate,
    bucketed by predicted probability.

    Per pair: ``pred = s_a·10⁶ // (s_a + s_b)`` (scale-invariant, so the
    normalized strengths serve directly); bucket = ``min(buckets−1,
    pred·buckets // 10⁶)``. Per bucket, the duel-weighted predicted mean
    and the empirical rate are exact integer ratios in micro units — a
    calibrated fit shows pred_avg ≈ emp in every bucket. All inputs are
    items²-sized; this never touches the corpus.
    """
    sa = strengths.select(
        F.col("item").alias("item_a"), F.col("strength_micro").alias("s_a")
    )
    sb = strengths.select(
        F.col("item").alias("item_b"), F.col("strength_micro").alias("s_b")
    )
    j = (
        matrix.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .withColumn("pred", F.expr(f"(s_a * {S0}) div (s_a + s_b)"))
        .withColumn(
            "decile",
            F.least(
                F.lit(buckets - 1), F.expr(f"(pred * {buckets}) div {S0}")
            ).cast("long"),
        )
    )
    return j.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("n").cast("long").alias("n_duels"),
        F.sum("wins_a").cast("long").alias("wins"),
        F.expr("CAST(sum(pred * n) div sum(n) AS BIGINT)").alias(
            "pred_avg_micro"
        ),
        F.expr(f"CAST((sum(wins_a) * {S0}) div sum(n) AS BIGINT)").alias(
            "emp_micro"
        ),
    )


def wilson_win_matrix(matrix: DataFrame, z: float = 1.959964) -> DataFrame:
    """Win-rate matrix with Wilson score interval bounds per ordered pair:
    (item_a, item_b, n, wins_a, win_rate, wilson_lo, wilson_hi).

    Closed-form per row from exact integer (n, wins): p̂ = w/n,
    lo/hi = (p̂ + z²/2n ∓ z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n). Every
    float op is a correctly-rounded scalar on integer-derived doubles —
    no float aggregation, so the values replay exactly in the oracle.
    """
    zz = float(z) * float(z)
    n = F.col("n").cast("double")
    p = F.col("wins_a").cast("double") / n
    half = F.lit(zz) / (2.0 * n)
    rad = F.sqrt(p * (F.lit(1.0) - p) / n + F.lit(zz) / (4.0 * n * n))
    den = F.lit(1.0) + F.lit(zz) / n
    return matrix.select(
        "item_a",
        "item_b",
        "n",
        "wins_a",
        p.alias("win_rate"),
        ((p + half - F.lit(float(z)) * rad) / den).alias("wilson_lo"),
        ((p + half + F.lit(float(z)) * rad) / den).alias("wilson_hi"),
    ).filter(F.col("n") >= 1)


# ---------------------------------------------------------------------------
# Inter-annotator agreement
# ---------------------------------------------------------------------------


def synthetic_annotations(
    docs: DataFrame,
    n_raters: int = 5,
    flip_pct: int = 15,
    group_col: str = "lang",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    n_cats: int = 4,
) -> DataFrame:
    """Deterministic rater panel over the corpus: (doc_id, grp, rater,
    category) — ``n_raters`` rows per doc.

    Staging CONTRACT: the latent category is the doc's score band,
    ``band = min(n_cats−1, score·n_cats // (max_score+1))`` against the
    GLOBAL max (one broadcast scalar); rater ``r`` flips the band ±1
    (clamped) with probability ``flip_pct``% decided by the portable md5
    hash of ``id:r`` — hash mod 100 < flip_pct flips, hash parity picks
    the direction. Fully portable (the fingerprint family MinHash
    replays on) and embarrassingly parallel: no window, no shuffle until
    the agreement aggregation.
    """
    mx = docs.agg(F.max(F.col(score_col).cast("long")).alias("mx"))
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).alias("grp"),
            F.col(score_col).cast("long").alias("__score"),
        )
        .crossJoin(F.broadcast(mx))
        .withColumn(
            "band",
            F.least(
                F.lit(n_cats - 1),
                F.expr(f"(__score * {n_cats}) div (mx + 1)"),
            ).cast("long"),
        )
    )
    raters = base.select(
        "doc_id",
        "grp",
        "band",
        F.explode(F.sequence(F.lit(1), F.lit(n_raters))).alias("rater"),
    )
    h = portable_hash64(F.concat_ws(":", F.col("doc_id"), F.col("rater")))
    shift = F.when(h % 100 >= flip_pct, F.lit(0)).otherwise(
        F.when((h % 2) == 0, F.lit(-1)).otherwise(F.lit(1))
    )
    cat = F.greatest(
        F.lit(0), F.least(F.lit(n_cats - 1), F.col("band") + shift)
    )
    return raters.select(
        "doc_id", "grp", "rater", cat.cast("long").alias("category")
    )


def fleiss_kappa(ann: DataFrame) -> DataFrame:
    """Fleiss' kappa per group: (grp, n_docs, n_raters, p_bar, p_e,
    kappa) — exact-integer numerators/denominators, one final float
    division each.

    With N docs, R raters, and per-doc-category counts n_dc:
    S = Σ_d Σ_c n_dc² − N·R, P̄ = S / (N·R·(R−1)); m_c = Σ_d n_dc,
    M2 = Σ_c m_c², P_e = M2 / (N·R)²; kappa = (P̄−P_e)/(1−P_e). The
    integer accumulators (S, M2, m_c) are exact BIGINTs; P̄/P_e/kappa
    are then a fixed tree of correctly-rounded double ops, identical in
    both engines (kappa deliberately composes from the two ratios
    rather than one giant integer polynomial — (NR)²-sized products
    would overflow BIGINT past ~3·10⁹ ratings per group; M2 itself
    bounds the exact range to ~10⁹-rating panels, documented). Two
    shuffles total ((grp,doc,cat) then (grp,cat)), both map-side
    combinable.
    """
    dc = ann.groupBy("grp", "doc_id", "category").agg(
        F.count(F.lit(1)).cast("long").alias("ndc")
    )
    per_grp = dc.groupBy("grp").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum(F.col("ndc") * F.col("ndc")).cast("long").alias("sq"),
        F.sum("ndc").cast("long").alias("tot"),
    )
    mc = (
        dc.groupBy("grp", "category")
        .agg(F.sum("ndc").cast("long").alias("mc"))
        .groupBy("grp")
        .agg(F.sum(F.col("mc") * F.col("mc")).cast("long").alias("m2"))
    )
    g = per_grp.join(mc, "grp")
    # R = tot / n_docs (every doc gets the full panel by construction).
    r_ = F.expr("tot div n_docs")
    nr = F.col("n_docs") * r_
    p_bar = (F.col("sq") - nr).cast("double") / (
        nr * (r_ - F.lit(1))
    ).cast("double")
    p_e = F.col("m2").cast("double") / (
        nr.cast("double") * nr.cast("double")
    )
    return g.select(
        "grp",
        "n_docs",
        r_.cast("long").alias("n_raters"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1.0) - p_e)).alias("kappa"),
    )


def cohen_kappa_pairs(ann: DataFrame) -> DataFrame:
    """Cohen's kappa for every rater pair over the WHOLE panel:
    (rater_a, rater_b, n_docs, po, pe, kappa), rater_a < rater_b.

    po from the exact agreement count; pe from the raters' marginal
    category counts: pe = Σ_c m_ac·m_bc / N²; kappa = (po−pe)/(1−pe) —
    integer accumulators, then a fixed correctly-rounded double tree
    (same contract and same ~10⁹-rating exact-range note as
    :func:`fleiss_kappa`). The rater×rater marginal join is
    panel²-sized (raters are tens); the doc-level join is an equi-join
    on doc_id — one shuffle, no pairwise doc work.
    """
    a = ann.select(
        "doc_id", F.col("rater").alias("rater_a"), F.col("category").alias("cat_a")
    )
    b = ann.select(
        "doc_id", F.col("rater").alias("rater_b"), F.col("category").alias("cat_b")
    )
    pairs = a.join(b, "doc_id").filter(F.col("rater_a") < F.col("rater_b"))
    agree = pairs.groupBy("rater_a", "rater_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("cat_a") == F.col("cat_b")).cast("long"))
        .cast("long")
        .alias("n_agree"),
    )
    marg = ann.groupBy("rater", "category").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    ma = marg.select(
        F.col("rater").alias("rater_a"),
        F.col("category").alias("category"),
        F.col("m").alias("m_a"),
    )
    mb = marg.select(
        F.col("rater").alias("rater_b"),
        F.col("category").alias("category"),
        F.col("m").alias("m_b"),
    )
    cross = (
        ma.join(mb, "category")
        .filter(F.col("rater_a") < F.col("rater_b"))
        .groupBy("rater_a", "rater_b")
        .agg(F.sum(F.col("m_a") * F.col("m_b")).cast("long").alias("mm"))
    )
    g = agree.join(cross, ["rater_a", "rater_b"])
    po = F.col("n_agree").cast("double") / F.col("n_docs").cast("double")
    pe = F.col("mm").cast("double") / (
        F.col("n_docs").cast("double") * F.col("n_docs").cast("double")
    )
    return g.select(
        "rater_a",
        "rater_b",
        "n_docs",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )
