"""Deterministic sampling/split semantics: reproducibility is the entire
point of the hash-bucket design, so every test re-runs the operator and
requires IDENTICAL row sets — then checks proportions are sane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.sampling import (
    bernoulli_sample,
    hash_split,
    split_column,
    weighted_sample,
)
from etl_platform_nyc_taxi_spark.sources import load_fixture

SF_DIR = "/root/testdata/sf0.01"


def test_hash_split_deterministic_and_partition_invariant(spark):
    d = load_fixture(spark, SF_DIR, "documents").select("doc_id")
    a = {(r["doc_id"], r["split"]) for r in hash_split(d).collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(d.repartition(7)).collect()
    }
    assert a == b  # layout must not affect assignment (rand() fails this)
    assert {s for _, s in a} == {"train", "val", "test"}


def test_hash_split_proportions(spark):
    d = load_fixture(spark, SF_DIR, "documents").select("doc_id")
    n = d.count()
    by = {
        r["split"]: r["c"]
        for r in hash_split(d).groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert by["train"] / n == pytest.approx(0.9, abs=0.05)
    assert (by.get("val", 0) + by.get("test", 0)) / n == pytest.approx(0.1, abs=0.05)


def test_split_weights_validation(spark):
    with pytest.raises(ValueError):
        split_column("doc_id", {})
    with pytest.raises(ValueError):
        split_column("doc_id", {"a": 0.9, "b": 0.2})


def test_weighted_sample_rates_and_determinism(spark):
    d = load_fixture(spark, SF_DIR, "documents").select("doc_id", "lang")
    rates = {"en": 1.0, "zh": 0.0}
    out = weighted_sample(d, rates, stratum_col="lang", default_rate=0.5)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {r["doc_id"] for r in out.collect()}  # replay-identical
    by = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    base = {r["lang"]: r["c"] for r in d.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert by["en"] == base["en"]  # rate 1.0 keeps everything
    assert "zh" not in by  # rate 0.0 keeps nothing
    for lang in ("de", "fr", "es"):  # default 0.5 within binomial slack
        assert by[lang] / base[lang] == pytest.approx(0.5, abs=0.2)


def test_sample_salts_are_independent(spark):
    """split and mix salts must decorrelate: the test split must not be
    systematically over/under-sampled by the mixing pass."""
    d = load_fixture(spark, SF_DIR, "documents").select("doc_id")
    n = d.count()
    split = hash_split(d)
    sampled = bernoulli_sample(split, 0.5)
    frac_overall = sampled.count() / n
    test_rows = split.filter(F.col("split") == "test")
    frac_test = bernoulli_sample(test_rows, 0.5).count() / test_rows.count()
    assert frac_overall == pytest.approx(0.5, abs=0.1)
    assert frac_test == pytest.approx(frac_overall, abs=0.25)


def test_bernoulli_sample_subset_and_rate(spark):
    d = load_fixture(spark, SF_DIR, "documents").select("doc_id")
    half = {r["doc_id"] for r in bernoulli_sample(d, 0.5).collect()}
    tenth = {r["doc_id"] for r in bernoulli_sample(d, 0.1).collect()}
    assert tenth <= half  # nested thresholds on the same salt
    assert len(half) / d.count() == pytest.approx(0.5, abs=0.1)


def test_pack_sequences_chunks_and_offsets(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [
            (1, "g", 300),
            (2, "g", 300),  # starts at 300 -> chunk 0 (spans the cut)
            (3, "g", 300),  # starts at 600 -> chunk 1
            (4, "h", 10),  # other group packs independently from offset 0
        ],
        "doc_id long, lang string, n long",
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, "n", capacity=512, group_cols=("lang",), order_cols=("doc_id",)
        ).collect()
    }
    assert [out[i]["start_offset"] for i in (1, 2, 3)] == [0, 300, 600]
    assert [out[i]["chunk_id"] for i in (1, 2, 3)] == [0, 0, 1]
    assert out[4]["start_offset"] == 0 and out[4]["chunk_id"] == 0


def test_shard_shuffle_deterministic_and_partition_invariant(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import shard_shuffle

    d = load_fixture(spark, SF_DIR, "documents").select("doc_id").limit(200)
    a = sorted(map(tuple, shard_shuffle(d, num_shards=8).collect()))
    b = sorted(map(tuple, shard_shuffle(d.repartition(7), num_shards=8).collect()))
    assert a == b  # layout-invariant permutation
    rows = shard_shuffle(d, num_shards=8).collect()
    assert {r["shard"] for r in rows} <= set(range(8))
    # positions are 1..n_in_shard, dense, no duplicates
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_stratified_cap_exact_counts(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import stratified_cap

    d = load_fixture(spark, SF_DIR, "documents").select("doc_id", "lang", "source")
    out = stratified_cap(d, cap=5, stratum_cols=("lang",))
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(5, full[lang])  # exact quota, not in-expectation
    # deterministic: same winners both runs
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_cap(d.repartition(5), cap=5, stratum_cols=("lang",)).collect())
    assert a == b


# ---------------------------------------------------------------------------
# Range sharding
# ---------------------------------------------------------------------------


def test_assign_range_shards_balances_and_is_deterministic(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        assign_range_shards,
    )

    df = spark.range(0, 800).withColumn("v", (F.col("id") * 7919) % 1000)
    a = assign_range_shards(df, "v", k=8)
    b = assign_range_shards(df, "v", k=8)
    ca = {r["shard_id"]: r["n"] for r in a.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    cb = {r["shard_id"]: r["n"] for r in b.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert ca == cb                                   # deterministic
    assert set(ca) == set(range(8))                   # every shard occupied
    assert max(ca.values()) <= 2 * min(ca.values())   # roughly balanced
    # shards are ranges: max(shard i) <= min(shard i+1)
    bounds = {
        r["shard_id"]: (r["lo"], r["hi"])
        for r in a.groupBy("shard_id").agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
    }
    for i in range(7):
        assert bounds[i][1] <= bounds[i + 1][0]


def test_assign_range_shards_ties_stay_together(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        assign_range_shards,
    )

    df = spark.createDataFrame([(i, 5) for i in range(100)], "id long, v long")
    out = assign_range_shards(df, "v", k=4)
    assert out.select("shard_id").distinct().count() == 1  # ties never split


def _z_interleave(bx: int, by: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((bx >> b) & 1) << (2 * b)
        z |= ((by >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_cells_match_python_reference(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import assign_zorder_cells

    rows_in = [(float(i % 37), float((i * 7) % 53)) for i in range(300)]
    df = spark.createDataFrame(rows_in, "x double, y double")
    out = assign_zorder_cells(df, "x", "y", bits=3).collect()

    xs = sorted(r[0] for r in rows_in)
    ys = sorted(r[1] for r in rows_in)

    def cuts(vals):
        import numpy as np

        return [round(float(np.quantile(vals, p, method="linear")), 4)
                for p in [i / 8 for i in range(1, 8)]]

    cx, cy = cuts(xs), cuts(ys)
    for r in out:
        bx = sum(1 for c in cx if c < r["x"])
        by = sum(1 for c in cy if c < r["y"])
        assert r["z_cell"] == _z_interleave(bx, by, 3), (r, bx, by)


def test_zorder_cells_bound_both_dimensions(spark):
    """The data-skipping property: each cell's min/max envelope spans at
    most one quantile bucket per dimension (files clustered by z_cell
    prune on either column)."""
    from etl_platform_nyc_taxi_spark.operators.sampling import assign_zorder_cells

    import random

    rng = random.Random(5)
    data = [(rng.uniform(0, 1000), rng.uniform(-50, 50)) for _ in range(2000)]
    df = spark.createDataFrame(data, "x double, y double")
    cells = (
        assign_zorder_cells(df, "x", "y", bits=3)
        .groupBy("z_cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        )
        .collect()
    )
    assert len(cells) == 64  # all 8x8 cells populated on smooth data
    # equi-population: quantile bucketing keeps cells balanced
    ns = [c["n"] for c in cells]
    assert max(ns) <= 3 * min(ns), ns
    # envelope tightness: each cell spans ≤ ~1/8 of each dimension's range
    for c in cells:
        assert c["x1"] - c["x0"] <= 1000 / 8 * 1.8, c
        assert c["y1"] - c["y0"] <= 100 / 8 * 1.8, c


# ---------------------------------------------------------------------------
# Round 5: hash_reservoir_per_key, plan_compaction_bins
# ---------------------------------------------------------------------------

from etl_platform_nyc_taxi_spark.sources.rows import rows_source  # noqa: E402
from tests.conftest import rows  # noqa: E402


def test_hash_reservoir_exact_k_per_key_and_deterministic(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import hash_reservoir_per_key

    data = [(f"k{i % 3}", i) for i in range(90)]
    df = rows_source(spark, data, "key string, id long")
    s1 = rows(hash_reservoir_per_key(df, ["key"], "id", 5))
    s2 = rows(hash_reservoir_per_key(df.repartition(7), ["key"], "id", 5))
    assert s1 == s2  # partitioning-independent
    per_key: dict[str, int] = {}
    for k, _ in s1:
        per_key[k] = per_key.get(k, 0) + 1
    assert per_key == {"k0": 5, "k1": 5, "k2": 5}
    # keys with fewer than k rows keep everything
    small = rows_source(spark, [("a", 1), ("a", 2)], "key string, id long")
    assert len(rows(hash_reservoir_per_key(small, ["key"], "id", 5))) == 2


def test_hash_reservoir_sample_is_nested(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import hash_reservoir_per_key

    df = rows_source(
        spark, [("k", i) for i in range(50)], "key string, id long"
    )
    s3 = {r[1] for r in rows(hash_reservoir_per_key(df, ["key"], "id", 3))}
    s10 = {r[1] for r in rows(hash_reservoir_per_key(df, ["key"], "id", 10))}
    assert s3 < s10  # hash-rank prefix property


def test_hash_reservoir_rejects_bad_k(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import hash_reservoir_per_key

    df = rows_source(spark, [("k", 1)], "key string, id long")
    with pytest.raises(ValueError):
        hash_reservoir_per_key(df, ["key"], "id", 0)


def test_plan_compaction_bins_greedy_cumsum(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import plan_compaction_bins

    files = rows_source(
        spark,
        [("a", 60), ("b", 50), ("c", 10), ("d", 100), ("e", 5)],
        "name string, size long",
    )
    out = {
        r["name"]: r["bin_id"]
        for r in plan_compaction_bins(files, "size", ["name"], 100).collect()
    }
    # exclusive prefix sums: a=0,b=60,c=110,d=120,e=220
    assert out == {"a": 0, "b": 0, "c": 1, "d": 1, "e": 2}
    with pytest.raises(ValueError):
        plan_compaction_bins(files, "size", ["name"], 0)


def test_pps_systematic_inclusion_counts(spark):
    """k picks per key; heavy rows (w > W/k) are certainty items."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.sampling import (
        pps_systematic_per_key,
    )

    df = spark.range(0, 200).select(
        (F.col("id") % 2).cast("string").alias("key"),
        F.col("id").alias("rid"),
        (F.col("id") % 7 + 1).alias("w"),
    )
    out = pps_systematic_per_key(df, ["key"], "rid", "w", k=10)
    per_key = {
        r["key"]: r["n"]
        for r in out.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # systematic PPS picks at most k rows per key (fewer only when one row
    # crosses several picks), and at least 1
    assert set(per_key) == {"0", "1"}
    for n in per_key.values():
        assert 1 <= n <= 10


def test_pps_systematic_weight_col_needing_backticks(spark):
    """ADVICE r4: a weight column whose name needs quoting (dots/spaces/
    hyphens) must behave identically to a plain name — the weight is
    staged through a temp column, never interpolated into expr SQL."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.sampling import (
        pps_systematic_per_key,
    )

    base = spark.range(0, 50).select(
        F.lit("a").alias("key"),
        F.col("id").alias("rid"),
        (F.col("id") % 5 + 1).alias("w"),
    )
    plain = {
        r["rid"]
        for r in pps_systematic_per_key(base, ["key"], "rid", "w", k=7).collect()
    }
    weird = base.withColumnRenamed("w", "doc weight.chars-v2")
    got = {
        r["rid"]
        for r in pps_systematic_per_key(
            weird, ["key"], "rid", "doc weight.chars-v2", k=7
        ).collect()
    }
    assert got == plain and len(got) >= 1


def test_pps_systematic_deterministic_and_weight_biased(spark):
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.sampling import (
        pps_systematic_per_key,
    )

    # one giant row among tiny ones: must ALWAYS be selected (certainty item)
    rows_in = [("a", 1, 1000)] + [("a", i, 1) for i in range(2, 100)]
    df = spark.createDataFrame(rows_in, "key string, rid long, w long")
    out1 = sorted(r["rid"] for r in pps_systematic_per_key(df, ["key"], "rid", "w", 5).collect())
    out2 = sorted(r["rid"] for r in pps_systematic_per_key(df, ["key"], "rid", "w", 5).collect())
    assert out1 == out2  # reproducible across runs
    assert 1 in out1  # the heavy row is certain


def test_pps_systematic_rejects_bad_k(spark):
    import pytest

    from etl_platform_nyc_taxi_spark.operators.sampling import (
        pps_systematic_per_key,
    )

    df = spark.createDataFrame([("a", 1, 1)], "key string, rid long, w long")
    with pytest.raises(ValueError):
        pps_systematic_per_key(df, ["key"], "rid", "w", 0)


def test_hash_split_null_ids_are_hashed_not_dumped(spark):
    """Code-review r7: null ids made every bucket comparison NULL and
    ALL null-id rows fell through to the LAST split label ('test');
    they now hash a sentinel and distribute like any other key."""
    from etl_platform_nyc_taxi_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(None,)] * 10 + [(i,) for i in range(10)], "doc_id int"
    )
    splits = hash_split(df).groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in splits}
    # all 10 null rows share one deterministic bucket — they must land
    # together in whichever split that bucket maps to, and with 90/5/5
    # weights that is overwhelmingly 'train'; the old bug pinned them
    # to 'test' unconditionally
    assert by.get("test", 0) < 10


def test_dsir_weights_hand_computed(spark):
    """DSIR importance weights against a python mirror of the exact
    quantization pipeline (md5 bins verified collision-free for these
    tokens: x->652, 'x x'->513, y->404, 'y y'->524 mod 1024).

    Corpus: target "x x"; raw "x x" (target-like) and raw "y y"
    (target-unseen). The raw copy of the target text must come out
    positive/selected; the all-raw text negative/unselected."""
    import math

    from etl_platform_nyc_taxi_spark.operators.sampling import dsir_weights

    df = spark.createDataFrame(
        [(1, "x x", True), (2, "x x", False), (3, "y y", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights(df, is_target=F.col("tgt")).collect()
    }

    B = 1024
    T, R = 3, 6  # target feats: x,x,'x x'; raw: x,x,'x x',y,y,'y y'
    def delta(ct, cr):
        return math.floor(
            (math.log((ct + 1) / (T + B)) - math.log((cr + 1) / (R + B)))
            * 1e6
            + 0.5
        )

    d_x, d_xx = delta(2, 2), delta(1, 1)
    d_y, d_yy = delta(0, 2), delta(0, 1)
    w_xlike = 2 * d_x + d_xx
    w_ylike = 2 * d_y + d_yy
    assert (out[1]["n_feats"], out[1]["weight_micro"]) == (3, w_xlike)
    assert (out[2]["n_feats"], out[2]["weight_micro"]) == (3, w_xlike)
    assert (out[3]["n_feats"], out[3]["weight_micro"]) == (3, w_ylike)
    assert w_xlike > 0 > w_ylike
    # selection: raw AND positive only
    assert out[1]["selected"] is False  # target doc never selected
    assert out[2]["selected"] is True
    assert out[3]["selected"] is False


# --- round 10: temperature-scaled multi-source mixing ----------------


def test_temperature_quotas_math(spark):
    """n^0.5 milli-quantized weights and pure-BIGINT quota arithmetic:
    hand-checkable on sources of 100/400/900 docs with budget 700 —
    sqrt weights 10/20/30 (milli 10000/20000/30000), shares
    700*{1,2,3}/6 = 116/233/350."""
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        temperature_quotas,
    )

    rows = (
        [(i, "s100") for i in range(100)]
        + [(1000 + i, "s400") for i in range(400)]
        + [(10_000 + i, "s900") for i in range(900)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    q = {
        r["source"]: (r["n_docs"], r["weight_milli"], r["quota"])
        for r in temperature_quotas(df, budget=700).collect()
    }
    assert q == {
        "s100": (100, 10_000, 100),  # share 116 capped at n=100
        "s400": (400, 20_000, 233),
        "s900": (900, 30_000, 350),
    }
    # temperature flattens: proportional shares would be 50/200/450 —
    # the small source keeps MORE than proportional, the big one less
    assert q["s100"][2] > 700 * 100 // 1400
    assert q["s900"][2] < 700 * 900 // 1400


def test_temperature_mix_respects_quotas_and_determinism(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        temperature_mix,
        temperature_quotas,
    )

    rows = [(i, "a" if i % 3 else "b") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    quotas = {
        r["source"]: r["quota"]
        for r in temperature_quotas(df, budget=40).collect()
    }
    out = temperature_mix(df, budget=40)
    kept = out.where("kept").groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in kept} == quotas
    # every input row comes back exactly once, flagged
    assert out.count() == 90
    # deterministic: same inputs -> same kept set
    k1 = {r["doc_id"] for r in out.where("kept").collect()}
    k2 = {
        r["doc_id"]
        for r in temperature_mix(df, budget=40).where("kept").collect()
    }
    assert k1 == k2


def test_temperature_mix_composes_with_dsir_order(spark):
    """Quality-aware mixing: rank within source by DSIR weight instead
    of the hash — the kept set becomes the top-weight docs per source."""
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [
        (1, "web", 500),
        (2, "web", -10),
        (3, "web", 900),
        (4, "web", 100),
        (5, "wiki", 50),
        (6, "wiki", 70),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, weight_micro long"
    )
    out = temperature_mix(
        df, budget=3, order_by=F.col("weight_micro").desc()
    )
    kept = {r["doc_id"] for r in out.where("kept").collect()}
    # weights milli: web floor(sqrt(4)*1000)=2000, wiki floor(sqrt(2)*1000)=1414
    # quotas: web 3*2000//3414 = 1, wiki 3*1414//3414 = 1
    assert kept == {3, 6}  # the top-DSIR doc of each source


def test_temperature_mix_budget_extremes(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        temperature_quotas,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 8 else "b") for i in range(10)],
        "doc_id long, source string",
    )
    # budget >= corpus: quotas cap at source sizes
    q = {
        r["source"]: r["quota"]
        for r in temperature_quotas(df, budget=1000).collect()
    }
    assert q == {"a": 8, "b": 2}
    # zero budget: nothing kept
    q0 = {
        r["source"]: r["quota"]
        for r in temperature_quotas(df, budget=0).collect()
    }
    assert q0 == {"a": 0, "b": 0}


# ---------------------------------------------------------------------------
# UniMax allocation
# ---------------------------------------------------------------------------


def _unimax_bruteforce(sizes: list[int], epoch_cap: int, budget: int):
    """Reference implementation: the paper's iterative waterfilling loop
    with real-valued shares, then largest-remainder integerization on the
    uniform tail (exactly the operator's documented integer semantics)."""
    items = sorted(
        [(n * epoch_cap, i) for i, n in enumerate(sizes)]
    )  # (cap, idx) ascending; idx doubles as the deterministic tie-break
    alloc = [0] * len(sizes)
    remaining = budget
    for pos, (cap, idx) in enumerate(items):
        n_left = len(items) - pos
        if cap * n_left <= remaining:  # cap <= real-valued share
            alloc[idx] = cap
            remaining -= cap
        else:  # water level reached: split remainder over the tail
            tail = items[pos:]
            base, rem = divmod(remaining, n_left)
            for j, (_, idx2) in enumerate(tail):
                alloc[idx2] = base + (1 if j < rem else 0)
            break
    return alloc


def test_unimax_matches_bruteforce(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        unimax_allocation,
    )

    cases = [
        [100, 200, 300, 5000],
        [7, 7, 7, 7],          # exact ties -> key tie-break
        [1],                   # single stratum
        [10, 10_000],          # extreme skew
        [3, 14, 159, 2653, 58979, 323],
    ]
    for sizes_list in cases:
        sizes = rows_source(
            spark,
            [(f"g{i:03d}", n) for i, n in enumerate(sizes_list)],
            "grp string, n_tok long",
        )
        total = sum(sizes_list)
        budget = total // 2
        out = {
            r["grp"]: (r["cap"], r["alloc"], r["epochs_micro"])
            for r in unimax_allocation(sizes, ["grp"], epoch_cap=2).collect()
        }
        want = _unimax_bruteforce(sizes_list, 2, budget)
        for i, n in enumerate(sizes_list):
            cap, alloc, em = out[f"g{i:03d}"]
            assert cap == 2 * n
            assert alloc == want[i], (sizes_list, i)
            assert em == (1_000_000 * alloc) // max(n, 1)
        # budget feasible (sum caps = 2*total >= total//2) -> exact spend
        assert sum(a for _, a, _ in out.values()) == budget


def test_unimax_infeasible_budget_allocates_all_caps(spark):
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        unimax_allocation,
    )
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source as rs

    sizes = rs(spark, [("a", 10), ("b", 20)], "grp string, n_tok long")
    budget = rs(spark, [(1000,)], "budget long")
    out = {
        r["grp"]: r["alloc"]
        for r in unimax_allocation(
            sizes, ["grp"], epoch_cap=2, budget=budget
        ).collect()
    }
    # budget exceeds sum of caps: every stratum saturates, no crossover
    assert out == {"a": 20, "b": 40}


def test_interleave_prefix_proportionality(spark):
    """The defining stride-scheduling property: every prefix of the
    order-key stream carries each source within one stride of its exact
    corpus proportion."""
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        interleave_sources,
    )

    data = (
        [(i, "a") for i in range(70)]
        + [(100 + i, "b") for i in range(20)]
        + [(200 + i, "c") for i in range(10)]
    )
    df = rows_source(spark, data, "doc_id long, source string")
    rows = sorted(
        interleave_sources(df).collect(),
        key=lambda r: (r["order_key"], r["source"], r["doc_id"]),
    )
    assert len(rows) == 100
    n = {"a": 70, "b": 20, "c": 10}
    seen = {"a": 0, "b": 0, "c": 0}
    for k, r in enumerate(rows, start=1):
        seen[r["source"]] += 1
        for s, cnt in seen.items():
            # within one stride (total/n_src docs) of the exact share
            assert abs(cnt - k * n[s] / 100) <= 100 / n[s] + 1, (k, s, cnt)
    assert seen == n
    # determinism: same input -> identical order keys
    again = sorted(
        interleave_sources(df).collect(),
        key=lambda r: (r["order_key"], r["source"], r["doc_id"]),
    )
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in rows]


def test_epoch_decay_micro_literals_match_registry():
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        epoch_decay_micro,
    )
    from etl_platform_nyc_taxi_spark.queries_registry import _EPOCH_DECAYS

    assert epoch_decay_micro(6, 500) == _EPOCH_DECAYS
    # general decays floor deterministically
    assert epoch_decay_micro(3, 602) == [1000000, 602000, 362404]


def test_epoch_allocation_greedy_hand_computed(spark):
    """2 strata, q 900 vs 300, n 100 each, budget 250, delta 0.5:
    greedy order by q*decay: hi e1 (900k), hi e2 (450k), lo e1 (300k),
    hi e3 (225k)... fill 100 + 100 + partial 50 of lo e1."""
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        epoch_allocation,
    )

    sizes = spark.createDataFrame(
        [("hi", 100, 900), ("lo", 100, 300)],
        "source string, n_tok long, q_milli long",
    )
    budget = spark.createDataFrame([(250,)], "budget long")
    out = {
        r["source"]: r
        for r in epoch_allocation(
            sizes, ["source"], budget=budget
        ).collect()
    }
    hi, lo = out["hi"], out["lo"]
    assert hi["epochs_full"] == 2 and hi["alloc_tok"] == 200
    assert lo["epochs_full"] == 0 and lo["alloc_tok"] == 50
    # effective ledger: hi = 100*1e6 + 100*5e5; lo = 50*1e6
    assert hi["eff_tok_micro"] == 100 * 1_000_000 + 100 * 500_000
    assert lo["eff_tok_micro"] == 50 * 1_000_000
    assert hi["epochs_micro"] == 2_000_000 and lo["epochs_micro"] == 500_000


def test_epoch_allocation_budget_exact_and_capacity_cap(spark):
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.sampling import (
        epoch_allocation,
    )

    sizes = spark.createDataFrame(
        [("a", 70, 500), ("b", 30, 400), ("c", 11, 100)],
        "source string, n_tok long, q_milli long",
    )
    # budget below capacity: sum(alloc) == budget exactly
    budget = spark.createDataFrame([(123,)], "budget long")
    out = epoch_allocation(sizes, ["source"], budget=budget)
    assert out.agg(F.sum("alloc_tok")).first()[0] == 123
    # budget above 6-epoch capacity: every stratum saturates
    big = spark.createDataFrame([(10_000,)], "budget long")
    sat = epoch_allocation(sizes, ["source"], budget=big)
    assert all(r["epochs_full"] == 6 for r in sat.collect())
    # zero-quality strata are excluded from allocation entirely
    z = spark.createDataFrame(
        [("z", 50, 0), ("a", 50, 10)], "source string, n_tok long, q_milli long"
    )
    zz = epoch_allocation(z, ["source"], budget=budget)
    assert [r["source"] for r in zz.collect()] == ["a"]
