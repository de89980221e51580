"""Unit tests for operators/preference.py (Bradley-Terry, Wilson win
matrix, synthetic rater panel, Fleiss/Cohen kappa)."""

from __future__ import annotations

import math

from conftest import rows

from etl_platform_nyc_taxi_spark.operators.preference import (
    BT_ITERS,
    S0,
    bradley_terry,
    bt_calibration,
    cohen_kappa_pairs,
    duel_matrix,
    fleiss_kappa,
    stage_duels,
    synthetic_annotations,
    wilson_win_matrix,
)


def _matrix(spark, triples):
    return spark.createDataFrame(
        [(a, b, n, w) for a, b, n, w in triples],
        "item_a string, item_b string, n long, wins_a long",
    )


def test_bradley_terry_orders_by_dominance(spark):
    # A beats B 9/10, B beats C 9/10, A beats C 9/10 — strength A>B>C.
    m = _matrix(spark, [("A", "B", 10, 9), ("A", "C", 10, 9), ("B", "C", 10, 9)])
    out = {r["item"]: r.asDict() for r in bradley_terry(m).collect()}
    assert out["A"]["rnk"] == 1
    assert out["B"]["rnk"] == 2
    assert out["C"]["rnk"] == 3
    assert out["A"]["strength_micro"] > out["B"]["strength_micro"] > out["C"]["strength_micro"]
    assert out["A"]["wins"] == 18 and out["A"]["n_duels"] == 20
    # normalization: mean strength == 1.0 up to integer floor (k items).
    tot = sum(v["strength_micro"] for v in out.values())
    assert 3 * S0 - 3 <= tot <= 3 * S0


def test_bradley_terry_symmetric_is_uniform(spark):
    # perfectly balanced duels -> equal strengths, all rank 1.
    m = _matrix(spark, [("A", "B", 10, 5), ("A", "C", 10, 5), ("B", "C", 10, 5)])
    out = bradley_terry(m).collect()
    assert {r["strength_micro"] for r in out} == {S0}
    assert {r["rnk"] for r in out} == {1}


def test_bradley_terry_zero_wins_pins_to_floor(spark):
    m = _matrix(spark, [("A", "B", 4, 4)])
    out = {r["item"]: r for r in bradley_terry(m, iters=3).collect()}
    assert out["B"]["wins"] == 0
    assert out["A"]["strength_micro"] > out["B"]["strength_micro"]
    assert out["B"]["strength_micro"] >= 0  # floor survives normalization


def test_stage_duels_contract(spark):
    docs = spark.createDataFrame(
        [
            # one lang, ids 1..5: pairs (1,2), (3,4); 5 is the odd tail out.
            (1, "en", "s1", 100),
            (2, "en", "s2", 200),
            (3, "en", "s1", 300),
            (4, "en", "s1", 100),  # same-source pair -> dropped
            (5, "en", "s2", 999),
        ],
        "doc_id long, lang string, source string, n_chars long",
    )
    out = rows(stage_duels(docs))
    # pair (1,2): s2 wins on score; canonical (s1, s2), win_a = 0.
    assert out == [("s1", "s2", 0)]
    # deterministic: re-run bit-identical.
    assert rows(stage_duels(docs)) == out


def test_stage_duels_tie_breaks_to_lower_id(spark):
    docs = spark.createDataFrame(
        [(1, "en", "sA", 100), (2, "en", "sB", 100)],
        "doc_id long, lang string, source string, n_chars long",
    )
    assert rows(stage_duels(docs)) == [("sA", "sB", 1)]


def test_wilson_matches_closed_form(spark):
    m = _matrix(spark, [("A", "B", 10, 7)])
    r = wilson_win_matrix(m).collect()[0]
    z = 1.959964
    zz = z * z
    n, p = 10.0, 0.7
    half = zz / (2.0 * n)
    rad = math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n))
    den = 1.0 + zz / n
    assert r["win_rate"] == p
    assert abs(r["wilson_lo"] - (p + half - z * rad) / den) < 1e-15
    assert abs(r["wilson_hi"] - (p + half + z * rad) / den) < 1e-15
    assert r["wilson_lo"] < p < r["wilson_hi"]


def test_synthetic_annotations_shape_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "s", 40 + i * 7) for i in range(1, 41)],
        "doc_id long, lang string, source string, n_chars long",
    )
    ann = synthetic_annotations(docs, n_raters=3)
    got = rows(ann)
    assert len(got) == 40 * 3
    assert all(0 <= r[3] <= 3 for r in got)
    assert rows(synthetic_annotations(docs, n_raters=3)) == got


def test_fleiss_kappa_perfect_agreement(spark):
    ann = spark.createDataFrame(
        [(d, "en", r, d % 3) for d in range(1, 11) for r in (1, 2, 3)],
        "doc_id long, grp string, rater long, category long",
    )
    out = fleiss_kappa(ann).collect()[0]
    assert out["n_docs"] == 10 and out["n_raters"] == 3
    assert out["p_bar"] == 1.0
    assert out["kappa"] == 1.0


def test_fleiss_kappa_textbook_formula(spark):
    # 4 docs, 2 raters, mixed agreement; replicate the formula in floats.
    labels = {1: (0, 0), 2: (0, 1), 3: (1, 1), 4: (2, 1)}
    ann = spark.createDataFrame(
        [(d, "en", r + 1, labels[d][r]) for d in labels for r in (0, 1)],
        "doc_id long, grp string, rater long, category long",
    )
    out = fleiss_kappa(ann).collect()[0]
    n_docs, r_ = 4, 2
    nr = n_docs * r_
    sq = sum(
        c * c
        for d in labels
        for c in [labels[d].count(k) for k in set(labels[d])]
    )
    p_bar = (sq - nr) / (nr * (r_ - 1))
    cats = [c for v in labels.values() for c in v]
    m2 = sum(cats.count(k) ** 2 for k in set(cats))
    p_e = m2 / (nr * nr)
    assert abs(out["p_bar"] - p_bar) < 1e-12
    assert abs(out["p_e"] - p_e) < 1e-12
    assert abs(out["kappa"] - (p_bar - p_e) / (1 - p_e)) < 1e-12


def test_cohen_kappa_pairs(spark):
    # raters 1,2 always agree; rater 3 always says 0.
    ann = spark.createDataFrame(
        [(d, "en", 1, d % 2) for d in range(1, 9)]
        + [(d, "en", 2, d % 2) for d in range(1, 9)]
        + [(d, "en", 3, 0) for d in range(1, 9)],
        "doc_id long, grp string, rater long, category long",
    )
    out = {(r["rater_a"], r["rater_b"]): r for r in cohen_kappa_pairs(ann).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)]["kappa"] == 1.0
    # rater 3 vs 1: po = 0.5 (agrees on the 4 zeros), pe = (4*8 + 4*0)/64.
    assert out[(1, 3)]["po"] == 0.5
    assert abs(out[(1, 3)]["pe"] - 0.5) < 1e-12
    assert out[(1, 3)]["kappa"] == 0.0


def test_bt_calibration_buckets_and_weights(spark):
    m = _matrix(
        spark, [("A", "B", 10, 9), ("A", "C", 10, 9), ("B", "C", 10, 5)]
    )
    bt = bradley_terry(m)
    cal = bt_calibration(m, bt.select("item", "strength_micro"))
    out = {r["decile"]: r.asDict() for r in cal.collect()}
    assert sum(v["n_pairs"] for v in out.values()) == 3
    assert sum(v["n_duels"] for v in out.values()) == 30
    for v in out.values():
        assert 0 <= v["decile"] <= 9
        assert 0 <= v["pred_avg_micro"] <= S0
        assert 0 <= v["emp_micro"] <= S0
    # the B-vs-C coin-flip pair lands in the middle deciles with emp 0.5
    mid = [v for v in out.values() if v["n_pairs"] == 1 and v["wins"] == 5]
    assert mid and mid[0]["emp_micro"] == S0 // 2


def test_bt_pipeline_end_to_end(spark):
    # stage -> matrix -> strengths on a corpus-shaped fixture.
    docs = spark.createDataFrame(
        [
            (i, "en", f"src{i % 4}", 50 + (i % 4) * 100 + i % 7)
            for i in range(1, 101)
        ],
        "doc_id long, lang string, source string, n_chars long",
    )
    duels = stage_duels(docs)
    bt = bradley_terry(duel_matrix(duels), iters=BT_ITERS)
    out = {r["item"]: r for r in bt.collect()}
    # src3 docs are longest -> must out-rank src0 (shortest).
    assert out["src3"]["strength_micro"] > out["src0"]["strength_micro"]
    assert sum(r["n_duels"] for r in out.values()) % 2 == 0
