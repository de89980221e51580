"""Unigram-LM tokenizer semantics (operators/unigram.py): Viterbi
lowest-cost segmentation, deterministic tie-breaks, seed selection,
hard-EM recount + prune, and single-char segmentability backstop."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.unigram import (
    micro_costs,
    seed_pieces,
    smoothed_costs,
    train_unigram,
    with_viterbi,
)


def _seg(spark, word: str, costs: list[tuple[str, int]], max_piece: int = 6):
    df = spark.createDataFrame([(word,)], "word string")
    r = with_viterbi(df, "word", costs, max_piece=max_piece).first()["vit"]
    return r["seg"], int(r["cost"])


def test_viterbi_picks_lowest_cost_path(spark):
    # 'ab' as one piece (cost 5) beats 'a'+'b' (cost 3+3=6)
    seg, cost = _seg(spark, "ab", [("a", 3), ("b", 3), ("ab", 5)])
    assert (seg, cost) == ("ab", 5)
    # and loses when the split is cheaper
    seg, cost = _seg(spark, "ab", [("a", 2), ("b", 2), ("ab", 5)])
    assert (seg, cost) == ("a b", 4)


def test_viterbi_tiebreak_prefers_longer_last_piece(spark):
    # equal total cost: 'ab' (4) == 'a'+'b' (2+2) — longest-last wins
    seg, cost = _seg(spark, "ab", [("a", 2), ("b", 2), ("ab", 4)])
    assert (seg, cost) == ("ab", 4)
    # the preference applies per DP step, rightmost decision first:
    # 'abc' with all pieces cost 2: 'abc' might be absent — 'ab c' vs
    # 'a bc': both cost 4; the final step prefers the longer LAST piece.
    seg, cost = _seg(
        spark, "abc", [("a", 2), ("b", 2), ("c", 2), ("ab", 2), ("bc", 2)]
    )
    assert (seg, cost) == ("a bc", 4)


def test_viterbi_respects_max_piece_window(spark):
    # 'abcd' exists as a piece but max_piece=2 forbids using it
    costs = [("a", 9), ("b", 9), ("c", 9), ("d", 9), ("ab", 1), ("cd", 1), ("abcd", 1)]
    seg, cost = _seg(spark, "abcd", costs, max_piece=2)
    assert (seg, cost) == ("ab cd", 2)


def test_viterbi_char_fallback_always_segments(spark):
    # no multi-char pieces at all: falls back to chars
    seg, cost = _seg(spark, "xyz", [("x", 1), ("y", 2), ("z", 3)])
    assert (seg, cost) == ("x y z", 6)


def test_seed_pieces_top_k_and_char_backstop(spark):
    vocab = spark.createDataFrame(
        [("abab", 10), ("cd", 1)], "word string, cnt long"
    )
    rows = {
        r["piece"]: r["c"]
        for r in seed_pieces(vocab, max_piece=2, num_multi=2).collect()
    }
    # multi-char: 'ab' appears twice per 'abab' occurrence -> 20;
    # 'ba' once -> 10; 'cd' once -> 1. top-2 keeps ('ab', 'ba').
    assert rows["ab"] == 20 and rows["ba"] == 10 and "cd" not in rows
    # all single chars ride along regardless of count
    assert {"a", "b", "c", "d"} <= set(rows)


def test_micro_costs_are_negative_log_probs(spark):
    import math

    pieces = spark.createDataFrame(
        [("a", 3), ("b", 1)], "piece string, c long"
    )
    got = {r["piece"]: r["cost"] for r in micro_costs(pieces).collect()}
    assert got["a"] == -math.floor(math.log(3 / 4) * 1e6 + 0.5)
    assert got["b"] == -math.floor(math.log(1 / 4) * 1e6 + 0.5)
    # smoothed: (c+1)/(tot+V) keeps zero-count pieces finite
    z = spark.createDataFrame([("a", 3), ("q", 0)], "piece string, c long")
    sm = {r["piece"]: r["cost"] for r in smoothed_costs(z).collect()}
    assert sm["q"] == -math.floor(math.log(1 / 5) * 1e6 + 0.5)


def test_train_prunes_unused_seeds_and_keeps_chars(spark):
    docs = spark.createDataFrame(
        [(i, "hash join hash join scan") for i in range(30)],
        "doc_id long, text string",
    )
    from etl_platform_nyc_taxi_spark.operators.bpe import word_vocab

    final_vocab, segmented = train_unigram(word_vocab(docs))
    pieces = {p for p, _, _ in final_vocab}
    segs = {
        r["word"]: r["vit"]["seg"] for r in segmented.collect()
    }
    # whole high-frequency words become single pieces
    assert segs["hash"] == "hash" and segs["join"] == "join"
    assert segs["scan"] == "scan"
    # every surviving multi-char piece was actually used in pass A;
    # all single chars survive as the segmentability backstop
    used = {p for s in segs.values() for p in s.split(" ")}
    assert all(p in used for p in pieces if len(p) > 1)
    assert {c for w in segs for c in w} <= pieces
    # path cost equals the sum of final piece costs for every word
    costs = {p: cost for p, _, cost in final_vocab}
    seg_rows = segmented.select("word", "vit").collect()
    for r in seg_rows:
        total = sum(costs[p] for p in r["vit"]["seg"].split(" "))
        assert total == r["vit"]["cost"], r["word"]


def test_apply_is_shuffle_free(spark):
    """The serving path must stay map-only: no Exchange in the plan."""
    df = spark.createDataFrame([("abc",)], "word string")
    plan = (
        with_viterbi(df, "word", [("a", 1), ("b", 1), ("c", 1), ("ab", 1)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
