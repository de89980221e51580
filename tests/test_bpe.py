"""BPE tokenizer semantics: greedy fold, deterministic merge order,
train/apply agreement, and the document rollup (operators/bpe.py;
VERDICT r9 task 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.bpe import (
    merge_pair_expr,
    segment_expr,
    tokenize_documents,
    train_bpe,
    word_vocab,
)


def _fold(spark, syms: list[str], left: str, right: str) -> list[str]:
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    return df.select(merge_pair_expr("syms", left, right).alias("r")).first()[
        "r"
    ]


def test_greedy_fold_semantics(spark):
    """Left-to-right greedy: overlapping candidates merge alternately
    from the left; adjacent non-overlapping candidates all merge."""
    assert _fold(spark, list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _fold(spark, list("aaa"), "a", "a") == ["aa", "a"]
    assert _fold(spark, list("abab"), "a", "b") == ["ab", "ab"]
    assert _fold(spark, list("aab"), "a", "b") == ["a", "ab"]
    # merged output token does not re-trigger within the same pass
    assert _fold(spark, ["ab", "a", "b"], "a", "b") == ["ab", "ab"]
    # a token ending in 'a' must NOT merge with a following 'b'
    assert _fold(spark, ["xa", "b"], "a", "b") == ["xa", "b"]
    # single-symbol word passes through
    assert _fold(spark, ["q"], "a", "b") == ["q"]


def test_merge_symbols_validated(spark):
    with pytest.raises(ValueError, match="space-free"):
        _fold(spark, ["a", "b"], "a ", "b")
    with pytest.raises(ValueError, match="nonempty"):
        _fold(spark, ["a", "b"], "", "b")


def test_train_order_and_tiebreak(spark):
    """'abab' x3 + 'cd' x3: pair counts are (a,b)=6, (b,a)=3, (c,d)=3 —
    round 1 merges (a,b); round 2 ties (b,a)... gone after merge, so
    counts are (ab,ab)=3 and (c,d)=3: the (ab,ab) < (c,d) lexicographic
    tie-break picks (ab,ab)."""
    docs = spark.createDataFrame(
        [(1, "abab abab abab cd cd cd")], "doc_id int, text string"
    )
    merges, vf = train_bpe(word_vocab(docs), num_merges=2)
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("a", "b", 6),
        ("ab", "ab", 3),
    ]
    segs = {r["word"]: r["syms"] for r in vf.collect()}
    assert segs == {"abab": ["abab"], "cd": ["c", "d"]}


def test_train_stops_when_vocabulary_exhausted(spark):
    """Single-char words only: no adjacent pairs exist, training stops
    early instead of looping."""
    docs = spark.createDataFrame([(1, "a b c a b")], "doc_id int, text string")
    merges, _ = train_bpe(word_vocab(docs), num_merges=5)
    assert merges == []


def test_segment_expr_matches_training_segmentation(spark):
    """Applying the merge list to raw words reproduces the trained
    vocab's final segmentation exactly (train/apply agreement)."""
    docs = spark.createDataFrame(
        [(1, "lower lowest newer newest wider")], "doc_id int, text string"
    )
    merges, vf = train_bpe(word_vocab(docs), num_merges=6)
    applied = {
        r["word"]: r["seg"]
        for r in vf.select(
            "word", segment_expr("word", merges).alias("seg")
        ).collect()
    }
    trained = {r["word"]: r["syms"] for r in vf.collect()}
    assert applied == trained


def test_tokenize_documents_rollup(spark):
    """Doc-level (n_words, n_tokens) equals the manual sum over the
    word segmentation; docs with no [a-z] words drop out."""
    docs = spark.createDataFrame(
        [(1, "abab cd"), (2, "abab abab"), (3, "123 !!")],
        "doc_id int, text string",
    )
    merges, vf = train_bpe(word_vocab(docs), num_merges=1)  # merges (a,b)
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in tokenize_documents(docs, vf).collect()
    }
    # abab -> [ab, ab] (2 tokens), cd -> [c, d] (2 tokens)
    assert out == {1: (2, 4), 2: (2, 4)}


def test_bpe_queries_survive_unpersist_sweep(spark):
    """Regression (r10 bench): bench.py's between-query hygiene sweep
    blocking-unpersists EVERY persistent RDD — a cached localCheckpoint'd
    vocab DataFrame dies there (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). The
    registry must cache only the merge list and rebuild the segmentation
    expression-side, so the apply queries survive the sweep."""
    from etl_platform_nyc_taxi_spark import queries_registry as qr

    sf = "/root/testdata/sf0.001"
    qr._BPE_CACHE.clear()
    assert qr.QUERIES["bpe_merges"](spark, sf).count() > 0  # trains + caches
    # emulate bench.py _gc_sweep: blocking unpersist of all persistent RDDs
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()
    assert qr.QUERIES["bpe_tokenize"](spark, sf).count() > 0
    assert qr.QUERIES["bpe_token_counts"](spark, sf).count() > 0
    assert qr.QUERIES["pack_sequences_bpe"](spark, sf).count() > 0
