"""Text-analysis operator semantics on hand-computable strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.text import (
    fingerprint,
    language_id,
    normalize_text,
    token_count,
    tokens_bpe,
    with_text_stats,
)


def test_text_stats_exact_values(spark):
    df = spark.createDataFrame([(1, "The cat of  the hat!")], "doc_id long, text string")
    row = with_text_stats(df).first()
    assert row["n_tokens"] == 5  # The cat of the hat!
    # bpe: the|cat|of|the|hat|! = 6
    assert row["n_bpe_tokens"] == 6
    # chars sans spaces = len("Thecatofthehat!") = 15, avg = 15/5
    assert row["avg_token_len"] == 15 / 5
    # stopwords (lowercase list): 'of', 'the' → 2 of 5 ('The' ≠ 'the')
    assert row["stopword_ratio"] == 2 / 5
    # alpha chars = 14 of 20
    assert row["alpha_ratio"] == 14 / 20


def test_language_id_threshold(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zzz qqq xxx yyy www")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["l"] for r in df.select("doc_id", language_id("text").alias("l")).collect()}
    assert out[1] == "en" and out[2] == "unknown"


def test_tokens_bpe_splits_runs_and_punct(spark):
    df = spark.createDataFrame([(1, "Ab12-cd!")], "doc_id long, text string")
    assert df.select(tokens_bpe("text").alias("t")).first()["t"] == [
        "ab", "12", "-", "cd", "!",
    ]


def test_token_count_modes(spark):
    df = spark.createDataFrame([(1, "one two three")], "doc_id long, text string")
    assert df.select(token_count("text").alias("n")).first()["n"] == 3
    assert df.select(token_count("text", "bpe").alias("n")).first()["n"] == 3


def test_fingerprint_normalizes_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, " hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]
    norm = df.select(normalize_text("text").alias("n")).first()["n"]
    assert norm == "hello world"
