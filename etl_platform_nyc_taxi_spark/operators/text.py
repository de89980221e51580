"""Text-analysis operators for LLM-data pipelines (SURVEY.md §7.2 step 5).

Tokenization, quality scoring, language-ID heuristic, and document
fingerprinting — all pure built-in expressions (split/regexp/higher-order
functions), zero UDFs, so they run at parquet-scan speed and every one has
an exact DuckDB-SQL oracle. Designed for the ``documents`` fixture
(doc_id, text, lang, source, n_chars) but parameterized on column names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny deterministic English stopword list for ratio features. (The
#: fixture corpus is synthetic word-soup, so this is a *capability*
#: demonstration with an exact oracle, not a trained model.)
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
#: the standard GPT-2-style pre-split shape, minus unicode categories.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens_ws(text: str | Column) -> Column:
    """Whitespace tokens as array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def tokens_bpe(text: str | Column) -> Column:
    """BPE-ish sub-word pre-tokens (lowercased) as array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), 0)


def token_count(text: str | Column, mode: str = "ws") -> Column:
    """Token count (whitespace or BPE-ish regex)."""
    return F.size(tokens_ws(text) if mode == "ws" else tokens_bpe(text))


def stopword_hits(tok_arr: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """How many tokens are stopwords (array filter, JVM-side)."""
    return F.size(F.filter(tok_arr, lambda t: t.isin(*stopwords)))


def with_text_stats(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Quality-scoring features per document:

    * ``n_tokens`` whitespace tokens, ``n_bpe_tokens`` subword tokens
    * ``avg_token_len`` = chars-sans-spaces / tokens
    * ``stopword_ratio`` stopword tokens / tokens
    * ``alpha_ratio`` alphabetic chars / chars

    All double arithmetic derives from integer counts (deterministic and
    engine-portable).
    """
    toks = tokens_ws(text_col)
    c = F.col(text_col)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    n_nospace = F.length(F.regexp_replace(c, r"\s", ""))
    n_tok = F.size(toks)
    p = prefix
    return df.withColumns(
        {
            f"{p}n_tokens": n_tok,
            f"{p}n_bpe_tokens": F.size(tokens_bpe(text_col)),
            f"{p}avg_token_len": n_nospace.cast("double") / n_tok,
            f"{p}stopword_ratio": stopword_hits(toks).cast("double") / n_tok,
            f"{p}alpha_ratio": n_alpha.cast("double") / n_chars,
        }
    )


def language_id(
    text_col: str | Column,
    stopwords: tuple[str, ...] = EN_STOPWORDS,
    threshold: float = 0.05,
) -> Column:
    """Stopword-density language heuristic: 'en' when the English stopword
    ratio clears ``threshold``, else 'unknown'. A real pipeline swaps in
    per-language stopword lists or an n-gram model; the operator shape
    (array filter → ratio → threshold) is what scales."""
    toks = tokens_ws(text_col)
    ratio = stopword_hits(toks, stopwords).cast("double") / F.size(toks)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown"))


def normalize_text(text_col: str | Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def fingerprint(text_col: str | Column) -> Column:
    """Deterministic 32-hex document fingerprint over normalized text
    (md5 — portable to the DuckDB oracle; swap for xxhash64 when oracle
    portability doesn't matter)."""
    return F.md5(normalize_text(text_col))


def winnow_fingerprints(
    text_col: str | Column, k: int = 6, window: int = 4
) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken): positional
    k-gram hashes, minimum per sliding window of ``window`` hashes,
    distinct minima as ``array<long>``.

    The robust local fingerprint behind MOSS-style plagiarism/containment
    detection: any shared substring of length ≥ k+window-1 guarantees a
    shared fingerprint. Per-k-gram hashes come from the portable
    md5-prefix family (functions/hashing.py), so the whole operator is
    DuckDB-oracle-checkable; all array work is one pass, bound as a
    lambda variable so the hash array evaluates once."""
    from etl_platform_nyc_taxi_spark.functions.hashing import (
        shingle_hash48,
        shingles,
    )

    def winnow(hv: Column) -> Column:
        n = F.greatest(F.size(hv) - F.lit(window - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.array_min(F.slice(hv, i, window)),
            )
        )

    return F.transform(
        F.array(shingle_hash48(shingles(text_col, k))), winnow
    )[0]


def winnow_fingerprint_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    window: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Winnowing fingerprints as (id, fp) rows — the scale form of
    :func:`winnow_fingerprints`.

    posexplode the k-gram stream → one codegen md5 per gram → per-doc
    window MIN over (pos .. pos+window-1) → distinct (id, fp). Identical
    fingerprint set to the array version (same hash family, same clamped
    trailing windows) but every hash runs inside whole-stage codegen
    instead of an interpreted higher-order transform, and the per-doc sort
    is a partitioned window (shuffle on id), never a driver-side array.
    """
    from pyspark.sql import Window

    from etl_platform_nyc_taxi_spark.functions.hashing import shingles

    base = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    if partitions:
        base = base.repartition(partitions)
    pos = base.select(
        F.col(id_col), F.posexplode(shingles(F.col("__t"), k)).alias("__pos", "__sh")
    )
    hashed = pos.select(
        F.col(id_col),
        F.col("__pos"),
        F.conv(F.substring(F.md5(F.col("__sh")), 1, 12), 16, 10)
        .cast("long")
        .alias("__h"),
    )
    wmin = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(0, window - 1)
    wall = Window.partitionBy(id_col)
    mins = hashed.select(
        F.col(id_col),
        F.col("__pos"),
        F.min("__h").over(wmin).alias("fp"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    )
    # windows start only at pos <= n-window (0-based); short docs keep the
    # single clamped window at pos 0 — mirrors the array version's
    # greatest(n-window+1, 1) window count
    return (
        mins.filter(F.col("__pos") <= F.greatest(F.col("__n") - window, F.lit(0)))
        .select(F.col(id_col), "fp")
        .distinct()
    )
