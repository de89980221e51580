"""Deterministic BPE subword tokenizer — distributed train + apply.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) with GPT-2
style pre-tokenization (regex word split, merges never cross a word
boundary). Training-data pipelines tokenize before packing; this module
lets ``pack_sequences``/``length_buckets`` price real subword tokens
instead of whitespace tokens (VERDICT r9 task 3).

Scale design (the 100 TB argument):

* **vocab collapse** — training never iterates the corpus. One shuffle
  (word → count) collapses 100 TB of text to a word-frequency table of
  |distinct words| rows; every merge iteration runs on that table only.
  This is the classic Sennrich optimization, and it is exactly the
  map-side-combinable aggregate Spark does best.
* **merge iterations** — each of the (fixed, small) ``num_merges``
  rounds is: adjacent-pair count (one keyed agg with partial
  aggregation), a 1-row ``TakeOrderedAndProject`` argmax collect (a
  bounded scalar, the registry's documented collect class), and a
  pure-expression re-segmentation fold. ``localCheckpoint`` truncates
  lineage so the plan does not grow with rank.
* **apply** — a per-row expression chain (no UDF, no shuffle): word →
  chars → one ``aggregate`` fold per merge, in rank order.

Determinism: pair selection orders by (count DESC, left ASC, right
ASC) — a total order, so ties are stable; the fold is greedy
left-to-right, the same semantics DuckDB's ``list_reduce`` replays in
the registry oracle. No randomness anywhere.

The fold encodes the token list as a space-joined string accumulator:
merging ``(L, R)`` when the accumulator ends with token ``L`` and the
next symbol is ``R`` is just *appending R without a separator* — which
keeps the accumulator a scalar (DuckDB's 2-arg ``list_reduce`` cannot
carry a list accumulator). Tokens come from ``[a-z]+`` pre-tokenization
so the space separator can never collide with token content.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pre-tokenizer: lowercased alphabetic runs. Tokens therefore can never
#: contain the space separator or a quote — both load-bearing (fold
#: encoding; merge symbols embed in expression literals).
WORD_PATTERN = "[a-z]+"


def word_vocab(
    docs: DataFrame, text_col: str = "text", pattern: str = WORD_PATTERN
) -> DataFrame:
    """(word, cnt, syms) word-frequency table — the training corpus
    collapsed to one row per distinct word, symbols initialized to
    characters. The only pass over the raw corpus in the whole
    train+apply lifecycle."""
    w = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 0)")
        ).alias("word")
    )
    return (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("syms", F.split("word", ""))
    )


def merge_pair_expr(syms_col: str, left: str, right: str) -> Column:
    """Re-segment ``syms_col`` by greedily merging adjacent (left,
    right) symbol pairs, left to right — pure expressions (aggregate
    fold over a space-joined accumulator; merging = append WITHOUT the
    separator, so the accumulator stays a scalar string)."""
    return _chain_merge(F.col(syms_col), left, right)


def train_bpe(
    vocab: DataFrame, num_merges: int = 12
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges from a :func:`word_vocab` table.

    Returns ``(merges, vocab_final)`` where merges is
    ``[(rank, left, right, pair_count)]`` in training order and
    vocab_final is the vocab with fully-merged ``syms`` — the word →
    segmentation lookup :func:`tokenize_documents` broadcasts.

    Each iteration: count adjacent pairs weighted by word frequency
    (one keyed agg), pick the argmax by (count DESC, left, right) — a
    1-row TakeOrderedAndProject collect, the bounded-scalar class —
    then fold the winning pair into every word's segmentation.
    ``localCheckpoint`` per round keeps lineage flat."""
    merges: list[tuple[int, str, str, int]] = []
    v = vocab.select("word", "cnt", "syms").localCheckpoint()
    for rank in range(num_merges):
        pairs = (
            v.where(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS l,"
                        "             element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not best:
            break  # every word fully merged — vocabulary exhausted
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, left, right, cnt))
        v = v.withColumn(
            "syms", merge_pair_expr("syms", left, right)
        ).localCheckpoint()
    return merges, v


def segment_expr(
    word_col: str, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Tokenize a word column with a trained merge list: chars, then
    each merge applied in rank order — one chained fold per merge, all
    expressions, embarrassingly parallel.

    CATALYST COST WARNING (measured r10): analysis of chained HOF
    lambdas is exponential in chain depth — 6 merges ≈ 3 s, 8 ≈ 21 s,
    12 ≈ 20 minutes of rule-transform time, regardless of data size.
    Use this only for short merge lists (≤ ~6); for a full tokenizer,
    apply merges through the word → segmentation lookup table instead
    (train once, broadcast-join the vocab — :func:`tokenize_documents`
    and the registry's cached-artifact pattern), which is also how a
    trained tokenizer ships in practice."""
    col: Column = F.split(F.col(word_col), "")
    for _, left, right, _cnt in merges:
        col = _chain_merge(col, left, right)
    return col


def _chain_merge(syms: Column, left: str, right: str) -> Column:
    """One greedy left-to-right (left, right) merge pass as a fold."""
    if not left or not right or " " in left + right:
        raise ValueError(
            "merge symbols must be nonempty and space-free (the fold "
            "separator) — use the [a-z]+ pre-tokenizer"
        )

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.substring_index(acc, " ", -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    folded = F.aggregate(
        F.slice(syms, 2, F.size(syms) - 1),
        F.element_at(syms, 1),
        step,
    )
    return F.split(folded, " ")


def tokenize_documents(
    docs: DataFrame,
    vocab_final: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Per-document subword token accounting: (id, n_words, n_tokens).

    Explodes each document into words and broadcast-joins the trained
    word → segmentation table (merges never cross word boundaries, so
    word-level segmentation IS document tokenization). The vocab side
    is |distinct words| rows — broadcast, never shuffled; the corpus
    side aggregates map-side. Documents with no pattern words drop out
    (inner join), mirroring the oracle."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 0)")
        ).alias("word"),
    )
    seg = vocab_final.select("word", F.size("syms").alias("__nt"))
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__nt").alias("n_tokens"),
        )
    )


def tokenizer_fertility(
    docs: DataFrame,
    vocab_final: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Tokenizer fertility audit per group — the standard multilingual
    tokenizer-quality metric (tokens per word; a language the tokenizer
    serves poorly fragments into many subwords, inflating its effective
    sequence length and training cost): per ``group_col``,
    ``(n_words, n_oov, n_tokens, n_chars, fertility_micro,
    chars_per_token_micro)`` under the trained BPE segmentation.

    Out-of-vocabulary words (absent from ``vocab_final`` because the
    training corpus never produced their word key) are NOT dropped
    (advisor r10: an inner join silently removed exactly the
    poorly-served mass this audit exists to expose): the join is a LEFT
    join, an OOV word is priced at its char-level fallback segmentation
    (one token per character — the pessimistic cost every real BPE pays
    via byte fallback), and ``n_oov`` makes the dropped mass visible.

    Same shape as tokenize_documents: corpus explodes to words, the
    word → segmentation relation broadcasts, the rollup aggregates
    map-side; ratios are exact integer micro units."""
    words = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 0)")
        ).alias("word"),
    )
    seg = vocab_final.select("word", F.size("syms").alias("__nt"))
    return (
        words.join(F.broadcast(seg), "word", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.col("__nt").isNull().cast("long"))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.coalesce(F.col("__nt"), F.length("word")))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_words",
            "n_oov",
            "n_tokens",
            "n_chars",
            F.expr("(1000000 * n_tokens) div n_words").alias(
                "fertility_micro"
            ),
            F.expr("(1000000 * n_chars) div n_tokens").alias(
                "chars_per_token_micro"
            ),
        )
    )
