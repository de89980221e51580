"""Deterministic unigram-LM subword tokenizer (SentencePiece family) —
distributed train + apply.

The unigram language-model tokenizer of Kudo 2018 (arXiv:1804.10959),
the "other" production tokenizer family next to BPE (operators/bpe.py):
instead of learning a merge list, it scores every candidate piece with a
unigram log-probability and segments each word with the Viterbi
lowest-cost path over the piece lattice. Training is hard-EM
(Viterbi-EM) with a fixed round count so every step is deterministic
and oracle-replayable — soft-EM's forward-backward would force float
accumulation orders onto the comparison surface, hard-EM keeps the
whole lifecycle in integer micro-nats after one quantization point.

Pipeline (mirrors SentencePiece's seed → EM → prune loop, collapsed to
one recount round):

1. **seed**: candidate pieces = every substring of length 1..MAX_PIECE
   of every distinct word, counted with word-frequency weights; keep
   the top ``num_multi`` multi-char pieces by (count DESC, piece ASC)
   plus ALL single characters (so every word always segments).
2. **cost**: piece cost in integer micro-nats, ``-floor(ln(count /
   total)·1e6 + 0.5)`` — the one float→int quantization (the
   operators/nbayes idiom; everything downstream is BIGINT).
3. **Viterbi (pass A)**: per-word lowest-cost segmentation under the
   seed costs — one expression fold, no UDF (below).
4. **hard-EM recount**: piece usage counts from the pass-A
   segmentations; the new vocabulary is (used pieces ∪ all single
   chars) — unused multi-char seeds are pruned, exactly
   SentencePiece's prune step with keep-threshold "used at all".
   Add-one-smoothed costs ``-floor(ln((c+1)/(tot+V))·1e6+0.5)`` keep
   never-used chars finite.
5. **Viterbi (pass B)**: final segmentation under the recounted costs;
   (costs, segmentation) is the shipped tokenizer artifact.

Viterbi as a single HOF fold (no chained-lambda blowup — the
operators/bpe.py segment_expr lesson; this is ONE ``aggregate`` with
nesting depth 2, not ``num_merges`` chained folds): the accumulator is
the DP frontier — an array of the last MAX_PIECE ``(cost, seg)`` bests,
newest first, so ``element_at(acc, k)`` is ``best(i-k)`` when computing
position ``i``. Each step builds ≤ MAX_PIECE candidate structs
(piece = ``substring(word, i-k+1, k)`` looked up in the broadcast cost
map), sorts by the composite integer key ``cost·(MAX_PIECE+1) +
(MAX_PIECE-k)`` — total order: lowest cost, then longest last piece —
and prepends the winner. DuckDB replays the identical frontier walk as
a recursive CTE carrying the same window (the registry oracle).

Scale design (the 100 TB argument — shared with operators/bpe.py):

* **vocab collapse** — one shuffle (word → count) collapses the corpus
  to |distinct words| rows; seeding, both Viterbi passes, and the
  recount all run on that table only. The corpus itself is read once.
* **bounded artifacts** — the piece table is ≤ ``num_multi`` + |chars|
  rows by construction; it ships into the fold as ONE constant map
  column referenced by attribute (the trained-tokenizer artifact, same
  broadcast-class premise as tokenize_documents' vocab broadcast). No
  literal growth with corpus size — only with the (fixed) vocab knob.
* **apply is map-only** — segmentation is a per-row expression fold:
  no shuffle, no UDF, embarrassingly parallel over 100 TB.
* **train is 2 bounded collects + 3 keyed aggs** — substring counts,
  usage recount (both map-side combinable), and the two cost-table
  collects of ≤ vocab rows each.

Determinism: every ordering is a total order ((count DESC, piece) for
seed selection; the composite integer key for DP ties); no randomness,
no floats past the cost quantization.

Reference parity: the reference engine (431 LoC, two taxi jobs) has no
tokenizer; this module belongs to the training-data extension surface
the brief mandates alongside dedup/ANN/mixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

#: max candidate piece length — bounds the DP window, the substring
#: explosion (|word|·MAX_PIECE candidates per word), and the recursive
#: oracle's carried frontier. 6 covers whole common words in the
#: fixture corpus (SentencePiece defaults to 16 at web scale; the knob
#: is free, cost is linear in it).
MAX_PIECE = 6

#: multi-char seed-vocabulary size (single chars always ride along).
NUM_MULTI = 64


def seed_pieces(
    vocab: DataFrame, max_piece: int = MAX_PIECE, num_multi: int = NUM_MULTI
) -> DataFrame:
    """Candidate piece table ``(piece, c)`` from a word-frequency vocab
    (operators/bpe.word_vocab): every substring of length 1..max_piece
    counted with word-frequency weights (multiplicity per occurrence),
    pruned to the top ``num_multi`` multi-char pieces by the
    (count DESC, piece ASC) total order, plus all single characters."""
    subs = vocab.select(
        "cnt",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, {max_piece}), l ->
              filter(transform(sequence(1, length(word)), s ->
                CASE WHEN s + l - 1 <= length(word)
                     THEN substring(word, s, l) END),
                x -> x IS NOT NULL)))"""
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("cnt").alias("c"))
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("c").desc(), "piece")
        .limit(num_multi)
    )
    return multi.unionByName(counts.where(F.length("piece") == 1))


def micro_costs(pieces: DataFrame) -> DataFrame:
    """Unsmoothed integer micro-nat costs ``(piece, cost)``:
    ``-floor(ln(c / total)·1e6 + 0.5)`` — the seed model. The total is a
    1-row broadcast relation, not a collected literal."""
    tot = pieces.agg(F.sum("c").cast("bigint").alias("tot"))
    return pieces.crossJoin(F.broadcast(tot)).select(
        "piece",
        (
            -F.floor(
                F.log(F.col("c").cast("double") / F.col("tot").cast("double"))
                * F.lit(float(MICRO))
                + F.lit(0.5)
            )
        )
        .cast("bigint")
        .alias("cost"),
    )


def smoothed_costs(pieces: DataFrame) -> DataFrame:
    """Add-one-smoothed costs over a (possibly zero-count) vocabulary:
    ``-floor(ln((c+1)/(tot+V))·1e6 + 0.5)`` — the post-recount model,
    finite for never-used single chars."""
    tot = pieces.agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    return pieces.crossJoin(F.broadcast(tot)).select(
        "piece",
        (
            -F.floor(
                F.log(
                    (F.col("c") + F.lit(1)).cast("double")
                    / (F.col("tot") + F.col("v")).cast("double")
                )
                * F.lit(float(MICRO))
                + F.lit(0.5)
            )
        )
        .cast("bigint")
        .alias("cost"),
    )


def _viterbi_fold_expr(word_col: str, map_col: str, max_piece: int) -> Column:
    """The DP fold with the cost map referenced as a column attribute —
    one attribute node per lookup instead of re-inlining the whole map
    literal (3 lookups × max_piece candidates × |vocab| entries was
    measured as ~15 s of pure Catalyst analysis at vocab 90)."""
    mp = max_piece
    return F.expr(
        f"""aggregate(
      sequence(1, length({word_col})),
      array(struct(CAST(0 AS BIGINT) AS cost, CAST('' AS STRING) AS seg)),
      (acc, i) -> concat(
        transform(array((
          element_at(
            array_sort(filter(transform(sequence(1, {mp}), k ->
              CASE WHEN k <= i AND k <= size(acc)
                        AND element_at({map_col},
                              substring({word_col}, i - k + 1, k))
                            IS NOT NULL
                   THEN named_struct(
                     'key',
                     (element_at(acc, k).cost
                        + element_at({map_col},
                            substring({word_col}, i - k + 1, k)))
                       * {mp + 1} + {mp} - k,
                     'cost',
                     element_at(acc, k).cost
                       + element_at({map_col},
                           substring({word_col}, i - k + 1, k)),
                     'seg',
                     CASE WHEN i = k
                          THEN substring({word_col}, i - k + 1, k)
                          ELSE concat(element_at(acc, k).seg, ' ',
                                      substring({word_col}, i - k + 1, k))
                     END)
              END), x -> x IS NOT NULL)), 1)
        )), b -> named_struct('cost', b.cost, 'seg', b.seg)),
        slice(acc, 1, {mp - 1})),
      acc -> named_struct('cost', element_at(acc, 1).cost,
                          'seg', element_at(acc, 1).seg))"""
    )


def with_viterbi(
    df: DataFrame,
    word_col: str,
    cost_pairs: list[tuple[str, int]],
    out_col: str = "vit",
    max_piece: int = MAX_PIECE,
) -> DataFrame:
    """Add ``out_col = struct(cost BIGINT, seg STRING)`` — the
    lowest-cost segmentation of ``word_col`` under a trained piece cost
    table (seg = space-joined pieces) — as one ``aggregate`` fold, pure
    expressions, no UDF, no shuffle.

    ``cost_pairs`` is the collected tokenizer artifact (bounded by the
    vocab knobs); it embeds as ONE constant map column the fold
    references by attribute, keeping the expression tree small. The
    fold carries the DP frontier (last ``max_piece`` bests, newest
    first) and picks each step's winner by the composite integer key
    ``cost·(max_piece+1) + (max_piece-k)`` — lowest total cost first,
    longest last piece on ties. Words are ``[a-z]+`` pre-tokens, so
    piece text can never collide with the space separator or a quote."""
    entries: list[Column] = []
    for p, c in sorted(cost_pairs):
        entries += [F.lit(p), F.lit(int(c)).cast("long")]
    tmp = f"__ug_costs_{out_col}"
    return (
        df.withColumn(tmp, F.create_map(*entries))
        .withColumn(out_col, _viterbi_fold_expr(word_col, tmp, max_piece))
        .drop(tmp)
    )


def train_unigram(
    vocab: DataFrame,
    max_piece: int = MAX_PIECE,
    num_multi: int = NUM_MULTI,
) -> tuple[list[tuple[str, int, int]], DataFrame]:
    """Train the unigram tokenizer on a word-frequency vocab with one
    hard-EM recount round (seed costs → Viterbi A → usage recount +
    prune → smoothed costs → Viterbi B).

    Returns ``(final_vocab, segmented)`` where final_vocab is
    ``[(piece, count, cost_micro)]`` — the shipped tokenizer artifact —
    and segmented is the word table with ``vit = struct(cost, seg)``
    under the final model. Both collects are of bounded, vocab-sized
    relations (the broadcast-class artifact pattern of
    queries_registry._BPE_CACHE)."""
    # vocab feeds four consumers (seed agg, both Viterbi passes, the
    # recount join) and seeds feeds two — checkpoint once so the corpus
    # scan + word agg never re-executes (both are collapsed-vocab-sized;
    # consumed entirely within this call, so the bench unpersist-sweep
    # hazard of cross-query checkpoints does not apply).
    vocab = vocab.select("word", "cnt").localCheckpoint(eager=False)
    seeds = seed_pieces(vocab, max_piece, num_multi).localCheckpoint(
        eager=False
    )
    c0 = [(r["piece"], int(r["cost"])) for r in micro_costs(seeds).collect()]

    seg_a = with_viterbi(vocab, "word", c0, max_piece=max_piece)
    usage = (
        seg_a.select(
            "cnt", F.explode(F.split(F.col("vit.seg"), " ")).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    chars = (
        seeds.where(F.length("piece") == 1)
        .select("piece")
        .join(usage, "piece", "left_anti")
        .withColumn("c", F.lit(0).cast("bigint"))
    )
    vocab1 = usage.unionByName(chars)
    cost1 = vocab1.join(smoothed_costs(vocab1), "piece")
    final_vocab = [
        (r["piece"], int(r["c"]), int(r["cost"])) for r in cost1.collect()
    ]
    c1 = [(p, cost) for p, _, cost in final_vocab]
    segmented = with_viterbi(vocab, "word", c1, max_piece=max_piece)
    return final_vocab, segmented
