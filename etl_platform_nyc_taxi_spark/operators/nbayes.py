"""Multinomial Naive Bayes text classifier (train + score), pure DataFrame.

The supervised counterpart of the rule-based quality gates in
operators/text.py: production LLM-data pipelines (CCNet, LLaMA's data
recipe, fastText-based LID) train a linear bag-of-words classifier on a
small labeled (or heuristically-labeled) set, then score the full corpus
with it — exactly the "distill a heuristic into a classifier" loop this
module implements. Multinomial NB is the closed-form member of that
family: training is nothing but token counts (one shuffle with map-side
combine), scoring is a join + weighted sum, so BOTH phases are exact
relational algebra with a bit-for-bit DuckDB replay — no SGD, no
iteration, no nondeterminism.

Engine-portable determinism: every log-probability is quantized to integer
MICRO-NATS at the one point it is born — ``floor(ln(p)·1e6 + 0.5)`` of a
single exactly-rounded IEEE division — and all downstream accumulation is
BIGINT (the bigram-LM discipline, operators/text.bigram_lm_scores). Doc
scores, argmax, and tie-breaks are therefore order-independent integers.

Scale shape (100 TB): training aggregates combine map-side and shuffle
token keys only; the model relation is vocab×classes rows — orders smaller
than the corpus — so scoring joins it by token (AQE broadcasts when it
fits). The per-class summary (priors, smoothing defaults) is a
classes-sized relation attached by broadcast. The test corpus is read
once, pre-aggregated to (doc, token, count) before the model join so the
join moves token TYPES per doc, not occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.text import tokens_ws

MICRO = 1_000_000


def _micro_ln(x) -> F.Column:
    """floor(ln(x)·1e6 + 0.5) as BIGINT — the one float→int quantization."""
    return F.floor(F.log(x) * F.lit(float(MICRO)) + F.lit(0.5)).cast("long")


def nb_train(
    train_df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train add-one-smoothed multinomial NB.

    Returns ``(model, classes)``:
      * ``model``  — ``(cls, tok, llh_micro)``: per (class, token) log
        p(tok|cls) = ln((c+1)/(n_cls+V)) in micro-nats;
      * ``classes`` — ``(cls, prior_micro, default_micro)``: log class
        prior and the unseen-token fallback ln(1/(n_cls+V)).

    V is the TRAIN vocabulary size, attached as a 1-row broadcast (never a
    driver action)."""
    toks = train_df.select(
        F.col(label_col).alias("cls"), F.explode(tokens_ws(text_col)).alias("tok")
    )
    ctc = toks.groupBy("cls", "tok").agg(F.count(F.lit(1)).alias("c"))
    # n_cls and V re-aggregate the (cls, tok, c) relation instead of the
    # raw token explode: sum(c) per class == occurrence count, distinct
    # tok over ctc == train vocabulary, and every consumer now sits on
    # the SAME (cls, tok) exchange, which ReuseExchange computes once —
    # the previous shape ran the tokenize+explode trunk three times (r12
    # optimization, guide §2.3).
    ncls = ctc.groupBy("cls").agg(F.sum("c").alias("n_tok"))
    vocab = ctc.agg(F.countDistinct("tok").cast("long").alias("vsz"))
    docs = train_df.groupBy(F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = train_df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))

    model = (
        ctc.join(ncls, "cls")
        .crossJoin(F.broadcast(vocab))
        .select(
            "cls",
            "tok",
            _micro_ln(
                (F.col("c") + F.lit(1))
                / (F.col("n_tok") + F.col("vsz")).cast("double")
            ).alias("llh_micro"),
        )
    )
    classes = (
        docs.join(ncls, "cls")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(total))
        .select(
            "cls",
            _micro_ln(
                F.col("n_docs") / F.col("n_total").cast("double")
            ).alias("prior_micro"),
            _micro_ln(
                F.lit(1) / (F.col("n_tok") + F.col("vsz")).cast("double")
            ).alias("default_micro"),
        )
    )
    return model, classes


def nb_score(
    test_df: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every test doc under every class: ``(id, cls, score_micro)``.

    score = prior + Σ_tok k·llh(tok|cls), unseen tokens take the class's
    smoothing default. Zero-token docs score their priors (the doc×class
    frame comes from a broadcast cross of the classes relation, so no doc
    is dropped)."""
    tk = (
        test_df.select(
            F.col(id_col).alias("__id"), F.explode(tokens_ws(text_col)).alias("tok")
        )
        .groupBy("__id", "tok")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    per_tok = (
        tk.crossJoin(F.broadcast(classes.select("cls", "default_micro")))
        .join(model, ["cls", "tok"], "left")
        .select(
            "__id",
            "cls",
            (
                F.col("k")
                * F.coalesce("llh_micro", F.col("default_micro"))
            ).alias("w"),
        )
        .groupBy("__id", "cls")
        .agg(F.sum("w").cast("long").alias("tok_micro"))
    )
    frame = test_df.select(F.col(id_col).alias("__id")).crossJoin(
        F.broadcast(classes.select("cls", "prior_micro"))
    )
    return frame.join(per_tok, ["__id", "cls"], "left").select(
        F.col("__id").alias(id_col),
        "cls",
        (
            F.col("prior_micro") + F.coalesce("tok_micro", F.lit(0))
        ).cast("long").alias("score_micro"),
    )


def nb_classify(
    test_df: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Argmax over :func:`nb_score`: ``(id, predicted, score_micro)``.
    Deterministic tie-break: highest score, then lexicographically
    smallest class. The reduction is ONE conditional aggregate —
    ``min(struct(-score, cls))`` orders (-score asc, cls asc) ==
    (score desc, cls asc), exactly the previous row_number window's
    ORDER BY — so the partial argmax folds map-side instead of
    shuffling + sorting the doc×class frame (r12 optimization, guide
    §2.3; scores are never null, every doc keeps its row)."""
    scored = nb_score(test_df, model, classes, id_col, text_col)
    best = scored.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("score_micro")).alias("neg"), F.col("cls")
            )
        ).alias("__b")
    )
    return best.select(
        id_col,
        F.col("__b.cls").alias("predicted"),
        (-F.col("__b.neg")).alias("score_micro"),
    )
