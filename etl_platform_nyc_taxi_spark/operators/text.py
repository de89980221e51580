"""Text-analysis operators for LLM-data pipelines (SURVEY.md §7.2 step 5).

Tokenization, quality scoring, language-ID heuristic, and document
fingerprinting — all pure built-in expressions (split/regexp/higher-order
functions), zero UDFs, so they run at parquet-scan speed and every one has
an exact DuckDB-SQL oracle. Designed for the ``documents`` fixture
(doc_id, text, lang, source, n_chars) but parameterized on column names.
"""

from __future__ import annotations

from dataclasses import dataclass

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
    """Whitespace tokens as array<string>.

    Empty and whitespace-only inputs yield an EMPTY array: bare
    ``split(trim(''), '\\s+')`` returns ``['']`` (split semantics), which
    inflated empty docs to 1 token and emitted an empty-string term from
    every explode-site downstream (operator review r7). The trailing
    filter removes that phantom token; on non-degenerate input the two
    forms are identical because ``\\s+`` splitting of trimmed text never
    produces interior empties. Oracle SQL mirrors this with
    ``list_filter(string_split_regex(...), t -> t <> '')``.

    r12 note: a ``regexp_replace('^\\s+|\\s+$')`` + branch rewrite
    (to remove the per-element higher-order filter) was tried and
    REVERTED — the anchored-alternation regex scans every position of
    every document and measured consistently SLOWER than the filter on
    tokenize-dominated queries (fuzzy_title_pairs ~1.85 s → ~2.7 s
    isolated); the per-element lambda is cheaper than a second regex
    pass over the text. Guide §1.1: the 'ideal' plan lost to the gotcha,
    empirical loop wins."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


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


@dataclass(frozen=True)
class QualityRules:
    """Thresholds for rule-based document filtering — the C4/Gopher-style
    gate every LLM-data pipeline runs before anything expensive. Defaults
    are in the published ballpark (Gopher: mean word length 3-10, ≥80%
    alpha words; C4: English-word density) but every corpus re-tunes them.
    """

    min_tokens: int = 10
    max_tokens: int = 100_000
    min_avg_token_len: float = 2.0
    max_avg_token_len: float = 12.0
    min_stopword_ratio: float = 0.0
    min_alpha_ratio: float = 0.6
    max_symbol_ratio: float = 0.1


def quality_flag_names(prefix: str = "q_") -> list[str]:
    """The exact flag columns :func:`quality_flags` adds for ``prefix``
    (plus ``keep``). Lets :func:`quality_filter` drop only its own columns
    instead of anything merely sharing the prefix."""
    return [
        f"{prefix}len_ok",
        f"{prefix}token_len_ok",
        f"{prefix}stopwords_ok",
        f"{prefix}alpha_ok",
        f"{prefix}symbols_ok",
    ]


def quality_flags(
    df: DataFrame,
    text_col: str = "text",
    rules: QualityRules = QualityRules(),
    prefix: str = "q_",
) -> DataFrame:
    """Per-rule boolean columns + a ``keep`` conjunction — the audit view
    of quality filtering (downstream dashboards need WHY a doc dropped,
    not just that it did). Pure expressions at scan speed; one pass.

    Refuses input frames already carrying ``keep`` or any of the
    prefixed flag names: silently overwriting a user column (which
    :func:`quality_filter` then DROPS) is the failure mode the
    prefix-scoped-drop design exists to prevent — pass a different
    ``prefix`` or rename the clashing column."""
    clash = [
        c
        for c in (*quality_flag_names(prefix), "keep")
        if c in df.columns
    ]
    if clash:
        raise ValueError(
            f"quality_flags would overwrite existing column(s) {clash}; "
            "pass a different prefix or rename them"
        )
    toks = tokens_ws(text_col)
    c = F.col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    avg_len = (
        F.length(F.regexp_replace(c, r"\s", "")).cast("double") / n_tok
    )
    stop_ratio = stopword_hits(toks).cast("double") / n_tok
    alpha_ratio = (
        F.length(F.regexp_replace(c, r"[^a-zA-Z]", "")).cast("double") / n_chars
    )
    symbol_ratio = (
        F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")).cast("double") / n_chars
    )
    p = prefix
    flags = {
        f"{p}len_ok": (n_tok >= rules.min_tokens) & (n_tok <= rules.max_tokens),
        f"{p}token_len_ok": (avg_len >= rules.min_avg_token_len)
        & (avg_len <= rules.max_avg_token_len),
        f"{p}stopwords_ok": stop_ratio >= rules.min_stopword_ratio,
        f"{p}alpha_ok": alpha_ratio >= rules.min_alpha_ratio,
        f"{p}symbols_ok": symbol_ratio <= rules.max_symbol_ratio,
    }
    out = df.withColumns(flags)
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    rules: QualityRules = QualityRules(),
    prefix: str = "q_",
) -> DataFrame:
    """Docs passing every rule, flag columns dropped — the pipeline form
    (filter early, filter cheap: this gate runs before any shuffle).

    Drops ONLY the flag columns it added (``quality_flag_names(prefix)``
    + ``keep``), so pre-existing user columns that happen to share the
    prefix (e.g. ``q_score``) survive."""
    flagged = quality_flags(df, text_col, rules, prefix)
    return flagged.filter(F.col("keep")).drop(*quality_flag_names(prefix), "keep")


def word_ngrams(text_col: str | Column, n: int = 2) -> Column:
    """All word n-grams (NON-distinct — repetition analysis needs the
    multiset) as array<string>; docs shorter than n yield one clamped
    gram, mirroring dedup.ngram_jaccard_pairs."""
    toks = tokens_ws(text_col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def ngram_offsets(toks: Column, n: int) -> Column:
    """Start offsets (1-based) of every word ``n``-gram of ``toks`` —
    ``sequence(1, greatest(size-n+1, 1))``: the explode-first twin of
    :func:`word_ngrams`. ``explode(ngram_offsets(t, n))`` followed by one
    :func:`ngram_at` projection emits the identical gram multiset while
    the whole stage stays in whole-stage codegen (r12, guide §4.1 — the
    interpreted higher-order ``transform`` built an array of gram strings
    per doc before exploding it; same rework as dedup.hashed_shingles)."""
    return F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))


def ngram_at(toks: Column, i: Column, n: int) -> Column:
    """The word ``n``-gram of ``toks`` starting at 1-based offset ``i`` —
    the same ``concat_ws(' ', slice(...))`` expression as
    :func:`word_ngrams`'s lambda body, so grams are bit-identical
    (including the clamped short-doc gram)."""
    return F.concat_ws(" ", F.slice(toks, i, n))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """Within-document repetition features (the Gopher repetition gate):
    per doc, over word n-grams — ``dup_gram_ratio`` (1 − distinct/total)
    and ``top_gram_ratio`` (most frequent gram's share). Degenerate
    machine-generated or template text scores high on both.

    Shape: explode → (doc, gram) count → per-doc aggregate. Both
    aggregations combine map-side, so the shuffle carries counts, not
    grams — the scale-safe form vs per-doc interpreted array counting
    (O(grams²) per row)."""
    base = df.select(F.col(id_col), tokens_ws(F.col(text_col)).alias("__t"))
    if partitions:
        base = base.repartition(partitions)
    # offset-explode + gram projection (codegen) instead of exploding an
    # interpreted per-doc gram array — identical gram multiset
    g = base.select(
        F.col(id_col), "__t", F.explode(ngram_offsets(F.col("__t"), n)).alias("__i")
    ).select(F.col(id_col), ngram_at(F.col("__t"), F.col("__i"), n).alias("__gram"))
    per = g.groupBy(id_col, "__gram").agg(F.count(F.lit(1)).alias("__c"))
    total = F.sum("__c")
    distinct = F.count(F.lit(1))
    return per.groupBy(id_col).agg(
        total.alias("n_grams"),
        distinct.alias("n_distinct_grams"),
        F.round(F.lit(1.0) - distinct.cast("double") / total, 6).alias(
            "dup_gram_ratio"
        ),
        F.round(F.max("__c").cast("double") / total, 6).alias("top_gram_ratio"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
    partitions: int | None = None,
) -> DataFrame:
    """Sliding-window document chunking — the RAG/embedding prep step:
    one row per (doc, window) with ``size`` tokens every ``stride``
    (overlap = size − stride keeps context across cuts). Output:
    (id, chunk_idx, n_chunk_tokens, chunk_text); every doc yields ≥ 1
    chunk. Pure explode + array-slice expressions: scan-speed, shuffle-
    free, and the 1→N expansion is plain Generate (codegen), not a UDF.

    Window starts stop once a chunk has reached the document end: the
    last start is ``stride·⌈(n−size)/stride⌉`` (0 when n ≤ size), so no
    emitted chunk is a strict subset of its predecessor. The previous
    upper bound (n−1) emitted such subset tails whenever size > stride
    and an earlier chunk already covered the end — duplicate text that
    would skew any downstream token accounting (operator review r7)."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    src = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    if partitions:
        src = src.repartition(partitions)
    toks = tokens_ws(F.col("__t"))
    n_tok = F.size(toks)
    last_start = F.when(
        n_tok > size,
        ((n_tok - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
        * F.lit(stride),
    ).otherwise(F.lit(0))
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    exploded = src.select(
        F.col(id_col), toks.alias("__toks"), F.explode(starts).alias("__start")
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return exploded.select(
        F.col(id_col),
        (F.col("__start") / F.lit(stride)).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Benchmark-contamination scan: training docs sharing any word
    ``n``-gram with the eval set, with per-doc overlap counts — the
    decontamination gate run before every LLM training dump.

    Shape: distinct n-grams per train doc (explode) ⋈ the eval set's
    distinct n-gram relation, count per doc, join back the per-doc totals.
    One shuffle per aggregation, all combining map-side. Grams join as
    STRINGS so the oracle comparison is exact; at 100 TB hash them first
    (functions/hashing.portable_hash64) and accept the ~2^-48 collision
    odds, or keep strings — n-grams are short. Output: (id, n_overlap,
    n_grams, overlap_ratio) for contaminated docs only."""
    t = train.select(F.col(id_col), F.col(text_col).alias("__t"))
    if partitions:
        t = t.repartition(partitions)
    grams = F.array_distinct(word_ngrams(F.col("__t"), n))
    tg = t.select(F.col(id_col), F.explode(grams).alias("__gram"))
    eg = (
        eval_df.select(F.col(text_col).alias("__t"))
        .select(F.explode(grams).alias("__gram"))
        .distinct()
    )
    overlap = tg.join(eg, "__gram").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    totals = t.select(F.col(id_col), F.size(grams).alias("n_grams"))
    return overlap.join(totals, id_col).select(
        F.col(id_col),
        "n_overlap",
        "n_grams",
        F.round(F.col("n_overlap").cast("double") / F.col("n_grams"), 6).alias(
            "overlap_ratio"
        ),
    )


#: PII patterns chosen for cross-engine (Java regex ↔ RE2) identical
#: semantics: no backrefs, no lookaround; \b and (?:...) work in both.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
) -> DataFrame:
    """Scrub emails / phone numbers / IPv4s, emitting the redacted text
    plus per-kind match counts (counts from the ORIGINAL text; replacement
    applied in ``kinds`` order — emails first so their host part is not
    half-eaten by the IP rule). Pure regexp expressions: scan-speed, no
    UDF, and exactly replicable in the DuckDB oracle."""
    c = F.col(text_col)
    red = c
    counts = {}
    for kind in kinds:
        pat, token = PII_PATTERNS[kind]
        counts[f"n_{kind}"] = F.regexp_count(c, F.lit(pat))
        red = F.regexp_replace(red, pat, token.replace("$", r"\$"))
    return df.withColumns({out_col: red, **counts})


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


def length_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Power-of-2 token-length buckets with padding-waste accounting —
    the batching-efficiency audit of a training pipeline (docs batched by
    nearest power-of-2 length minimize pad tokens; this measures what
    that costs per bucket).

    The bucket is computed in INTEGER arithmetic — ``2^len(bin(n-1))`` =
    smallest power of two ≥ n — never via float ``log2``, whose last-ulp
    rounding at exact powers of two would flip buckets differently per
    engine. One scan, one aggregate; group count is bounded by
    log2(max_len), so the shuffle is trivially small at any scale."""
    n_tok = F.size(tokens_ws(text_col))
    bucket = F.when(n_tok <= 1, F.lit(1)).otherwise(
        F.pow(F.lit(2), F.length(F.conv((n_tok - 1).cast("string"), 10, 2))).cast(
            "long"
        )
    )
    return (
        df.select(n_tok.alias("__n"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            F.sum(F.col("bucket") - F.col("__n")).alias("pad_waste"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic keyword-extraction
    / salient-term op over a corpus: (doc, term, score, rank).

    Smooth idf (sklearn convention): ``ln((N+1)/(df+1)) + 1``. Shapes for
    scale: explode → two-phase (doc, term) count with map-side combine;
    document frequency is a second aggregate OVER the tf relation (no
    re-scan of the text); corpus size N joins in as a broadcast 1-row
    relation (no driver action — the whole thing is one plan); final
    rank is a window partitioned by doc over the rounded score, never a
    global sort. Scores round to 6 decimals BEFORE ranking so the
    (score desc, term asc) order is a deterministic total order the
    DuckDB oracle replays."""
    from etl_platform_nyc_taxi_spark.operators.windows import top_k_per_group

    toks = df.select(F.col(id_col), F.explode(tokens_ws(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    scored = (
        tf.join(dfc, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    return top_k_per_group(
        scored,
        group_by=[id_col],
        order=[F.col("score").desc(), F.col("term").asc()],
        k=k,
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_avg_nll_micro: int = 3_450_000,
) -> DataFrame:
    """Perplexity-style quality filter: score every document under an
    add-one-smoothed bigram LM trained on the corpus itself — the
    CCNet/Gopher-class filtering step that flags statistically unusual
    documents (boilerplate, garbled text, wrong-language leakage) by
    how surprising their token sequences are to the corpus's own
    language model.

    Model: whitespace tokens; for each in-document bigram (w1, w2),
    ``p = (c(w1,w2) + 1) / (c_left(w1) + V)`` where ``c_left`` counts w1
    as a bigram left context and ``V`` is the corpus vocabulary size.
    Output per doc: ``n_bigrams``, ``nll_micro`` (total negative
    log-likelihood), and ``is_outlier`` (average NLL above
    ``flag_avg_nll_micro``). Docs with fewer than two tokens score
    (0, 0, false).

    Engine-portable determinism: floating-point SUM of per-bigram
    ``-ln p`` is order-dependent, so each bigram's NLL is quantized to
    integer MICRO-NATS first — ``FLOOR(-ln(p) * 1e6 + 0.5)`` where ``p``
    is one exactly-rounded IEEE division of two exact integers — and the
    per-doc total is an order-independent BIGINT sum (same discipline as
    the exact-decimal pagerank accumulation). The outlier flag is a pure
    integer compare (``nll_micro > threshold * n_bigrams``), no division.

    Scale shape (100 TB): bigram extraction is a higher-order-function
    projection at scan speed (no UDF); both model aggregates shuffle on
    token keys with map-side combine; the per-(doc, bigram) relation is
    pre-aggregated (count ``k`` per doc) so the scoring join moves bigram
    TYPES, not occurrences; the model join shuffles on (w1, w2) — the
    model table is orders smaller than the corpus that produced it; the
    left-context table is vocab-sized (AQE broadcasts it when it fits,
    shuffle-joins otherwise); the vocabulary size joins in as a 1-row
    broadcast relation, never a driver action."""
    toks = df.select(F.col(id_col), tokens_ws(text_col).alias("t"))
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2))"
                )
            ).alias("b"),
        )
        .select(F.col(id_col), F.col("b.w1"), F.col("b.w2"))
    )
    per_doc = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    lc = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.explode("t").alias("tok")).agg(
        F.countDistinct("tok").cast("long").alias("vsz")
    )
    nll_micro_per_bigram = F.floor(
        -F.log(
            (F.col("c12") + F.lit(1))
            / (F.col("c1") + F.col("vsz")).cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    scored = (
        per_doc.join(bc, ["w1", "w2"])
        .join(lc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), "k", nll_micro_per_bigram.alias("nm"))
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("nm")).cast("long").alias("nll_micro"),
    )
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias("nll_micro"),
            (
                F.coalesce("nll_micro", F.lit(0))
                > F.lit(int(flag_avg_nll_micro))
                * F.coalesce("n_bigrams", F.lit(0))
            ).alias("is_outlier"),
        )
    )


def stupid_backoff_scores(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    flag_avg_nll_micro: int = 3_700_000,
) -> DataFrame:
    """Held-out document scoring under a Stupid-Backoff trigram LM
    (Brants et al. 2007, "Large Language Models in Machine
    Translation") — the web-scale LM recipe that deliberately skips
    normalization and discounting so the model is nothing but raw
    n-gram counts, exactly the shape a distributed engine aggregates
    best. The score of each held-out trigram (w1, w2, w3) is

      S = c3(w1 w2 w3) / c2(w1 w2)              if the trigram was seen
        = α · c2(w2 w3) / c1(w2)                 else if the bigram was
        = α² · (c1(w3) + 1) / (N + V)            else (final level
                                                  add-one smoothed so
                                                  unseen words stay
                                                  finite — our one
                                                  deviation from the
                                                  paper's c(w3)/N)

    with α = 0.4 (the paper's constant). Seen higher-order counts
    imply their denominators exist (a trigram contains its context
    bigram), so the chain never divides by NULL.

    Output per scored doc: ``n_trigrams``, per-backoff-level occurrence
    counts (``n_tri_hits`` / ``n_bi_hits`` / ``n_uni_hits`` — the
    model-coverage audit), ``nll_micro``, and ``is_outlier``. Docs with
    fewer than three tokens score (0, 0, 0, 0, 0, false).

    Engine-portable determinism (the bigram_lm_scores discipline): each
    trigram's ``-ln S`` is quantized to integer micro-nats —
    ``FLOOR(-ln(S)·1e6 + 0.5)`` where S is one or two exactly-rounded
    IEEE ops on exact integers — and the per-doc total is an
    order-independent BIGINT sum; the outlier flag is a pure integer
    compare.

    Scale shape (100 TB): n-gram extraction is a HOF projection at scan
    speed; all model aggregates shuffle on n-gram keys with map-side
    combine; the scored relation is pre-aggregated (count ``k`` per
    (doc, trigram)) so joins move trigram TYPES, not occurrences; the
    three model tables are orders smaller than the corpus and join on
    their own keys (AQE broadcasts the unigram table when it fits);
    (N, V) joins as a 1-row broadcast relation, never a driver
    action."""
    ttoks = train.select(tokens_ws(text_col).alias("t"))
    tri_of = "transform(slice(t, 1, size(t) - 2), (w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2, element_at(t, i + 3) AS w3))"
    bi_of = "transform(slice(t, 1, size(t) - 1), (w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2))"
    c3 = (
        ttoks.filter(F.size("t") >= 3)
        .select(F.explode(F.expr(tri_of)).alias("g"))
        .groupBy("g.w1", "g.w2", "g.w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    c2 = (
        ttoks.filter(F.size("t") >= 2)
        .select(F.explode(F.expr(bi_of)).alias("g"))
        .groupBy("g.w1", "g.w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    c1 = (
        ttoks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    nv = ttoks.select(F.explode("t").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("vsz"),
    )
    per_doc = (
        score.select(F.col(id_col), tokens_ws(text_col).alias("t"))
        .filter(F.size("t") >= 3)
        .select(F.col(id_col), F.explode(F.expr(tri_of)).alias("g"))
        .groupBy(id_col, "g.w1", "g.w2", "g.w3")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    joined = (
        per_doc.join(c3, ["w1", "w2", "w3"], "left")
        .join(c2.withColumnRenamed("c2", "c12"), ["w1", "w2"], "left")
        .join(
            c2.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c2").alias("c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("c1").alias("cw2")), "w2", "left"
        )
        .join(
            c1.select(F.col("w").alias("w3"), F.col("c1").alias("cw3")), "w3", "left"
        )
        .crossJoin(F.broadcast(nv))
    )
    a = float(alpha)
    s_expr = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("c12").cast("double"),
        )
        .when(
            F.col("c23").isNotNull(),
            F.lit(a) * (F.col("c23").cast("double") / F.col("cw2").cast("double")),
        )
        .otherwise(
            F.lit(a * a)
            * (
                (F.coalesce("cw3", F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("n_tokens") + F.col("vsz")).cast("double")
            )
        )
    )
    level = F.when(F.col("c3").isNotNull(), F.lit(0)).when(
        F.col("c23").isNotNull(), F.lit(1)
    ).otherwise(F.lit(2))
    nm = F.floor(-F.log(s_expr) * F.lit(1e6) + F.lit(0.5)).cast("long")
    agg = (
        joined.select(F.col(id_col), "k", nm.alias("nm"), level.alias("lv"))
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_trigrams"),
            F.sum(F.when(F.col("lv") == 0, F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_tri_hits"),
            F.sum(F.when(F.col("lv") == 1, F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_bi_hits"),
            F.sum(F.when(F.col("lv") == 2, F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_uni_hits"),
            F.sum(F.col("k") * F.col("nm")).cast("long").alias("nll_micro"),
        )
    )
    z = F.lit(0).cast("long")
    return (
        score.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_trigrams", z).alias("n_trigrams"),
            F.coalesce("n_tri_hits", z).alias("n_tri_hits"),
            F.coalesce("n_bi_hits", z).alias("n_bi_hits"),
            F.coalesce("n_uni_hits", z).alias("n_uni_hits"),
            F.coalesce("nll_micro", z).alias("nll_micro"),
            (
                F.coalesce("nll_micro", z)
                > F.lit(int(flag_avg_nll_micro)) * F.coalesce("n_trigrams", z)
            ).alias("is_outlier"),
        )
    )


def normalize_text(text_col: str | Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def fingerprint(text_col: str | Column) -> Column:
    """Deterministic 32-hex document fingerprint over normalized text
    (md5 — portable to the DuckDB oracle; swap for xxhash64 when oracle
    portability doesn't matter)."""
    return F.md5(normalize_text(text_col))


def url_domain(url_col: str | Column) -> Column:
    """Canonical domain from a URL, for per-domain corpus accounting
    (CommonCrawl-style provenance quotas): the lowercased authority
    host, with any port and a leading ``www.`` stripped. Pure regex —
    three codegen expressions, no UDF, and the SAME RE2-compatible
    patterns replay verbatim in the DuckDB oracle. Non-URL input (no
    ``scheme://`` prefix) yields NULL rather than a phantom domain."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(host, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host != "", host)


#: Tracking query parameters stripped by :func:`url_canonicalize` —
#: the standard analytics noise that makes one page crawl as many URLs.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"


def url_canonicalize(url_col: str | Column) -> Column:
    """Canonical URL for crawl-frontier dedup — the normalization every
    web-corpus fetch pipeline runs so one page doesn't crawl as many
    URLs: lowercase scheme and host, strip the scheme's default port
    (:80 http / :443 https), drop the fragment, remove tracking query
    parameters (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``),
    sort the surviving parameters (query order is almost never
    semantic), and normalize an empty path to ``/``. Pure
    regex/array-HOF expressions — no UDF, and every step replays
    verbatim in the DuckDB oracle. Non-URL input yields NULL.

    Deliberately NOT stripped: ``www.`` (a distinct host is a distinct
    page until proven otherwise — :func:`url_domain` is the provenance
    view that collapses it) and percent-encoding (decoding can change
    semantics; crawl canonicalizers leave it)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(
        F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )
    host = F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(host)
    host = F.when(
        (scheme == "https"), F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    rest = F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    out = F.concat(scheme, F.lit("://"), host, path, qpart)
    return F.when((scheme != "") & (host != ""), out)


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


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    df_cap_ppm: int = 200_000,
    df_cap_abs: int = 1000,
    partitions: int | None = None,
) -> DataFrame:
    """Sparse TF-IDF cosine document-pair similarity via an inverted-index
    self-join — the term-space twin of embedding cosine near-dup: pairs
    form ONLY where documents share a term, never all-pairs.

    Scale levers: (1) the document-frequency cap drops terms present in
    more than ``df_cap_ppm``/1e6 of the corpus (stopword-grade terms
    carry near-zero idf but quadratic join fan-out — the classic
    inverted-index prune; candidate pairs are bounded by Σ_t df_t² over
    surviving terms); the cap itself is integer-exact and scale-free
    (df·1e6 ≤ cap·N) — AND an ABSOLUTE cap ``df_cap_abs`` (sklearn's
    max_df): a relative cap alone is defeated by subpopulation-hot terms
    (a term in every doc of one large subcorpus stays under any global
    percentage as the corpus grows around it, and its df² pair fan-out
    goes quadratic — measured: the ×10 scale bench hung on exactly this
    before the absolute cap existed). (2) dot products accumulate per-pair over shared
    terms only, map-side combinable. Cosine is defined over the CAPPED
    vocabulary (declared semantic, same on both engines).

    Engine-exactness: weights round to 6 places (idf via ln — the
    tfidf_top_terms precedent), per-term products/squares quantize to
    DECIMAL(38,12) before the order-free sums, and norm/ratio are
    correctly-rounded IEEE sqrt/divide — bit-identical on any engine.
    """
    base = df.select(F.col(id_col).alias("__id"), tokens_ws(text_col).alias("__t"))
    if partitions:
        base = base.repartition(partitions)
    toks = base.select("__id", F.explode("__t").alias("term"))
    tf = toks.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    kept = (
        tf.join(dfc, "term")
        .join(F.broadcast(n_docs))
        .filter(
            (
                F.col("df") * F.lit(1_000_000)
                <= F.lit(df_cap_ppm) * F.col("n_docs")
            )
            & (F.col("df") <= F.lit(df_cap_abs))
        )
    )
    w = F.round(
        F.col("tf")
        * (
            F.log(
                (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
            )
            + F.lit(1.0)
        ),
        6,
    )
    # Materialize the surviving weighted postings ONCE (r12, guide §1.2):
    # three consumers (norms, both join sides) each re-ran the
    # tokenize+TF+DF trunk — the different downstream keys (__id vs term)
    # mean no exchange is reusable. The postings relation is the capped
    # inverted index — exactly what an ingest pipeline persists.
    weighted = kept.select("__id", "term", w.alias("w")).localCheckpoint(
        eager=False
    )
    sq = F.round(F.col("w") * F.col("w"), 12).cast("decimal(38,12)")
    norms = weighted.groupBy("__id").agg(
        F.sqrt(F.sum(sq).cast("double")).alias("norm")
    )
    a = weighted.select(F.col("__id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = weighted.select(F.col("__id").alias("id_b"), "term", F.col("w").alias("wb"))
    prod = F.round(F.col("wa") * F.col("wb"), 12).cast("decimal(38,12)")
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(prod).alias("__dot"))
    )
    na = norms.select(F.col("__id").alias("id_a"), F.col("norm").alias("__na"))
    nb = norms.select(F.col("__id").alias("id_b"), F.col("norm").alias("__nb"))
    cos = F.col("__dot").cast("double") / (F.col("__na") * F.col("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("__cos", 6).alias("cosine"))
    )


def domain_suffixes(host_col: str | Column) -> Column:
    """All label-boundary suffixes of a hostname, as array<string>:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com, example.com,
    com]``. Label-boundary generation (split on dots, rejoin tails) is
    what makes blocklist matching precise: ``ads.example.com.evil.io``
    shares NO suffix with the rule ``ads.example.com`` — a substring or
    LIKE match would wrongly block it."""
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    labels = F.split(F.lower(c), r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def blocklist_match(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    rule_col: str = "rule",
) -> DataFrame:
    """Match hosts against a domain blocklist with parent-domain
    semantics (a rule blocks the domain and every subdomain) — the crawl
    filtering step before any fetch/ingest.

    Returns the input plus ``blocked`` (boolean) and ``matched_rule``
    (deterministic: lexicographically smallest matching rule, NULL when
    clean).

    Scale shape: explode each host to its ≤|labels| suffixes and
    equi-join the (broadcast) blocklist on the suffix — never a
    LIKE/contains cross join, which is both quadratic and semantically
    wrong at label boundaries. The blocklist relation is list-sized
    (thousands of rules); hosts are typically pre-aggregated distinct
    before matching, so the explode multiplies domains, not documents."""
    rules = blocklist.select(F.lower(F.col(rule_col)).alias("__rule"))
    sufs = df.select(
        F.col(host_col).alias("__host"),
        F.explode(domain_suffixes(host_col)).alias("__suf"),
    )
    matched = (
        sufs.join(F.broadcast(rules), sufs["__suf"] == rules["__rule"])
        .groupBy("__host")
        .agg(F.min("__rule").alias("matched_rule"))
    )
    return df.join(
        matched, df[host_col] == matched["__host"], "left"
    ).select(
        *[df[c] for c in df.columns],
        F.col("matched_rule").isNotNull().alias("blocked"),
        "matched_rule",
    )


def distinct_ngram_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
    partitions: int | None = None,
) -> DataFrame:
    """Distinct-n corpus diversity (the distinct-1/2/3 metric of Li et
    al. 2016, standard for spotting templated or self-repeating corpora
    before training): per ``group_col`` and n-gram order, total grams,
    distinct grams, and their ratio in exact integer micro units
    (``(1e6·distinct) div total`` — no float crosses the engine
    boundary). A source whose distinct-2 ratio collapses relative to its
    peers is dominated by boilerplate.

    Shape: ONE tokenize + explode pass for every requested order — rows
    fan out to (n, offset) via two chained generators and the gram is a
    codegen ``slice``/``concat_ws`` projection (r12, guide §2.3/§4.1: the
    previous per-n loop re-tokenized and re-scanned the corpus once per
    order through an interpreted gram-array ``transform``) — then one
    (grp, n, gram) count and one (grp, n) rollup, both map-side
    combinable."""
    base = df.select(
        F.col(group_col).alias("grp"), tokens_ws(F.col(text_col)).alias("__t")
    )
    if partitions:
        base = base.repartition(partitions)
    ng = base.select(
        "grp", "__t", F.explode(F.array(*[F.lit(n) for n in ns])).alias("n")
    )
    # per-n offsets/grams: ns is a tiny static tuple, so both are a CASE
    # over literal n — stays codegen, no lambda
    offs, gram = None, None
    for n in ns:
        ob = ngram_offsets(F.col("__t"), n)
        gb = ngram_at(F.col("__t"), F.col("__i"), n)
        offs = ob if offs is None else F.when(F.col("n") == n, ob).otherwise(offs)
        gram = gb if gram is None else F.when(F.col("n") == n, gb).otherwise(gram)
    g = ng.select(
        "grp", "n", "__t", F.explode(offs).alias("__i")
    ).select("grp", "n", gram.alias("__gram"))
    per = g.groupBy("grp", "n", "__gram").agg(F.count(F.lit(1)).alias("__c"))
    out = per.groupBy("grp", "n").agg(
        F.sum("__c").cast("long").alias("total_grams"),
        F.count(F.lit(1)).cast("long").alias("distinct_grams"),
    ).select("grp", F.col("n").cast("int").alias("n"), "total_grams", "distinct_grams")
    return out.select(
        F.col("grp").alias(group_col),
        "n",
        "total_grams",
        "distinct_grams",
        F.expr("(1000000 * distinct_grams) div total_grams").alias(
            "diversity_micro"
        ),
    )


def span_corruption_examples(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 20,
    max_span: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """T5-style span-corruption example prep (Raffel et al. 2020): mask
    ~15% of each document's tokens in short contiguous spans, emit the
    corrupted ``input_text`` (spans replaced by ``<extra_id_k>``
    sentinels, k in document order) and the seq2seq ``target_text``
    (each sentinel followed by the tokens it hides) — the
    example-construction step between a cleaned corpus and an
    encoder-decoder pretraining run.

    Determinism replaces the paper's RNG: token positions are tiled
    into ``block``-sized blocks, and the portable md5 family draws each
    block's span offset (mod ``block``−3) and length (2..``max_span``)
    from ``md5('span:' || id || ':' || block_no)`` — spans are
    non-overlapping BY CONSTRUCTION (one span per block, offset+length
    bounded inside the block), so both engines rebuild the identical
    example without any island-merge pass. Expected mask rate =
    E[len]/block = 3/20 = 15%. Spans that would spill past the doc's
    last token are skipped (short tail blocks).

    Shape: one explode to (doc, position) plus one block-per-20-tokens
    explode for spans; sentence assembly is a per-doc sort_array over
    (position, piece) structs — one shuffle keyed on the doc id, no
    windows, no joins wider than (doc, position)."""
    base = df.select(
        F.col(id_col).alias("__id"), tokens_ws(text_col).alias("__t")
    )
    if partitions:
        base = base.repartition(partitions)
    n = F.size("__t")
    # clamp to ≥1: sequence(0, -1) would generate a DESCENDING range for
    # an empty doc and negative-start spans could slip past the tail
    # filter (start+len-1 <= 0)
    nblocks = F.greatest(
        F.floor((n + F.lit(block - 1)) / F.lit(block)).cast("int"), F.lit(1)
    )
    h = lambda b: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.lit("span:"),
                    F.col("__id").cast("string"),
                    F.lit(":"),
                    b.cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window

    off_mod = block - max_span + 1  # offsets keep start+len inside the block
    spans = (
        base.select(
            "__id",
            "__t",
            n.alias("__n"),
            F.explode(F.sequence(F.lit(0), nblocks - 1)).alias("b"),
        )
        .withColumn("__h", h(F.col("b")))
        .select(
            "__id",
            "__t",
            "__n",
            "b",
            (
                F.col("b") * block
                + 1
                + F.pmod(F.col("__h"), F.lit(off_mod))
            ).cast("int").alias("start"),
            (
                F.lit(2)
                + F.pmod(
                    F.expr(f"__h div {off_mod}"), F.lit(max_span - 1)
                ).cast("int")
            ).alias("len"),
        )
        .filter(F.col("start") + F.col("len") - 1 <= F.col("__n"))
        .withColumn(
            "k",
            F.row_number().over(
                Window.partitionBy("__id").orderBy(F.col("start"))
            )
            - 1,
        )
    )
    # target pieces: "<extra_id_k> tok tok ..." per span, in k order
    piece = F.concat(
        F.lit("<extra_id_"),
        F.col("k").cast("string"),
        F.lit("> "),
        F.array_join(F.slice("__t", F.col("start"), F.col("len")), " "),
    )
    targets = spans.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("k"), piece.alias("p")))
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("target_text"),
        F.sum("len").cast("long").alias("n_masked"),
    )
    # input pieces: unmasked (pos, token) plus (span start pos, sentinel)
    masked_pos = spans.select(
        "__id",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.col("len") - 1)
        ).alias("pos"),
        F.col("start").alias("span_start"),
        F.col("k"),
    )
    toks = base.select(
        "__id", F.posexplode("__t").alias("pos0", "tok")
    ).select("__id", (F.col("pos0") + 1).alias("pos"), "tok")
    joined = toks.join(masked_pos, ["__id", "pos"], "left")
    pieces = joined.select(
        "__id",
        "pos",
        F.when(F.col("k").isNull(), F.col("tok"))
        .when(
            F.col("pos") == F.col("span_start"),
            F.concat(F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")),
        )
        .otherwise(F.lit(None))
        .alias("piece"),
    ).filter(F.col("piece").isNotNull())
    inputs = pieces.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", F.col("piece").alias("p")))
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("input_text")
    )
    return (
        base.select(
            "__id",
            n.cast("long").alias("n_tok"),
            F.array_join("__t", " ").alias("__full"),
        )
        .join(inputs, "__id", "left")
        .join(targets, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tok",
            F.coalesce("n_masked", F.lit(0)).cast("long").alias("n_masked"),
            F.coalesce("input_text", "__full").alias("input_text"),
            F.coalesce("target_text", F.lit("")).alias("target_text"),
        )
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, in
    integer micro-nats — the compressibility proxy quality gates use
    (Dolma-style): templated or machine-looped text concentrates its
    token mass and scores low; natural text sits near the corpus band.

    H = Σ_tok (c/n)·ln(n/c). Each distinct token's term quantizes to
    micro-nats at birth (one division and one ln over exact integers —
    identical IEEE results in any engine) and the per-doc total is an
    order-independent BIGINT sum (the bigram-LM discipline). Docs with
    no tokens score (0, 0, 0).

    Shape: one explode → (doc, token) count with map-side combine → one
    per-doc rollup; linear end to end."""
    base = df.select(F.col(id_col).alias("__id"), tokens_ws(text_col).alias("__t"))
    if partitions:
        base = base.repartition(partitions)
    per = (
        base.select("__id", F.explode("__t").alias("tok"))
        .groupBy("__id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = per.groupBy("__id").agg(F.sum("c").alias("n"))
    term = F.floor(
        (F.col("c").cast("double") / F.col("n"))
        * F.log(F.col("n").cast("double") / F.col("c"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    scored = per.join(n, "__id").groupBy("__id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(term).cast("long").alias("entropy_micro"),
    )
    return (
        base.select("__id")
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("entropy_micro", F.lit(0)).cast("long").alias(
                "entropy_micro"
            ),
        )
    )


def robots_apply(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Apply robots.txt-style path rules to a crawl frontier with the
    standard (RFC 9309) LONGEST-MATCH semantics: for each (host, path),
    among all rules of that host whose ``rule_path`` is a prefix of the
    path, the longest wins; ``allow`` rules beat ``disallow`` at equal
    length (the RFC tie-break); a host with no matching rule is allowed.

    ``rules`` is ``(host, rule_path, allow boolean)`` — the parsed form
    of per-host robots files (an empty-path disallow is the "Disallow: /"
    blanket when expressed as ``'/'``).

    Returns the input plus ``allowed boolean`` and ``matched_rule``
    (NULL when no rule matched). ``id_col`` must be unique per URL row —
    the winner window partitions on it (partitioning on (host, path)
    would silently collapse distinct frontier rows that share a URL).

    Scale shape: equi-join on host FIRST (rules are host-keyed, the
    relation is crawl-metadata-sized — broadcast), then the prefix test
    runs as a post-join filter on the co-located pair; the winner is a
    per-URL window over ≤ |that host's rules| rows. Never a LIKE cross
    join against the whole rule set."""
    from pyspark.sql import Window

    r = rules.select(
        F.col(host_col).alias("__rh"),
        F.col("rule_path").alias("__rp"),
        F.col("allow").alias("__allow"),
    )
    j = urls.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("__rh"))
        & (
            F.col(path_col).substr(F.lit(1), F.length("__rp"))
            == F.col("__rp")
        ),
        "left",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.length("__rp").desc(),
        F.col("__allow").desc(),  # RFC tie-break: allow wins at equal length
        F.col("__rp").asc(),
    )
    best = (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(c) for c in urls.columns],
            F.coalesce("__allow", F.lit(True)).alias("allowed"),
            F.col("__rp").alias("matched_rule"),
        )
    )
    return best
