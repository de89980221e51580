"""Text-analysis operator semantics on hand-computable strings."""

from __future__ import annotations

import pytest
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


def test_quality_flags_and_filter(spark):
    from etl_platform_nyc_taxi_spark.operators.text import (
        QualityRules,
        quality_filter,
        quality_flags,
    )

    rules = QualityRules(min_tokens=3, min_stopword_ratio=0.1, max_symbol_ratio=0.2)
    df = spark.createDataFrame(
        [
            (1, "the cat sat on a mat today"),  # passes everything
            (2, "xy zz"),  # too few tokens, no stopwords
            (3, "the #### $$$$ %%%% &&&& ****"),  # symbol ratio too high
        ],
        "doc_id long, text string",
    )
    flags = {r["doc_id"]: r for r in quality_flags(df, rules=rules).collect()}
    assert flags[1]["keep"] is True
    assert flags[2]["q_len_ok"] is False and flags[2]["q_stopwords_ok"] is False
    assert flags[3]["q_symbols_ok"] is False and flags[3]["keep"] is False
    kept = quality_filter(df, rules=rules)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert kept.columns == ["doc_id", "text"]  # flags dropped in pipeline form


def test_repetition_stats_hand_checked(spark):
    from etl_platform_nyc_taxi_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "u v w x"),  # bigrams: uv vw wx -> all unique
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_grams"] == 5 and out[1]["n_distinct_grams"] == 2
    assert out[1]["dup_gram_ratio"] == 0.6  # 1 - 2/5
    assert out[1]["top_gram_ratio"] == 0.6  # "a b" appears 3/5
    assert out[2]["dup_gram_ratio"] == 0.0 and out[2]["top_gram_ratio"] == pytest.approx(1 / 3, abs=1e-6)


def test_redact_pii_counts_and_replacement(spark):
    from etl_platform_nyc_taxi_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org or 555-123-4567; host 10.0.0.1 end"),
            (2, "clean text, no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1 and out[1]["n_ipv4"] == 1
    assert out[1]["redacted"] == "mail [EMAIL] or [PHONE]; host [IP] end"
    assert out[2]["redacted"] == out[2]["text"]
    assert out[2]["n_email"] == out[2]["n_phone"] == out[2]["n_ipv4"] == 0


def test_contamination_check_hand_built(spark):
    from etl_platform_nyc_taxi_spark.operators.text import contamination_check

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # shares "alpha beta gamma"
            (2, "zeta eta theta iota"),  # clean
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in contamination_check(train, eval_df).collect()}
    assert set(out) == {1}  # only the contaminated doc reports
    # train doc 1 trigrams: {abg, bgd}; eval: {abg, bge} -> 1 of 2 overlap
    assert out[1]["n_overlap"] == 1 and out[1]["n_grams"] == 2
    assert out[1]["overlap_ratio"] == 0.5


def test_word_ngrams_clamp_short_docs(spark):
    from etl_platform_nyc_taxi_spark.operators.text import word_ngrams

    df = spark.createDataFrame([(1, "only"), (2, "two words here")], "doc_id long, text string")
    got = {r["doc_id"]: r["g"] for r in df.select("doc_id", word_ngrams("text", 3).alias("g")).collect()}
    assert got[1] == ["only"]  # shorter than n: one clamped gram
    assert got[2] == ["two words here"]


def test_chunk_documents_windows_and_overlap(spark):
    from etl_platform_nyc_taxi_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "short doc")],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(df, size=4, stride=3).collect():
        out.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(out[1], key=lambda r: r["chunk_idx"])
    # 10 tokens, size 4 / stride 3: starts 0,3,6 — the chunk at 6
    # (w6..w9) reaches the doc end, so no start 9 ("w9" would be a
    # strict subset of the previous chunk — the r7 review finding)
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    assert c1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c1[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert c1[2]["chunk_text"] == "w6 w7 w8 w9" and c1[2]["n_chunk_tokens"] == 4
    # doc shorter than one window: exactly one clamped chunk
    assert len(out[2]) == 1 and out[2][0]["chunk_text"] == "short doc"


def test_chunk_documents_validates_params(spark):
    import pytest as _pytest

    from etl_platform_nyc_taxi_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_tfidf_top_terms_hand_built(spark):
    """Rare terms outrank ubiquitous ones; scores follow smooth idf."""
    import math

    from etl_platform_nyc_taxi_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common rare"),
            (2, "common boring"),
            (3, "common boring"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=2).collect()
    top1 = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    # equal tf=1 in doc 1: "rare" (df 1, idf ln2+1) outranks "common"
    # (df 3, idf ln(4/4)+1 = 1)
    assert top1[1] == "rare"
    rare = next(r for r in out if r["doc_id"] == 1 and r["term"] == "rare")
    assert rare["score"] == round(1 * (math.log(4.0 / 2.0) + 1.0), 6)
    # every doc gets at most k rows, ranks dense from 1
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= 2


def test_length_bucket_stats_integer_boundaries(spark):
    """Bucket = smallest power of two >= n_tok, exact at boundaries."""
    from etl_platform_nyc_taxi_spark.operators.text import length_bucket_stats

    docs = [
        (1, "w"),                    # 1 token  -> bucket 1
        (2, "w w"),                  # 2        -> 2
        (3, "w w w"),                # 3        -> 4
        (4, " ".join(["w"] * 8)),    # 8        -> 8 (exact power stays)
        (5, " ".join(["w"] * 9)),    # 9        -> 16
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["bucket"]: r for r in length_bucket_stats(df).collect()}
    assert set(out) == {1, 2, 4, 8, 16}
    assert out[4]["n_docs"] == 1 and out[4]["pad_waste"] == 1
    assert out[8]["pad_waste"] == 0  # exact power of two wastes nothing
    assert out[16]["total_tokens"] == 9 and out[16]["pad_waste"] == 7


def test_quality_filter_preserves_user_prefixed_columns(spark):
    # ADVICE r2: a pre-existing user column sharing the flag prefix (e.g.
    # q_score) must survive quality_filter — only the filter's OWN flag
    # columns are dropped.
    from etl_platform_nyc_taxi_spark.operators.text import (
        QualityRules,
        quality_filter,
    )

    rules = QualityRules(min_tokens=3, min_stopword_ratio=0.1, max_symbol_ratio=0.2)
    df = spark.createDataFrame(
        [(1, "the cat sat on a mat today", 0.9), (2, "xy zz", 0.1)],
        "doc_id long, text string, q_score double",
    )
    kept = quality_filter(df, rules=rules)
    assert kept.columns == ["doc_id", "text", "q_score"]
    assert kept.collect()[0]["q_score"] == 0.9

    # custom prefix is forwarded end-to-end
    kept2 = quality_filter(df, rules=rules, prefix="flag_")
    assert kept2.columns == ["doc_id", "text", "q_score"]


def test_tfidf_cosine_pairs_absolute_df_cap(spark):
    """The ABSOLUTE df cap must prune subpopulation-hot terms that stay
    under the relative cap: with df_cap_abs=2, a term in 3 of 20 docs
    (15% < the 50% relative cap) generates no pairs."""
    from etl_platform_nyc_taxi_spark.operators.text import tfidf_cosine_pairs

    docs = [(i, f"filler{i}a filler{i}b filler{i}c") for i in range(1, 18)]
    docs += [
        (18, "hot alpha beta"),
        (19, "hot alpha gamma"),
        (20, "hot delta epsilon"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with_abs = tfidf_cosine_pairs(
        df, threshold=0.01, df_cap_ppm=500_000, df_cap_abs=2
    ).collect()
    pairs_abs = {(r["id_a"], r["id_b"]) for r in with_abs}
    # 'hot' (df=3 > 2) is pruned; 'alpha' (df=2) survives -> only (18,19)
    assert pairs_abs == {(18, 19)}, pairs_abs
    without_abs = tfidf_cosine_pairs(
        df, threshold=0.01, df_cap_ppm=500_000, df_cap_abs=1000
    ).collect()
    pairs_rel = {(r["id_a"], r["id_b"]) for r in without_abs}
    assert {(18, 19), (18, 20), (19, 20)} <= pairs_rel


def test_quality_flags_rejects_column_clash(spark):
    """Code-review r7: silently overwriting a pre-existing user 'keep'
    (or prefixed flag) column — which quality_filter then DROPS — must
    fail loudly instead."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.text import quality_flags

    df = spark.createDataFrame(
        [("some text here", True)], "text string, keep boolean"
    )
    with pytest.raises(ValueError, match="overwrite"):
        quality_flags(df)


def test_tokens_ws_empty_and_whitespace_docs(spark):
    """Operator review r7: split('') returns [''] (split semantics),
    which inflated empty docs to 1 token and leaked an empty-string
    term from every explode site. tokens_ws must yield [] instead."""
    from etl_platform_nyc_taxi_spark.operators.text import (
        token_count,
        tokens_ws,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, " \t\n "), (4, "one two")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["toks"], r["n"])
        for r in df.select(
            "doc_id",
            tokens_ws("text").alias("toks"),
            token_count("text").alias("n"),
        ).collect()
    }
    assert got[1] == ([], 0)
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)
    assert got[4] == (["one", "two"], 2)


def test_tokens_ws_empty_matches_duckdb_oracle_form():
    """The oracle-side replica (list_filter over string_split_regex)
    must agree with tokens_ws on degenerate inputs — both engines were
    fixed together, so pin the DuckDB form too."""
    import duckdb

    rows = duckdb.sql(
        r"""
        SELECT s, list_filter(string_split_regex(trim(s), '\s+'),
                              tk -> tk <> '') AS toks
        FROM (VALUES (''), ('   '), (e' \t '), ('one two')) v(s)
        """
    ).fetchall()
    got = {s: toks for s, toks in rows}
    assert got[""] == []
    assert got["   "] == []
    assert got[" \t "] == []
    assert got["one two"] == ["one", "two"]


def test_chunk_documents_no_subset_tail_and_exact_fit(spark):
    """Start generation stops once a chunk reaches the doc end: exact
    multiples produce no empty/subset tail, and an empty doc still
    yields its single (empty) chunk."""
    from etl_platform_nyc_taxi_spark.operators.text import chunk_documents

    toks = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    df = spark.createDataFrame(
        [(1, toks(8)), (2, toks(9)), (3, "")],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(df, size=4, stride=4).collect():
        out.setdefault(r["doc_id"], []).append(r)
    # 8 tokens, size=stride=4: chunks at 0,4 — the second ends exactly
    # at the doc end, so NO third (empty) chunk at start 8
    assert sorted(r["chunk_idx"] for r in out[1]) == [0, 1]
    # 9 tokens: starts 0,4,8 (the 8-start chunk carries the tail token)
    c2 = sorted(out[2], key=lambda r: r["chunk_idx"])
    assert [r["n_chunk_tokens"] for r in c2] == [4, 4, 1]
    # empty doc: exactly one chunk of zero tokens (contract: >= 1 chunk)
    assert len(out[3]) == 1 and out[3][0]["n_chunk_tokens"] == 0
    assert out[3][0]["chunk_text"] == ""


def test_bigram_lm_scores_hand_computed(spark):
    """Add-one-smoothed bigram NLL against hand-computed micro-nat values.

    Corpus: doc1 "a b a b", doc2 "a b", doc3 "c" (no bigram).
    Counts: c(a,b)=3, c(b,a)=1; left contexts c(a)=3, c(b)=1; V=3.
      p(a,b) = (3+1)/(3+3) = 2/3  -> -ln = 0.4054651...  -> 405465
      p(b,a) = (1+1)/(1+3) = 1/2  -> -ln = 0.6931472...  -> 693147
    doc1: 3 bigrams, nll = 2*405465 + 693147 = 1504077 (avg 501359)
    doc2: 1 bigram,  nll = 405465
    doc3: 0 bigrams, nll = 0 (never an outlier).
    """
    from etl_platform_nyc_taxi_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in bigram_lm_scores(df, flag_avg_nll_micro=450_000).collect()
    }
    assert (rows[1]["n_bigrams"], rows[1]["nll_micro"]) == (3, 1504077)
    assert (rows[2]["n_bigrams"], rows[2]["nll_micro"]) == (1, 405465)
    assert (rows[3]["n_bigrams"], rows[3]["nll_micro"]) == (0, 0)
    # avg micro-nll: doc1 501359 > 450000 -> flagged; doc2 405465 -> kept
    assert rows[1]["is_outlier"] is True
    assert rows[2]["is_outlier"] is False
    assert rows[3]["is_outlier"] is False


def test_bigram_lm_scores_invariants_on_fixture(spark):
    """Structural invariants over the real fixture: every doc scores
    n_bigrams == max(0, n_tokens - 1) and a non-negative NLL total."""
    from etl_platform_nyc_taxi_spark.operators.text import (
        bigram_lm_scores,
        tokens_ws,
    )
    from etl_platform_nyc_taxi_spark.sources.parquet import read_parquet_auto

    docs = read_parquet_auto(spark, "/root/testdata/sf0.001/documents.parquet")
    expect = {
        r["doc_id"]: r["nt"]
        for r in docs.select(
            "doc_id", F.size(tokens_ws("text")).alias("nt")
        ).collect()
    }
    for r in bigram_lm_scores(docs).collect():
        assert r["n_bigrams"] == max(0, expect[r["doc_id"]] - 1)
        assert r["nll_micro"] >= 0
        assert (r["nll_micro"] > 0) == (r["n_bigrams"] > 0)


def test_corpus_quality_funnel_composition(spark):
    """The funnel's conditional aggregate must agree with independently
    composed gate relations, stages must be monotone non-increasing,
    and exact duplicates must collapse at the canonical stage."""
    from etl_platform_nyc_taxi_spark.operators.text import (
        QualityRules,
        bigram_lm_scores,
        fingerprint,
        quality_flags,
    )
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    out = {
        r["stage"]: (r["gate"], r["n_docs"])
        for r in QUERIES["corpus_quality_funnel"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert [out[i][0] for i in range(4)] == [
        "total", "rules", "perplexity", "dedup_canonical",
    ]
    n = [out[i][1] for i in range(4)]
    assert n[0] >= n[1] >= n[2] >= n[3] > 0

    # independent composition of the same gates
    from etl_platform_nyc_taxi_spark.sources import load_fixture

    docs = load_fixture(spark, "/root/testdata/sf0.001", "documents")
    rules = QualityRules(min_tokens=40, min_stopword_ratio=0.05)
    keep = {
        r["doc_id"]
        for r in quality_flags(docs.select("doc_id", "text"), rules=rules)
        .filter("keep")
        .collect()
    }
    not_out = {
        r["doc_id"]
        for r in bigram_lm_scores(docs).filter("NOT is_outlier").collect()
    }
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", fingerprint("text").alias("fp")
        ).collect()
    }
    survivors = keep & not_out
    assert n[0] == docs.count()
    assert n[1] == len(keep)
    assert n[2] == len(survivors)
    assert n[3] == len({fps[d] for d in survivors})


def test_url_domain_strips_scheme_port_and_www(spark):
    """Canonical domain: lowercased authority host, port stripped,
    leading www. stripped; non-URLs yield NULL, never a phantom."""
    from etl_platform_nyc_taxi_spark.operators.text import url_domain

    rows = [
        ("https://www.Example.COM:443/path?q=1", "example.com"),
        ("http://sub.news.example.org/a/b#frag", "sub.news.example.org"),
        ("ftp://files.example.net:2121/", "files.example.net"),
        ("https://wwwx.example.com/", "wwwx.example.com"),  # not 'www.'
        ("not a url at all", None),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _ in rows], "url string"
    ).select("url", url_domain("url").alias("domain"))
    got = {r.url: r.domain for r in df.collect()}
    for u, want in rows:
        assert got[u] == want, (u, got[u], want)


def test_url_canonicalize_rules(spark):
    """Crawl-frontier canonicalization: lowercase scheme/host, default
    port stripped (only the scheme's own), fragment dropped, tracking
    params removed, remaining params sorted, empty path -> '/'."""
    from etl_platform_nyc_taxi_spark.operators.text import url_canonicalize

    rows = [
        (
            "https://WWW.News.Example.COM:443/en/page?id=7#frag",
            "https://www.news.example.com/en/page?id=7",
        ),
        (
            "http://example.org:80/a/b?z=1&a=2&utm_source=x&fbclid=abc",
            "http://example.org/a/b?a=2&z=1",
        ),
        ("https://example.org", "https://example.org/"),
        ("HTTPS://example.org/?ref=hp&id=3", "https://example.org/?id=3"),
        # non-default port survives; http's :80 rule must not eat :8080
        ("https://example.org:8443/x?b=2&a=1",
         "https://example.org:8443/x?a=1&b=2"),
        ("http://example.org:8080/", "http://example.org:8080/"),
        # :443 on http is NOT default — stays
        ("http://example.org:443/", "http://example.org:443/"),
        # 'refresh=1' must not be eaten by the 'ref' rule (anchored)
        ("https://example.org/?refresh=1", "https://example.org/?refresh=1"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _ in rows], "url string"
    ).select("url", url_canonicalize("url").alias("c"))
    got = {r.url: r.c for r in df.collect()}
    for u, want in rows:
        assert got[u] == want, (u, got[u], want)


# ---------------------------------------------------------------------------
# Domain blocklist + distinct-n diversity
# ---------------------------------------------------------------------------


def test_domain_suffixes_label_boundaries(spark):
    from etl_platform_nyc_taxi_spark.operators.text import domain_suffixes
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    df = rows_source(spark, [("A.B.Example.COM",)], "host string")
    out = df.select(domain_suffixes("host").alias("s")).collect()[0]["s"]
    assert out == ["a.b.example.com", "b.example.com", "example.com", "com"]


def test_blocklist_match_parent_domain_semantics(spark):
    from etl_platform_nyc_taxi_spark.operators.text import blocklist_match
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    hosts = rows_source(
        spark,
        [
            ("ads.tracker.net",),        # subdomain of rule
            ("tracker.net",),            # exact rule
            ("nottracker.net",),         # shares no LABEL suffix
            ("ads.example.com.evil.io",),  # suffix-spoof: must pass
            ("clean.org",),
        ],
        "host string",
    )
    rules = rows_source(spark, [("tracker.net",)], "rule string")
    got = {
        r["host"]: (r["blocked"], r["matched_rule"])
        for r in blocklist_match(hosts, rules).collect()
    }
    assert got["ads.tracker.net"] == (True, "tracker.net")
    assert got["tracker.net"] == (True, "tracker.net")
    assert got["nottracker.net"] == (False, None)
    assert got["ads.example.com.evil.io"] == (False, None)
    assert got["clean.org"] == (False, None)


def test_blocklist_match_deterministic_rule_choice(spark):
    from etl_platform_nyc_taxi_spark.operators.text import blocklist_match
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    hosts = rows_source(spark, [("a.b.c",)], "host string")
    rules = rows_source(spark, [("b.c",), ("a.b.c",)], "rule string")
    out = blocklist_match(hosts, rules).collect()[0]
    assert out["blocked"] and out["matched_rule"] == "a.b.c"  # lexicographic min


def test_distinct_ngram_diversity_hand_computed(spark):
    from etl_platform_nyc_taxi_spark.operators.text import (
        distinct_ngram_diversity,
    )
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    df = rows_source(
        spark,
        [
            (1, "a b a b", "s1"),   # unigrams: 4 total / 2 distinct
            (2, "a a a a", "s1"),   # bigrams s1: "a b","b a","a b" + "a a"x3
            (3, "x y z", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source"], r["n"]): (
            r["total_grams"], r["distinct_grams"], r["diversity_micro"]
        )
        for r in distinct_ngram_diversity(df, "source", "text", (1, 2)).collect()
    }
    assert got[("s1", 1)] == (8, 2, 250000)
    # s1 bigrams: doc1 -> [a b, b a, a b], doc2 -> [a a, a a, a a]
    assert got[("s1", 2)] == (6, 3, 500000)
    assert got[("s2", 1)] == (3, 3, 1000000)
    assert got[("s2", 2)] == (2, 2, 1000000)


# ---------------------------------------------------------------------------
# Span corruption
# ---------------------------------------------------------------------------


def _uncorrupt(input_text: str, target_text: str) -> str:
    """Invert span corruption: substitute each sentinel in the input with
    the tokens its target segment carries."""
    import re

    segs = {}
    parts = re.split(r"<extra_id_(\d+)>", target_text)
    # parts: ['', k0, ' seg0 ', k1, ' seg1 ', ...]
    for i in range(1, len(parts), 2):
        segs[int(parts[i])] = parts[i + 1].strip()
    out = []
    for tok in input_text.split():
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            out.append(segs[int(m.group(1))])
        else:
            out.append(tok)
    return " ".join(x for x in out if x)


def test_span_corruption_roundtrip_and_rate(spark):
    from etl_platform_nyc_taxi_spark.operators.text import (
        span_corruption_examples,
    )
    from etl_platform_nyc_taxi_spark.sources.parquet import read_parquet_auto

    d = read_parquet_auto(spark, "/root/testdata/sf0.001/documents.parquet")
    out = span_corruption_examples(d).collect()
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    assert len(out) == len(texts)
    total_tok = total_masked = 0
    for r in out:
        orig = " ".join(texts[r["doc_id"]].split())
        assert _uncorrupt(r["input_text"], r["target_text"]) == orig
        # sentinels appear 0..k-1 in document order in the input
        import re

        ks = [int(m) for m in re.findall(r"<extra_id_(\d+)>", r["input_text"])]
        assert ks == list(range(len(ks)))
        total_tok += r["n_tok"]
        total_masked += r["n_masked"]
    # expected rate E[len]/block = 3/20 = 15%; tail-block skips pull it
    # slightly below — accept a generous deterministic band
    rate = total_masked / total_tok
    assert 0.10 < rate < 0.18, rate


def test_span_corruption_short_and_empty_docs(spark):
    from etl_platform_nyc_taxi_spark.operators.text import (
        span_corruption_examples,
    )
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    df = rows_source(
        spark,
        [(1, ""), (2, "one"), (3, "a b c d e f g h i j k l m n o p q r s t")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_corruption_examples(df).collect()}
    assert got[1]["n_tok"] == 0 and got[1]["n_masked"] == 0
    assert got[1]["input_text"] == "" and got[1]["target_text"] == ""
    # 1-token doc: every candidate span (len>=2) overflows -> untouched
    assert got[2]["n_masked"] == 0 and got[2]["input_text"] == "one"
    # exactly one block of 20: exactly one span of len 2..4
    assert 2 <= got[3]["n_masked"] <= 4
    assert "<extra_id_0>" in got[3]["input_text"]
    assert got[3]["target_text"].startswith("<extra_id_0> ")


def test_token_entropy_matches_python(spark):
    import collections
    import math

    from etl_platform_nyc_taxi_spark.operators.text import token_entropy
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    df = rows_source(
        spark,
        [
            (1, "a a a a"),          # zero entropy
            (2, "a b c d"),          # max entropy ln(4)
            (3, "a a b"),
            (4, ""),                 # empty -> zeros
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_micro"])
        for r in token_entropy(df).collect()
    }

    def h_micro(text):
        toks = text.split()
        n = len(toks)
        c = collections.Counter(toks)
        return sum(
            math.floor((k / n) * math.log(n / k) * 1e6 + 0.5)
            for k in c.values()
        )

    assert got[1] == (4, 1, 0)
    assert got[2] == (4, 4, h_micro("a b c d"))
    assert abs(got[2][2] - 1_386_294) <= 2  # ln(4) in micro-nats
    assert got[3] == (3, 2, h_micro("a a b"))
    assert got[4] == (0, 0, 0)


def test_tokenizer_fertility_hand_computed(spark):
    from etl_platform_nyc_taxi_spark.operators.bpe import tokenizer_fertility
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    docs = rows_source(
        spark,
        [
            (1, "hello world", "en"),
            (2, "hello hello", "de"),
            (3, "hello unseen", "fr"),  # 'unseen' is OOV for the vocab
        ],
        "doc_id long, text string, lang string",
    )
    vocab = rows_source(
        spark,
        [("hello", 3, ["hel", "lo"]), ("world", 1, ["world"])],
        "word string, cnt long, syms array<string>",
    )
    got = {
        r["lang"]: (
            r["n_words"], r["n_oov"], r["n_tokens"], r["n_chars"],
            r["fertility_micro"], r["chars_per_token_micro"],
        )
        for r in tokenizer_fertility(docs, vocab, "lang").collect()
    }
    # en: hello(2 toks) + world(1 tok) = 2 words, 0 oov, 3 tokens, 10 chars
    assert got["en"] == (2, 0, 3, 10, 1_500_000, 3_333_333)
    # de: hello x2 -> 2 words, 0 oov, 4 tokens, 10 chars
    assert got["de"] == (2, 0, 4, 10, 2_000_000, 2_500_000)
    # fr: hello(2) + OOV 'unseen' at char fallback (6 tokens) — the OOV
    # word is PRICED, not dropped (advisor r10), and n_oov exposes it.
    assert got["fr"] == (2, 1, 8, 11, 4_000_000, 1_375_000)


def test_robots_apply_longest_match_semantics(spark):
    from etl_platform_nyc_taxi_spark.operators.text import robots_apply
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    urls = rows_source(
        spark,
        [
            (1, "h", "/private/data"),        # disallowed by /private/
            (2, "h", "/private/export/x"),    # allow carve-out wins (longer)
            (3, "h", "/public/x"),            # no matching rule -> allowed
            (4, "h", "/priv"),                # NOT a prefix match of /private/
            (5, "other", "/private/data"),    # unruled host -> allowed
            (6, "h", "/same"),                # equal-length tie -> allow wins
        ],
        "doc_id long, host string, path string",
    )
    rules = rows_source(
        spark,
        [
            ("h", "/private/", False),
            ("h", "/private/export/", True),
            ("h", "/same", False),
            ("h", "/same", True),  # pathological same-length pair
        ],
        "host string, rule_path string, allow boolean",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_rule"])
        for r in robots_apply(urls, rules).collect()
    }
    assert got[1] == (False, "/private/")
    assert got[2] == (True, "/private/export/")
    assert got[3] == (True, None)
    assert got[4] == (True, None)
    assert got[5] == (True, None)
    assert got[6] == (True, "/same")
    assert len(got) == 6  # no frontier row lost or duplicated


def test_stupid_backoff_level_routing_hand_computed(spark):
    """Train: 'a b c a b c'; score doc exercises all three levels:
    (a b c) seen trigram, (b c x)->? ... hand-build each level."""
    import math

    from etl_platform_nyc_taxi_spark.operators.text import (
        stupid_backoff_scores,
    )

    train = spark.createDataFrame(
        [(1, "a b c a b d")], "doc_id long, text string"
    )
    # train counts: tokens N=6, V=4. trigrams: (a,b,c),(b,c,a),(c,a,b),
    # (a,b,d); bigrams: (a,b)x2,(b,c),(c,a),(b,d); unigrams a2 b2 c1 d1.
    score = spark.createDataFrame(
        [(0, "a b c"), (5, "c a b"), (10, "b c q"), (15, "q q z"), (20, "a b")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in stupid_backoff_scores(train, score).collect()
    }
    m = lambda s: math.floor(-math.log(s) * 1e6 + 0.5)  # noqa: E731
    # doc 0: trigram (a,b,c) seen: S = c3/c2(a,b) = 1/2, level tri
    assert rows[0]["n_tri_hits"] == 1 and rows[0]["nll_micro"] == m(1 / 2)
    # doc 5: (c,a,b) seen: S = 1/1
    assert rows[5]["n_tri_hits"] == 1 and rows[5]["nll_micro"] == m(1.0)
    # doc 10: (b,c,q) unseen; bigram (c,q) unseen -> level uni on w3=q:
    # S = 0.16 * (0+1)/(N+V) = 0.16 * 1/10
    assert rows[10]["n_uni_hits"] == 1
    assert rows[10]["nll_micro"] == m((0.4 * 0.4) * (1 / 10))
    # doc 15: (q,q,z) unseen, (q,z) unseen -> uni level on z (unseen)
    assert rows[15]["n_uni_hits"] == 1
    # doc 20: fewer than 3 tokens -> zero-fill, not dropped
    assert rows[20]["n_trigrams"] == 0 and rows[20]["is_outlier"] is False


def test_stupid_backoff_bigram_level(spark):
    """A trigram whose suffix bigram WAS seen scores at the bigram
    level: S = 0.4 * c2(w2 w3)/c1(w2)."""
    import math

    from etl_platform_nyc_taxi_spark.operators.text import (
        stupid_backoff_scores,
    )

    train = spark.createDataFrame(
        [(1, "x a b y a b")], "doc_id long, text string"
    )
    score = spark.createDataFrame([(0, "z a b")], "doc_id long, text string")
    r = stupid_backoff_scores(train, score).collect()[0]
    # (z,a,b): trigram unseen; suffix bigram (a,b) seen twice; c1(a)=2
    assert r["n_bi_hits"] == 1 and r["n_tri_hits"] == 0
    assert r["nll_micro"] == math.floor(
        -math.log(0.4 * (2 / 2)) * 1e6 + 0.5
    )


def test_stupid_backoff_total_is_sum_of_levels(spark):
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.text import (
        stupid_backoff_scores,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stupid_backoff_scores(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
    )
    bad = out.filter(
        F.col("n_trigrams")
        != F.col("n_tri_hits") + F.col("n_bi_hits") + F.col("n_uni_hits")
    ).count()
    assert bad == 0
    # every scored doc appears exactly once (zero-fill keeps short docs)
    assert out.count() == docs.filter(F.col("doc_id") % 5 == 0).count()
