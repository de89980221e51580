"""Dedup operator semantics pinned on tiny inline corpora (SURVEY.md §5.2).

The sf-fixture versions of these operators are oracle-checked by the
driver; these tests pin the properties the oracle can't express —
SimHash banding completeness (pigeonhole), LSH recall on known
near-pairs, and blocking behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.hashing import hamming64
from etl_platform_nyc_taxi_spark.operators.dedup import (
    exact_dedup,
    exact_duplicate_groups,
    minhash_candidates,
    minhash_near_dups,
    ngram_jaccard_pairs,
    salt_hot_buckets,
    simhash_near_dups,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green bottles hang on the wall and slowly count themselves to sleep"
)


@pytest.fixture
def corpus(spark):
    rows = [
        (1, BASE, "en"),
        (2, BASE + " tonight", "en"),  # near-dup of 1
        (3, "completely different content about spark shuffle partitions "
            "and adaptive query execution plans at terabyte scale", "en"),
        (4, BASE, "de"),  # exact dup of 1, other block
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_collapses_normalized(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")],
        "doc_id long, text string",
    )
    assert exact_dedup(df).count() == 2
    groups = exact_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["copies"] == 2 and groups[0]["min_doc_id"] == 1


def test_minhash_finds_near_dup_and_skips_unrelated(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dups(
            corpus, k=4, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8  # tiny suffix edit
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert not any(3 in p for p in pairs)  # unrelated never pairs
    assert all(a < b for a, b in pairs)  # canonical orientation, no dupes


def test_minhash_jaccard_matches_exact_set_jaccard(spark):
    # signature-based candidates, but the reported jaccard is EXACT
    a = "abcdefgh"
    b = "abcdefgh"  # identical: jaccard exactly 1.0
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = minhash_near_dups(df, k=4, num_hashes=16, bands=4, threshold=0.9).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0


def test_simhash_banding_is_complete_up_to_max_hamming(corpus, spark):
    """Pigeonhole guarantee: banded equi-join finds EVERY pair with
    Hamming ≤ max_hamming — compare against the brute-force cross join."""
    sigs = simhash_signatures(corpus, "doc_id", "text")
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    banded = simhash_near_dups(corpus, max_hamming=3, blocks=4)
    assert sorted(map(tuple, brute.collect())) == sorted(map(tuple, banded.collect()))


def test_simhash_identical_docs_have_zero_hamming(corpus):
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(corpus, max_hamming=3, blocks=4).collect()
    }
    assert out[(1, 4)] == 0  # identical text, identical signature


def test_simhash_rejects_unsound_block_count(corpus):
    with pytest.raises(ValueError):
        simhash_near_dups(corpus, max_hamming=4, blocks=4)


def test_ngram_jaccard_respects_blocks_and_threshold(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            corpus, block_cols=("lang",), n=2, threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs  # same block, high bigram overlap
    # 1 and 4 are identical text but in DIFFERENT lang blocks: never compared
    assert (1, 4) not in pairs
    assert (1, 3) not in pairs  # same block but below threshold


def test_ngram_jaccard_exact_value(spark):
    # bigrams("a b c d") = {ab, bc, cd}; bigrams("a b c e") = {ab, bc, ce}
    # jaccard = 2/4 = 0.5
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    out = ngram_jaccard_pairs(df, n=2, threshold=0.4, allow_unblocked=True).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 0.5


def test_ngram_jaccard_refuses_silent_cross_join(spark):
    # No blocking key = full cross-pair; must be an explicit opt-in, not a
    # silently-planned O(n^2) join.
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="allow_unblocked"):
        ngram_jaccard_pairs(df, n=2, threshold=0.4)


# ---------------------------------------------------------------------------
# Hot-bucket guard (salt_hot_buckets + max_bucket plumbing)
# ---------------------------------------------------------------------------


def test_salt_hot_buckets_splits_only_oversized(spark):
    # One hot bucket (100 distinct members), one small bucket (3 members).
    rows = [(i, "hot", f"c{i}") for i in range(100)]
    rows += [(1000 + i, "cold", f"d{i}") for i in range(3)]
    banded = spark.createDataFrame(rows, "__id long, key string, content string")
    out = salt_hot_buckets(banded, ("key",), F.col("content"), cap=10)
    per = {
        (r["key"], r["__salt"]): r["c"]
        for r in out.groupBy("key", "__salt").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    cold = [(k, s) for (k, s) in per if k == "cold"]
    assert cold == [("cold", 0)]  # under-cap bucket untouched, salt 0
    hot_sizes = [c for (k, _), c in per.items() if k == "hot"]
    assert sum(hot_sizes) == 100  # no rows dropped
    assert len(hot_sizes) > 1  # the hot bucket WAS split
    # xxhash64 spreads ~uniformly over ceil(100/10)=10 salts: no sub-bucket
    # should retain a quadratic share of the original.
    assert max(hot_sizes) <= 40


def test_salt_hot_buckets_identical_content_shares_salt(spark):
    # 50 copies of the same content in one hot bucket: content-derived salt
    # must keep every copy together (exact dups are never separated).
    rows = [(i, "hot", "same-bytes") for i in range(50)]
    rows += [(100 + i, "hot", f"filler{i}") for i in range(50)]
    banded = spark.createDataFrame(rows, "__id long, key string, content string")
    out = salt_hot_buckets(banded, ("key",), F.col("content"), cap=8)
    salts = {
        r["__salt"] for r in out.filter(F.col("content") == "same-bytes").collect()
    }
    assert len(salts) == 1


def test_salt_hot_buckets_rejects_degenerate_cap(spark):
    df = spark.createDataFrame([(1, "k", "x")], "__id long, key string, content string")
    with pytest.raises(ValueError):
        salt_hot_buckets(df, ("key",), F.col("content"), cap=1)


def test_minhash_max_bucket_caps_candidates_but_keeps_exact_dups(spark):
    # 40 documents that all share every band (identical text => identical
    # signature) would generate 780 candidate pairs unguarded. With
    # identical signatures the salt CANNOT separate them (content hash is
    # the salt source), so the guard must leave exact dups intact...
    rows = [(i, BASE) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_candidates(df, k=4, num_hashes=8, bands=4, max_bucket=8)
    assert pairs.count() == 40 * 39 // 2
    # ...while docs with DIFFERENT signatures crowding one band-bucket are
    # split: doc<->its own exact copy must still pair under a tiny cap.
    rows = [(i, BASE + f" variant token {i}") for i in range(30)]
    rows += [(1000, BASE), (2000, BASE)]  # the exact-dup pair to preserve
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(
            df, k=4, num_hashes=8, bands=4, threshold=0.99, max_bucket=4
        ).collect()
    }
    assert (1000, 2000) in found


def test_embedding_lsh_max_bucket_preserves_identical_vectors(spark):
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        embedding_near_dups_lsh,
    )

    dim = 8
    # 60 near-collinear vectors crowd the same LSH cells; ids 1/2 are
    # bit-identical and must survive any cap at threshold 1.0.
    rows = [(1, [1.0] * dim), (2, [1.0] * dim)]
    rows += [(10 + i, [1.0] * (dim - 1) + [1.0 + (i + 1) / 100.0]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dups_lsh(
        df, threshold=1.0, num_planes=4, num_tables=2, dim=dim, max_bucket=5
    )
    found = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in found


# ---------------------------------------------------------------------------
# Prefix duplicate groups
# ---------------------------------------------------------------------------


def test_prefix_duplicate_groups_matches_shared_prefix_only(spark):
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        prefix_duplicate_groups,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    shared_prefix_other_tail = " ".join(f"tok{i}" for i in range(32)) + " DIFFERENT tail here"
    diverges_at_31 = " ".join(f"tok{i}" for i in range(31)) + " other rest of text"
    df = spark.createDataFrame(
        [(1, base), (2, shared_prefix_other_tail), (3, diverges_at_31), (4, "unrelated text")],
        "doc_id long, text string",
    )
    out = prefix_duplicate_groups(df, n_tokens=32).collect()
    assert len(out) == 1
    assert out[0]["copies"] == 2
    assert out[0]["min_doc_id"] == 1


def test_prefix_duplicate_groups_short_docs_group_on_whole_text(spark):
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        prefix_duplicate_groups,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b"), (4, "a b c d")],
        "doc_id long, text string",
    )
    out = {r["min_doc_id"]: r["copies"] for r in prefix_duplicate_groups(df, n_tokens=32).collect()}
    # docs 1/2 identical (and < 32 tokens): one group; 3 and 4 are distinct prefixes
    assert out == {1: 2}


# ---------------------------------------------------------------------------
# Fuzzy string join (deletion-neighborhood blocking)
# ---------------------------------------------------------------------------


def test_fuzzy_pairs_edit1_matches_naive_quadratic(spark):
    from etl_platform_nyc_taxi_spark.operators.dedup import fuzzy_pairs_edit1

    rows = [
        (1, "spark"), (2, "spars"),   # substitution  -> dist 1
        (3, "spak"),                  # deletion of r -> dist 1 to spark
        (4, "sparks"),                # insertion     -> dist 1 to spark
        (5, "scala"),                 # far from all
        (6, "spark"),                 # exact dup of 1 -> dist 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs_edit1(df, text_col="title").collect()
    }
    # naive oracle
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (ia, ib, lev(ta, tb))
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2)
        if lev(ta, tb) <= 1
    }
    assert got == want
    assert (1, 6, 0) in got and (1, 2, 1) in got and (1, 3, 1) in got and (1, 4, 1) in got
    assert not any({a, b} == {1, 5} for a, b, _ in got)


def test_fuzzy_pairs_edit1_rejects_long_text_at_execution(spark):
    import pytest as _pytest

    from etl_platform_nyc_taxi_spark.operators.dedup import fuzzy_pairs_edit1

    df = spark.createDataFrame([(1, "x" * 100), (2, "y")], "doc_id long, title string")
    out = fuzzy_pairs_edit1(df, text_col="title", max_len=64)
    with _pytest.raises(Exception, match="short-string operator"):
        out.collect()


def test_minhash_probe_new_only_batch_corpus_quadrant(spark):
    from etl_platform_nyc_taxi_spark.operators.dedup import minhash_probe_new

    rows = [
        # corpus (ids < 100)
        (1, BASE),
        (2, "completely different content about spark shuffle partitions "
            "and adaptive query execution plans at terabyte scale"),
        # batch (ids >= 100)
        (101, BASE + " tonight"),          # near-dup of corpus 1
        (102, BASE + " tonight"),          # identical to 101: batch-batch
                                           # pair must NOT surface
        (103, "entirely novel text with no relatives in sight regarding "
              "astronomy telescopes and galaxy cluster surveys"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["new_id"]: (r["n_matches"], r["max_jaccard"])
        for r in minhash_probe_new(
            df, is_new=lambda c: c >= 100, k=4, num_hashes=32, bands=8,
            threshold=0.5,
        ).collect()
    }
    assert set(out) == {101, 102}  # 103 is new; batch-batch dup ignored
    assert out[101] == out[102]
    assert out[101][0] == 1 and out[101][1] > 0.8


def test_minhash_probe_new_agrees_with_pairwise_pipeline(spark):
    """Differential: probe results must equal the full pair pipeline
    restricted to the batch×corpus quadrant (no guard on either side)."""
    from etl_platform_nyc_taxi_spark.operators.dedup import minhash_probe_new

    docs = [(i, f"shared boilerplate prefix block number {i % 7} with "
                f"some trailing words {i}") for i in range(40)]
    batch = [(1000 + i, t) for i, t in docs[::3]]
    df = spark.createDataFrame(docs + batch, "doc_id long, text string")
    probe = {
        (r["new_id"], r["n_matches"], r["max_jaccard"])
        for r in minhash_probe_new(
            df, is_new=lambda c: c >= 1000, k=4, num_hashes=32, bands=8,
            threshold=0.5,
        ).collect()
    }
    pairs = minhash_near_dups(
        df, k=4, num_hashes=32, bands=8, threshold=0.5, max_bucket=None
    ).collect()
    from collections import defaultdict

    agg = defaultdict(list)
    for r in pairs:  # id_a < id_b so batch ids are always id_b
        if r["id_b"] >= 1000 and r["id_a"] < 1000:
            agg[r["id_b"]].append(r["jaccard"])
    want = {(k, len(v), round(max(v), 6)) for k, v in agg.items()}
    assert probe == want


def test_minhash_probe_guard_is_lossless(spark):
    """Probe replication across salt shards must yield the EXACT result
    of the unguarded join — the asymmetric guard trades replication for
    bounded buckets, never recall (unlike the symmetric pair salt)."""
    from etl_platform_nyc_taxi_spark.operators.dedup import minhash_probe_new

    # hot bucket: many identical corpus docs -> one bucket over any cap
    corpus = [(i, BASE) for i in range(30)]
    batch = [(1000, BASE + " tonight"), (1001, "nothing like the others here at all")]
    df = spark.createDataFrame(corpus + batch, "doc_id long, text string")

    kw = dict(is_new=lambda c: c >= 1000, k=4, num_hashes=32, bands=8, threshold=0.5)
    guarded = sorted(
        tuple(r) for r in minhash_probe_new(df, max_bucket=8, **kw).collect()
    )
    unguarded = sorted(
        tuple(r) for r in minhash_probe_new(df, max_bucket=None, **kw).collect()
    )
    assert guarded == unguarded
    assert guarded and guarded[0][0] == 1000 and guarded[0][1] == 30


# ---------------------------------------------------------------------------
# directed containment (operators/dedup.containment_pairs)
# ---------------------------------------------------------------------------


def test_containment_detects_quote_inclusion(spark):
    """A short doc quoted inside a long one: Jaccard is tiny but
    containment ≈ 1 — the mode this metric exists for."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    article = " ".join(f"filler{i}" for i in range(60)) + " " + quote
    df = spark.createDataFrame(
        [(1, quote, "en"), (2, article, "en")], "doc_id long, text string, lang string"
    )
    out = containment_pairs(df, block_cols=("lang",), threshold=0.8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["contained_id"], r["container_id"]) == (1, 2)
    assert r["containment"] == 1.0
    # the same pair is invisible to symmetric Jaccard at any usable bar
    j = ngram_jaccard_pairs(df, block_cols=("lang",), threshold=0.3).collect()
    assert j == []


def test_containment_direction_and_threshold(spark):
    from etl_platform_nyc_taxi_spark.operators.dedup import containment_pairs

    # doc 1 shares 2 of its 4 bigrams with doc 2 -> containment 0.5
    df = spark.createDataFrame(
        [
            (1, "a b c x y", "en"),       # bigrams: ab bc cx xy
            (2, "a b c d e f g", "en"),   # shares ab bc
        ],
        "doc_id long, text string, lang string",
    )
    assert containment_pairs(df, block_cols=("lang",), threshold=0.6).collect() == []
    out = containment_pairs(df, block_cols=("lang",), threshold=0.5).collect()
    assert len(out) == 1 and out[0]["containment"] == 0.5


def test_containment_requires_blocking_or_optin(spark):
    import pytest

    from etl_platform_nyc_taxi_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame([(1, "a b", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        containment_pairs(df)
    # explicit opt-in plans without raising
    containment_pairs(df, allow_unblocked=True).collect()


def test_minhash_estimate_audit_properties(spark):
    """Identical docs audit to est=1, jac=1, err=0; estimates stay in
    [0,1]; every verified near-dup pair appears among audited candidates
    with |est-jac| bounded by the estimator's coarse resolution."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        minhash_estimate_audit,
        minhash_near_dups,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, base * 3),
        (2, base * 3),  # exact duplicate of 1
        (3, (base * 3)[15:]),  # near-dup mutant
        (4, "completely different content about spark shuffles and parquet files"),
        (5, "another unrelated short text with nothing shared at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    audit = minhash_estimate_audit(
        df, k=4, num_hashes=16, bands=4
    ).collect()
    by_pair = {(r["id_a"], r["id_b"]): r for r in audit}
    assert (1, 2) in by_pair
    r12 = by_pair[(1, 2)]
    assert r12["est_jaccard"] == 1.0
    assert r12["hash_jaccard"] == 1.0
    assert r12["abs_err"] == 0.0
    for r in audit:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 < r["hash_jaccard"] <= 1.0
        assert abs(abs(r["est_jaccard"] - r["hash_jaccard"]) - r["abs_err"]) < 1e-9
    verified = minhash_near_dups(
        df, k=4, num_hashes=16, bands=4, threshold=0.5
    ).collect()
    for v in verified:
        assert (v["id_a"], v["id_b"]) in by_pair


def test_banding_rejects_non_divisible_bands(spark):
    """Code-review r7: bands must divide num_hashes — a remainder would
    silently drop trailing hashes from every band key (shifting the LSH
    s-curve), and bands > num_hashes would make every band key the
    empty string: ONE global bucket, an O(n^2) self-join."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.dedup import (
        minhash_candidates,
        minhash_near_dups,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_near_dups(df, num_hashes=10, bands=4)
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_candidates(df, num_hashes=8, bands=16)


def test_simhash_full_width_single_block(spark):
    """Code-review r7: blocks=1 with max_hamming=0 is the legitimate
    'exact 64-bit signature match' configuration; the full-width mask
    must not overflow the int64 literal ((1<<64)-1 did)."""
    from etl_platform_nyc_taxi_spark.operators.dedup import simhash_near_dups

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "other text")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dups(df, max_hamming=0, blocks=1).collect()
    }
    assert got == {(1, 2)}  # identical docs match, distinct do not


# ---------------------------------------------------------------------------
# Exact-substring dedup (token-window fingerprints, Lee et al. 2022 shape)
# ---------------------------------------------------------------------------


def _subs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_substring_pairs_hand_computed(spark):
    """Three docs, window=4: docs 1 and 2 share the verbatim span
    'a b c d e' (two 4-token windows: 'a b c d' and 'b c d e'); doc 3
    shares nothing. Window counts are per-doc DISTINCT fingerprints."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        exact_substring_pairs,
    )

    df = _subs_df(
        spark,
        [
            (1, "a b c d e x y z"),      # 5 windows
            (2, "p q a b c d e"),        # 4 windows
            (3, "m n o r s t u v"),      # 5 windows
        ],
    )
    out = exact_substring_pairs(df, window=4).collect()
    assert [
        (r.doc_a, r.doc_b, r.shared_windows, r.windows_a, r.windows_b)
        for r in out
    ] == [(1, 2, 2, 5, 4)]


def test_exact_substring_short_docs_emit_no_windows(spark):
    """Docs shorter than the window yield zero fingerprints (Spark's
    sequence(1, n<1) DESCENDS — the CASE guard must keep them out), and
    empty/whitespace text tokenizes to [] (tokens_ws semantics)."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        exact_substring_pairs,
    )

    df = _subs_df(
        spark,
        [(1, "a b c"), (2, "a b c"), (3, "   "), (4, "a b c d")],
    )
    # window=4: only doc 4 has any window, so no pair exists at all
    assert exact_substring_pairs(df, window=4).collect() == []


def test_exact_substring_duplicate_windows_within_doc_count_once(spark):
    """A span repeated INSIDE one doc contributes one distinct
    fingerprint — counts are distinct-window counts, so the containment
    ratio shared/least(windows) stays <= 1."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        exact_substring_pairs,
    )

    df = _subs_df(
        spark,
        [
            (1, "a b c d a b c d"),  # 'a b c d' appears at pos 1 and 5
            (2, "z a b c d"),
        ],
    )
    out = exact_substring_pairs(df, window=4).collect()
    row = next(r for r in out if (r.doc_a, r.doc_b) == (1, 2))
    # doc 1 windows: 'a b c d', 'b c d a', 'c d a b', 'd a b c',
    # 'a b c d' (dup -> 4 distinct); doc 2: 'z a b c', 'a b c d' (2)
    assert (row.shared_windows, row.windows_a, row.windows_b) == (1, 4, 2)


def test_exact_substring_stop_span_occupancy_bound(spark):
    """A window shared by more docs than max_docs_per_window is a STOP
    SPAN (boilerplate) and must not create pairs; a rarer span still
    pairs. SCALING.md lesson 2: absolute bound on the self-join key."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        exact_substring_pairs,
    )

    boiler = [(i, "same old boiler plate") for i in range(1, 5)]
    rare = [(10, "k l m n o"), (11, "k l m n p")]
    df = _subs_df(spark, boiler + rare)
    out = exact_substring_pairs(df, window=4, max_docs_per_window=3).collect()
    # the 4-doc boilerplate exceeds the bound of 3 -> dropped entirely;
    # docs 10/11 share exactly 'k l m n'
    assert [
        (r.doc_a, r.doc_b, r.shared_windows, r.windows_a, r.windows_b)
        for r in out
    ] == [(10, 11, 1, 2, 2)]


def test_exact_substring_parameter_validation(spark):
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        exact_substring_pairs,
    )

    df = _subs_df(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="window"):
        exact_substring_pairs(df, window=1)
    with pytest.raises(ValueError, match="max_docs_per_window"):
        exact_substring_pairs(df, max_docs_per_window=1)


def test_substring_dedup_spans_hand_computed(spark):
    """Docs 1/2/3 share 'a b c d e' (doc 1 is the min-id owner and keeps
    it); the non-owner occurrences come back as ONE merged span each,
    in 1-based token coordinates."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        substring_dedup_spans,
    )

    df = _subs_df(
        spark,
        [
            (1, "a b c d e x y z"),
            (2, "p q a b c d e"),   # marked windows at pos 3,4 -> span 3..7
            (3, "a b c d e"),       # pos 1,2 -> span 1..5 (whole doc)
        ],
    )
    out = substring_dedup_spans(df, window=4).collect()
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out
    )
    assert got == [(2, 3, 7, 5), (3, 1, 5, 5)]


def test_substring_dedup_spans_disjoint_spans_stay_separate(spark):
    """Two shared spans in one doc separated by unique text must NOT
    merge — island detection breaks on the coverage gap."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        substring_dedup_spans,
    )

    df = _subs_df(
        spark,
        [
            (1, "a b c d"),
            (2, "w x y z"),
            (3, "a b c d m1 m2 m3 m4 m5 w x y z"),
        ],
    )
    out = substring_dedup_spans(df, window=4).collect()
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out
    )
    # doc 3: 'a b c d' at pos 1 (owner doc 1 keeps its copy) and
    # 'w x y z' at pos 10 (owner doc 2) — two separate spans
    assert got == [(3, 1, 4, 4), (3, 10, 13, 4)]


def test_substring_dedup_spans_owner_keeps_all_copies(spark):
    """The min-id owner is never marked, even when the span repeats
    inside the owner document itself."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        substring_dedup_spans,
    )

    df = _subs_df(
        spark,
        [(1, "a b c d u v a b c d"), (2, "z z a b c d")],
    )
    out = substring_dedup_spans(df, window=4).collect()
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out
    )
    assert got == [(2, 3, 6, 4)]  # only doc 2's occurrence is deletable


def test_apply_substring_dedup_rewrites_non_owner_docs(spark):
    """End-to-end rewrite: non-owner occurrences of the shared span are
    excised; the owner and untouched docs pass through with normalized
    whitespace; counts match the plan."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        apply_substring_dedup,
    )

    df = _subs_df(
        spark,
        [
            (1, "a b c d e x y z"),
            (2, "p q a b c d e"),    # span 3..7 removed -> 'p q'
            (3, "a b c  d e"),       # exact span, doubled space normalizes
            (4, "totally unrelated words here"),
        ],
    )
    out = {r.doc_id: r for r in apply_substring_dedup(df, window=4).collect()}
    assert out[1].text_deduped == "a b c d e x y z"  # owner untouched
    assert (out[1].n_tokens_before, out[1].n_tokens_after) == (8, 8)
    assert out[2].text_deduped == "p q"
    assert (out[2].n_tokens_before, out[2].n_tokens_after) == (7, 2)
    assert out[3].text_deduped == ""                 # fully deduped
    assert (out[3].n_tokens_before, out[3].n_tokens_after) == (5, 0)
    assert out[4].text_deduped == "totally unrelated words here"


def test_apply_substring_dedup_interior_removal_keeps_flanks(spark):
    """A shared span in the MIDDLE of a non-owner doc removes only the
    covered positions — both flanks survive and re-join."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        apply_substring_dedup,
    )

    df = _subs_df(
        spark,
        [(1, "a b c d"), (2, "pre1 pre2 a b c d post1 post2")],
    )
    out = {r.doc_id: r for r in apply_substring_dedup(df, window=4).collect()}
    assert out[2].text_deduped == "pre1 pre2 post1 post2"
    assert (out[2].n_tokens_before, out[2].n_tokens_after) == (8, 4)


def test_longest_shared_substring_hand_computed(spark):
    """Docs 1/2 share 'a b c d e' — two consecutive matched 4-token
    windows on one diagonal certify a 5-token span. Doc 3 shares only
    the single window 'a b c d' with each."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        longest_shared_substring,
    )

    df = _subs_df(
        spark,
        [
            (1, "a b c d e x y z"),
            (2, "p q a b c d e"),
            (3, "z z a b c d q q"),
        ],
    )
    out = {
        (r.doc_a, r.doc_b): (r.longest_shared_tokens, r.n_matched_windows)
        for r in longest_shared_substring(df, window=4).collect()
    }
    assert out[(1, 2)] == (5, 2)   # run of 2 windows -> 2+4-1 = 5
    assert out[(1, 3)] == (4, 1)
    assert out[(2, 3)] == (4, 1)


def test_longest_shared_substring_diagonal_breaks_runs(spark):
    """Matched windows at NON-aligned offsets (different diagonals) must
    not chain into one run: doc 2 contains 'a b c d' and 'e f g h' but
    separated by junk, while doc 1 has them adjacent — the longest
    certified span stays 4, not 8."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        longest_shared_substring,
    )

    df = _subs_df(
        spark,
        [(1, "a b c d e f g h"), (2, "a b c d junk1 junk2 e f g h")],
    )
    out = longest_shared_substring(df, window=4).collect()
    row = out[0]
    # matched windows: 'a b c d' (diag 0) and 'e f g h' (diag -2) —
    # two runs of length 1 each
    assert (row.longest_shared_tokens, row.n_matched_windows) == (4, 2)


def test_substring_probe_new_hand_computed(spark):
    """Batch doc 10 copies 'a b c d e' from the corpus (2 consecutive
    hit windows -> longest run 5 tokens); batch doc 20 is clean; batch
    doc 30 is too short for any window."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        substring_probe_new,
    )

    corpus = _subs_df(
        spark,
        [(1, "a b c d e x y z"), (2, "m n o p q r")],
    )
    batch = _subs_df(
        spark,
        [
            (10, "w w a b c d e"),       # 4 windows, 2 hit, run of 2
            (20, "clean new text with fresh words"),
            (30, "too short"),
        ],
    )
    out = {
        r.doc_id: (r.n_windows, r.n_hit_windows, r.longest_hit_run_tokens)
        for r in substring_probe_new(batch, corpus, window=4).collect()
    }
    assert out[10] == (4, 2, 5)
    assert out[20] == (3, 0, 0)
    assert out[30] == (0, 0, 0)


def test_substring_probe_quadrant_only_batch_scored(spark):
    """Corpus-internal duplication must NOT appear in the output — only
    batch docs are scored, and only against the corpus index."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        substring_probe_new,
    )

    corpus = _subs_df(spark, [(1, "a b c d"), (2, "a b c d")])  # dup pair
    batch = _subs_df(spark, [(10, "a b c d")])
    out = substring_probe_new(batch, corpus, window=4).collect()
    assert [(r.doc_id, r.n_windows, r.n_hit_windows) for r in out] == [
        (10, 1, 1)
    ]


# ---------------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunks_shift_invariance(spark):
    """The defining CDC property: a prefix insertion shifts every offset
    but downstream chunk fingerprints survive, so the edited doc still
    dedups against the original chunk-for-chunk."""
    from etl_platform_nyc_taxi_spark.operators.dedup import cdc_chunk_dedup
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    base_text = " ".join(f"tok{i}" for i in range(200))  # aperiodic
    edited = "inserted prefix tokens here " + base_text
    df = rows_source(
        spark,
        [(1, base_text), (2, edited), (3, "totally different content")],
        "doc_id long, text string",
    )
    out = cdc_chunk_dedup(df).collect()
    # docs 1 and 2 share (nearly) all of doc 1's chunks; doc 3 shares none
    shared = [r for r in out if r["n_docs"] == 2 and r["min_doc_id"] == 1]
    assert len(shared) >= 5, f"expected many surviving chunks, got {len(shared)}"
    assert all(r["min_doc_id"] != 3 for r in out)


def test_cdc_chunks_partition_is_exact(spark):
    """Chunks tile the document: per doc, chunk lengths sum to n_tokens
    and chunk 0 starts at position 1 (no token lost or duplicated)."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.dedup import cdc_chunk_dedup
    from etl_platform_nyc_taxi_spark.sources.parquet import read_parquet_auto

    d = read_parquet_auto(
        spark, "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    # reuse the operator's internals indirectly: duplicate corpus so every
    # chunk appears in >= 2 docs and survives the report filter
    d2 = d.union(d.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    out = cdc_chunk_dedup(d2).collect()
    # identical chunk texts collapse to one fingerprint row carrying
    # n_chunks occurrences; token mass is len * occurrences, and the
    # doubled corpus carries 2x the base token count
    total_chunk_tokens = sum(r["len_tokens"] * r["n_chunks"] for r in out)
    true_tokens = d.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    assert total_chunk_tokens == 2 * true_tokens


# ---------------------------------------------------------------------------
# Prefix-filtering exact Jaccard join
# ---------------------------------------------------------------------------


def test_jaccard_prefix_join_matches_bruteforce(spark):
    """Completeness + precision: the prefix-filtered join returns exactly
    the naive all-pairs result on a corpus engineered with borderline
    pairs (just above/below t=0.6 on bigram sets)."""
    import itertools

    from etl_platform_nyc_taxi_spark.operators.dedup import (
        jaccard_prefix_join,
    )
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    docs = {
        1: "a b c d e f g h",
        2: "a b c d e f g h",            # exact dup of 1
        3: "a b c d e f g z",            # high overlap with 1
        4: "a b c d q r s t",            # ~borderline
        5: "z y x w v u t s",            # disjoint-ish
        6: "a b",                        # tiny set (1 bigram)
        7: "a b",                        # tiny dup
    }
    df = rows_source(spark, list(docs.items()), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
        for r in jaccard_prefix_join(df, threshold_pct=60).collect()
    }

    def bigrams(t):
        toks = t.split()
        return {" ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 1))}

    want = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = bigrams(docs[a]), bigrams(docs[b])
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter * 100 >= union * 60:
            want[(a, b)] = (inter, union)
    assert got == want
    assert (1, 2) in got and (6, 7) in got  # exact dups found
    assert (1, 5) not in got


def test_jaccard_prefix_join_prunes_candidates(spark):
    """The rare-first prefix must generate far fewer candidates than
    all-pairs on a corpus with one corpus-wide frequent element."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.dedup import (
        jaccard_prefix_join,
    )
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    # every doc shares the frequent bigram "the end"; unique tails make
    # all true similarities low -> result must be empty, and the shared
    # frequent element must NOT have generated n^2 candidates (it sorts
    # to the back of every set, outside the prefix)
    data = [
        (i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f the end")
        for i in range(100)
    ]
    df = rows_source(spark, data, "doc_id long, text string")
    assert jaccard_prefix_join(df, threshold_pct=60).count() == 0


def test_minhash_probe_index_equals_union_form(spark):
    """The split build/probe API (r11: minhash_corpus_index +
    minhash_probe_index) must be result-identical to the union-input
    minhash_probe_new under the SAME geometry — and the geometry must
    travel together: an index built under different k/hashes/bands
    produces band keys the probe can never match (zero candidates,
    silently), which is exactly how the streaming capstone first broke."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        minhash_corpus_index,
        minhash_probe_index,
        minhash_probe_new,
    )
    from etl_platform_nyc_taxi_spark.sources import load_fixture

    d = load_fixture(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    geo = dict(k=6, num_hashes=32, bands=8)
    union_form = {
        r["new_id"]: (r["n_matches"], r["max_jaccard"])
        for r in minhash_probe_new(
            d, is_new=lambda c: c % 4 == F.lit(0), threshold=0.6,
            partitions=8, **geo
        ).collect()
    }
    idx = minhash_corpus_index(
        d.filter(F.col("doc_id") % 4 != 0), partitions=8, **geo
    )
    index_form = {
        r["new_id"]: (r["n_matches"], r["max_jaccard"])
        for r in minhash_probe_index(
            idx, d.filter(F.col("doc_id") % 4 == 0), threshold=0.6,
            partitions=8, **geo
        ).collect()
    }
    assert union_form == index_form
    assert union_form, "fixture produced no cross-quadrant near-dups"
