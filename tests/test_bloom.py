"""Bloom-filter decontamination (operators/bloom.py).

Semantics pinned here:
 * membership is NEVER missed (a Bloom filter has no false negatives) —
   every gram actually present in the eval set bloom-hits;
 * a probe hits iff ALL k positions are set (verified against a pure-
   Python reimplementation of the same md5 position family);
 * the per-doc flag is a pure integer threshold;
 * the FP audit's bloom-hit set is a superset of its true-hit set.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.bloom import (
    bloom_build,
    bloom_decontaminate,
    bloom_fp_audit,
    bloom_probe_grams,
)
from etl_platform_nyc_taxi_spark.sources.rows import rows_source

from tests.conftest import rows


def _pos(gram: str, j: int, m: int) -> int:
    h = hashlib.md5(f"bloom{j}:{gram}".encode()).hexdigest()
    return int(h[:12], 16) % m


def _py_grams(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture
def docs(spark):
    schema = "doc_id long, text string, source string"
    data = [
        # train docs
        (1, "alpha beta gamma delta epsilon", "s1"),
        (2, "zeta eta theta iota kappa", "s1"),
        (3, "alpha beta gamma zeta eta", "s2"),  # shares grams with eval
        (4, "one two", "s2"),  # shorter than n -> single clamped gram
        # eval docs
        (100, "alpha beta gamma delta", "ev"),
        (101, "one two", "ev"),
    ]
    return rows_source(spark, data, schema)


def test_bloom_no_false_negatives(spark, docs):
    train = docs.filter(F.col("doc_id") < 100)
    evals = docs.filter(F.col("doc_id") >= 100)
    out = {
        (r["__id"], r["__gram"]): r["bloom_hit"]
        for r in bloom_probe_grams(
            train, bloom_build(evals), m_bits=1 << 17
        ).collect()
    }
    eval_grams = _py_grams("alpha beta gamma delta") | _py_grams("one two")
    for (doc, gram), hit in out.items():
        if gram in eval_grams:
            assert hit, f"false negative for member gram {gram!r}"


def test_bloom_positions_match_python_family(spark, docs):
    evals = docs.filter(F.col("doc_id") >= 100)
    m = 1 << 17
    got = {r["pos"] for r in bloom_build(evals, m_bits=m).collect()}
    eval_grams = _py_grams("alpha beta gamma delta") | _py_grams("one two")
    want = {_pos(g, j, m) for g in eval_grams for j in (1, 2, 3)}
    assert got == want


def test_probe_requires_all_k_positions(spark):
    # Craft a bloom relation that contains only 2 of gram X's 3 positions:
    # the probe must NOT hit.
    m = 1 << 17
    gram = "alpha beta gamma"
    partial = [(p,) for p in [_pos(gram, 1, m), _pos(gram, 2, m)]]
    bloom = rows_source(spark, partial, "pos long")
    train = rows_source(
        spark, [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    out = rows(bloom_probe_grams(train, bloom, m_bits=m))
    assert out == [(1, gram, False)]


def test_decontaminate_flags_contaminated_doc(spark, docs):
    train = docs.filter(F.col("doc_id") < 100)
    evals = docs.filter(F.col("doc_id") >= 100)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_bloom_hits"], r["flagged"])
        for r in bloom_decontaminate(train, evals).collect()
    }
    # doc 1: 3 grams, 2 of them ("alpha beta gamma", "beta gamma delta")
    # are eval members -> flagged at the 5% threshold.
    assert got[1] == (3, 2, True)
    # doc 2: no shared vocabulary -> (modulo astronomically unlikely md5
    # triple-collisions at 2^17 bits) zero hits, not flagged.
    assert got[2] == (3, 0, False)
    # doc 4: clamped single gram "one two" IS an eval doc verbatim.
    assert got[4] == (1, 1, True)


def test_fp_audit_bloom_superset_of_truth(spark, docs):
    train = docs.filter(F.col("doc_id") < 100)
    evals = docs.filter(F.col("doc_id") >= 100)
    for r in bloom_fp_audit(train, evals).collect():
        assert r["n_bloom_hits"] >= r["n_true_hits"]
        assert r["n_false_pos"] == r["n_bloom_hits"] - r["n_true_hits"]
        assert r["n_grams"] >= r["n_bloom_hits"]
    # Tiny filter (4 bits) saturates: the 9 eval positions set every bit,
    # every probe hits, and every non-member gram becomes a false
    # positive — proving the audit distinguishes bloom hits from truth.
    audit = bloom_fp_audit(train, evals, m_bits=4)
    total_fp = sum(r["n_false_pos"] for r in audit.collect())
    assert total_fp > 0


def test_bloom_empty_and_whitespace_docs(spark):
    """Zero-token docs produce ONE clamped empty gram (word_ngrams clamp)
    and must flow through build/probe without errors or row loss."""
    from pyspark.sql import functions as F

    train = rows_source(
        spark,
        [(1, ""), (2, "   "), (3, "real content here now")],
        "doc_id long, text string",
    )
    evals = rows_source(spark, [(9, "")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bloom_decontaminate(train, evals).collect()}
    assert set(out) == {1, 2, 3}
    # the empty eval doc's single clamped gram ('') matches the empty
    # train docs' clamped gram -> they bloom-hit; the real doc doesn't
    assert out[1]["n_bloom_hits"] == 1 and out[1]["flagged"]
    assert out[2]["n_bloom_hits"] == 1
    assert out[3]["n_bloom_hits"] == 0 and not out[3]["flagged"]
