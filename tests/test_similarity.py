"""Similarity-search semantics: exact brute-force values on hand-built
vectors, and LSH recall measured against the brute-force baseline on the
driver's sf0.001 embeddings fixture (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.similarity import (
    brute_force_topk,
    embedding_norm,
    lsh_topk,
)
from etl_platform_nyc_taxi_spark.sources import load_fixture

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def tiny(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [1.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_exact_cosines_and_ranks(tiny):
    queries = tiny.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {r["vec_id"]: r for r in brute_force_topk(tiny, queries, k=4).collect()}
    assert out[1]["cosine"] == 1.0 and out[1]["rank"] == 1
    assert out[3]["cosine"] == pytest.approx(0.707107) and out[3]["rank"] == 2
    assert out[2]["cosine"] == 0.0 and out[2]["rank"] == 3
    assert out[4]["cosine"] == -1.0 and out[4]["rank"] == 4


def test_brute_force_k_cap_and_tiebreak(tiny):
    queries = tiny.filter(F.col("vec_id") == 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(tiny, queries, k=2).collect()
    assert len(out) == 2
    # ties broken by vec_id asc: cosine(2,1) == cosine(2,4) == 0.0 but
    # only rank-2 slot remains after vec_id 2 itself (cosine 1.0)
    assert [r["rank"] for r in out] == [1, 2]


def test_lsh_recall_against_brute_force(spark):
    """Recall@10 of the multiprobe LSH path vs exact, on real fixture
    embeddings. Approximation is the contract — but it must be a GOOD
    approximation for nearby vectors."""
    emb = load_fixture(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    approx = lsh_topk(emb, queries, k=10, num_planes=8, dim=64)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"
    # every approx hit must carry the EXACT cosine (rerank is exact)
    exact_cos = {
        (r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]


def test_lsh_output_schema_matches_brute_force(tiny):
    queries = tiny.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    assert (
        lsh_topk(tiny, queries, k=2, num_planes=4, dim=2).columns
        == brute_force_topk(tiny, queries, k=2).columns
    )


def test_embedding_norm(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], "vec_id long, embedding array<float>")
    assert df.select(embedding_norm("embedding").alias("n")).first()["n"] == 5.0


def test_embedding_lsh_near_dups_vs_exact(spark):
    """LSH-bucketed near-dup (the 100 TB path) vs the all-pairs exact
    result on fixture embeddings + scaled mutants. Precision must be
    perfect (the verify step computes exact cosine); recall floor is high
    because cosine≥0.999 pairs split per-plane with P≈arccos(.999)/π."""
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    emb = load_fixture(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    mut = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias(
            "embedding"
        ),
    )
    corpus = emb.unionByName(mut)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups(
            corpus, threshold=0.999, allow_unblocked=True
        ).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups_lsh(
            corpus, threshold=0.999, num_planes=8, num_tables=6, dim=64
        ).collect()
    }
    assert exact, "fixture must contain near-dup pairs (each vec + its mutant)"
    # precision: every LSH pair is a true pair with the exact cosine
    for pair, cos in approx.items():
        assert pair in exact and cos == exact[pair]
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.95, f"LSH near-dup recall {recall:.3f} below floor"


def test_ivf_recall_against_brute_force(spark):
    """IVF (KMeans + nprobe) recall vs exact top-10. With nprobe/nlist =
    4/16 a quarter of the corpus is scanned — recall must beat that
    fraction by a wide margin (the quantizer must be pulling neighbors
    into probed lists, not sampling uniformly)."""
    from etl_platform_nyc_taxi_spark.operators.similarity import ivf_topk

    emb = load_fixture(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, nlist=16, nprobe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_l2_normalize_and_quantize(spark):
    from etl_platform_nyc_taxi_spark.functions.vectors import (
        l2_norm,
        l2_normalize,
        quantize_int8,
        quantize_scale,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in df.select(
            "vec_id",
            l2_normalize(F.col("embedding")).alias("nv"),
            l2_norm(l2_normalize(F.col("embedding"))).alias("nn"),
            quantize_int8(F.col("embedding")).alias("q"),
            quantize_scale(F.col("embedding")).alias("s"),
        ).collect()
    }
    assert out[1]["nv"] == pytest.approx([0.6, 0.8])
    assert out[1]["nn"] == pytest.approx(1.0)
    assert out[2]["nv"] == [0.0, 0.0]  # zero vector passes through, no NULL
    assert out[2]["q"] == [0, 0]
    # q = round(x * 127 / max|x|): [3,4] -> [round(95.25), 127]
    assert out[1]["q"] == [95, 127]
    assert out[1]["s"] == pytest.approx(4.0 / 127.0)
    # dequantized reconstruction error bounded by scale/2 per element
    s = out[3]["s"]
    for orig, q in zip([-1.0, 2.0], out[3]["q"]):
        assert abs(orig - q * s) <= s / 2 + 1e-9


def test_mean_center(spark):
    """mean_center removes the DC component elementwise; identical inputs
    stay identical (the property dedup_image's threshold-1.0 check rests
    on); direction of near-constant vectors spreads (bucket-collapse fix)."""
    from etl_platform_nyc_taxi_spark.functions.vectors import mean_center

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 6.0]), (2, [1.0, 2.0, 3.0, 6.0]), (3, [5.0, 5.0, 5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", mean_center(F.col("embedding")).alias("c")
        ).collect()
    }
    assert out[1] == pytest.approx([-2.0, -1.0, 0.0, 3.0])
    assert out[1] == out[2]  # identical in -> identical out, exactly
    assert out[3] == pytest.approx([0.0, 0.0, 0.0, 0.0])  # constant -> zero


def test_lsh_index_serving_matches_inmemory_and_prunes(spark, tmp_path):
    """write_lsh_index + lsh_topk_from_index == lsh_topk, and the serve
    scan must touch only the probed (table, bucket) partitions."""
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        lsh_topk_from_index,
        write_lsh_index,
    )

    emb = load_fixture(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "lsh_index")
    write_lsh_index(emb, path, num_planes=6, num_tables=8, dim=64)

    served = lsh_topk_from_index(
        spark, path, queries, k=10, num_planes=6, num_tables=8, dim=64
    )
    in_mem = lsh_topk(emb, queries, k=10, num_planes=6, num_tables=8, dim=64)
    s = {(r["query_id"], r["vec_id"], r["cosine"]) for r in served.collect()}
    m = {(r["query_id"], r["vec_id"], r["cosine"]) for r in in_mem.collect()}
    assert s == m and s

    # the probe predicate must land in the scan's PartitionFilters
    # (inputFiles() lists the relation BEFORE pruning, so assert the plan;
    # long OR-chains truncate in the plan string, so check non-emptiness)
    assert _nonempty_partition_filters(served), "no pruning on the index scan"


def _nonempty_partition_filters(df) -> list[str]:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    lines = [l for l in buf.getvalue().splitlines() if "PartitionFilters: [" in l]
    assert lines, "no FileScan with PartitionFilters in plan"
    filters = [l.split("PartitionFilters: ", 1)[1] for l in lines]
    return [f for f in filters if not f.startswith("[]")]


def test_ivf_index_serving_matches_inmemory_and_prunes(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        fit_ivf_centroids,
        ivf_topk,
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = load_fixture(spark, SF_DIR, "embeddings")
    centroids = fit_ivf_centroids(emb, nlist=16, seed=42)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, centroids, path)

    served = ivf_topk_from_index(
        spark, path, queries, centroids, k=10, nprobe=4
    )
    in_mem = ivf_topk(emb, queries, k=10, nprobe=4, centroids=centroids)
    s = {(r["query_id"], r["vec_id"], r["cosine"]) for r in served.collect()}
    m = {(r["query_id"], r["vec_id"], r["cosine"]) for r in in_mem.collect()}
    assert s == m and s

    pf = _nonempty_partition_filters(served)
    assert pf and any("ivf_list" in f for f in pf), pf


# --- round 10: SemDeDup semantic dedup (VERDICT r9 task 2) -----------


def test_semdedup_removes_mutants_keeps_originals(spark):
    """Each ×2-scaled mutant shares its original's cosine profile
    bitwise (powers of two are exact through FP), so it lands in the
    same cluster with an exactly tied sim_centroid and the larger-id
    tie-break removes the mutant, never the original."""
    from etl_platform_nyc_taxi_spark.operators.similarity import semdedup

    emb = load_fixture(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    m = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    out = semdedup(emb.unionByName(m), num_seeds=8, eps=0.999).collect()
    n = len(out) // 2
    assert len(out) == 2 * emb.count()
    by_id = {r["vec_id"]: r for r in out}
    for vid in list(by_id):
        if vid >= 1_000_000:
            continue
        orig, mut = by_id[vid], by_id[vid + 1_000_000]
        assert mut["removed"], vid  # the larger-id twin goes
        assert not orig["removed"], vid
        assert orig["cluster"] == mut["cluster"]
        assert orig["sim_centroid"] == mut["sim_centroid"]


def test_semdedup_hand_built_keep_rule(spark):
    """Paper keep rule on a hand-built cluster: above eps, the member
    CLOSEST to the centroid is removed (diversity-preserving keep of
    the farthest member)."""
    from etl_platform_nyc_taxi_spark.operators.similarity import semdedup

    # centroid along +x; v10 near-parallel to v11 (cos > 0.999), but
    # v10 is closer to the centroid -> v10 removed, v11 kept. v12 is
    # orthogonal-ish: no pair, kept.
    rows = [
        (10, [1.0, 0.01]),
        (11, [1.0, 0.02]),
        (12, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semdedup(
            df, eps=0.999, centroids=[[1.0, 0.0], [0.0, 1.0]]
        ).collect()
    }
    assert out[10]["removed"] and not out[11]["removed"]
    assert not out[12]["removed"]
    assert out[10]["cluster"] == out[11]["cluster"] == 0
    assert out[12]["cluster"] == 1


def test_semdedup_kmeans_centroid_path(spark):
    """Production path: fit_ivf_centroids output plugs into semdedup's
    centroids parameter; output covers the corpus exactly once and
    cluster ids are centroid indices."""
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        fit_ivf_centroids,
        semdedup,
    )

    emb = load_fixture(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = fit_ivf_centroids(emb, nlist=4, seed=42)
    out = semdedup(emb, eps=0.999, centroids=cents).collect()
    assert len(out) == emb.count()
    assert {r["cluster"] for r in out} <= set(range(4))
    # raw fixture without mutants: nothing at cosine >= 0.999
    assert not any(r["removed"] for r in out)


def test_semdedup_seed_determinism(spark):
    """md5 medoid seeds are a deterministic function of the ids — two
    invocations agree row-for-row (registry md5-determinism rule)."""
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        semdedup_seeds,
    )

    emb = load_fixture(spark, SF_DIR, "embeddings")
    s1 = [r["seed_id"] for r in semdedup_seeds(emb, 8).collect()]
    s2 = [r["seed_id"] for r in semdedup_seeds(emb, 8).collect()]
    assert s1 == s2 and len(s1) == 8


def test_embedding_dispersion_matches_bruteforce(spark):
    import itertools
    import math

    from etl_platform_nyc_taxi_spark.operators.similarity import (
        embedding_dispersion,
    )
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    vecs = {
        "a": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 0.0]],
        "b": [[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]],  # identical -> mean cos 1
        "c": [[1.0, 0.0, 0.0]],                   # single vector -> omitted
        "d": [[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]],  # zero vec excluded -> n=1 -> omitted
    }
    data, i = [], 0
    for lbl, vs in vecs.items():
        for v in vs:
            data.append((i, lbl, v))
            i += 1
    df = rows_source(
        spark, data, "vec_id long, label string, embedding array<float>"
    )
    got = {
        r["label"]: (r["n_vecs"], r["mean_pair_cos_micro"], r["dispersion_micro"])
        for r in embedding_dispersion(df, "label").collect()
    }
    assert set(got) == {"a", "b"}

    def mean_cos(vs):
        def unit(v):
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v]
        us = [unit(v) for v in vs]
        cos = [
            sum(x * y for x, y in zip(u, w))
            for u, w in itertools.combinations(us, 2)
        ]
        return sum(cos) * 2 / (len(us) * (len(us) - 1))

    for lbl in ("a", "b"):
        want = math.floor(mean_cos(vecs[lbl]) * 1e6 + 0.5)
        n, mm, dm = got[lbl]
        assert n == len(vecs[lbl])
        # quantization chain differs from the naive float path by at most
        # a few micro at these magnitudes
        assert abs(mm - want) <= 2, (lbl, mm, want)
        assert dm == 1_000_000 - mm
    assert got["b"][1] >= 999_998  # identical vectors -> mean cos ~= 1


def test_ivf_plan_has_no_literal_codebook_trees(spark):
    """VERDICT r11 task 6: the coarse codebook must travel as DATA (the
    one-row broadcast relation), never as literal expression trees — the
    compiled plan's size must not grow with nlist, and no centroid value
    may appear as a literal in the plan text."""
    import contextlib
    import io

    from etl_platform_nyc_taxi_spark.operators.similarity import (
        assign_ivf_lists,
        ivf_topk,
    )

    emb = load_fixture(spark, SF_DIR, "embeddings")
    # distinctive, un-foldable centroid components
    cents = [
        [0.1234567 + i / 997.0 for _ in range(64)] for i in range(16)
    ]
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    for df in (
        assign_ivf_lists(emb, cents),
        ivf_topk(emb, queries, k=5, nprobe=2, centroids=cents),
    ):
        plan = plan_of(df)
        assert "0.1234567" not in plan, "centroid literal leaked into plan"
        assert "PythonEval" not in plan and "BatchEvalPython" not in plan
        # the codebook rides a broadcast join of the one-row relation
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    # compiled-plan size is flat in nlist (literal trees grew linearly)
    small = len(plan_of(assign_ivf_lists(emb, cents[:2])))
    large = len(plan_of(assign_ivf_lists(emb, cents * 8)))  # 128 centroids
    assert large < small * 1.5, (small, large)


def test_hard_triplets_hand_computed(spark):
    """4 vectors, 2 labels, hand-checkable cosines: anchors pick the
    least-similar same-label and most-similar other-label candidates."""
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        hard_triplets,
    )

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.1]),   # near v1, same label
        (3, 1, [0.0, 1.0]),   # orthogonal to v1
        (4, 1, [0.6, 0.8]),   # 53 deg from v1, closest other-label
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r["anchor_id"]: r for r in hard_triplets(df).collect()}
    # anchor 1: only positive is 2; hardest negative is 4 (cos 0.6 > 0)
    assert out[1]["pos_id"] == 2 and out[1]["neg_id"] == 4
    assert abs(out[1]["neg_cos"] - 0.6) < 1e-9
    # anchor 3: positive 4 (cos 0.8); hardest negative 2 (cos ~0.0995 > 0)
    assert out[3]["pos_id"] == 4 and out[3]["neg_id"] == 2
    # margin algebra + flag
    for r in out.values():
        assert abs(r["margin"] - (r["pos_cos"] - r["neg_cos"])) < 1e-12
        assert r["violates"] == (r["margin"] <= 0.0)
    # anchor 1 margin: pos_cos ~0.995 > neg 0.6 -> not violated
    assert out[1]["violates"] is False


def test_hard_triplets_tiebreak_and_singleton_label(spark):
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        hard_triplets,
    )

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0]),   # identical twin — cos 1.0 with anchor 1
        (3, 0, [1.0, 0.0]),   # another twin: tie on cos -> min cand_id
        (9, 5, [0.5, 0.5]),   # singleton label: no positive -> omitted
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r["anchor_id"]: r for r in hard_triplets(df).collect()}
    assert 9 not in out                      # no positive exists
    assert out[1]["pos_id"] == 2             # tie (cos 1.0): min id wins
    assert out[2]["pos_id"] == 1
    assert out[1]["neg_id"] == 9             # only negative available


def test_hard_triplets_lsh_is_conservative_vs_exact(spark):
    """LSH-candidate mining: positives identical to the exact form;
    the mined negative is a lower bound (missed candidates can only
    raise the reported margin), and n_cand_neg is exposed."""
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        hard_triplets,
        hard_triplets_lsh,
    )

    df = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "label", "embedding")
    )
    exact = {r["anchor_id"]: r for r in hard_triplets(df).collect()}
    ann = {r["anchor_id"]: r for r in hard_triplets_lsh(df).collect()}
    assert set(ann) <= set(exact)
    # wide 4-plane buckets at this corpus size: coverage must be broad
    assert len(ann) >= int(0.9 * len(exact))
    for aid, r in ann.items():
        e = exact[aid]
        assert (r["pos_id"], r["pos_cos"]) == (e["pos_id"], e["pos_cos"])
        assert r["neg_cos"] <= e["neg_cos"] + 1e-12
        assert r["margin"] >= e["margin"] - 1e-12
        assert 1 <= r["n_cand_neg"]
    # the top candidate usually IS the true hardest at this scale
    agree = sum(
        1 for aid in ann if ann[aid]["neg_id"] == exact[aid]["neg_id"]
    )
    assert agree >= int(0.5 * len(ann))


def test_retrieval_ndcg_matches_python_recompute(spark):
    """NDCG/MRR math pinned against a from-scratch Python recompute of
    the same ranking at sf0.001 — catches weight/fold drift
    independently of the SQL oracle."""
    import math

    from etl_platform_nyc_taxi_spark import queries_registry as QR

    sf = "/root/testdata/sf0.001"
    got = {r["query_id"]: r for r in QR.QUERIES["retrieval_ndcg"](spark, sf).collect()}

    rows = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]]) for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    w = lambda r: math.floor(1e6 * math.log(2) / math.log(r + 1) + 0.5)  # noqa: E731
    for qid in [i for i in vecs if i < 8]:
        qlab, qv = vecs[qid]
        ranked = sorted(
            ((cos(qv, v), -i) for i, (lab, v) in vecs.items() if i != qid),
            reverse=True,
        )[:10]
        rels = [1 if vecs[-i][0] == qlab else 0 for (_, i) in ranked]
        dcg = sum(w(r + 1) for r, rel in enumerate(rels) if rel)
        n_rel = sum(1 for i, (lab, _) in vecs.items() if i != qid and lab == qlab)
        idcg = sum(w(i) for i in range(1, min(n_rel, 10) + 1))
        g = got[qid]
        assert g["dcg_micro"] == dcg, qid
        assert g["idcg_micro"] == idcg, qid
        assert g["ndcg_ppm"] == (dcg * 1_000_000 // idcg if idcg else 0), qid
        first = next((r + 1 for r, rel in enumerate(rels) if rel), 0)
        assert g["mrr_ppm"] == (1_000_000 // first if first else 0), qid
        assert 0 <= g["ndcg_ppm"] <= 1_000_000
