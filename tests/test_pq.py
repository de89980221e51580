"""IVF-PQ semantics (operators/pq.py): deterministic integer Lloyd's
training hand-checked on tiny vectors, encoding/ADC exactness, recall
floor vs brute-force truth on the sf0.001 embeddings fixture, and plan
hygiene (no Python rows, broadcast query side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.pq import (
    MILLI_OFFSET,
    fit_int_kmeans,
    int_nearest,
    ivfpq_topk,
    pq_encode,
    quantize_milli,
)
from etl_platform_nyc_taxi_spark.sources import load_fixture

SF_DIR = "/root/testdata/sf0.001"


def test_quantize_milli_exact_and_offset(spark):
    df = spark.createDataFrame(
        [(1, [0.0015, -0.002, 1.0])], "vec_id long, embedding array<float>"
    )
    got = df.select(quantize_milli("embedding").alias("q")).first()["q"]
    # floor(x*1000 + 0.5) + OFFSET, float32-widened: 0.0015f*1000 = 1.5…
    assert got[0] - MILLI_OFFSET in (1, 2)  # 1.5 rounds up (float32 ulp)
    assert got[1] - MILLI_OFFSET == -2
    assert got[2] - MILLI_OFFSET == 1000
    assert all(v > 0 for v in got)  # offset keeps every component positive


def test_int_nearest_ties_to_lowest_id(spark):
    df = spark.createDataFrame([(1, [0, 0])], "vec_id long, v array<long>")
    cents = [[3, 0], [0, 3], [5, 5]]  # centroids 0 and 1 tie at d2=9
    got = df.select(int_nearest(F.col("v"), cents, 2).alias("n")).first()["n"]
    assert got == [0, 1]


def test_fit_int_kmeans_hand_computed(spark):
    # Two obvious clusters on a line; k=2, init = rows 0 and 1.
    # milli+offset values: x=0.0 -> OFF, 0.001 -> OFF+1, 1.0 -> OFF+1000...
    rows = [
        (0, [0.0]), (1, [1.0]), (2, [0.002]), (3, [0.998]), (4, [0.004]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = fit_int_kmeans(df, m=1, dsub=1, k=2, iters=2)
    c = [b[0] - MILLI_OFFSET for b in books[0]]
    # cluster 0 <- {0, 2, 4}: mean of (0, 2, 4) = 2 exactly
    # cluster 1 <- {1, 3}: mean of (1000, 998) = 999
    assert c == [2, 999]


def test_fit_int_kmeans_empty_cluster_keeps_previous(spark):
    # k=3 but only two distinct points: init row 2 duplicates row 0's
    # value, so after assignment (ties to lowest j) cluster 2 is empty
    # and must keep its init centroid.
    rows = [(0, [0.0]), (1, [1.0]), (2, [0.0]), (3, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = fit_int_kmeans(df, m=1, dsub=1, k=3, iters=2)
    c = [b[0] - MILLI_OFFSET for b in books[0]]
    assert c == [0, 1000, 0]


def test_pq_encode_codes_in_range_and_deterministic(spark):
    e = load_fixture(spark, SF_DIR, "embeddings")
    books = fit_int_kmeans(e, m=8, dsub=8, k=16, iters=2)
    codes = pq_encode(e, books).select("vec_id", "pq_codes")
    rows = {r["vec_id"]: r["pq_codes"] for r in codes.collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert all(0 <= c < 16 for v in rows.values() for c in v)
    again = {
        r["vec_id"]: r["pq_codes"]
        for r in pq_encode(e, books).select("vec_id", "pq_codes").collect()
    }
    assert rows == again


def test_ivfpq_recall_floor_and_self_hit(spark):
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        brute_force_topk,
    )

    e = load_fixture(spark, SF_DIR, "embeddings")
    coarse = fit_int_kmeans(e, m=1, dsub=64, k=8, iters=2)[0]
    books = fit_int_kmeans(e, m=8, dsub=8, k=16, iters=2)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivfpq_topk(e, q, coarse, books, k=10, nprobe=3)
    got = approx.collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rs in by_q.items():
        assert len(rs) == 10
        # the query vector IS a corpus member: its own list is always the
        # first probe and its ADC distance is only quantization error, so
        # it must appear in its own top-10
        assert any(r["vec_id"] == qid for r in rs)
    truth = brute_force_topk(e, q, k=10).select("query_id", "vec_id")
    t = {(r["query_id"], r["vec_id"]) for r in truth.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in got}
    recall = len(t & a) / len(t)
    assert recall >= 0.4, f"IVF-PQ macro recall collapsed: {recall}"


def test_ivfpq_plan_no_python_and_broadcast(spark):
    e = load_fixture(spark, SF_DIR, "embeddings")
    coarse = fit_int_kmeans(e, m=1, dsub=64, k=8, iters=2)[0]
    books = fit_int_kmeans(e, m=8, dsub=8, k=16, iters=2)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivfpq_topk(e, q, coarse, books, k=10, nprobe=3).explain("formatted")
    plan = buf.getvalue()
    assert "PythonEval" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_fit_int_kmeans_rejects_sparse_init_ids(spark):
    """ADVICE r11: init takes codeword j from the row with vec_id == j,
    so ids 0..k-1 must all exist — a gap must raise a clear ValueError
    naming the missing ids, not surface later as an opaque TypeError in
    codebook_df (Spark) while the SQL replay silently trains with fewer
    centroids."""
    rows = [(i + 10, [float(i), float(-i)]) for i in range(6)]  # ids 10..15
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match=r"missing ids: \[0, 1, 2, 3\]"):
        fit_int_kmeans(df, m=1, dsub=2, k=4, iters=1)


def test_ivfpq_append_equals_full_reencode_and_serving_parity(spark):
    """VERDICT r11 task 4: codebooks are FROZEN at append time, so an
    appended index must equal a full re-encode row-for-row, and serving
    from the encoded relation must match the self-encoding ivfpq_topk
    pair-for-pair (same artifacts, same nprobe)."""
    from etl_platform_nyc_taxi_spark.operators.pq import (
        ivfpq_append,
        ivfpq_encode,
        ivfpq_topk_encoded,
    )

    e = load_fixture(spark, SF_DIR, "embeddings")
    n = e.count()
    b = (n * 3) // 4
    base, new = e.filter(F.col("vec_id") < b), e.filter(F.col("vec_id") >= b)
    coarse = fit_int_kmeans(base, m=1, dsub=64, k=8, iters=2)[0]
    books = fit_int_kmeans(base, m=8, dsub=8, k=16, iters=2)

    appended = ivfpq_append(
        ivfpq_encode(base, coarse, books), new, coarse, books
    )
    full = ivfpq_encode(e, coarse, books)
    assert appended.exceptAll(full).isEmpty()
    assert full.exceptAll(appended).isEmpty()

    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = ivfpq_topk_encoded(appended, q, coarse, books, k=10, nprobe=3)
    mem = ivfpq_topk(e, q, coarse, books, k=10, nprobe=3)
    assert {tuple(r) for r in served.collect()} == {
        tuple(r) for r in mem.collect()
    }


def test_append_index_survives_unpersist_sweep(spark):
    """bench.py's per-query hygiene blocking-unpersists EVERY persistent
    RDD between queries (its _gc_sweep). A cross-query cache must
    therefore be a re-readable storage artifact, never a localCheckpoint
    — lineage-truncated blocks cannot be recomputed once swept (r12: the
    first appended-index cache died exactly this way, mid-bench)."""
    from etl_platform_nyc_taxi_spark import queries_registry as QR

    first = {tuple(r) for r in QR.QUERIES["ann_ivfpq_append"](
        spark, SF_DIR).collect()}
    # replicate bench._gc_sweep's destructive part
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)
    spark.catalog.clearCache()
    again = {tuple(r) for r in QR.QUERIES["ann_ivfpq_drift"](
        spark, SF_DIR).collect()}
    assert first and again  # both executed post-sweep without recompute loss
