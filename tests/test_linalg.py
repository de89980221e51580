"""operators/linalg.py: distributed PCA — numpy-differential parity,
partition invariance, and the no-UDF serving-path plan contract."""

from __future__ import annotations

import numpy as np
import pytest

from etl_platform_nyc_taxi_spark.operators.linalg import (
    fit_pca,
    pca_embed,
    project_pca,
)


def _toy(spark, n=200, d=8, parts=4, seed=0):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: two dominant directions the fit must find
    base = rng.normal(size=(n, d)) * np.array([5.0, 3.0] + [0.3] * (d - 2))
    rows = [(i, base[i].astype("float32").tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        .repartition(parts),
        base,
    )


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x.astype(np.float64), rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_fit_matches_numpy_oracle(spark):
    df, x = _toy(spark)
    # float32 storage quantizes the input; compare against numpy over the
    # same quantized values.
    x32 = x.astype("float32").astype("float64")
    mean, comps, ev = fit_pca(df, "embedding", k=2)
    nmean, ncomps, nev = _numpy_pca(x32, 2)
    np.testing.assert_allclose(mean, nmean, atol=1e-6)
    np.testing.assert_allclose(ev, nev, rtol=1e-6)
    np.testing.assert_allclose(comps, ncomps, atol=1e-6)


def test_fit_invariant_to_partitioning(spark):
    df1, _ = _toy(spark, parts=1)
    df8, _ = _toy(spark, parts=8)
    m1, c1, e1 = fit_pca(df1, "embedding", k=2)
    m8, c8, e8 = fit_pca(df8, "embedding", k=2)
    np.testing.assert_allclose(m1, m8, atol=1e-9)
    np.testing.assert_allclose(c1, c8, atol=1e-9)
    np.testing.assert_allclose(e1, e8, atol=1e-9)


def test_projection_scores_match_numpy(spark):
    df, x = _toy(spark, n=100)
    x32 = x.astype("float32").astype("float64")
    mean, comps, _ = fit_pca(df, "embedding", k=2)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in project_pca(df, "embedding", mean, comps).collect()
    }
    want = (x32 - mean) @ comps.T
    for i in range(100):
        np.testing.assert_allclose(got[i], want[i], atol=1e-5)


def test_projection_explained_variance_ordering(spark):
    df, _ = _toy(spark, n=500)
    out = pca_embed(df, "embedding", k=2).select("pc1", "pc2").collect()
    p1 = np.var([r["pc1"] for r in out])
    p2 = np.var([r["pc2"] for r in out])
    assert p1 > p2 > 0  # dominant direction first


def test_projection_plan_is_udf_free(spark):
    df, _ = _toy(spark, n=50)
    mean, comps, _ = fit_pca(df, "embedding", k=2)
    plan = (
        project_pca(df, "embedding", mean, comps)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_fit_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        fit_pca(df, "embedding")


# ---------------------------------------------------------------------------
# label centroid cosine
# ---------------------------------------------------------------------------


def test_label_centroid_cosine_known_geometry(spark):
    from etl_platform_nyc_taxi_spark.operators.linalg import (
        label_centroid_cosine,
    )

    # label 0 along +x, label 1 along +y (orthogonal), label 2 along +x
    # (parallel to 0); centroids are means but cosine ignores scale
    rows_in = [
        (0, [1.0, 0.0]),
        (0, [3.0, 0.0]),
        (1, [0.0, 2.0]),
        (2, [5.0, 0.0]),
    ]
    df = spark.createDataFrame(rows_in, "label int, v array<float>")
    got = {
        (r["label_a"], r["label_b"]): r["cosine"]
        for r in label_centroid_cosine(df, "label", "v").collect()
    }
    assert abs(got[(0, 1)]) < 1e-12
    assert abs(got[(0, 2)] - 1.0) < 1e-12
    assert abs(got[(1, 2)]) < 1e-12


def test_label_centroid_cosine_opposed(spark):
    from etl_platform_nyc_taxi_spark.operators.linalg import (
        label_centroid_cosine,
    )

    rows_in = [(0, [1.0, 1.0]), (1, [-2.0, -2.0])]
    df = spark.createDataFrame(rows_in, "label int, v array<float>")
    [r] = label_centroid_cosine(df, "label", "v").collect()
    assert (r["label_a"], r["label_b"]) == (0, 1)
    assert abs(r["cosine"] + 1.0) < 1e-12


def test_fit_pca_partition_count_independent(spark):
    """VERDICT r7 task 4: driver traffic is bounded by the merge stage,
    and the fit itself must not depend on how the input was partitioned
    (deterministic sign canonicalization + associative moment sums)."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.linalg import fit_pca

    rng = np.random.default_rng(7)
    base = rng.normal(size=(400, 6))
    base[:, 0] *= 4.0  # dominant direction
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "id long, v array<double>")

    fits = []
    for parts in (1, 7, 64, 200):
        mean, comps, evals = fit_pca(df.repartition(parts), "v", k=2)
        fits.append((mean, comps, evals))
    m0, c0, e0 = fits[0]
    for mean, comps, evals in fits[1:]:
        np.testing.assert_allclose(mean, m0, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(comps, c0, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(evals, e0, rtol=1e-9, atol=1e-12)
    # ground truth: numpy eigensolve on the same covariance
    cov = np.cov(base, rowvar=False, bias=True)
    ev, _ = np.linalg.eigh(cov)
    np.testing.assert_allclose(sorted(e0, reverse=True), ev[::-1][:2], rtol=1e-8)


def test_fit_pca_mixed_dims_named_error_through_merge(spark):
    """The merge stage must surface the cross-partition ragged-dim case
    as the same named ValueError the per-partition stage raises."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.linalg import fit_pca

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], "id long, v array<double>"
    ).repartition(2)
    with pytest.raises(Exception, match="mixed embedding dimensions"):
        fit_pca(df, "v", k=1)
