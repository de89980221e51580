"""Distributed linear algebra over embedding columns: PCA via moment
aggregation.

The 100 TB shape for PCA on an ``array<float>`` column is the classic
two-stage split:

1. **Fit** — one pass computing the Gram moments ``(n, Σx, ΣxᵀX)`` as
   per-partition numpy partials (``mapInPandas``: each Arrow batch is a
   dense matrix, the partial is one d + d² row — matmul is the right
   Pandas-UDF exception, exactly like similarity.table_signatures_udf).
   One bounded merge stage (``MERGE_PARTITIONS`` tasks) combines the
   per-partition partials before the driver ever sees them, so driver
   traffic is O(64 × (d²+d+1) doubles) regardless of how many input
   partitions exist; the driver then runs the d×d eigensolve locally:
   the data never shuffles, only sketches move.
2. **Project** — the fitted mean/components embed as PLAIN ARRAY
   LITERALS in the projection expression (``zip_with`` + ``aggregate``
   fold, JVM codegen) — the serving pass is a pure map, broadcast-free,
   UDF-free, and partition-prunable, mirroring the IVF centroids-as-
   literals design (similarity.py).

Caveat vs iterative SVD: forming covariance from moments squares the
condition number — fine for feature-reduction over unit-scale
embeddings (this use), wrong for ill-conditioned data; the fix at that
point is power iteration on the same partial-aggregation skeleton.

Ref (capability gap): the reference has no vector analytics at all
(SURVEY.md §2 has zero array operators).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: Width of the intermediate partial-merge stage in :func:`fit_pca` —
#: the driver never collects more than this many (1 + d + d²) sketch
#: rows, whatever the input partitioning.
MERGE_PARTITIONS = 64


def fit_pca(
    df: DataFrame, vec_col: str, k: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-pass distributed PCA fit: returns ``(mean[d], components[k,d],
    explained_variance[k])``. Components are rows, unit-norm, ordered by
    descending eigenvalue, sign-canonicalized (largest-|coef| entry
    positive) so the fit is deterministic across partitionings. NULL
    vectors are skipped in the fit (projection of a NULL vector yields
    NULL scores); mixed dimensions raise a named ValueError instead of
    failing opaquely inside the task's matmul."""

    partial_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("xtx", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, xtx = 0, None, None
        for pdf in batches:
            vals = pdf[vec_col].dropna().tolist()
            if not vals:
                continue
            dims = {len(v) for v in vals}
            # also compare against earlier batches of this partition —
            # a per-batch-only check lets cross-batch mismatches fail
            # opaquely in the `s + x.sum` broadcast (code-review r7)
            if s is not None:
                dims.add(len(s))
            if len(dims) != 1:  # ragged input would silently build an
                # object array and fail deep inside the matmul
                raise ValueError(
                    f"fit_pca: mixed embedding dimensions {sorted(dims)} "
                    f"in column {vec_col!r}"
                )
            x = np.asarray(vals, dtype=np.float64)
            if x.size == 0:
                continue
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            xtx = g if xtx is None else xtx + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
            )

    def merge_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, xtx = 0, None, None
        for pdf in batches:
            for _, r in pdf.iterrows():
                rs = np.asarray(r["s"], dtype=np.float64)
                if s is not None and len(rs) != len(s):
                    raise ValueError(
                        f"fit_pca: mixed embedding dimensions "
                        f"[{len(s)}, {len(rs)}] across partitions in "
                        f"column {vec_col!r}"
                    )
                n += int(r["n"])
                s = rs if s is None else s + rs
                g = np.asarray(r["xtx"], dtype=np.float64)
                xtx = g if xtx is None else xtx + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.tolist()]}
            )

    # Bound the driver collect (code-review r7): the per-partition stage
    # yields one (1 + d + d²) row per input partition — at d=1024 over
    # 10k partitions that is ~80 GB of driver traffic. Insert one merge
    # stage over the PARTIALS relation (tiny — the data itself never
    # shuffles) so the driver sees at most MERGE_PARTITIONS rows,
    # O(64·d²) bytes, regardless of input partitioning.
    part = df.select(vec_col).mapInPandas(partials, partial_schema)
    rows = (
        part.repartition(MERGE_PARTITIONS)
        .mapInPandas(merge_partials, partial_schema)
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca: empty input")
    cross = {len(r["s"]) for r in rows}
    if len(cross) != 1:  # per-PARTITION partials can still disagree
        raise ValueError(
            f"fit_pca: mixed embedding dimensions {sorted(cross)} "
            f"across partitions in column {vec_col!r}"
        )
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["xtx"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # canonical sign: the largest-magnitude coefficient is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def _dot_lit(vec: Column, weights: np.ndarray) -> Column:
    arr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(vec, arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def project_pca(
    df: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    prefix: str = "pc",
) -> DataFrame:
    """Append principal-component scores ``pc1..pck``. The fitted
    vectors are expression LITERALS — whole-stage-codegen arithmetic,
    no UDF, no broadcast variable, no Python on the serving path.
    ``x·c − mean·c`` (the scalar ``mean·c`` folds to a constant) rather
    than ``(x−mean)·c`` keeps one array op per component."""
    v = F.col(vec_col).cast("array<double>")
    out = df
    for i, c in enumerate(components):
        shift = float(np.dot(mean, c))
        out = out.withColumn(f"{prefix}{i + 1}", _dot_lit(v, c) - F.lit(shift))
    return out


def pca_embed(df: DataFrame, vec_col: str, k: int = 2) -> DataFrame:
    """Fit + project in one call (fit is an action over sketches only)."""
    mean, comps, _ = fit_pca(df, vec_col, k)
    return project_pca(df, vec_col, mean, comps)


def label_centroid_cosine(
    df: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroid embeddings
    — the inter-class separation audit run before trusting labels for
    training-mix stratification or an IVF partitioning (near-parallel
    centroids ⇒ the classes don't separate in this embedding space).

    Cosine is scale-invariant, so cos(mean_a, mean_b) = cos(sum_a,
    sum_b) and the centroid DIVISION never happens — per-(label, dim)
    DECIMAL sums are exact, every cross-engine-fragile op is gone, and
    the only IEEE arithmetic is single correctly-rounded ops (×, ÷,
    sqrt) over already-exact inputs. Plan: one explode + one (label,
    dim) aggregate over the data (map-side combinable, shuffle carries
    |labels|·d rows), then all pair math runs on the tiny
    |labels|·d relation — the full |labels|² work never touches the
    corpus. Products are quantized to DECIMAL(38,12) before the pair
    sums so accumulation is summation-order-free."""
    ex = df.select(
        F.col(label_col).alias("__lbl"),
        F.posexplode(vec_col).alias("__pos", "__x"),
    )
    sums = ex.groupBy("__lbl", "__pos").agg(
        F.sum(
            F.col("__x").cast("double").cast("decimal(28,14)")
        ).alias("__s")
    )
    sd = sums.select(
        "__lbl", "__pos", F.col("__s").cast("double").alias("__sd")
    )
    norms = sd.groupBy("__lbl").agg(
        F.sum((F.col("__sd") * F.col("__sd")).cast("decimal(38,12)")).alias(
            "__n2"
        )
    )
    a = sd.select(
        F.col("__lbl").alias("label_a"),
        F.col("__pos").alias("__pos"),
        F.col("__sd").alias("__sa"),
    )
    b = sd.select(
        F.col("__lbl").alias("label_b"),
        F.col("__pos").alias("__posb"),
        F.col("__sd").alias("__sb"),
    )
    dots = (
        a.join(
            b,
            (a["__pos"] == b["__posb"])
            & (a["label_a"] < b["label_b"]),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(
                (F.col("__sa") * F.col("__sb")).cast("decimal(38,12)")
            ).alias("__dot")
        )
    )
    na = norms.select(
        F.col("__lbl").alias("label_a"), F.col("__n2").alias("__n2a")
    )
    nb = norms.select(
        F.col("__lbl").alias("label_b"), F.col("__n2").alias("__n2b")
    )
    return (
        dots.join(na, "label_a")
        .join(nb, "label_b")
        .select(
            "label_a",
            "label_b",
            (
                F.col("__dot").cast("double")
                / (
                    F.sqrt(F.col("__n2a").cast("double"))
                    * F.sqrt(F.col("__n2b").cast("double"))
                )
            ).alias("cosine"),
        )
    )
