"""PCA-based anomaly detection on event-count windows.

Re-expresses PCADetector (aminer/analysis/PCADetector.py:31-384): build the
event-count matrix over time windows, project onto the top-k principal
components, and flag windows whose reconstruction error exceeds a threshold.

Spark shape: the count matrix is assembled relationally (count_vectors →
pivot-free dense vector via a sorted type index), pyspark.ml PCA fits the
components, and the reconstruction error is computed row-wise with a
vectorized expression over the projected coordinates (||x||² − ||proj||² for
mean-centered orthonormal PCA — no per-row Python).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pyspark.ml ships with pyspark, but keep the import soft for slim builds
    from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    _HAVE_ML = True
except ImportError:  # pragma: no cover
    _HAVE_ML = False


def count_matrix(
    df: DataFrame,
    type_col: str,
    ts_col: str = "ts",
    window_size: float = 600.0,
) -> tuple[DataFrame, list[str]]:
    """(windows × event-types count matrix as array column, type order).
    Pivot on the (small) event-type vocabulary."""
    ts = F.col(ts_col).cast("double")
    t0_df = df.agg(F.min(ts).alias("_t0"))
    types = sorted(
        r[0]
        for r in df.select(type_col).filter(F.col(type_col).isNotNull()).distinct().collect()
    )
    binned = df.crossJoin(F.broadcast(t0_df)).withColumn(
        "w", F.floor((ts - F.col("_t0")) / F.lit(window_size))
    )
    pivoted = (
        binned.groupBy("w").pivot(type_col, types).count().fillna(0)
    )
    return pivoted, types


def pca_reconstruction_errors(
    matrix: DataFrame, feature_cols: Sequence[str], k: int = 2
) -> DataFrame:
    """Adds `error` = squared reconstruction error of each row after
    projecting onto the top-k components of the standardized matrix.
    For orthonormal PCA on centered data: err = ||x_c||² − ||W,x_c||²."""
    if not _HAVE_ML:  # pragma: no cover
        raise NotImplementedError("pyspark.ml not available")
    asm = VectorAssembler(inputCols=list(feature_cols), outputCol="_raw")
    assembled = asm.transform(matrix)
    scaler = StandardScaler(
        inputCol="_raw", outputCol="_feat", withMean=True, withStd=True
    ).fit(assembled)
    feats = scaler.transform(assembled)
    pca = PCA(k=k, inputCol="_feat", outputCol="_proj").fit(feats)
    out = pca.transform(feats)
    sq = lambda c: F.aggregate(  # noqa: E731
        vector_to_array(F.col(c)), F.lit(0.0), lambda a, x: a + x * x
    )
    return (
        out.withColumn("error", sq("_feat") - sq("_proj"))
        .drop("_raw", "_feat", "_proj")
    )


def check_pca_anomalies(
    df: DataFrame,
    type_col: str,
    ts_col: str = "ts",
    window_size: float = 600.0,
    k: int = 2,
    error_threshold: float | None = None,
) -> DataFrame:
    """Windows whose reconstruction error exceeds the threshold (default:
    mean + 3·stddev_pop of the errors, the reference's spirit)."""
    matrix, types = count_matrix(df, type_col, ts_col, window_size)
    errs = pca_reconstruction_errors(matrix, types, k)
    if error_threshold is None:
        stats = errs.agg(
            F.avg("error").alias("m"), F.stddev_pop("error").alias("s")
        ).collect()[0]
        error_threshold = float(stats["m"]) + 3.0 * float(stats["s"] or 0.0)
    return errs.filter(F.col("error") > F.lit(error_threshold))
