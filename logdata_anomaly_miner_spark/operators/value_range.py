"""Range-constraint detector.

Re-expresses ValueRangeDetector (aminer/analysis/ValueRangeDetector.py:27-238;
check :131-149, learn :151-164, persisted {min,max} per id-tuple :62-63).

Two modes, matching AMiner's two lifecycle phases:

1. ``check_value_range_sequential`` — learn_mode=True parity. AMiner
   processes atoms in order: the first observation per id sets min=max, each
   later observation is checked against the range accumulated *so far* and
   then (learn mode) extends it. That sequential fold is exactly a running
   min/max window: anomaly(row i) = value_i outside
   [min(values_0..i-1), max(values_0..i-1)] per id, ordered by (ts, order).
   Verified on the reference unit fixture (ValueRangeDetectorTest.py:26-112)
   in tests/test_value_range.py.

2. ``check_value_range`` — learn_mode=False / scale path: check a batch
   against a fixed learned baseline via a join (broadcast for small
   baselines) + filter. No window, no per-group sort: O(n) scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def learn_ranges(
    df: DataFrame, id_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Baseline = per-group [min,max] (reference learn :151-164).
    Map-side partial aggregation makes this one shuffle of |groups| rows."""
    return df.groupBy(*id_cols).agg(
        F.min(value_col).cast("double").alias("min"),
        F.max(value_col).cast("double").alias("max"),
    )


def merge_ranges(old: DataFrame | None, new: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    if old is None:
        return new
    return (
        old.unionByName(new)
        .groupBy(*id_cols)
        .agg(F.min("min").alias("min"), F.max("max").alias("max"))
    )


def check_value_range(
    df: DataFrame,
    id_cols: Sequence[str],
    value_col: str,
    baseline: DataFrame,
    broadcast_baseline: bool = True,
) -> DataFrame:
    """Batch check against a fixed baseline (reference check :131-149).
    Rows whose group has no learned range are NOT violations (AMiner treats
    first sight as learning material), hence inner join."""
    b = F.broadcast(baseline) if broadcast_baseline else baseline
    v = F.col(value_col).cast("double")
    return (
        df.join(b, on=list(id_cols), how="inner")
        .filter((v < F.col("min")) | (v > F.col("max")))
        .withColumn(
            "detail",
            F.to_json(
                F.struct(
                    v.alias("value"),
                    F.col("min").alias("range_min"),
                    F.col("max").alias("range_max"),
                )
            ),
        )
    )


def check_value_range_sequential(
    df: DataFrame,
    id_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str] = ("ts",),
    baseline: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """learn_mode=True parity: per id, running-prefix min/max check.

    Returns (violations, learned_baseline). ``baseline`` (previous run's
    ranges) seeds the running min/max. Window sorts are per-group; groups are
    bounded (id cardinality), so this scales by partitioning on id.
    """
    v = F.col(value_col).cast("double")
    w = (
        Window.partitionBy(*id_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    work = df
    if baseline is not None:
        work = df.join(
            F.broadcast(baseline.withColumnRenamed("min", "_bmin").withColumnRenamed("max", "_bmax")),
            on=list(id_cols),
            how="left",
        )
    else:
        work = df.withColumn("_bmin", F.lit(None).cast("double")).withColumn(
            "_bmax", F.lit(None).cast("double")
        )
    prev_min = F.least(F.min(v).over(w), F.coalesce(F.col("_bmin"), F.min(v).over(w)))
    prev_max = F.greatest(F.max(v).over(w), F.coalesce(F.col("_bmax"), F.max(v).over(w)))
    scored = work.withColumn("_pmin", prev_min).withColumn("_pmax", prev_max)
    violations = (
        scored.filter(
            F.col("_pmin").isNotNull()
            & ((v < F.col("_pmin")) | (v > F.col("_pmax")))
        )
        .withColumn(
            "detail",
            F.to_json(
                F.struct(
                    v.alias("value"),
                    F.col("_pmin").alias("range_min"),
                    F.col("_pmax").alias("range_max"),
                )
            ),
        )
        .drop("_pmin", "_pmax", "_bmin", "_bmax")
    )
    learned = merge_ranges(baseline, learn_ranges(df, id_cols, value_col), id_cols)
    return violations, learned


def check_value_range_lifecycle(
    df: DataFrame,
    id_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str] = ("ts",),
    ts_col: str = "ts",
    baseline: DataFrame | None = None,
    stop_learning_time: float | Column | None = None,
    stop_learning_no_anomaly_time: float | None = None,
    ignore_cols: Sequence[str] = (),
    constraint_cols: Sequence[str] = (),
    broadcast_baseline: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full VRD lifecycle (reference ValueRangeDetector.py:74-164):
    screen ignore/constraint paths, run the sequential prefix check while
    learn_mode holds, then check the remaining atoms against the FROZEN
    learned ranges once stop_learning_time / stop_learning_no_anomaly_time
    flips learn_mode off. Returns (violations + phase column, learned
    baseline — which post-cutoff atoms never extend)."""
    from logdata_anomaly_miner_spark.operators.lifecycle import (
        screen_paths,
        split_learn_check,
    )

    work = screen_paths(df, ignore_cols, constraint_cols)
    learn_df, check_df = split_learn_check(
        work, ts_col, stop_learning_time, stop_learning_no_anomaly_time
    )
    v_learn, learned = check_value_range_sequential(
        learn_df, id_cols, value_col, order_cols, baseline
    )
    v_check = check_value_range(
        check_df, id_cols, value_col, learned, broadcast_baseline
    )
    cols = [*df.columns, "detail"]
    violations = (
        v_learn.withColumn("phase", F.lit("learn"))
        .select(*cols, "phase")
        .unionByName(v_check.withColumn("phase", F.lit("check")).select(*cols, "phase"))
    )
    return violations, learned
