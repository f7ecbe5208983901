"""Sequence / transition detectors.

Re-expresses:
- EventSequenceDetector (aminer/analysis/EventSequenceDetector.py:31-293;
  n-gram novelty check :169-178): length-n windows of event types (optionally
  per id) anti-joined against the known-sequence set.
- MinimalTransitionTimeDetector (aminer/analysis/MinimalTransitionTimeDetector.py:
  26-558): minimal observed time between consecutive state values per id;
  a transition faster than the learned minimum is an anomaly.

Spark shape: lag() windows per id ordered by event time — the span-sequence
(kind, text, media_ref, order) invariant for documents rides the same
machinery with ord as the order column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_ngrams(
    df: DataFrame,
    value_col: str,
    n: int = 3,
    id_cols: Sequence[str] = (),
    order_cols: Sequence[str] = ("ts",),
) -> DataFrame:
    """Attach g1..gn columns = the n-gram ending at each row (null-g1 rows,
    i.e. the first n-1 per id, are dropped)."""
    w = Window.partitionBy(*id_cols).orderBy(*[F.col(c) for c in order_cols])
    out = df
    names = []
    for i in range(n - 1, 0, -1):
        c = f"g{n - i}"
        out = out.withColumn(c, F.lag(value_col, i).over(w))
        names.append(c)
    out = out.withColumn(f"g{n}", F.col(value_col))
    return out.filter(F.col("g1").isNotNull())


def check_new_sequences(
    df: DataFrame,
    value_col: str,
    baseline: DataFrame | None,
    n: int = 3,
    id_cols: Sequence[str] = (),
    order_cols: Sequence[str] = ("ts",),
) -> DataFrame:
    """Distinct n-grams (per id) not in the known-sequence baseline
    (EventSequenceDetector check :169-178). Baseline columns:
    id_cols + g1..gn."""
    gram_cols = [f"g{i}" for i in range(1, n + 1)]
    grams = event_ngrams(df, value_col, n, id_cols, order_cols)
    seen = grams.select(*id_cols, *gram_cols).dropDuplicates()
    if baseline is None:
        return seen
    return seen.join(
        baseline.select(*id_cols, *gram_cols).dropDuplicates(),
        on=[*id_cols, *gram_cols],
        how="left_anti",
    )


def transition_times(
    df: DataFrame,
    value_col: str,
    id_cols: Sequence[str] = (),
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """(id..., from_value, to_value, dt [, keep...]) for consecutive rows
    per id. Pass ``order_cols`` (e.g. the ingest id) to break timestamp
    TIES deterministically — without it, equal-ts rows make lag() order
    engine- and retry-dependent. ``keep_cols`` are carried through from
    the ARRIVING row (the one that completes the transition)."""
    w = Window.partitionBy(*id_cols).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("_prev_v", F.lag(value_col).over(w))
        .withColumn("_prev_t", F.lag(ts_col).over(w))
        .filter(F.col("_prev_v").isNotNull())
        .select(
            *id_cols,
            F.col("_prev_v").alias("from_value"),
            F.col(value_col).alias("to_value"),
            (F.col(ts_col).cast("double") - F.col("_prev_t").cast("double")).alias("dt"),
            *[F.col(c) for c in keep_cols],
        )
    )


def check_minimal_transition_time(
    df: DataFrame,
    value_col: str,
    baseline: DataFrame,
    id_cols: Sequence[str] = (),
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """Violations: transitions faster than the learned minimum.
    Returns (violations, merged_baseline); baseline columns:
    (from_value, to_value, min_dt)."""
    trans = transition_times(df, value_col, id_cols, ts_col, order_cols)
    viols = (
        trans.join(F.broadcast(baseline), ["from_value", "to_value"], "inner")
        .filter(F.col("dt") < F.col("min_dt"))
    )
    batch_min = trans.groupBy("from_value", "to_value").agg(F.min("dt").alias("min_dt"))
    merged = (
        baseline.unionByName(batch_min)
        .groupBy("from_value", "to_value")
        .agg(F.min("min_dt").alias("min_dt"))
    )
    return viols, merged
