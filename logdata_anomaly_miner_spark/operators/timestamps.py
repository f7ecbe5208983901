"""Timestamp-ordering operators.

Re-expresses:
- TimestampsUnsortedDetector (aminer/analysis/TimestampsUnsortedDetector.py:
  23-76): event whenever an atom's timestamp is smaller than its
  predecessor's (in ingest order).
- SimpleMonotonicTimestampAdjust (aminer/analysis/
  TimestampCorrectionFilters.py:18-52): clamp decreasing timestamps to the
  running maximum.

Ingest order in batch = an explicit order column (event id / file offset).
The running max is a prefix window — inherently sequential per stream, so
partition by the stream/source column when there are many streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unsorted_timestamps(
    df: DataFrame,
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    stream_cols: Sequence[str] = (),
) -> DataFrame:
    """Rows whose timestamp is smaller than the previous row's (ingest order)."""
    w = Window.partitionBy(*stream_cols).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(F.col(ts_col)).over(w)
    return (
        df.withColumn("prev_ts", prev)
        .filter(F.col("prev_ts").isNotNull() & (F.col(ts_col) < F.col("prev_ts")))
    )


def monotonic_adjust(
    df: DataFrame,
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    stream_cols: Sequence[str] = (),
    out_col: str = "ts_adj",
) -> DataFrame:
    """Adds ``out_col`` = running max of the timestamp in ingest order
    (decreasing timestamps clamped up, reference :18-52)."""
    w = (
        Window.partitionBy(*stream_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.max(F.col(ts_col)).over(w))
