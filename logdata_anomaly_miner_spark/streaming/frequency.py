"""Streaming event-frequency detection.

Batch EventFrequencyDetector (operators/event_frequency.py) uses windows
anchored at the first atom for byte-parity with the reference
(EventFrequencyDetector.py:181-194). In streaming mode there is no "first
atom" once the job restarts, so the streaming variant uses Spark's
calendar-aligned tumbling `window()` with a watermark for late data — a
DOCUMENTED deviation (relaxed mode); the counts land in the same
window_counts table shape (FIXTURES.md §2) and the band check runs as a
follow-up batch query over that table.

SimpleMultisourceAtomSync (aminer/input/SimpleMultisourceAtomSync.py:19-126)
— the reference's k-way event-time merge with sync_wait_time — maps to
``union_sources`` + the watermark: the watermark IS the bounded wait for
stragglers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_sources(sources: Sequence[DataFrame]) -> DataFrame:
    """K-way merge of sources; event-time ordering is reconstructed by the
    engine's watermarking, not by a driver-side merge loop."""
    out = sources[0]
    for s in sources[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def streaming_window_counts(
    stream: DataFrame,
    key_cols: Sequence[str],
    window_size_s: float = 600.0,
    watermark_s: float = 600.0,
    ts_col: str = "ts",
) -> DataFrame:
    """readStream df -> per (key, window) counts with late-data handling.
    Output schema: key_cols + (win_start, win_end, cnt)."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        stream.withColumn("_event_time", ts)
        .withWatermark("_event_time", f"{int(watermark_s)} seconds")
        .groupBy(
            F.window("_event_time", f"{int(window_size_s)} seconds").alias("win"),
            *key_cols,
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *key_cols,
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "cnt",
        )
    )
