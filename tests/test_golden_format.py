"""Golden output-format parity: the StreamPrinter event text
(aminer/events/EventData.py:49-78; asserted verbatim by every reference
detector unit test, e.g. ValueRangeDetectorTest.py:22)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from logdata_anomaly_miner_spark.operators.base import format_event, violation_cols
from logdata_anomaly_miner_spark.operators.value_range import (
    check_value_range_sequential,
)

T0 = 1_700_000_000.0


def test_value_range_golden_string(spark):
    """Replay FIXTURES.md §3.1 and render the first anomaly exactly as the
    reference golden format string:
    '%s Value range anomaly detected\\n%s: "None" (%d lines)\\n  %s\\n\\n'."""
    rows = [
        (T0 + 0, "a", 2.5), (T0 + 1, "b", 5.0), (T0 + 2, "a", 4.75),
        (T0 + 3, "b", 6.3), (T0 + 4, "a", 4.25), (T0 + 5, "b", 3.1),
    ]
    df = spark.createDataFrame(rows, "ts double, id string, value double")
    viols, _ = check_value_range_sequential(df, ["id"], "value", ["ts"])
    v = viols.select(
        *violation_cols(
            "ValueRangeDetector",
            "Value range anomaly detected",
            F.col("ts"),
            group_key=F.col("id"),
            value=F.col("value").cast("string"),
        )
    )
    out = {r["ts"]: r["event_text"] for r in format_event(v).collect()}
    ts = T0 + 2
    expected = "%s Value range anomaly detected\n%s: \"None\" (%d lines)\n  %s\n\n" % (
        datetime.fromtimestamp(ts, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S"),
        "ValueRangeDetector",
        1,
        "4.75",
    )
    assert out[ts] == expected


def test_new_value_golden_string(spark):
    v = spark.createDataFrame(
        [("NewMatchPathValueDetector", "New value(s) detected", T0, None, "val_a", None)],
        "detector string, message string, ts double, group_key string, value string, detail string",
    )
    got = format_event(v).collect()[0]["event_text"]
    expected = "%s New value(s) detected\n%s: \"None\" (%d lines)\n  %s\n\n" % (
        datetime.fromtimestamp(T0, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S"),
        "NewMatchPathValueDetector",
        1,
        "val_a",
    )
    assert got == expected
