"""Stream ≡ batch certification (round-5 VERDICT item 5).

Each test feeds the SAME corpus through a Structured Streaming stateful
operator and the batch operator it re-expresses, and asserts identical
violation sets. Together with the existing equivalence tests
(streaming_window_counts ≡ anchored_window_counts,
run_streaming_band_check ≡ check_event_frequency,
streaming_value_range ≡ check_value_range_sequential in
tests/test_io_streaming.py) this turns "streaming tested" into
"streaming ≡ batch" for five detectors, including one with a state
timeout (missing values, ProcessingTimeTimeout).
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F


def test_streaming_new_values_equals_batch_across_microbatches(spark):
    """streaming_new_values (state store across micro-batches) ≡ batch
    check_new_values: the corpus is split into two files processed as
    separate micro-batches (maxFilesPerTrigger=1), so a value first seen in
    batch 1 must NOT re-alert in batch 2 — the cross-batch state is what
    this certifies."""
    from logdata_anomaly_miner_spark.operators.new_value import check_new_values
    from logdata_anomaly_miner_spark.streaming.state import streaming_new_values

    part1 = [("p1", "x", 1.0), ("p1", "y", 2.0), ("p2", "x", 3.0)]
    part2 = [("p1", "x", 4.0), ("p1", "z", 5.0), ("p2", "x", 6.0), ("p2", "q", 7.0)]
    schema = "target string, value string, ts double"
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/in")
        spark.createDataFrame(part1, schema).coalesce(1).write.mode("append").parquet(f"{d}/in")
        # ensure file-1 mtime < file-2 mtime so trigger order is the corpus order
        time.sleep(1.1)
        spark.createDataFrame(part2, schema).coalesce(1).write.mode("append").parquet(f"{d}/in")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in")
        )
        q = (
            streaming_new_values(stream)
            .writeStream.format("memory").queryName("sbe_new_vals")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert len(q.recentProgress) >= 2, "expected >=2 micro-batches"
        got = {
            (r["target"], r["value"], r["first_ts"])
            for r in spark.sql("select * from sbe_new_vals").collect()
        }
    batch = spark.createDataFrame(part1 + part2, schema)
    firsts = check_new_values(batch, ["target", "value"], None, order_cols=["ts"])
    want = {(r["target"], r["value"], r["ts"]) for r in firsts.collect()}
    assert got == want and len(want) == 5


def test_streaming_missing_values_timeout_equals_batch(spark):
    """streaming_missing_values (ProcessingTimeTimeout state) ≡ batch
    check_missing_values: value 'b' goes silent while 'a' keeps arriving;
    the streaming alarm fired by the state TIMEOUT must name exactly the
    values the batch check flags over the same written corpus, with the
    same last_seen. (Documented semantic mapping: the stream's
    processing-time silence interval plays the batch check's event-time
    interval_s — equivalence holds when arrival rate tracks event time,
    which the keep-alive writer enforces here.)"""
    from logdata_anomaly_miner_spark.operators.missing import check_missing_values
    from logdata_anomaly_miner_spark.streaming.state import streaming_missing_values

    schema = "value string, ts double"
    t0 = 1000.0
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/in")
        written = [("a", t0), ("b", t0 + 1.0)]
        spark.createDataFrame(written, schema).coalesce(1).write.mode("append").parquet(f"{d}/in")
        stream = spark.readStream.schema(schema).parquet(f"{d}/in")
        q = (
            streaming_missing_values(stream, timeout_ms=3000)
            .writeStream.format("memory").queryName("sbe_missing")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            # keep 'a' alive past b's silence window; b must time out
            alarms = {}
            deadline = time.time() + 60
            i = 0
            while time.time() < deadline:
                time.sleep(1.0)
                i += 1
                # event time advances FASTER than the wall clock (2 s per
                # keep-alive) so by the time the 3 s processing-time timeout
                # fires, b's event-time silence also exceeds interval_s
                row = ("a", t0 + 1.0 + 2.0 * i)
                written.append(row)
                spark.createDataFrame([row], schema).coalesce(1).write.mode(
                    "append"
                ).parquet(f"{d}/in")
                alarms = {
                    r["value"]: r["last_seen"]
                    for r in spark.sql("select * from sbe_missing").collect()
                }
                if "b" in alarms:
                    break
        finally:
            q.stop()
    assert "b" in alarms, "state timeout never fired"
    assert "a" not in alarms, "keep-alive value must not alarm"
    # batch over the SAME corpus: b silent > interval before the last event
    batch = spark.createDataFrame(
        [(v, int(t * 1_000_000)) for v, t in written], "value string, us long"
    )
    flagged = check_missing_values(batch, ["value"], interval_s=3.0, ts_micros_col="us")
    want = {r["value"]: r["last_seen_us"] / 1_000_000.0 for r in flagged.collect()}
    assert set(want) == {"b"}
    assert abs(alarms["b"] - want["b"]) < 1e-6
