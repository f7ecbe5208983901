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


def _two_file_stream(spark, d, part1, part2, schema):
    """The two-file micro-batch pattern: file mtimes force trigger order."""
    os.makedirs(f"{d}/in", exist_ok=True)
    spark.createDataFrame(part1, schema).coalesce(1).write.mode("append").parquet(f"{d}/in")
    time.sleep(1.1)
    spark.createDataFrame(part2, schema).coalesce(1).write.mode("append").parquet(f"{d}/in")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/in")
    )


def _run_to_memory(df, name, ckpt):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2, "expected >=2 micro-batches"
    return q


def test_streaming_charset_equals_batch(spark):
    """streaming_new_charset ≡ learn_charsets + check_charset: chars first
    seen in the learn half initialize state silently across the micro-batch
    boundary; only the check half's genuinely novel chars alert."""
    from logdata_anomaly_miner_spark.operators.charset import (
        check_charset,
        learn_charsets,
    )
    from logdata_anomaly_miner_spark.streaming.state import streaming_new_charset

    schema = "g string, text string, ts double"
    part1 = [("g1", "abc", 1.0), ("g1", "abd", 2.0), ("g2", "xy", 3.0)]
    part2 = [("g1", "abe!", 10.0), ("g2", "xz", 11.0), ("g1", "cab", 12.0)]
    with tempfile.TemporaryDirectory() as d:
        stream = _two_file_stream(spark, d, part1, part2, schema)
        _run_to_memory(streaming_new_charset(stream), "sbe_charset", f"{d}/ckpt")
        got = {
            (r["g"], r["ch"])
            for r in spark.sql("select * from sbe_charset where first_ts >= 10").collect()
        }
    learn = learn_charsets(spark.createDataFrame(part1, schema), "text", ["g"])
    check = check_charset(spark.createDataFrame(part2, schema), "text", learn, ["g"])
    want = {(r["g"], r["ch"]) for r in check.collect()}
    assert got == want == {("g1", "e"), ("g1", "!"), ("g2", "z")}


def test_streaming_seq_ngrams_equals_batch(spark):
    """streaming_new_sequences ≡ check_new_sequences: the per-id last-(n-1)
    window is carried ACROSS the micro-batch boundary (grams spanning the
    two files still form) and grams repeated in batch 2 do not re-alert."""
    from logdata_anomaly_miner_spark.operators.sequence import check_new_sequences
    from logdata_anomaly_miner_spark.streaming.state import streaming_new_sequences

    schema = "id string, value string, ts double"
    part1 = [("u1", v, float(i)) for i, v in enumerate(["a", "b", "c", "d"])]
    part1 += [("u2", v, float(i)) for i, v in enumerate(["p", "q", "r"])]
    # u1 batch 2 re-walks a,b,c (gram abc repeats -> no alert) then e
    part2 = [("u1", v, 10.0 + i) for i, v in enumerate(["a", "b", "c", "e"])]
    part2 += [("u2", v, 10.0 + i) for i, v in enumerate(["q", "r"])]
    with tempfile.TemporaryDirectory() as d:
        stream = _two_file_stream(spark, d, part1, part2, schema)
        _run_to_memory(streaming_new_sequences(stream), "sbe_grams", f"{d}/ckpt")
        rows = spark.sql("select * from sbe_grams").collect()
        got = {(r["id"], r["g1"], r["g2"], r["g3"]) for r in rows}
        assert len(rows) == len(got), "a repeated gram re-alerted"
    batch = spark.createDataFrame(part1 + part2, schema)
    want = {
        (r["id"], r["g1"], r["g2"], r["g3"])
        for r in check_new_sequences(
            batch, "value", None, n=3, id_cols=["id"], order_cols=["ts"]
        ).collect()
    }
    assert got == want
    # the boundary-spanning grams exist: u1 (c,d,a) and u2 (q,r,q)
    assert ("u1", "c", "d", "a") in got and ("u2", "q", "r", "q") in got


def test_streaming_count_cluster_equals_batch(spark):
    """streaming_count_cluster ≡ count_vectors + manhattan_vs_baseline over
    every COMPLETED window: window counts accumulate across the micro-batch
    boundary, window 0 is the baseline, an id without window-0 events scores
    1.0, and the still-open final window is excluded on both sides."""
    from logdata_anomaly_miner_spark.operators.event_count_cluster import (
        count_vectors,
        manhattan_vs_baseline,
    )
    from logdata_anomaly_miner_spark.streaming.state import streaming_count_cluster

    schema = "id string, event_type string, ts double"
    t0, ws = 1000.0, 10.0
    part1 = [
        # u1 w0 (baseline): A:2 B:1   w1: A:2 B:1 (dist 0)   w2 first half: A:2
        ("u1", "A", 1001.0), ("u1", "A", 1002.0), ("u1", "B", 1003.0),
        ("u1", "A", 1011.0), ("u1", "B", 1012.0), ("u1", "A", 1013.0),
        ("u1", "A", 1021.0), ("u1", "A", 1022.0),
        # u2 has NO w0: first events land in w1
        ("u2", "X", 1015.0),
    ]
    part2 = [
        # u1 w2 second half: A:2 more (total A:4), then w3 B:2, w4 sentinel
        ("u1", "A", 1023.0), ("u1", "A", 1024.0),
        ("u1", "B", 1031.0), ("u1", "B", 1032.0),
        ("u1", "A", 1041.0),
        # u2 w2 completes w1; w3 sentinel completes w2
        ("u2", "X", 1025.0), ("u2", "Y", 1026.0),
        ("u2", "X", 1035.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        stream = _two_file_stream(spark, d, part1, part2, schema)
        _run_to_memory(
            streaming_count_cluster(stream, t0=t0, window_size=ws),
            "sbe_cluster", f"{d}/ckpt",
        )
        got = {
            (r["id"], r["w"]): round(r["dist"], 9)
            for r in spark.sql("select * from sbe_cluster").collect()
        }
    batch = spark.createDataFrame(part1 + part2, schema)
    cv = count_vectors(batch, ["id"], "event_type", ts_col="ts", window_size=ws, t0=t0)
    baseline = cv.filter("w = 0").select("id", "event_type", "cnt")
    dists = manhattan_vs_baseline(cv.filter("w > 0"), baseline, ["id"])
    # exclude each id's final (still-open) window on the batch side
    last_w = {r["id"]: r["mw"] for r in cv.groupBy("id").agg(F.max("w").alias("mw")).collect()}
    want = {
        (r["id"], r["w"]): round(r["dist"], 9)
        for r in dists.collect()
        if r["w"] < last_w[r["id"]]
    }
    assert got == want
    assert got[("u1", 1)] == 0.0          # identical window -> 0
    assert got[("u2", 1)] == 1.0          # no baseline -> all mass unmatched
    # u1 w2 {A:4} vs baseline {A:2,B:1}: (|4-2| + |0-1|) / (4 + 3)
    assert got[("u1", 2)] == round(3.0 / 7.0, 9)
