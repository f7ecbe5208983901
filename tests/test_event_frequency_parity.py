"""Exact-scenario parity with the reference EventFrequencyDetector unit test
(aecid-testsuite/unit/analysis/EventFrequencyDetectorTest.py:24-175).

Scenario: window_size=10, num_windows=1, confidence_factor=0.51,
learn_mode=True, key = the value at /value. Atoms:

    w1: a@t+1, b@t+3, a@t+7        (anchor: first atom t+1)
    w2: a@t+13, b@t+17, a@t+18, a@t+19
    w3: b@t+25, b@t+25
    w4: a@t+35                      (closes w3; never checked itself)

Reference expectation: exactly two anomalies, both reported at the close of
window 3 — 'a' dropped to 0 (history count 3) and 'b' rose to 2 (history
count 1). Windows 1/2 are silent.
"""

from __future__ import annotations

from logdata_anomaly_miner_spark.operators.event_frequency import (
    anchored_window_counts,
    check_event_frequency,
)

T0 = 1_700_000_000.0
ATOMS = [
    (T0 + 1, "a"), (T0 + 3, "b"), (T0 + 7, "a"),
    (T0 + 13, "a"), (T0 + 17, "b"), (T0 + 18, "a"), (T0 + 19, "a"),
    (T0 + 25, "b"), (T0 + 25, "b"),
    (T0 + 35, "a"),
]


def test_reference_scenario_counts(spark):
    """Count evolution parity: a=[2,3,0,1], b=[1,1,2,0] on the dense spine
    (reference counts asserts at :108-170, zero-filled)."""
    df = spark.createDataFrame(ATOMS, "ts double, k string")
    counts = anchored_window_counts(df, ["k"], 10.0)
    got = {(r["k"], r["w"]): r["cnt"] for r in counts.collect()}
    assert got == {
        ("a", 0): 2, ("a", 1): 3, ("a", 2): 0, ("a", 3): 1,
        ("b", 0): 1, ("b", 1): 1, ("b", 2): 2, ("b", 3): 0,
    }


def test_reference_scenario_anomalies(spark):
    """Exactly the two reference anomalies: (a, w2, 0) and (b, w2, 2)."""
    df = spark.createDataFrame(ATOMS, "ts double, k string")
    viols = check_event_frequency(
        df, ["k"], window_size=10.0, num_windows=1, confidence_factor=0.51
    )
    got = sorted((r["k"], r["w"], r["cnt"]) for r in viols.collect())
    assert got == [("a", 2, 0), ("b", 2, 2)]


def test_whole_stream_key(spark):
    """First part of the reference test: no target path -> one global key;
    counts [3, 4, 2, 1] and no anomalies (all counts within 1-window bands)."""
    df = spark.createDataFrame(ATOMS, "ts double, k string")
    counts = anchored_window_counts(df, [], 10.0)
    got = {r["w"]: r["cnt"] for r in counts.collect()}
    assert got == {0: 3, 1: 4, 2: 2, 3: 1}
    viols = check_event_frequency(
        df, [], window_size=10.0, num_windows=1, confidence_factor=0.51
    )
    assert viols.count() == 0
