"""Seasonal bands + early-exceeding alarms (EventFrequencyDetector
reference :264-302 and :366-378)."""

from __future__ import annotations

import pytest

from logdata_anomaly_miner_spark.operators.event_frequency import (
    anchored_window_counts,
    check_early_exceeding,
    frequency_bands_seasonal,
)

T0 = 1_700_000_000.0


def _seasonal_rows():
    """Period-2 pattern: even windows 6 events, odd windows 2 events, for
    11 windows (w0..w10); w11 (an ODD slot, 2 expected) breaks the season
    with 6 events; w12 closes it."""
    rows = []
    for w in range(11):
        n = 6 if w % 2 == 0 else 2
        rows += [(T0 + w * 10 + i, "a") for i in range(n)]
    rows += [(T0 + 111 + i * 0.5, "a") for i in range(6)]  # w11 (odd slot): 6
    rows += [(T0 + 121, "a")]                               # w12 closes w11
    return rows


def test_seasonal_band_flags_broken_season(spark):
    df = spark.createDataFrame(_seasonal_rows(), "ts double, k string")
    counts = anchored_window_counts(df, ["k"], 10.0)
    banded = frequency_bands_seasonal(
        counts, ["k"], num_windows=8, confidence_factor=0.51, lookback=2
    )
    rows = {r["w"]: r for r in banded.collect()}
    # w11 is an odd slot: season_offset = mean of past odd counts = 2,
    # seasonal diffs are 0 -> band centered at 2; count 6 must exceed upper
    r = rows[11]
    assert r["season_offset"] == pytest.approx(2.0)
    assert r["cnt"] == 6
    assert r["cnt"] > r["upper"]
    # a normal odd window (w9, count 2) stays inside its band
    r9 = rows[9]
    assert r9["lower"] <= r9["cnt"] <= r9["upper"]


def test_early_exceeding_first_crossing(spark):
    """History of 2-event windows; a burst window gets flagged at the first
    event whose running count crosses the upper band — not at window close."""
    rows = []
    for w in range(3):
        rows += [(T0 + w * 10 + 1, "a"), (T0 + w * 10 + 2, "a")]
    # burst in w3: 8 events at t+31..t+34.5
    rows += [(T0 + 31 + i * 0.5, "a") for i in range(8)]
    df = spark.createDataFrame(rows, "ts double, k string")
    out = check_early_exceeding(
        df, ["k"], window_size=10.0, num_windows=10, confidence_factor=0.51
    )
    got = [(r["w"], r["running_cnt"], r["ts"] - T0) for r in out.collect()]
    # band upper for w3: history [2,2,2] -> mean 2, std 0 -> upper 2;
    # the 3rd burst event (running_cnt=3) is the first crossing, at t+32.0
    assert got == [(3, 3, 32.0)]
