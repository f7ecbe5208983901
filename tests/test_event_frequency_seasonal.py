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


def _ref_seasonal_bands(seq, num_windows, cf, lookback):
    """Count-level simulator of the reference's calculate_range loop
    (EventFrequencyDetector.py:361-399) including reset_counter's bounded
    list (:340-347, retained length num_windows+2). Returns {w: (lo, hi)}
    for every window with len(counts) >= 2."""
    from statistics import mean, pstdev

    counts: list[int] = []
    out = {}
    for w, c in enumerate(seq):
        counts.append(c)
        if len(counts) > num_windows + 2:
            counts = counts[1:]
        if len(counts) < 2:
            continue
        season_offset = 0.0
        L = len(counts)
        if lookback is not None and L > lookback + 2:
            counts_tmp, season_list = [], []
            for i in range(0, L - 1):
                if i >= lookback:
                    counts_tmp.append(counts[i] - counts[i - lookback])
                if (i - (L - 1)) % lookback == 0:
                    season_list.append(counts[i])
            season_offset = mean(season_list)
        else:
            counts_tmp = counts[:]
        sl = counts_tmp[-num_windows - 1:-1]
        if not sl:
            continue
        m = mean(sl)
        if len(sl) > 1:
            s = pstdev(sl)
        else:
            s2 = counts[-num_windows - 1:-1]
            s = mean(s2) * (1 - cf)
        out[w] = (m + season_offset - s / cf, m + season_offset + s / cf)
    return out


@pytest.mark.parametrize(
    "num_windows,lookback", [(8, 2), (6, 3), (5, 5), (10, 4), (4, 2)]
)
def test_seasonal_bands_match_reference_simulator(spark, num_windows, lookback):
    """Randomized (seeded) count sequence; every closed window's band must
    equal the sequential reference loop's, including after the retained
    list starts truncating (w > num_windows+2) and for lookback==num_windows
    (gate permanently closed by truncation)."""
    import random

    rng = random.Random(42 + num_windows * 100 + lookback)
    seq = [rng.randrange(0, 9) for _ in range(30)]
    cf = 0.5
    df = spark.createDataFrame(
        [("a", w, c) for w, c in enumerate(seq)], "k string, w long, cnt long"
    )
    banded = frequency_bands_seasonal(df, ["k"], num_windows, cf, lookback)
    got = {
        r["w"]: (r["lower"], r["upper"])
        for r in banded.collect()
        if r["lower"] is not None
    }
    want = _ref_seasonal_bands(seq, num_windows, cf, lookback)
    assert set(got) == set(want)
    for w in want:
        assert got[w][0] == pytest.approx(want[w][0], abs=1e-9), (w, "lower")
        assert got[w][1] == pytest.approx(want[w][1], abs=1e-9), (w, "upper")


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
