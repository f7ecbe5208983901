"""Property-based tests (hypothesis): the set-oriented re-expressions must
agree with straightforward sequential reference implementations on random
inputs — the same strategy the reference's unit fixtures use, generalized."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from logdata_anomaly_miner_spark.operators.new_value import first_occurrences
from logdata_anomaly_miner_spark.operators.value_range import (
    check_value_range_sequential,
)

# events: (ts offset int, key in a..d, value small int)
EVENTS = st.lists(
    st.tuples(
        st.integers(0, 50),
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(-5, 5),
    ),
    min_size=1,
    max_size=25,
)

T0 = 1_700_000_000.0


@settings(max_examples=12, deadline=None)
@given(EVENTS)
def test_first_occurrences_matches_sequential_scan(spark, events):
    # unique, deterministic order: (ts, seq) — seq breaks ties like doc_id
    rows = [(T0 + ts, f"s{i:03d}", k, float(v)) for i, (ts, k, v) in enumerate(events)]
    df = spark.createDataFrame(rows, "ts double, seq string, k string, v double")
    got = {
        (r["k"]): (r["ts"], r["seq"])
        for r in first_occurrences(df, ["k"], ["ts", "seq"]).collect()
    }
    seen = {}
    for ts, seq, k, v in sorted(rows, key=lambda r: (r[0], r[1])):
        seen.setdefault(k, (ts, seq))
    assert got == seen


@settings(max_examples=10, deadline=None)
@given(EVENTS)
def test_value_range_sequential_matches_reference_loop(spark, events):
    rows = [(T0 + ts, f"s{i:03d}", k, float(v)) for i, (ts, k, v) in enumerate(events)]
    df = spark.createDataFrame(rows, "ts double, seq string, k string, v double")
    viols, learned = check_value_range_sequential(df, ["k"], "v", ["ts", "seq"])
    got = sorted((r["k"], r["ts"], r["v"]) for r in viols.collect())

    # reference semantics: per key in arrival order, first value sets the
    # range; later values outside the running range are anomalies and (learn
    # mode) extend it (ValueRangeDetector.py:131-164)
    want = []
    state: dict[str, list[float]] = {}
    for ts, seq, k, v in sorted(rows, key=lambda r: (r[0], r[1])):
        if k not in state:
            state[k] = [v, v]
        else:
            lo, hi = state[k]
            if v < lo or v > hi:
                want.append((k, ts, v))
            state[k][0] = min(lo, v)
            state[k][1] = max(hi, v)
    assert got == sorted(want)
    lr = {r["k"]: (r["min"], r["max"]) for r in learned.collect()}
    assert lr == {k: (lo, hi) for k, (lo, hi) in state.items()}
