"""Custom stateful streaming operators via applyInPandasWithState.

Re-expresses the per-detector in-memory state loop (AnalysisChild
dispatch_atom + detector.receive_atom) for true streaming:

- ``streaming_new_values``: per-key known-values state; emits each value the
  first time it is ever seen (NewMatchPathValueDetector's learn_mode
  semantics, NewMatchPathValueDetector.py:91-98, with state in the Spark
  state store instead of a persistence JSON).
- ``streaming_missing_values``: heartbeat detector with processing-time
  timeout ≙ MissingMatchPathValueDetector's default_interval alerts
  (MissingMatchPathValueDetector.py:25-334).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NEW_VALUE_OUTPUT_SCHEMA = "target string, value string, first_ts double"
NEW_VALUE_STATE_SCHEMA = "seen array<string>"


def _new_value_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (target,) = key
    seen = set(state.get[0]) if state.exists else set()
    out_vals, out_ts = [], []
    # concat ALL Arrow chunks before sorting: a key whose micro-batch
    # exceeds arrow.maxRecordsPerBatch arrives as several pdfs, and
    # per-chunk sorting would process a later-chunk row with an earlier
    # ts after rows that followed it
    all_pdfs = [p for p in pdfs]
    for pdf in [pd.concat(all_pdfs).sort_values("ts")] if all_pdfs else []:
        for v, t in zip(pdf["value"], pdf["ts"]):
            if v is not None and v not in seen:
                seen.add(v)
                out_vals.append(v)
                out_ts.append(float(t))
    state.update((list(seen),))
    yield pd.DataFrame(
        {"target": [target] * len(out_vals), "value": out_vals, "first_ts": out_ts}
    )


def streaming_new_values(stream: DataFrame, target_col: str = "target") -> DataFrame:
    """stream(target, value, ts) -> first-ever occurrences per target.
    State = the known-values set per key in the Spark state store."""
    return stream.groupBy(target_col).applyInPandasWithState(
        _new_value_fn,
        outputStructType=NEW_VALUE_OUTPUT_SCHEMA,
        stateStructType=NEW_VALUE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MISSING_OUTPUT_SCHEMA = "value string, last_seen double"
MISSING_STATE_SCHEMA = "last_seen double"


def _make_missing_value_fn(timeout_ms: int):
    def _missing_value_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (value,) = key
        if state.hasTimedOut:
            last = state.get[0] if state.exists else float("nan")
            state.remove()
            yield pd.DataFrame({"value": [value], "last_seen": [last]})
            return
        last = state.get[0] if state.exists else 0.0
        for pdf in pdfs:
            if len(pdf):
                last = max(last, float(pdf["ts"].max()))
        state.update((last,))
        state.setTimeoutDuration(int(timeout_ms))
        yield pd.DataFrame({"value": [], "last_seen": []})

    return _missing_value_fn


def streaming_missing_values(
    stream: DataFrame, value_col: str = "value", timeout_ms: int = 60_000
) -> DataFrame:
    """stream(value, ts) -> a row when a value goes silent past the timeout
    (processing-time timeout ≙ the reference's default_interval realert,
    MissingMatchPathValueDetector.py:25-334). ``timeout_ms`` is the
    silence interval; each arriving batch for a key re-arms its timer."""
    return stream.groupBy(value_col).applyInPandasWithState(
        _make_missing_value_fn(timeout_ms),
        outputStructType=MISSING_OUTPUT_SCHEMA,
        stateStructType=MISSING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


VALUE_RANGE_OUTPUT_SCHEMA = (
    "id string, ts double, value double, range_min double, range_max double"
)
VALUE_RANGE_STATE_SCHEMA = "mn double, mx double"


def _value_range_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (ident,) = key
    mn, mx = state.get if state.exists else (None, None)
    out = []
    # concat-then-sort across ALL Arrow chunks (see _new_value_fn): the
    # sequential check-then-learn order must hold across chunk boundaries
    all_pdfs = [p for p in pdfs]
    for pdf in [pd.concat(all_pdfs).sort_values("ts")] if all_pdfs else []:
        for t, v in zip(pdf["ts"], pdf["value"]):
            # Arrow delivers SQL NULL doubles as NaN, not None: a bare
            # `v is None` never fires and a single NaN would poison the
            # (mn, mx) state forever (all later comparisons false).
            if v is None or pd.isna(v):
                continue
            v = float(v)
            if mn is not None and (v < mn or v > mx):
                out.append((ident, float(t), v, mn, mx))
            mn = v if mn is None else min(mn, v)
            mx = v if mx is None else max(mx, v)
    state.update((mn, mx))
    yield pd.DataFrame(
        out, columns=["id", "ts", "value", "range_min", "range_max"]
    )


def streaming_value_range(
    stream: DataFrame, id_col: str = "id", value_col: str = "value", ts_col: str = "ts"
) -> DataFrame:
    """True-streaming ValueRangeDetector (reference ValueRangeDetector.py:
    74-164, learn_mode=True): per-id [min,max] lives in the Spark state
    store; each event outside the range so far alarms WITH the pre-event
    range (exactly the sequential check-then-learn order), then extends it.
    Matches check_value_range_sequential batch-for-stream."""
    renamed = stream.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return renamed.groupBy("id").applyInPandasWithState(
        _value_range_fn,
        VALUE_RANGE_OUTPUT_SCHEMA,
        VALUE_RANGE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
