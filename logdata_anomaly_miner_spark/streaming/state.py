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


CHARSET_OUTPUT_SCHEMA = "g string, ch string, first_ts double"
CHARSET_STATE_SCHEMA = "seen array<string>"


def _charset_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (g,) = key
    seen = set(state.get[0]) if state.exists else set()
    out_ch, out_ts = [], []
    all_pdfs = [p for p in pdfs]
    for pdf in [pd.concat(all_pdfs).sort_values("ts")] if all_pdfs else []:
        for text, t in zip(pdf["text"], pdf["ts"]):
            if text is None:
                continue
            for ch in text:
                if ch not in seen:
                    seen.add(ch)
                    out_ch.append(ch)
                    out_ts.append(float(t))
    state.update((sorted(seen),))
    yield pd.DataFrame(
        {"g": [g] * len(out_ch), "ch": out_ch, "first_ts": out_ts}
    )


def streaming_new_charset(stream: DataFrame, group_col: str = "g") -> DataFrame:
    """True-streaming CharsetDetector (reference CharsetDetector.py:96-122,
    learn_mode): per-group known-character set in the Spark state store;
    each character's FIRST occurrence (in event-time order) emits once,
    never again across micro-batches. Batch-equivalent contract: emissions
    whose first_ts falls in a check window equal
    check_charset(check, learn_charsets(learn)) over the same split."""
    return stream.groupBy(group_col).applyInPandasWithState(
        _charset_fn,
        CHARSET_OUTPUT_SCHEMA,
        CHARSET_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


_GRAM_SEP = "\x1f"
SEQ_OUTPUT_SCHEMA = "id string, g1 string, g2 string, g3 string, first_ts double"
SEQ_STATE_SCHEMA = "lastvals array<string>, seen array<string>"


def _seq_ngram_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (ident,) = key
    last_vals, seen = ([], set())
    if state.exists:
        lv, sn = state.get
        last_vals, seen = list(lv), set(sn)
    out = []
    all_pdfs = [p for p in pdfs]
    for pdf in [pd.concat(all_pdfs).sort_values("ts")] if all_pdfs else []:
        for v, t in zip(pdf["value"], pdf["ts"]):
            if v is None:
                continue
            last_vals.append(v)
            if len(last_vals) > 3:
                last_vals.pop(0)
            if len(last_vals) == 3:
                gram = _GRAM_SEP.join(last_vals)
                if gram not in seen:
                    seen.add(gram)
                    out.append((ident, *last_vals, float(t)))
    state.update((last_vals, sorted(seen)))
    yield pd.DataFrame(out, columns=["id", "g1", "g2", "g3", "first_ts"])


def streaming_new_sequences(stream: DataFrame, id_col: str = "id") -> DataFrame:
    """True-streaming EventSequenceDetector 3-grams (reference
    EventSequenceDetector.py:169-178): per-id state carries the last n-1
    values ACROSS micro-batch boundaries (a gram spanning two files must
    still form) plus the known-gram set; each novel gram emits once with
    the timestamp of its completing event."""
    return stream.groupBy(id_col).applyInPandasWithState(
        _seq_ngram_fn,
        SEQ_OUTPUT_SCHEMA,
        SEQ_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


_COMBO_SEP = "\x1f"
DISPATCH_OUTPUT_SCHEMA = (
    "ingest_order long, rank int, prev_ts double, new_paths array<string>"
)
DISPATCH_STATE_SCHEMA = (
    "prev_ts double, known_paths array<string>, known_values array<string>, "
    "known_combos array<string>"
)


def _dispatch_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """The reference's AnalysisChild dispatch loop (aminer/AnalysisChild.py:
    298-408, dispatch via SubhandlerFilter walking its handler list,
    aminer/analysis/AtomFilters.py:18-54) as ONE
    stateful streaming operator: per stream-key, the learned sets of four
    detectors live together in the Spark state store and every atom is
    checked-then-learned in handler registration order. Emits decision rows
    (rank = handler registration order); rendering stays outside (the
    golden StreamPrinter format is a plain projection over these rows)."""
    prev_ts, known_paths, known_values, known_combos = None, set(), set(), set()
    if state.exists:
        pt, kp, kv, kc = state.get
        # NaN sentinel: state tuples cannot hold None doubles reliably
        prev_ts = None if pt is None or pd.isna(pt) else float(pt)
        known_paths, known_values, known_combos = set(kp), set(kv), set(kc)
    out = []
    all_pdfs = [p for p in pdfs]
    for pdf in [pd.concat(all_pdfs).sort_values("ingest_order")] if all_pdfs else []:
        for o, ts, ok, paths, value, combo in zip(
            pdf["ingest_order"], pdf["ts"], pdf["parse_ok"],
            pdf["paths"], pdf["value"], pdf["combo"],
        ):
            o = int(o)
            if not ok:
                # SimpleUnparsedAtomHandler, stop_when_handled=True: the
                # atom never reaches the detectors below
                out.append((o, 0, None, None))
                continue
            ts = float(ts)
            if prev_ts is not None and ts < prev_ts:
                out.append((o, 1, prev_ts, None))
            prev_ts = ts
            new_paths = [p for p in paths if p not in known_paths]
            if new_paths:
                known_paths.update(new_paths)
                out.append((o, 2, None, new_paths))
            if value is not None and value not in known_values:
                known_values.add(value)
                out.append((o, 3, None, None))
            if combo is not None and combo not in known_combos:
                known_combos.add(combo)
                out.append((o, 4, None, None))
    state.update((
        float("nan") if prev_ts is None else prev_ts,
        sorted(known_paths), sorted(known_values), sorted(known_combos),
    ))
    yield pd.DataFrame(out, columns=["ingest_order", "rank", "prev_ts", "new_paths"])


def streaming_dispatch_pipeline(
    stream: DataFrame, key_col: str | None = None
) -> DataFrame:
    """True-streaming multi-detector pipeline over a parsed atom stream:
    SimpleUnparsedAtomHandler → TimestampsUnsortedDetector →
    NewMatchPathDetector → NewMatchPathValue(Combo)Detector with all
    detector state in the Spark state store, one applyInPandasWithState.

    Input columns: ``ingest_order long`` (total order within the stream
    key), ``ts double`` (atom time), ``parse_ok boolean``, ``paths
    array<string>`` (the atom's match-dictionary paths in model order),
    ``value string`` / ``combo string`` (the configured detector targets;
    null = atom not in that detector's scope). Output: decision rows
    ``(ingest_order, rank, prev_ts, new_paths)`` where rank is the handler
    registration order (0=unparsed … 4=new combo).

    ``key_col`` is the log-resource/stream identity (the reference is a
    single sequential stream per process; at scale one key per resource
    keeps state partitioned while each key replays the exact reference
    semantics). None = one global stream."""
    if key_col is None:
        stream = stream.withColumn("_stream_key", F.lit("all"))
        key_col = "_stream_key"
    return stream.groupBy(key_col).applyInPandasWithState(
        _dispatch_fn,
        DISPATCH_OUTPUT_SCHEMA,
        DISPATCH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


CLUSTER_OUTPUT_SCHEMA = "id string, w long, dist double"
CLUSTER_STATE_SCHEMA = (
    "bt array<string>, bc array<long>, w long, ct array<string>, cc array<long>"
)


def _make_count_cluster_fn(t0: float, window_size: float):
    def _fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (ident,) = key
        if state.exists:
            bt, bc, cur_w, ct, cc = state.get
            base = dict(zip(bt, bc))
            cur = dict(zip(ct, cc))
            cur_w = int(cur_w)
        else:
            base, cur, cur_w = {}, {}, None
        out = []

        def flush(completed_w):
            """Score the completed window: window 0 becomes the baseline,
            later windows emit the normalized Manhattan distance vs it
            (manhattan_vs_baseline's Σ|c−b| / (Σc + Σb))."""
            nonlocal base
            if completed_w == 0:
                base = dict(cur)
                return
            types = set(base) | set(cur)
            num = sum(abs(cur.get(k, 0) - base.get(k, 0)) for k in types)
            den = sum(cur.values()) + sum(base.values())
            out.append((ident, completed_w, num / den if den else 0.0))

        all_pdfs = [p for p in pdfs]
        for pdf in [pd.concat(all_pdfs).sort_values("ts")] if all_pdfs else []:
            for t, ev in zip(pdf["ts"], pdf["event_type"]):
                w = int((float(t) - t0) // window_size)
                if cur_w is None:
                    cur_w = w
                elif w > cur_w:
                    flush(cur_w)
                    cur, cur_w = {}, w
                cur[ev] = cur.get(ev, 0) + 1
        state.update((
            sorted(base), [base[k] for k in sorted(base)],
            cur_w if cur_w is not None else -1,
            sorted(cur), [cur[k] for k in sorted(cur)],
        ))
        yield pd.DataFrame(out, columns=["id", "w", "dist"])

    return _fn


def streaming_count_cluster(
    stream: DataFrame, t0: float, window_size: float = 600.0,
    id_col: str = "id",
) -> DataFrame:
    """True-streaming EventCountClusterDetector (reference
    EventCountClusterDetector.py:24-98 semantics as re-expressed by
    operators/event_count_cluster.py): per-id the window-0 count vector is
    the baseline; each LATER window is scored with the normalized Manhattan
    distance when its first out-of-window successor event arrives (windows
    accumulate across micro-batches; empty windows emit nothing, matching
    the batch operator). The eternally-open final window is a stream-end
    artifact — flush it with a sentinel event or state timeout in
    production. ``t0`` anchors the window grid (the batch side's global
    min-ts anchor must be passed explicitly — per-key state cannot see the
    global minimum)."""
    return stream.groupBy(id_col).applyInPandasWithState(
        _make_count_cluster_fn(float(t0), float(window_size)),
        CLUSTER_OUTPUT_SCHEMA,
        CLUSTER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
