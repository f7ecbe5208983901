"""Allowlist / blocklist event mutation — batch analog.

The reference's remote-control surface lets an operator mutate a LIVE
detector: NewMatchPathValueDetector.allowlist_event adds a value to
known_values_set so it stops alarming (NewMatchPathValueDetector.py:156-175);
EntropyDetector.allowlist_event / blocklist_event append a path to
constraint_list / ignore_list (EntropyDetector.py:238-272). In the batch
engine detector state IS a baseline table and screening lists ARE plain
config, so the analog is programmatic edits to those, applied before the
next run (the reference's mutation also only affects future atoms):

- ``allowlist_values`` / ``blocklist_values`` edit a baseline DataFrame
  (union-distinct / anti-join) — rerunning the check with the edited
  baseline reproduces exactly the reference's post-mutation behavior.
- ``allowlist_path`` / ``blocklist_path`` append to the constraint / ignore
  column lists consumed by operators/lifecycle.screen_paths, returning the
  reference's confirmation message alongside the new tuple.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def allowlist_values(
    baseline: DataFrame, values: Sequence[tuple], value_cols: Sequence[str]
) -> DataFrame:
    """Add value tuples to a known-values baseline (NMPVD allowlist_event):
    the values stop alarming on the next run and are never re-reported."""
    if not values:
        return baseline
    spark = baseline.sparkSession
    add = spark.createDataFrame(
        [tuple(v) for v in values], schema=baseline.select(*value_cols).schema
    )
    return baseline.select(*value_cols).unionByName(add).dropDuplicates()


def blocklist_values(
    baseline: DataFrame, values: Sequence[tuple], value_cols: Sequence[str]
) -> DataFrame:
    """Remove value tuples from a baseline — the inverse mutation (the
    reference exposes it via persistence edits): removed values alarm again
    as novel on the next run."""
    if not values:
        return baseline
    spark = baseline.sparkSession
    drop = spark.createDataFrame(
        [tuple(v) for v in values], schema=baseline.select(*value_cols).schema
    )
    return baseline.select(*value_cols).join(drop, list(value_cols), "left_anti")


def allowlist_path(
    constraint_cols: Sequence[str], path: str, detector: str = "detector"
) -> tuple[tuple[str, ...], str]:
    """EntropyDetector.allowlist_event (:238-254): append a path to the
    constraint list; atoms missing it are skipped from then on."""
    cols = tuple(constraint_cols)
    if path not in cols:
        cols = (*cols, path)
    return cols, f"Allowlisted path {path} in Analysis.{detector}."


def blocklist_path(
    ignore_cols: Sequence[str], path: str, detector: str = "detector"
) -> tuple[tuple[str, ...], str]:
    """EntropyDetector.blocklist_event (:256-272): append a path to the
    ignore list; atoms containing it are skipped from then on."""
    cols = tuple(ignore_cols)
    if path not in cols:
        cols = (*cols, path)
    return cols, f"Blocklisted path {path} in Analysis.{detector}."


def allowlist_event(
    event_type: str,
    event_data: str,
    allowlisting_data,
    constraint_cols: Sequence[str],
    detector: str = "EntropyDetector",
) -> tuple[tuple[str, ...], str]:
    """Full reference surface of EntropyDetector.allowlist_event
    (:238-254): rejects events from another source and any allowlisting
    payload, then appends the path to the constraint list (idempotent) and
    returns the confirmation message."""
    if event_type != f"Analysis.{detector}":
        raise Exception("Event not from this source")
    if allowlisting_data is not None:
        raise Exception("Allowlisting data not understood by this detector")
    cols, _ = allowlist_path(constraint_cols, event_data, detector)
    return cols, f"Allowlisted path {event_data} in {event_type}."


def blocklist_event(
    event_type: str,
    event_data: str,
    blocklisting_data,
    ignore_cols: Sequence[str],
    detector: str = "EntropyDetector",
) -> tuple[tuple[str, ...], str]:
    """Full reference surface of EntropyDetector.blocklist_event
    (:256-272), mirroring its error semantics and message."""
    if event_type != f"Analysis.{detector}":
        raise Exception("Event not from this source")
    if blocklisting_data is not None:
        raise Exception("Blocklisting data not understood by this detector")
    cols, _ = blocklist_path(ignore_cols, event_data, detector)
    return cols, f"Blocklisted path {event_data} in {event_type}."


def save_path_lists(
    spark,
    table_path: str,
    constraint_cols: Sequence[str] = (),
    ignore_cols: Sequence[str] = (),
) -> None:
    """Persist the mutated constraint/ignore lists as a tiny table — the
    batch analog of the reference persisting detector state
    (PersistenceUtil.py:116-125): the NEXT run loads them and screens
    atoms accordingly, so a remote-control mutation survives restarts."""
    rows = [("constraint", c) for c in constraint_cols] + [
        ("ignore", c) for c in ignore_cols
    ]
    df = spark.createDataFrame(rows or [], "list_type string, col string")
    df.coalesce(1).write.mode("overwrite").parquet(table_path)


def load_path_lists(spark, table_path: str) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """Load (constraint_cols, ignore_cols) persisted by save_path_lists."""
    rows = spark.read.parquet(table_path).collect()
    constraint = tuple(sorted(r["col"] for r in rows if r["list_type"] == "constraint"))
    ignore = tuple(sorted(r["col"] for r in rows if r["list_type"] == "ignore"))
    return constraint, ignore
