"""Allowlist/blocklist mutation analog (reference
NewMatchPathValueDetector.py:156-175, EntropyDetector.py:238-272)."""

from __future__ import annotations

from logdata_anomaly_miner_spark.operators.allowlisting import (
    allowlist_path,
    allowlist_values,
    blocklist_path,
    blocklist_values,
)
from logdata_anomaly_miner_spark.operators.new_value import check_new_values


def test_allowlist_value_stops_alarming(spark):
    base = spark.createDataFrame([("login",)], "event_type string")
    batch = spark.createDataFrame(
        [(1.0, "login"), (2.0, "probe"), (3.0, "probe")], "ts double, event_type string"
    )
    before = check_new_values(batch, ["event_type"], base)
    assert [r["event_type"] for r in before.collect()] == ["probe"]
    base2 = allowlist_values(base, [("probe",)], ["event_type"])
    after = check_new_values(batch, ["event_type"], base2)
    assert after.count() == 0


def test_blocklist_value_alarms_again(spark):
    base = spark.createDataFrame([("login",), ("probe",)], "event_type string")
    batch = spark.createDataFrame([(1.0, "probe")], "ts double, event_type string")
    assert check_new_values(batch, ["event_type"], base).count() == 0
    base2 = blocklist_values(base, [("probe",)], ["event_type"])
    assert check_new_values(batch, ["event_type"], base2).count() == 1


def test_path_list_mutations():
    cols, msg = allowlist_path((), "user", detector="EntropyDetector")
    assert cols == ("user",)
    assert msg == "Allowlisted path user in Analysis.EntropyDetector."
    cols2, _ = allowlist_path(cols, "user")  # idempotent
    assert cols2 == ("user",)
    icols, msg = blocklist_path(("dbg",), "trace")
    assert icols == ("dbg", "trace")
    assert msg == "Blocklisted path trace in Analysis.detector."


def test_entropy_allowlist_blocklist_event_reference_replay():
    """Replay of EntropyDetectorTest.test3allowlist_event /
    test4blocklist_event (reference :333-362): wrong-source events and
    non-null payloads raise, good calls mutate the list idempotently and
    return the reference's exact message."""
    import pytest as _pytest

    from logdata_anomaly_miner_spark.operators.allowlisting import (
        allowlist_event,
        blocklist_event,
    )

    analysis = "Analysis.%s"
    with _pytest.raises(Exception, match="Event not from this source"):
        allowlist_event(analysis % "NewMatchPathValueDetector", "/s1", None, ())
    with _pytest.raises(Exception, match="not understood"):
        allowlist_event(analysis % "EntropyDetector", "/s1", ["random", "Data"], ())
    cols, msg = allowlist_event(analysis % "EntropyDetector", "/s1", None, ())
    assert msg == "Allowlisted path /s1 in Analysis.EntropyDetector."
    cols, msg = allowlist_event(analysis % "EntropyDetector", "/d1", None, cols)
    assert msg == "Allowlisted path /d1 in Analysis.EntropyDetector."
    assert cols == ("/s1", "/d1")
    assert allowlist_event(analysis % "EntropyDetector", "/s1", None, cols)[0] == cols

    with _pytest.raises(Exception, match="Event not from this source"):
        blocklist_event(analysis % "NewMatchPathValueDetector", "/s1", None, ())
    with _pytest.raises(Exception, match="not understood"):
        blocklist_event(analysis % "EntropyDetector", "/s1", ["random", "Data"], ())
    icols, msg = blocklist_event(analysis % "EntropyDetector", "/s1", None, ())
    assert msg == "Blocklisted path /s1 in Analysis.EntropyDetector."
    assert icols == ("/s1",)


def test_blocklist_mutation_consumed_on_next_run(spark, tmp_path):
    """End-to-end: an entropy alarm's path is blocklisted, the mutated
    lists persist as a baseline-table update, and the NEXT run loads them
    and screens the offending atoms (reference remote-control mutation +
    state persist, EntropyDetector.py:238-272)."""
    from pyspark.sql import functions as F

    from logdata_anomaly_miner_spark.operators.allowlisting import (
        blocklist_event,
        load_path_lists,
        save_path_lists,
    )
    from logdata_anomaly_miner_spark.operators.entropy import (
        check_entropy,
        learn_bigram_freq,
        score_entropy_pandas,
    )
    from logdata_anomaly_miner_spark.operators.lifecycle import screen_paths

    normal = [(f"user{i % 7} logged in", None) for i in range(40)]
    weird = [("zq9#kx!!pw%%", "dbg")]  # high-entropy value tagged by path dbg
    df = spark.createDataFrame(normal + weird, "value string, dbg string")
    freq, _ = learn_bigram_freq(df.filter(F.col("dbg").isNull()), "value")
    scored = score_entropy_pandas(spark, df, "value", freq)
    alarms = check_entropy(scored, 0.01)
    assert alarms.filter(F.col("dbg").isNotNull()).count() == 1

    # operator blocklists the offending path; state persists to a table
    icols, _ = blocklist_event("Analysis.EntropyDetector", "dbg", None, ())
    state = str(tmp_path / "path_lists.parquet")
    save_path_lists(spark, state, (), icols)

    # next run: a fresh session-load of the lists screens the atoms
    constraint, ignore = load_path_lists(spark, state)
    assert (constraint, ignore) == ((), ("dbg",))
    screened = screen_paths(df, ignore_cols=ignore, constraint_cols=constraint)
    scored2 = score_entropy_pandas(spark, screened, "value", freq)
    assert check_entropy(scored2, 0.01).count() == 0
