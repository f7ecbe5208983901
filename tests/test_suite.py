"""End-to-end validation-suite test on synthesized documents (datagen)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from logdata_anomaly_miner_spark.constraints.suite import SuiteConfig, run_suite
from logdata_anomaly_miner_spark.datagen import explode_spans, gen_documents, gen_media
from logdata_anomaly_miner_spark.plans.checkpoint import CheckpointManifest


def test_datagen_shape(spark):
    docs = gen_documents(spark, n_docs=500, dup_rate=0.02, dangling_rate=0.05)
    assert docs.columns == ["doc_id", "ts", "spans"]
    flat = explode_spans(docs)
    assert flat.columns == ["doc_id", "ts", "ord", "kind", "text", "media_ref", "offset"]
    # deterministic: same seed -> same data
    again = gen_documents(spark, n_docs=500, dup_rate=0.02, dangling_rate=0.05)
    assert docs.exceptAll(again).count() == 0 and again.exceptAll(docs).count() == 0
    # offsets strictly increasing within each doc (generator invariant)
    from logdata_anomaly_miner_spark.constraints.schema_checks import offsets_monotonic
    assert offsets_monotonic(docs).count() == 0
    # planted non-monotonic offsets are caught
    broken = spark.createDataFrame(
        [("d1", 1.0, [("text", "a", None, 5), ("text", "b", None, 3)])],
        "doc_id string, ts double, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    assert offsets_monotonic(broken).count() == 1


def test_merged_scan_matches_standalone_schema_checks(spark):
    """Drift guard for the round-6 single-scan check branch: the suite's
    inlined per-span predicates must stay predicate-for-predicate equal to
    the standalone reference implementations in constraints/schema_checks.py
    — compared on a corpus with every schema violation class planted
    (unknown kind, null kind, null offset, media_ref on a text kind,
    non-monotonic offsets)."""
    from logdata_anomaly_miner_spark.constraints.schema_checks import (
        media_kind_consistency,
        offsets_monotonic,
        required_non_null,
        unknown_kinds,
    )
    from logdata_anomaly_miner_spark.datagen import KINDS

    docs = spark.createDataFrame(
        [
            ("d1", 100.0, [("text", "ok", None, 0), ("blob", "x", None, 5)]),
            ("d2", 200.0, [(None, "y", None, 0), ("text", "z", None, None)]),
            ("d3", 300.0, [("text", "m", "media-1", 0)]),
            ("d4", 400.0, [("text", "a", None, 5), ("text", "b", None, 3)]),
            ("d5", 500.0, [("image", None, "media-9", 0)]),
        ],
        "doc_id string, ts double, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media = gen_media(spark, 10)
    res = run_suite(spark, docs, media, SuiteConfig(entropy_prob_thresh=0.0), persist=False)
    got = {
        (r["message"],): r["n"]
        for r in res.violations.filter("suite = 'schema'")
        .groupBy("message").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    flat = explode_spans(docs)
    want = {
        ("Unknown span kind",): unknown_kinds(flat, tuple(KINDS)).count(),
        ("Required field null",): required_non_null(flat, ["kind", "offset"]).count(),
        ("Offset not increasing",): offsets_monotonic(docs).count(),
        ("media_ref on non-media kind",): media_kind_consistency(flat).count(),
    }
    want = {k: v for k, v in want.items() if v > 0}
    assert got == want
    assert got[("Unknown span kind",)] == 1      # blob
    assert got[("Required field null",)] == 2    # null kind + null offset
    assert got[("Offset not increasing",)] == 1  # d4
    assert got[("media_ref on non-media kind",)] == 1  # d3


def test_suite_finds_planted_violations(spark):
    docs = gen_documents(spark, n_docs=1000, dup_rate=0.02, dangling_rate=0.1)
    media = gen_media(spark, 1000)
    res = run_suite(spark, docs, media, SuiteConfig(entropy_prob_thresh=0.0))
    by_suite = {
        r["suite"]: r["n"]
        for r in res.violations.groupBy("suite").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_suite.get("uniqueness", 0) > 0      # planted dup doc_ids
    assert by_suite.get("referential", 0) > 0     # planted dangling media_refs
    assert by_suite.get("new_value", 0) > 0       # learn-from-scratch: all new
    assert "schema" not in by_suite               # generator respects schema
    verd = res.verdicts.collect()
    assert len(verd) > 0
    assert res.metrics["rows_scanned"] == 1000
    assert res.metrics["violations"] > 0


def test_suite_with_baselines_quiet(spark):
    """Second run with baselines learned from the same data: novelty silent."""
    docs = gen_documents(spark, n_docs=500, dup_rate=0.0, dangling_rate=0.0)
    media = gen_media(spark, 1000)
    flat = explode_spans(docs)
    known = flat.select("kind", "text").dropDuplicates()
    res = run_suite(
        spark, docs, media,
        SuiteConfig(known_kind_text=known, entropy_prob_thresh=0.0),
    )
    by_suite = {
        r["suite"]: r["n"]
        for r in res.violations.groupBy("suite").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_suite == {}  # no dups, no dangling, known values, entropy off
    assert res.verdicts.filter("pass = false").count() == 0


def test_suite_drift_verdict_attribution(spark):
    """A snapshot-level drift failure must land in per-partition verdicts."""
    docs = gen_documents(spark, n_docs=500, dup_rate=0.0, dangling_rate=0.0)
    media = gen_media(spark, 1000)
    flat = explode_spans(docs)
    known = flat.select("kind", "text").dropDuplicates()
    # baseline histogram wildly different from actual text lengths -> PSI fail
    kinds = [r["kind"] for r in flat.select("kind").distinct().collect()]
    baseline_hist = spark.createDataFrame(
        [(k, 9, 1000) for k in kinds], "kind string, bucket long, cnt long"
    )
    from logdata_anomaly_miner_spark.constraints.suite import SuiteConfig, run_suite

    res = run_suite(
        spark, docs, media,
        SuiteConfig(known_kind_text=known, entropy_prob_thresh=0.0,
                    baseline_hist=baseline_hist),
    )
    drift_verdicts = res.verdicts.filter("suite = 'drift'").collect()
    assert len(drift_verdicts) > 0
    assert all(not r["pass"] for r in drift_verdicts)
    assert all(r["partition"] is not None for r in drift_verdicts)


def test_checkpoint_manifest(spark):
    with tempfile.TemporaryDirectory() as d:
        m = CheckpointManifest(spark, f"{d}/manifest")
        assert m.committed_partitions(1) == set()
        m.commit(1, "2023-11-14", rows_scanned=100, violations=2, wall_time_s=1.5)
        m.commit(1, "2023-11-15", rows_scanned=50, violations=0, wall_time_s=0.7)
        m.commit(2, "2023-11-14", rows_scanned=10, violations=0, wall_time_s=0.1)
        assert m.committed_partitions(1) == {"2023-11-14", "2023-11-15"}
        assert m.committed_partitions(2) == {"2023-11-14"}
        df = m.read()
        assert df.count() == 3
        assert df.filter("snapshot_id = 1").agg(F.sum("rows_scanned")).collect()[0][0] == 150


def test_suite_lifecycle_freeze_and_ignore(spark):
    """Suite-spec lifecycle wiring: stop_learning_no_anomaly_time freezes
    the novelty baseline at the first gap, so every later unseen value
    alarms (per occurrence); ignore_kinds screens spans out entirely."""
    from logdata_anomaly_miner_spark.config import to_suite_config, validate_spec
    from logdata_anomaly_miner_spark.constraints.suite import run_suite
    from logdata_anomaly_miner_spark.datagen import gen_documents, gen_media

    spec = validate_spec(
        {"suite": {"lifecycle": {"stop_learning_no_anomaly_time": 3600.0,
                                 "ignore_kinds": ["footnote"]}}}
    )
    cfg = to_suite_config(spec)
    assert cfg.stop_learning_no_anomaly_time == 3600.0
    assert cfg.ignore_kinds == ("footnote",)
    docs = gen_documents(spark, n_docs=300, seed=11)
    media = gen_media(spark, 1000)
    res = run_suite(spark, docs, media, cfg, persist=False)
    base = run_suite(spark, docs, media, None, persist=False)
    nv_lc = res.violations.filter("suite = 'new_value'").count()
    nv_base = base.violations.filter("suite = 'new_value'").count()
    # the synthetic docs all fall within one dense time range -> no gap ->
    # learning never stops -> same novelty set minus the screened kind
    assert nv_lc <= nv_base
