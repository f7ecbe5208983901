"""Config-COMPILER parity against the pipeline-1 reference golden.

tests/test_demo_e2e_parity.py certifies the OPERATOR path byte-for-byte;
this test certifies the YAML config-compiler path (plans/reference_config):
parity1.yml — the YAML form of tests/golden/demo_e2e/ref_config.py — is
compiled with load_reference_config and run over the same corpus, and its
detections must equal the event set the reference emitted into
reference_stream.txt (same unparsed atoms, same unsorted timestamp, same
new values, same new combos). A user expressing the pipeline as config.yml
gets the same anomalies as a user of the reference.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logdata_anomaly_miner_spark.plans.reference_config import load_reference_config
from logdata_anomaly_miner_spark.sources.readers import read_text_lines

E2E = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "demo_e2e")


def test_compiled_yaml_matches_reference_detections(spark):
    cfg = load_reference_config(os.path.join(E2E, "parity1.yml"))
    assert cfg.skipped == []
    lines = read_text_lines(spark, os.path.join(E2E, "corpus.log")).withColumn(
        "line_no", F.col("ingest_order")  # the compiler's order column
    )
    parsed = cfg.parse(lines, "raw").localCheckpoint()

    # unparsed atoms: the three lines the reference routed to
    # SimpleUnparsedAtomHandler
    unparsed = sorted(
        r["raw"] for r in parsed.filter(~F.col("_parse_ok")).collect()
    )
    assert unparsed == [
        "15.2024 12:00:05 testhost aminer: System rebooted for hard disk upgrade",
        "2024-03-15 12:00:01 testhost aminer: System rebooted for hard disk upgrad",
        "2024-03-15 12:00:04 testhost aminer: System rebooted for hard disk upgrad",
    ]

    ok = parsed.filter(F.col("_parse_ok"))
    out = cfg.run_detectors(ok)
    assert set(out) == {"Unsorted", "NewValue", "NewValueCombo"}

    # TimestampsUnsortedDetector: exactly the 12:00:03-after-12:00:06 atom
    uns = out["Unsorted"].collect()
    assert [r["raw"] for r in uns] == [
        "2024-03-15 12:00:03 fedora aminer: System rebooted for hard disk upgrade"
    ]
    assert uns[0]["prev_ts"] / 1_000_000 % 100 == 6.0  # below 12:00:06

    # NewMatchPathValueDetector on Username: root, user, guest (first atoms)
    vals = {(r["Username"]) for r in out["NewValue"].collect()}
    assert vals == {"root", "user", "guest"}

    # NewMatchPathValueComboDetector: the four combos of the golden
    combos = {(r["Username"], r["Path"]) for r in out["NewValueCombo"].collect()}
    assert combos == {
        ("root", "/root"), ("user", "/home/user"),
        ("guest", "/home/guest"), ("root", "/home/root"),
    }

    # cross-check against the GOLDEN itself: every combo event body in
    # reference_stream.txt appears exactly once in the compiled output
    with open(os.path.join(E2E, "reference_stream.txt"), encoding="utf-8") as fh:
        golden = fh.read()
    for u, p in combos:
        assert f"(b'{u}', b'{p}')" in golden
    assert golden.count("New value combination(s) detected") == len(combos)
    assert golden.count("New value(s) detected") == len(vals)
