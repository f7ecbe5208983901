"""Parity with reference EntropyDetectorTest.py:22-151 (FIXTURES.md §3.3).

The reference interleaves check-then-learn per atom; the harness below
replays that loop with the batch operators (score value_i against the freq
table learned from values 1..i-1), asserting the same anomaly sets:
  prob_thresh=0.05 -> {aminer, lfmvasacz}
  prob_thresh=0.10 -> {aminer, austrian, lfmvasacz}
"""

from __future__ import annotations

import pytest

from logdata_anomaly_miner_spark.operators.entropy import (
    check_entropy,
    learn_bigram_freq,
    score_entropy_expr,
    score_entropy_pandas,
)

VALUES = ["aminer", "logdata-anomaly-miner", "ait-aecid", "austrian", "institute", "lfmvasacz"]


def _ref_scores():
    """Independent oracle: straight reimplementation of the reference math
    (EntropyDetector.py:128-145) in plain Python over the fixture."""
    freq: dict[int, dict[int, int]] = {}
    total: dict[int, int] = {}
    scores = []
    for v in VALUES:
        b = v.encode()
        probs = []
        for i in range(-1, len(b)):
            first = b[i] if i != -1 else -1
            second = b[i + 1] if i != len(b) - 1 else -1
            p = 0.0
            if first in freq and second in freq[first]:
                p = freq[first][second] / total[first]
            probs.append(p)
        scores.append(sum(probs) / len(probs))
        for i in range(-1, len(b)):
            first = b[i] if i != -1 else -1
            second = b[i + 1] if i != len(b) - 1 else -1
            total[first] = total.get(first, 0) + 1
            d = freq.setdefault(first, {})
            d[second] = d.get(second, 0) + 1
    return scores


def _spark_sequential_scores(spark, scorer):
    scores = []
    baseline = None
    for v in VALUES:
        df = spark.createDataFrame([(v,)], "value string")
        if baseline is None:
            scores.append(0.0)  # empty freq table -> every prob 0
        else:
            scored = scorer(df, baseline)
            scores.append(scored.collect()[0]["critical_val"])
        baseline, _ = learn_bigram_freq(df, "value", baseline)
    return scores


@pytest.mark.parametrize("which", ["expr", "pandas"])
def test_sequential_parity_scores(spark, which):
    if which == "expr":
        scorer = lambda df, b: score_entropy_expr(df, "value", b)  # noqa: E731
    else:
        scorer = lambda df, b: score_entropy_pandas(spark, df, "value", b)  # noqa: E731
    got = _spark_sequential_scores(spark, scorer)
    want = _ref_scores()
    assert got == pytest.approx(want, abs=1e-12)
    # anomaly sets from the reference unit test
    assert [v for v, s in zip(VALUES, got) if s < 0.05] == ["aminer", "lfmvasacz"]
    assert [v for v, s in zip(VALUES, got) if s < 0.1] == ["aminer", "austrian", "lfmvasacz"]


def test_check_entropy_filter(spark):
    df = spark.createDataFrame(
        [("a", 0.04), ("b", 0.06)], "value string, critical_val double"
    )
    assert [r["value"] for r in check_entropy(df, 0.05).collect()] == ["a"]


def test_skip_repetitions(spark):
    """skip_repetitions=True counts each distinct value once (ref :170-174)."""
    df = spark.createDataFrame([("ab",), ("ab",), ("cd",)], "value string")
    freq, seen = learn_bigram_freq(df, "value", None, skip_repetitions=True)
    # "ab" counted once: pairs (-1,a),(a,b),(b,-1) and (-1,c),(c,d),(d,-1)
    total = sum(r["cnt"] for r in freq.collect())
    assert total == 6
    assert sorted(r["value"] for r in seen.collect()) == ["ab", "cd"]
    # second batch with an already-seen value adds nothing
    df2 = spark.createDataFrame([("ab",), ("ef",)], "value string")
    freq2, seen2 = learn_bigram_freq(df2, "value", freq, skip_repetitions=True, seen_values=seen)
    assert sum(r["cnt"] for r in freq2.collect()) == 9
    assert sorted(r["value"] for r in seen2.collect()) == ["ab", "cd", "ef"]
