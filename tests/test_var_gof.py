"""VariableTypeDetector gof core (reference VariableTypeDetector.py:969-1150
detect_continuous_shape, :1605-1700 s_gof_test + binomial ladder)."""

from __future__ import annotations

import math
from statistics import NormalDist

import pytest

from logdata_anomaly_miner_spark.operators.var_gof import (
    binomial_critical,
    fit_continuous,
    s_gof_ladder,
)


def _rows(vals, grp="g"):
    return [(grp, i, float(v)) for i, v in enumerate(vals)]


def _ks_uniform_py(vals):
    """Independent plain-Python KS statistic vs uniform(min,max)."""
    s = sorted(vals)
    n = len(s)
    lo, hi = s[0], s[-1]
    d = 0.0
    for i, x in enumerate(s, start=1):
        f = (x - lo) / (hi - lo)
        d = max(d, i / n - f, f - (i - 1) / n)
    return d


def test_ks_stat_matches_python(spark):
    vals = [((i * 37) % 101) / 101.0 for i in range(100)]  # uniform-ish grid
    df = spark.createDataFrame(_rows(vals), "g string, i long, v double")
    out = fit_continuous(df, ["g"], "v", ["i"], num_init=100).collect()[0]
    # uniform must win on a uniform grid, with the exact KS statistic
    assert out["dist"] == "uni"
    assert out["stat"] == pytest.approx(_ks_uniform_py(vals), abs=1e-12)
    assert out["accepted"]


def test_normal_sample_fits_normal(spark):
    nd = NormalDist(10.0, 2.0)
    vals = [nd.inv_cdf((i + 0.5) / 100) for i in range(100)]
    df = spark.createDataFrame(_rows(vals), "g string, i long, v double")
    out = fit_continuous(df, ["g"], "v", ["i"], num_init=100).collect()[0]
    assert out["dist"] == "nor"
    assert out["accepted"]
    assert out["mu"] == pytest.approx(10.0, abs=0.1)


def test_cm_statistic_mode(spark):
    """CvM mode: omega^2 = 1/(12n) + sum (F - (2i-1)/2n)^2; a perfect
    uniform grid gives the minimum 1/(12n) + tiny grid residue."""
    vals = [(i + 0.5) / 100 for i in range(100)]
    df = spark.createDataFrame(_rows(vals), "g string, i long, v double")
    out = fit_continuous(df, ["g"], "v", ["i"], num_init=100, test="CM").collect()[0]
    assert out["dist"] == "uni"
    # F((i+.5-.5)/99-scaled) is not exactly (2i-1)/2n: just sanity-bound it
    assert 0 < out["stat"] < 0.4614 and out["accepted"]


def test_binomial_critical():
    # Bin(3, 0.05): P(X>=1)=0.142625 > .05, P(X>=2)=0.00725 <= .05 -> k=2
    assert binomial_critical(3, 0.05, 0.05) == 2
    # Bin(30, 0.05): matches an exact tail scan
    k = binomial_critical(30, 0.05, 0.05)
    tail = sum(
        math.comb(30, i) * 0.05**i * 0.95 ** (30 - i) for i in range(k, 31)
    )
    tail_prev = sum(
        math.comb(30, i) * 0.05**i * 0.95 ** (30 - i) for i in range(k - 1, 31)
    )
    assert tail <= 0.05 < tail_prev


def test_s_gof_ladder_alarms_on_drift(spark):
    """Init: uniform [0,1]. Chunks 0-1 uniform (pass); chunks 2-4 shifted to
    [2,3] (hard fail). With num_s_gof_bt=3 and k_crit=2, the alarm fires
    once two of the trailing three chunks failed."""
    vals = [((i * 37) % 100) / 100.0 for i in range(100)]          # init
    vals += [((i * 41) % 100) / 100.0 for i in range(40)]          # chunks 0,1
    vals += [2.0 + ((i * 43) % 100) / 100.0 for i in range(60)]    # chunks 2-4
    df = spark.createDataFrame(_rows(vals), "g string, i long, v double")
    fitted = fit_continuous(df, ["g"], "v", ["i"], num_init=100)
    out = s_gof_ladder(
        df,
        ["g"],
        "v",
        ["i"],
        fitted,
        num_init=100,
        num_s_gof_values=20,
        num_s_gof_bt=3,
    ).collect()
    by_chunk = {r["chunk"]: r for r in out}
    assert not by_chunk[0]["failed"] and not by_chunk[1]["failed"]
    assert by_chunk[2]["failed"] and by_chunk[3]["failed"] and by_chunk[4]["failed"]
    # alarm needs >= 3 tests in window AND >= 2 fails: first at chunk 3
    assert not by_chunk[2]["alarm"]
    assert by_chunk[3]["alarm"] and by_chunk[4]["alarm"]


def test_fit_discrete_classification(spark):
    """detect_var_type discrete branch: stat / unq / others / d kinds and
    the learned value probabilities."""
    from logdata_anomaly_miner_spark.operators.var_gof import fit_discrete

    rows = []
    # stat: one value 100x
    rows += [("s", i, "only") for i in range(100)]
    # unq: all distinct
    rows += [("u", i, f"v{i}") for i in range(100)]
    # others: 95 distinct out of 100 (>= 100*(1-0.1))
    rows += [("o", i, f"w{min(i, 94)}") for i in range(100)]
    # d: three values 50/30/20
    dvals = ["x"] * 50 + ["y"] * 30 + ["z"] * 20
    rows += [("d", i, dvals[i]) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, i long, v string")
    out = fit_discrete(df, ["g"], "v", ["i"], num_init=100, sim_thres=0.1)
    kinds = {r["g"]: r["var_kind"] for r in out.select("g", "var_kind").dropDuplicates().collect()}
    assert kinds == {"s": "stat", "u": "unq", "o": "others", "d": "d"}
    probs = {r["value"]: r["p"] for r in out.filter("g = 'd'").collect()}
    assert probs == {"x": 0.5, "y": 0.3, "z": 0.2}


def test_d_ladder_drift_and_new_values(spark):
    """Discrete chi² ladder: matching chunks pass, a skewed chunk fails,
    a chunk with an unseen value fails via the new-values branch, and the
    trailing binomial ladder alarms once successes drop low enough."""
    from logdata_anomaly_miner_spark.operators.var_gof import (
        bt_min_successes,
        d_ladder,
        fit_discrete,
    )

    base_pat = ["x"] * 5 + ["y"] * 3 + ["z"] * 2          # p = .5/.3/.2
    vals = base_pat * 10                                   # init: 100
    vals += base_pat * 4                                   # chunks 0,1 (20 each): match
    vals += ["x"] * 20                                     # chunk 2: all-x, skewed
    vals += base_pat + ["x"] * 9 + ["NEW"]                 # chunk 3: unseen value
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, i long, v string")
    baseline = fit_discrete(df, ["g"], "v", ["i"], num_init=100)
    out = d_ladder(
        df, ["g"], "v", ["i"], baseline,
        num_init=100, num_update=20, num_d_bt=3, d_bt_alpha=0.3,
    ).collect()
    by_chunk = {r["chunk"]: r for r in out}
    assert not by_chunk[0]["failed"] and not by_chunk[1]["failed"]
    assert by_chunk[2]["failed"] and by_chunk[2]["n_new"] == 0
    assert by_chunk[3]["failed"] and by_chunk[3]["n_new"] == 1
    # ladder: num_d_bt=3 -> alarm when successes in window < min_success
    ms = bt_min_successes(3, 0.95, 0.3)
    assert ms == 3  # P(Bin(3,.95) failures >= 1) ~= .14 < .3 tail walk
    assert not by_chunk[1]["alarm"]  # window [0,1] not full... chunk2: [0,1,2] 2 succ < 3
    assert by_chunk[2]["alarm"] and by_chunk[3]["alarm"]
    assert by_chunk[0]["dof"] == 2


def test_constant_group_is_static_and_excluded_from_ladder(spark):
    """A constant init sample is the reference's STATIC type: classified
    as such (trivially accepted, stat 0) and excluded from the s_gof
    ladder rather than emitting all-null rows that vanish from both
    accept and reject filters."""
    rows = [("const", i, 5.0) for i in range(160)] + [
        ("vary", i, float((i * 37) % 101) / 101.0) for i in range(160)
    ]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    fit = fit_continuous(df, ["g"], "v", ["i"], num_init=100)
    got = {r["g"]: r for r in fit.collect()}
    assert got["const"]["dist"] == "static"
    assert got["const"]["stat"] == 0.0 and got["const"]["accepted"] is True
    assert got["vary"]["dist"] == "uni" and got["vary"]["accepted"]

    lad = s_gof_ladder(df, ["g"], "v", ["i"], fit, num_init=100, num_s_gof_values=50)
    groups = {r["g"] for r in lad.collect()}
    assert groups == {"vary"}  # static group routed to d_test, not s_gof
