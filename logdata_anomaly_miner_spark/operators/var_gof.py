"""VariableTypeDetector goodness-of-fit core.

Re-expresses the continuous-distribution machinery of VariableTypeDetector
(aminer/analysis/VariableTypeDetector.py):

- ``detect_continuous_shape`` (:969-1150): fit candidate distributions to
  the first ``num_init`` values of a variable and pick the best by
  goodness-of-fit. The reference tests uniform, normal and four/five beta
  shapes via scipy's one-sample KS (or CvM) test; scipy is not available
  here, so the same statistics are computed in closed form as column
  expressions — the KS one-sample statistic only needs the candidate CDF,
  and every candidate CDF has an elementary form:
    * uniform(min,max):      F(x) = (x-min)/(max-min)
    * normal(μ,σ):           F(x) = (1+erf((x-μ)/(σ√2)))/2
    * beta(0.5,0.5) scaled:  F(x) = 2/π·asin(√x)   (arcsine law)
    * beta(a,b) integer a,b: I(x;a,b) = Σ_{j=a}^{a+b-1} C(a+b-1,j)
                              x^j (1-x)^{a+b-1-j}  (polynomial)
  The standardizations match the reference exactly (e.g. beta(5,2) values
  enter as (v-μ)/σ·√(10/8)/7 + 5/7, :1020-1046).
- acceptance: p-value of the one-sample KS test is a function of (n, D)
  only, so the reference's argmax-significance choice equals argmin D here,
  and "p > gof_alpha" equals "D < c(α)/√n" with the asymptotic
  c(α) = √(−ln(α/2)/2) (c(0.05) ≈ 1.3581); for CvM the asymptotic
  critical value at α=0.05 is 0.4614 (the reference ships the same
  literature constants as lookup tables, crit_val_ini_cm).
- ``s_gof_test`` + binomial ladder (:1558-1700, num_s_gof_values /
  num_s_gof_bt / s_gof_bt_alpha): after the first num_init values, each
  consecutive chunk of ``num_s_gof_values`` values is KS-tested against
  the FITTED distribution (pass/fail); a sliding window of the last
  ``num_s_gof_bt`` chunk results raises an alarm when the number of fails
  reaches the binomial critical value at s_gof_bt_alpha.

Everything is per-(group, variable) window algebra — one sort per group,
map-side aggregation for the fit statistics; no UDF, no driver loop.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SQRT2 = math.sqrt(2.0)


def _clip01(x: Column) -> Column:
    return F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))


def _norm_cdf(z: Column) -> Column:
    """Standard normal CDF via the Abramowitz & Stegun 26.2.17 polynomial
    (|err| < 7.5e-8). Used instead of erf so the DuckDB oracle can evaluate
    the IDENTICAL formula (DuckDB has no erf); both engines then agree to
    the last ulp, not just to the approximation error."""
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t * (F.lit(1.781477937) + t * (F.lit(-1.821255978) + t * F.lit(1.330274429)))
        )
    )
    pdf = F.exp(-az * az / F.lit(2.0)) * F.lit(0.3989422804014327)
    upper = F.lit(1.0) - pdf * poly
    return F.when(z >= 0, upper).otherwise(F.lit(1.0) - upper)


def _beta_int_cdf(x: Column, a: int, b: int) -> Column:
    """Regularized incomplete beta I(x; a, b) for integer a, b:
    I(x;a,b) = Σ_{j=a}^{n} C(n,j) x^j (1-x)^{n-j} with n = a+b-1."""
    n = a + b - 1
    x = _clip01(x)
    out = F.lit(0.0)
    for j in range(a, n + 1):
        out = out + F.lit(float(math.comb(n, j))) * F.pow(x, F.lit(float(j))) * F.pow(
            1 - x, F.lit(float(n - j))
        )
    return out


def candidate_cdfs(
    v: Column, mn: Column, mx: Column, mu: Column, sigma: Column
) -> list[tuple[str, Column]]:
    """(name, F(v)) per candidate, standardized exactly like the reference
    (VariableTypeDetector.py:984-1046). mn/mx/mu/sigma are per-group
    aggregate columns over the init sample.

    nullif guards: for a CONSTANT group sigma = 0 and mx = mn, and ANSI
    mode (Spark 4 default) raises DIVIDE_BY_ZERO even for doubles — the
    degenerate group must flow through as nulls (classified 'static'
    downstream), not abort the job."""
    z = (v - mu) / F.nullif(sigma, F.lit(0.0))
    rng = F.nullif(mx - mn, F.lit(0.0))
    return [
        ("uni", _clip01((v - mn) / rng)),
        ("nor", _norm_cdf(z)),
        # arcsine beta(0.5, 0.5) on the min-max-scaled value
        (
            "beta1",
            F.lit(2.0 / math.pi) * F.asin(F.sqrt(_clip01((v - mn) / rng))),
        ),
        # beta(5,2): z·√(10/8)/7 + 5/7
        (
            "beta2",
            _beta_int_cdf(z * F.lit(math.sqrt(10.0 / 8.0) / 7.0) + F.lit(5.0 / 7.0), 5, 2),
        ),
        # beta(2,5): z·√(10/8)/7 + 2/7
        (
            "beta3",
            _beta_int_cdf(z * F.lit(math.sqrt(10.0 / 8.0) / 7.0) + F.lit(2.0 / 7.0), 2, 5),
        ),
        # beta(1,5): z·√(5/7)/6 + 1/6
        (
            "beta4",
            _beta_int_cdf(z * F.lit(math.sqrt(5.0 / 7.0) / 6.0) + F.lit(1.0 / 6.0), 1, 5),
        ),
        # beta(5,1): z·√(5/7)/6 + 5/6
        (
            "beta5",
            _beta_int_cdf(z * F.lit(math.sqrt(5.0 / 7.0) / 6.0) + F.lit(5.0 / 6.0), 5, 1),
        ),
    ]


def _gof_terms(test: str, cdf: Column, rn: Column, n: Column) -> Column:
    """Per-row contribution whose per-group MAX (KS) / SUM (CvM) yields the
    statistic; rn is the 1-based rank of the value within the group."""
    if test == "KS":
        return F.greatest(rn / n - cdf, cdf - (rn - 1) / n)
    if test == "CM":
        return F.pow(cdf - (2 * rn - 1) / (2 * n), F.lit(2.0))
    raise ValueError(f"unknown gof test {test!r}")


def fit_continuous(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    num_init: int = 100,
    gof_alpha: float = 0.05,
    test: str = "KS",
) -> DataFrame:
    """Per group: best-fitting candidate over the first ``num_init`` values
    (event order), with the gof statistic and acceptance flag.

    Returns group_cols + (dist, stat, n, mu, sigma, vmin, vmax, accepted).
    """
    v = F.col(value_col).cast("double")
    w_ord = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    init = (
        df.filter(v.isNotNull())
        .withColumn("_ern", F.row_number().over(w_ord))
        .filter(F.col("_ern") <= num_init)
        .select(*group_cols, v.alias("_v"))
    )
    stats = init.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_v").alias("vmin"),
        F.max("_v").alias("vmax"),
        F.avg("_v").alias("mu"),
        F.stddev_pop("_v").alias("sigma"),
    )
    ranked = init.join(stats, list(group_cols)).withColumn(
        "_rn",
        F.row_number()
        .over(Window.partitionBy(*group_cols).orderBy("_v"))
        .cast("double"),
    )
    rn, n = F.col("_rn"), F.col("n").cast("double")
    terms = ranked.select(
        *group_cols,
        "n",
        "vmin",
        "vmax",
        "mu",
        "sigma",
        *[
            _gof_terms(test, cdf, rn, n).alias(f"_t_{name}")
            for name, cdf in candidate_cdfs(
                F.col("_v"), F.col("vmin"), F.col("vmax"), F.col("mu"), F.col("sigma")
            )
        ],
    )
    names = [name for name, _ in candidate_cdfs(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0), F.lit(1.0))]
    if test == "KS":
        aggs = [F.max(f"_t_{name}").alias(f"_s_{name}") for name in names]
    else:
        aggs = [
            (F.sum(f"_t_{name}") + F.lit(1.0) / (12.0 * F.first("n"))).alias(
                f"_s_{name}"
            )
            for name in names
        ]
    fitted = terms.groupBy(*group_cols, "n", "vmin", "vmax", "mu", "sigma").agg(*aggs)
    # argmin statistic across candidates (ties: candidate order, matching
    # the reference's max-significance scan)
    packed = F.array(
        *[
            F.struct(
                F.col(f"_s_{name}").alias("stat"),
                F.lit(i).alias("ord"),
                F.lit(name).alias("dist"),
            )
            for i, name in enumerate(names)
        ]
    )
    best = F.array_min(F.filter(packed, lambda s: s["stat"].isNotNull()))
    if test == "KS":
        crit = F.lit(math.sqrt(-math.log(gof_alpha / 2.0) / 2.0)) / F.sqrt(
            F.col("n").cast("double")
        )
    else:
        crit = F.lit(0.4614)  # asymptotic one-sample CvM crit at alpha=0.05
    # degenerate (constant) groups: vmax == vmin makes every candidate CDF
    # 0/0 -> all stats null -> _best null, and accepted = (null < crit)
    # would be neither true nor false, silently dropping the group from
    # BOTH filter(accepted) and filter(~accepted). A constant sample is
    # the reference's STATIC variable type — classify it as such,
    # trivially accepted, rather than emitting nulls.
    degenerate = F.col("vmax") == F.col("vmin")
    return (
        fitted.withColumn("_best", best)
        .select(
            *group_cols,
            F.when(degenerate, F.lit("static"))
            .otherwise(F.col("_best.dist"))
            .alias("dist"),
            F.when(degenerate, F.lit(0.0)).otherwise(F.col("_best.stat")).alias("stat"),
            "n",
            "mu",
            "sigma",
            "vmin",
            "vmax",
            degenerate.alias("_deg"),
        )
        .withColumn("accepted", F.when(F.col("_deg"), F.lit(True)).otherwise(F.col("stat") < crit))
        .drop("_deg")
    )


def binomial_critical(n: int, p: float, alpha: float) -> int:
    """Smallest k with P(Bin(n, p) >= k) <= alpha (upper-tail test)."""
    tail = 1.0
    cum = 0.0
    for k in range(n + 1):
        cum += math.comb(n, k) * (p**k) * ((1 - p) ** (n - k))
        if 1.0 - cum <= alpha:  # P(X >= k+1) <= alpha
            return k + 1
    return n + 1


def s_gof_ladder(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    fitted: DataFrame,
    num_init: int = 100,
    num_s_gof_values: int = 50,
    s_gof_alpha: float = 0.05,
    num_s_gof_bt: int = 30,
    s_gof_bt_alpha: float = 0.05,
    test: str = "KS",
) -> DataFrame:
    """Sliding gof + binomial ladder (reference s_gof_test :1605-1700):
    values after the init sample are cut into consecutive chunks of
    ``num_s_gof_values``; each full chunk is gof-tested against the FITTED
    distribution (fail = statistic above the α critical value); an alarm
    fires on chunks where the fail count within the trailing
    ``num_s_gof_bt`` chunks reaches the binomial critical value.

    Returns group_cols + (chunk, stat, failed, n_fails, n_tests, alarm).

    Groups whose fit is 'static' (constant init sample) are EXCLUDED: a
    static variable has no continuous CDF to slide against — the
    reference routes such variables to the discrete/static d_test path
    (fit_discrete / d_test_ladder), not s_gof.
    """
    fitted = fitted.filter(F.col("dist") != "static")
    v = F.col(value_col).cast("double")
    w_ord = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    chunked = (
        df.filter(v.isNotNull())
        .withColumn("_ern", F.row_number().over(w_ord))
        .filter(F.col("_ern") > num_init)
        .withColumn(
            "chunk", F.floor((F.col("_ern") - num_init - 1) / num_s_gof_values)
        )
        .select(*group_cols, "chunk", v.alias("_v"))
        .join(
            fitted.select(*group_cols, "dist", "mu", "sigma", "vmin", "vmax"),
            list(group_cols),
        )
    )
    ranked = chunked.withColumn(
        "_rn",
        F.row_number()
        .over(Window.partitionBy(*group_cols, "chunk").orderBy("_v"))
        .cast("double"),
    ).withColumn(
        "_cn",
        F.count(F.lit(1))
        .over(
            Window.partitionBy(*group_cols, "chunk").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("double"),
    )
    cdf_by_name = candidate_cdfs(
        F.col("_v"), F.col("vmin"), F.col("vmax"), F.col("mu"), F.col("sigma")
    )
    # select the fitted distribution's CDF via a chained when() on dist
    sel = F.lit(None).cast("double")
    for name, expr in cdf_by_name:
        sel = F.when(F.col("dist") == name, expr).otherwise(sel)
    term = _gof_terms(test, sel, F.col("_rn"), F.col("_cn"))
    if test == "KS":
        agg = F.max(term).alias("stat")
        crit = F.lit(math.sqrt(-math.log(s_gof_alpha / 2.0) / 2.0)) / F.sqrt(
            F.lit(float(num_s_gof_values))
        )
    else:
        agg = (F.sum(term) + F.lit(1.0 / (12.0 * num_s_gof_values))).alias("stat")
        crit = F.lit(0.4614)
    per_chunk = (
        ranked.groupBy(*group_cols, "chunk")
        .agg(agg, F.max("_cn").alias("cn"))
        .filter(F.col("cn") >= num_s_gof_values)  # only full chunks are tested
        .withColumn("failed", F.col("stat") >= crit)
    )
    bt = Window.partitionBy(*group_cols).orderBy("chunk").rowsBetween(
        -(num_s_gof_bt - 1), 0
    )
    k_crit = binomial_critical(num_s_gof_bt, s_gof_alpha, s_gof_bt_alpha)
    return (
        per_chunk.withColumn(
            "n_fails", F.sum(F.col("failed").cast("int")).over(bt)
        )
        .withColumn("n_tests", F.count(F.lit(1)).over(bt))
        .withColumn(
            "alarm",
            (F.col("n_tests") >= num_s_gof_bt) & (F.col("n_fails") >= k_crit),
        )
        .drop("cn")
    )


def bt_min_successes(num_bt: int, p: float, alpha: float) -> int:
    """Minimal number of successes for the binomial test at significance
    alpha (reference bt_min_successes :2096-2110): walk the failure tail
    until the cumulative probability exceeds alpha."""
    s = 0.0
    for i in range(num_bt + 1):
        s += math.comb(num_bt, i) * ((1 - p) ** i) * (p ** (num_bt - i))
        if s > alpha:
            return num_bt - i
    return 0


def fit_discrete(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    num_init: int = 100,
    sim_thres: float = 0.1,
) -> DataFrame:
    """Discrete/static variable baseline (reference detect_var_type
    :887-965, discrete branch :958-965): per group, classify the first
    ``num_init`` values and learn the value-probability list.

    Classification over the init sample (one distinct-count aggregate):
    - 'stat'   — exactly one distinct value (:896-897)
    - 'unq'    — every value distinct (:951-953; the reference also
      requires non-float values, folded into the caller's column choice)
    - 'others' — num_diff >= num_init·(1−sim_thres) (:954-956)
    - 'd'      — otherwise: discrete, with p(v) = count(v)/n (:958-965)

    Returns one row per (group, value): group_cols + (var_kind, value, p,
    n_init, num_diff) — 'stat' groups carry their single value with p=1;
    'unq'/'others' groups keep their rows so the caller can filter or
    inspect, with p still the empirical probability."""
    v = F.col(value_col).cast("string")
    w_ord = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    init = (
        df.filter(v.isNotNull())
        .withColumn("_ern", F.row_number().over(w_ord))
        .filter(F.col("_ern") <= num_init)
        .select(*group_cols, v.alias("value"))
    )
    counts = init.groupBy(*group_cols, "value").agg(F.count(F.lit(1)).alias("_cnt"))
    totals = counts.groupBy(*group_cols).agg(
        F.sum("_cnt").alias("n_init"), F.count(F.lit(1)).alias("num_diff")
    )
    kind = (
        F.when(F.col("num_diff") == 1, F.lit("stat"))
        .when(F.col("num_diff") == F.col("n_init"), F.lit("unq"))
        .when(
            F.col("num_diff")
            >= F.col("n_init").cast("double") * F.lit(1.0 - sim_thres),
            F.lit("others"),
        )
        .otherwise(F.lit("d"))
    )
    return (
        counts.join(totals, list(group_cols))
        .withColumn("var_kind", kind)
        .withColumn("p", F.col("_cnt") / F.col("n_init"))
        .select(*group_cols, "var_kind", "value", "p", "n_init", "num_diff")
    )


def d_ladder(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    baseline: DataFrame,
    num_init: int = 100,
    num_update: int = 50,
    d_alpha: float = 0.05,
    alpha_z: float = 1.6448536269514722,
    num_d_bt: int = 30,
    d_bt_alpha: float = 0.05,
) -> DataFrame:
    """Discrete drift ladder (reference d_test :1845-1903 'Chi' mode +
    update_var_type :1337-1433 + the num_d_bt binomial ladder): values
    after the init sample are cut into consecutive chunks of
    ``num_update``; each full chunk is chi-square-tested against the
    baseline value probabilities (every baseline value contributes an
    expected count E = p·num_update, observed-but-unseen values flag the
    chunk as 'new value' instead — the reference's new-values branch); a
    chunk fails when it has new values or its chi² exceeds the d_alpha
    critical value (Wilson–Hilferty z > z_α, scipy-free and oracle-
    evaluable); the trailing ``num_d_bt`` chunk results alarm when the
    success count drops below bt_min_successes(num_d_bt, 1−d_alpha,
    d_bt_alpha) (reference :158).

    Documented deviation: the reference mutates the baseline inside the
    stream (learn mode expands the value set / re-weights probabilities);
    the batch form tests every chunk against the INIT baseline — the same
    fixed-model convention s_gof_ladder already uses.

    Only 'd'-classified groups are laddered. Returns group_cols + (chunk,
    chi2, dof, z, n_new, failed, n_fails, n_tests, alarm)."""
    base = baseline.filter(F.col("var_kind") == "d")
    v = F.col(value_col).cast("string")
    w_ord = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    chunked = (
        df.filter(v.isNotNull())
        .withColumn("_ern", F.row_number().over(w_ord))
        .filter(F.col("_ern") > num_init)
        .withColumn("chunk", F.floor((F.col("_ern") - num_init - 1) / num_update))
        .select(*group_cols, "chunk", v.alias("value"))
        .join(
            base.select(*group_cols).dropDuplicates(), list(group_cols), "left_semi"
        )
    )
    # observed counts per (group, chunk, value)
    obs_counts = chunked.groupBy(*group_cols, "chunk", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    full_chunks = (
        chunked.groupBy(*group_cols, "chunk")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= num_update)
    )
    # expected grid: every baseline value × every full chunk of its group,
    # left-joined with observed counts (unobserved -> 0); the join keys are
    # the group columns, so this is a co-partitioned hash join, never a cross
    grid = (
        base.select(*group_cols, "value", "p", "num_diff")
        .join(full_chunks.select(*group_cols, "chunk"), list(group_cols))
        .join(obs_counts, [*group_cols, "chunk", "value"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .withColumn("e", F.col("p") * F.lit(float(num_update)))
        .withColumn("term", (F.col("cnt") - F.col("e")) ** 2 / F.col("e"))
    )
    chi2 = grid.groupBy(*group_cols, "chunk").agg(
        F.sum("term").alias("chi2"),
        (F.first("num_diff") - F.lit(1)).cast("long").alias("dof"),
    )
    # observed values with no baseline row = the reference's new-value branch
    new_vals = (
        obs_counts.join(
            base.select(*group_cols, "value"), [*group_cols, "value"], "left_anti"
        )
        .groupBy(*group_cols, "chunk")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    k = F.col("dof").cast("double")
    z = (
        F.pow(F.col("chi2") / k, F.lit(1.0 / 3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * k))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * k))
    per_chunk = (
        chi2.join(new_vals, [*group_cols, "chunk"], "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
        .withColumn("z", z)
        .withColumn(
            "failed", (F.col("n_new") > 0) | (F.col("z") > F.lit(float(alpha_z)))
        )
    )
    bt = Window.partitionBy(*group_cols).orderBy("chunk").rowsBetween(
        -(num_d_bt - 1), 0
    )
    min_success = bt_min_successes(num_d_bt, 1.0 - d_alpha, d_bt_alpha)
    return (
        per_chunk.withColumn("n_fails", F.sum(F.col("failed").cast("int")).over(bt))
        .withColumn("n_tests", F.count(F.lit(1)).over(bt))
        .withColumn(
            "alarm",
            (F.col("n_tests") >= num_d_bt)
            & ((F.col("n_tests") - F.col("n_fails")) < min_success),
        )
    )
