"""Variable-correlation detection.

Re-expresses the testable core of VariableCorrelationDetector
(aminer/analysis/VariableCorrelationDetector.py:15-1642): find pairs of
categorical variables whose values co-occur far from independence, learn the
contingency baseline, and flag batches whose co-occurrence pattern breaks it.
The reference's hypothesis machinery (binomial homogeneity tests per value
pair) reduces batch-side to a chi-square independence statistic over the
contingency table — a pure groupBy/join program.

EventCorrelationDetector's A-implies-B-within-window rules
(aminer/analysis/EventCorrelationDetector.py:37-846) and
TimeCorrelationViolationDetector's CorrelationRule
(aminer/analysis/TimeCorrelationViolationDetector.py:24-364) share the
range-join core implemented here as ``implication_within``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contingency(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """(a, b, cnt) contingency table."""
    return df.groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def chi_square(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One-row chi² independence statistic: Σ (O−E)²/E with
    E = row_total·col_total/N. All joins are on the (small) marginal keys."""
    obs = contingency(df, col_a, col_b)
    ra = obs.groupBy("a").agg(F.sum("cnt").alias("ra"))
    rb = obs.groupBy("b").agg(F.sum("cnt").alias("rb"))
    n = obs.agg(F.sum("cnt").alias("n"))
    # the statistic needs EVERY (a, b) cell including unobserved ones
    # (O=0 still contributes E): cross the marginals, left-join observations
    cells = ra.crossJoin(F.broadcast(rb)).join(obs, ["a", "b"], "left").fillna(
        {"cnt": 0}
    )
    j = (
        cells.crossJoin(F.broadcast(n))
        .withColumn("e", F.col("ra") * F.col("rb") / F.col("n"))
        .withColumn("term", (F.col("cnt") - F.col("e")) ** 2 / F.col("e"))
    )
    dof = (
        (F.countDistinct("a") - 1) * (F.countDistinct("b") - 1)
    )
    return j.agg(F.sum("term").alias("chi2"), dof.alias("dof"))


def implication_within(
    df: DataFrame,
    antecedent: F.Column,
    consequent: F.Column,
    min_dt: float,
    max_dt: float,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A-implies-B-within-[min_dt, max_dt] violations: antecedent rows with
    NO consequent row in their forward time window (per optional key) — the
    reference's CorrelationRule check, expressed as a range join + anti-semi.
    At scale the range join benefits from bucketing ts (AQE handles skew)."""
    ts = F.col(ts_col).cast("double")
    a = df.filter(antecedent).select(
        *key_cols, ts.alias("ta"), *[c for c in df.columns if c not in key_cols and c != ts_col]
    )
    b = df.filter(consequent).select(*key_cols, ts.alias("tb"))
    cond = (F.col("tb") >= F.col("ta") + F.lit(min_dt)) & (
        F.col("tb") <= F.col("ta") + F.lit(max_dt)
    )
    for k in key_cols:
        cond = cond & (a[k] == b[k])
    return a.join(b, cond, "left_anti")
