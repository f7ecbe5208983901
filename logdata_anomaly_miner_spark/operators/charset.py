"""Character-set detector.

Re-expresses CharsetDetector (aminer/analysis/CharsetDetector.py:27-241;
check :126-133, learn :155-162): per id group, the set of characters ever
seen in the value; characters outside the learned set are anomalies.

Spark shape: explode characters (regexp_extract_all '.') → distinct →
left_anti vs baseline. One narrow shuffle of |distinct (group, char)| rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chars(df: DataFrame, value_col: str, group_cols: Sequence[str]) -> DataFrame:
    return df.select(
        *group_cols,
        # (?s): dot must also match line terminators — the reference
        # iterates every byte, so \n/\r in a value are characters too
        F.explode(F.regexp_extract_all(F.col(value_col), F.lit("(?s)."), 0)).alias("ch"),
    ).dropDuplicates()


def learn_charsets(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Baseline = distinct (group..., ch)."""
    return _chars(df, value_col, group_cols)


def check_charset(
    df: DataFrame,
    value_col: str,
    baseline: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Distinct new (group, char) combos not in the learned charset."""
    return _chars(df, value_col, group_cols).join(
        baseline, on=[*group_cols, "ch"], how="left_anti"
    )
