"""Match-rule DSL → Column predicates.

Re-expresses the aminer/analysis/Rules.py hierarchy (and the filters built
on it) as composable Column expressions — the idiomatic Spark form: a rule
IS a boolean Column, combinators are &, |, ~, and Catalyst pushes the
resulting predicate into the scan.

| Reference rule                              | Here |
|---|---|
| AndMatchRule / OrMatchRule / NegationMatchRule (Rules.py:130,177,350) | and_ / or_ / not_ |
| PathExistsMatchRule (Rules.py:379)          | path_exists |
| ValueMatchRule / ValueListMatchRule (:412,461) | value_match / value_in |
| ValueRangeMatchRule (:505)                  | value_range |
| StringRegexMatchRule (:556)                 | string_regex |
| ModuloTimeMatchRule (:596)                  | modulo_time |
| IPv4InRFC1918MatchRule (:797)               | ipv4_in_rfc1918 |
| MatchFilter (MatchFilter.py:22-83)          | match_filter |
| AllowlistViolationDetector (AllowlistViolationDetector.py:22-82) | allowlist_violations |
| ParallelMatchRule (:224)                    | plain | — all branches are Columns, nothing short-circuits |
| ValueDependentDelegatedMatchRule (:277)     | delegated |
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def and_(*rules: Column) -> Column:
    if not rules:
        raise ValueError("and_ needs at least one rule")
    out = rules[0]
    for r in rules[1:]:
        out = out & r
    return out


def or_(*rules: Column) -> Column:
    if not rules:
        raise ValueError("or_ needs at least one rule")
    out = rules[0]
    for r in rules[1:]:
        out = out | r
    return out


def not_(rule: Column) -> Column:
    return ~rule


def path_exists(col: str) -> Column:
    return F.col(col).isNotNull()


def value_match(col: str, value) -> Column:
    return F.col(col) == F.lit(value)


def value_in(col: str, values: Sequence) -> Column:
    return F.col(col).isin(*values)


def value_range(col: str, lower, upper) -> Column:
    return F.col(col).between(lower, upper)


def string_regex(col: str, pattern: str) -> Column:
    return F.col(col).rlike(pattern)


def modulo_time(
    ts_col: str, lower: float, upper: float, modulo: float = 86400.0
) -> Column:
    """Time-of-day band predicate (Rules.py:596): lower <= ts % modulo <= upper."""
    return F.pmod(F.col(ts_col).cast("double"), F.lit(modulo)).between(lower, upper)


def ipv4_in_rfc1918(packed_col: str) -> Column:
    """Private-IPv4 predicate on the packed-int representation
    (IpAddressDataModelElement packs to int; Rules.py:797)."""
    ip = F.col(packed_col).cast("long")
    return (
        (ip.bitwiseAND(F.lit(0xFF000000)) == 0x0A000000)        # 10.0.0.0/8
        | (ip.bitwiseAND(F.lit(0xFFF00000)) == 0xAC100000)      # 172.16.0.0/12
        | (ip.bitwiseAND(F.lit(0xFFFF0000)) == 0xC0A80000)      # 192.168.0.0/16
    )


def delegated(key_col: str, rules: dict, default: Column | None = None) -> Column:
    """ValueDependentDelegatedMatchRule: pick the rule by the key value."""
    out = default if default is not None else F.lit(False)
    for k, rule in rules.items():
        out = F.when(F.col(key_col) == F.lit(k), rule).otherwise(out)
    return out


def match_filter(df: DataFrame, rule: Column) -> DataFrame:
    """MatchFilter: every row matching the rule is an event."""
    return df.filter(rule)


def allowlist_violations(df: DataFrame, allow_rules: Sequence[Column]) -> DataFrame:
    """AllowlistViolationDetector: rows matching NO allowlist rule."""
    return df.filter(~or_(*allow_rules))
