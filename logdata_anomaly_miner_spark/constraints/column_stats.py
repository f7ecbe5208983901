"""Per-column statistics collector.

AMiner analog: EventTypeDetector's per-variable value accumulation
(aminer/analysis/EventTypeDetector.py:25-293) and HistogramAnalysis
(aminer/analysis/HistogramAnalysis.py:79-623); extended per the north star
with null rate, distinct counts (exact or HyperLogLog), min/max, and
approximate quantiles.

Scale shape: ONE aggregation pass over the table produces every column's
stats (map-side combinable, one shuffled row), then the single result row is
exploded into one row per column. With ``exact_distinct=True`` Spark plans an
Expand (input ×|columns|) to satisfy multiple count-distincts — fine at test
scale; at 10^12 rows use ``exact_distinct=False`` (HyperLogLog
approx_count_distinct, default rsd 5%) which keeps partial aggregation and a
single pass with no expand.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float")


def column_stats(
    df: DataFrame,
    columns: Sequence[str],
    exact_distinct: bool = True,
    rsd: float = 0.05,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """One output row per column: (column, n_rows, null_rate, n_distinct,
    min, max, quantiles). min/max/quantiles are null for non-numeric cols."""
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        col = F.col(c)
        is_num = dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
        num = col.cast("double") if is_num else F.lit(None).cast("double")
        aggs += [
            F.round(F.avg(col.isNull().cast("double")), 9).alias(f"_null_{c}"),
            (
                F.countDistinct(col) if exact_distinct else F.approx_count_distinct(col, rsd)
            ).alias(f"_nd_{c}"),
            F.min(num).alias(f"_min_{c}"),
            F.max(num).alias(f"_max_{c}"),
            (
                F.percentile_approx(num, list(quantiles), 10000)
                if is_num
                else F.lit(None).cast("array<double>")
            ).alias(f"_q_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("null_rate"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min"),
                F.col(f"_max_{c}").alias("max"),
                F.col(f"_q_{c}").alias("quantiles"),
            )
            for c in columns
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select("s.*")


def partition_distinct_sketches(
    df: DataFrame,
    part_col: str,
    columns: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-partition MERGEABLE HyperLogLog sketches (Apache DataSketches via
    hll_sketch_agg) — the north-star incremental-stats shape at 10^12 rows:
    each ingest appends one sketch row per new partition; global or
    any-partition-subset distinct counts then come from merging the (tiny)
    sketch table with hll_union_agg, never re-scanning the data. Values are
    canonicalized to strings (bijective for the supported types)."""
    aggs = [
        F.hll_sketch_agg(F.col(c).cast("string"), F.lit(int(lg_k))).alias(f"sk_{c}")
        for c in columns
    ]
    return df.groupBy(part_col).agg(*aggs)


def merged_distinct_counts(
    sketches: DataFrame, columns: Sequence[str]
) -> DataFrame:
    """One row of global distinct-count estimates from a sketch table
    (hll_union_agg + hll_sketch_estimate) — O(|partitions|) work."""
    aggs = [
        F.hll_sketch_estimate(F.hll_union_agg(F.col(f"sk_{c}"))).alias(f"nd_{c}")
        for c in columns
    ]
    return sketches.agg(*aggs)
