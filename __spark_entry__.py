"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the full constraint-validation pipeline (event
               frequency bands, a real detector end-to-end) on sf0.001.
queries()    — one entry per implemented operator (SURVEY.md §2), each
               (spark, sf_dir) -> DataFrame.
oracle_sql() — matching DuckDB SQL per query (same column names/types).

Implementation lives in logdata_anomaly_miner_spark.engine_queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from logdata_anomaly_miner_spark.engine_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["freq_bands"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
