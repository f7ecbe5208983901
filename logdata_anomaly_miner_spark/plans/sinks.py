"""Event/violation sinks.

Re-expresses the reference event-handler layer (semantics only):
- StreamPrinterEventHandler (aminer/events/StreamPrinterEventHandler.py:21-61)
  → operators/base.py format_event (golden text format).
- JsonConverterHandler (aminer/events/JsonConverterHandler.py:22-36) →
  ``to_json_events``: wraps each violation in the AnalysisComponent JSON
  envelope.
- KafkaEventHandler / ZmqEventHandler (aminer/events/KafkaEventHandler.py:
  21-37) → ``write_kafka``: the JSON column is writeStream-able to the kafka
  sink (format left to deploy config; no broker in this sandbox).
- MatchValueStreamWriter (aminer/analysis/MatchValueStreamWriter.py:21-104)
  → ``write_csv_projection``: select paths, write CSV.
- ScoringEventHandler (aminer/events/ScoringEventHandler.py:24-48) →
  ``score_events``: attach confidence weights to violation values.
- VolatileLogarithmicBackoffEventHistory (aminer/events/Utils.py:19-48) →
  the violations table itself is the (unbounded, queryable) history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_json_events(violations: DataFrame, analysis_id: str = "None") -> DataFrame:
    """Violation rows -> JSON envelope column `event_json` mirroring the
    reference's {"AnalysisComponent": {...}} structure."""
    envelope = F.struct(
        F.struct(
            F.col("detector").alias("AnalysisComponentType"),
            F.lit(analysis_id).alias("AnalysisComponentName"),
            F.col("message").alias("Message"),
            F.array(F.col("value")).alias("AffectedLogAtomValues"),
        ).alias("AnalysisComponent")
    )
    return violations.withColumn("event_json", F.to_json(envelope))


def write_csv_projection(
    df: DataFrame, cols: Sequence[str], path: str, sep: str = ";"
) -> None:
    """MatchValueStreamWriter analog: project selected paths to CSV."""
    df.select(*cols).write.mode("overwrite").option("sep", sep).csv(path)


def write_kafka(json_df: DataFrame, bootstrap: str, topic: str):
    """Violations JSON -> Kafka (streaming); returns the started query.
    (KafkaEventHandler analog; requires a broker + the kafka connector.)"""
    return (
        json_df.selectExpr("CAST(event_json AS STRING) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .start()
    )


def score_events(
    violations: DataFrame, weights: dict[str, float], default: float = 0.5
) -> DataFrame:
    """ScoringEventHandler analog: attach a confidence score per detector."""
    expr: Column = F.lit(default)
    for detector, w in weights.items():
        expr = F.when(F.col("detector") == detector, F.lit(w)).otherwise(expr)
    return violations.withColumn("confidence", expr)
