"""PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the query/data-processing capabilities of
``ernstleierzopf/logdata-anomaly-miner`` (AMiner) as declarative, set-oriented
Spark DataFrame programs: per-column stats, uniqueness, referential integrity,
distribution drift, and the AMiner detector family (new-value novelty, value
ranges, char-bigram entropy, windowed event frequency, sequences, charsets,
...) over tables of interleaved text+media documents

    documents(doc_id: string,
              ts: double,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Design notes (Spark-first, not a port):
- Everything is a DataFrame transformation; Catalyst handles pushdown,
  pruning, join strategy, AQE skew handling. No per-row Python in hot paths;
  the only Python UDFs are vectorized pandas/Arrow UDFs (entropy scoring,
  count-vector distance).
- Detector state ("baselines") are small DataFrames/tables merged with
  set-oriented ops (union/dropDuplicates, groupBy min/max, groupBy count).
- Batch semantics: violations are computed against the *pre-batch* baseline
  with first-occurrence ordering defined as (ts, doc_id) within the batch,
  reproducing AMiner's sequential check-then-learn interleaving on the
  reference unit-test fixtures (see tests/).
"""

__version__ = "0.1.0"
