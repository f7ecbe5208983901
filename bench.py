#!/usr/bin/env python
"""Benchmark harness.

Runs (a) every queries() entry from __spark_entry__.py against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and (b) the full
constraint-validation suite over a synthesized interleaved-span documents
table, on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "suite_docs_per_sec": ...}

Execution is forced with the noop sink (full computation, no driver
materialization). Scaling evidence (local[8] vs local[32]) is produced by
scripts/run_bench.sh into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 1M docs by default: at 100k the suite's fixed costs (job setup, python
# worker spawn, broadcast builds) dominate and docs/sec reads ~5x below the
# steady-state throughput the 4M-doc scaling runs measure.
SUITE_DOCS = int(os.environ.get("SPARK_GRAFT_SUITE_DOCS", "1000000"))
# all | queries | suite — the scaling harness uses `suite` so the measured
# segment is the compute-bound validation workload, not 21 fixed job setups
MODE = os.environ.get("SPARK_GRAFT_BENCH_MODE", "all")


def main() -> None:
    from __spark_entry__ import queries
    from logdata_anomaly_miner_spark.constraints.suite import SuiteConfig, run_suite
    from logdata_anomaly_miner_spark.datagen import gen_documents, gen_media
    from logdata_anomaly_miner_spark.session import get_spark

    spark = get_spark(
        app_name="lams-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warmup outside any timed segment. With the suite now FIRST (round-5
    # ordering rule), process bring-up that the 50 queries used to absorb
    # would land inside the suite's timing — warm each path explicitly:
    # codegen'd agg, shuffle, broadcast join, parquet scan, and the
    # pandas-UDF python-worker pool (spawn cost is per-executor-thread).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F
    warm = spark.range(2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )
    warm.groupBy("k").agg(F.sum("v").alias("s")).join(
        F.broadcast(warm.limit(7).select("k").dropDuplicates()), "k"
    ).collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wu(s):
        return s * 2.0

    warm.repartition(CPUS).select(_wu("v")).write.format("noop").mode(
        "overwrite"
    ).save()

    def cpu_probe() -> float:
        # Inline cpu_ref (scripts/cpu_ref.py scaled to ~1.5 s): pure
        # whole-stage-codegen arithmetic, no shuffle, no Python — measures
        # the host's instantaneous CPU speed, not the engine. Row count
        # scales with CPUS so probe wall time is parallelism-invariant.
        # The tiny prefix run compiles the probe's codegen so the FIRST
        # real probe is not inflated by its own JIT (measured: +25%).
        spark.range(0, 1_000_000, 1, CPUS).selectExpr(
            "sum(xxhash64(id, id+1, id+2)/1e9)"
        ).collect()
        t0 = time.time()
        spark.range(0, 40_000_000 * CPUS, 1, CPUS * 2).selectExpr(
            "sum(xxhash64(id, id+1, id+2)/1e9)"
        ).collect()
        return time.time() - t0

    timings: dict[str, float] = {}
    suite_wall = None
    res = None
    # NORMALIZATION RULE (round 6, BENCH/NOTES.md): probe host CPU speed
    # fresh (after warmup, before any timed work), then again before and
    # after the query section. queries_normalized rescales each raw query
    # second to fresh-host speed — raw * fresh / mean(bracket probes) — so
    # a burst-credit drain between rounds shows up as slowdown_factor, not
    # as a phantom per-query regression. The first full-size probe is
    # discarded: JVM tiered compilation of the probe's codegen class plus
    # host frequency ramp inflate it ~25% (measured 1.00/0.74/0.70/0.66 s
    # over four consecutive probes); one discard leaves a ~5% residual
    # drift floor, far below the 10-30% drained-credit effect being
    # corrected (BENCH/NOTES.md round 6).
    cpu_probe()
    probe_fresh = cpu_probe()
    # ORDERING RULE (round 5, BENCH/NOTES.md): the headline validation
    # suite runs FIRST, on fresh burst credits, so its docs/sec is
    # comparable round-over-round; the 50 engine queries follow. Round 4's
    # suite number was measured LAST after ~92 s of queries and read 51%
    # high on drained credits with zero code change.
    if MODE in ("all", "suite"):
        # Headline workload: validate a parquet-backed documents table (the
        # realistic input shape — a table scan, not an in-flight generator).
        # Materialization of the synthetic table is setup, not measured.
        docs_path = os.environ.get(
            "SPARK_GRAFT_DOCS_PATH", f"/dev/shm/bench_docs_{SUITE_DOCS}.parquet"
        )
        # _SUCCESS guards against benchmarking a PARTIAL table left by a
        # crashed generation run (isdir alone would silently accept it)
        if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
            gen_documents(
                spark, n_docs=SUITE_DOCS, dup_rate=0.001, dangling_rate=0.02,
                n_partitions=128,
            ).write.mode("overwrite").parquet(docs_path)
        media = gen_media(spark, 1000)
        t0 = time.time()
        docs = spark.read.parquet(docs_path)
        # persist=False for parquet-backed input: the cache build is
        # memory-bandwidth-bound and does not scale with cores, while the
        # pruned columnar re-scan does (measured: 8->32 speedup 1.26x
        # without the cache vs 1.01x with it, same input).
        res = run_suite(
            spark, docs, media, SuiteConfig(entropy_prob_thresh=0.0001),
            persist=False,
        )
        force(res.verdicts)
        suite_wall = time.time() - t0
        timings["validation_suite"] = round(suite_wall, 3)

    probe_pre = probe_post = None
    if MODE in ("all", "queries"):
        probe_pre = cpu_probe()
        for name, fn in queries().items():
            t0 = time.time()
            force(fn(spark, SF_DIR))
            timings[name] = round(time.time() - t0, 3)
        probe_post = cpu_probe()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    slowdown = None
    queries_normalized = None
    if probe_pre is not None and probe_post is not None:
        bracket = (probe_pre + probe_post) / 2.0
        slowdown = round(bracket / probe_fresh, 3)
        queries_normalized = {
            k: round(v / slowdown, 3)
            for k, v in timings.items()
            if k != "validation_suite"
        }
    out = {
        "metric": "total wall time: all engine queries @ sf + full validation suite "
                  f"on {SUITE_DOCS} synthetic interleaved-span documents",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "suite_docs": SUITE_DOCS,
        "suite_docs_per_sec": (
            # divide by the rows the suite ACTUALLY scanned (equals
            # SUITE_DOCS on healthy runs) so a short table can never
            # inflate the headline metric
            round((res.metrics.get("rows_scanned") or SUITE_DOCS) / suite_wall, 1)
            if suite_wall
            else None
        ),
        "suite_metrics": res.metrics if res else None,
        "cpu_ref": {
            "fresh_s": round(probe_fresh, 3),
            "pre_queries_s": round(probe_pre, 3) if probe_pre else None,
            "post_queries_s": round(probe_post, 3) if probe_post else None,
            "slowdown_factor": slowdown,
        },
        "queries_normalized": queries_normalized,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
