#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver-timed bench (bench.py is frozen); this one exists to
attribute time within each query:

- t_build  — wall seconds spent in fn(spark, sf_dir) itself: plan
             construction PLUS any eager driver-side work the query does
             (collects, localCheckpoints, corpus writes, ML fits).
- t_exec   — wall seconds for the noop-sink force of the returned frame.
- jobs     — Spark jobs launched during build+force (statusTracker delta):
             overhead-bound queries show up as dozens of tiny jobs.
- cpu_probe bracketing — the same xxhash64 probe bench.py uses, run before
             each query, so numbers can be normalized across host drift.

Usage:
  python bench_extra.py [query ...]          # default: all queries
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=...
  BENCH_EXTRA_REPEATS=n   (default 1)
  BENCH_EXTRA_PLANS_DIR=plans/r08 BENCH_EXTRA_PLAN_SUFFIX=_before
      also dump df.explain("formatted") per query.
  BENCH_EXTRA_OUT=path.json  (default /tmp/bench_extra.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))
PLANS_DIR = os.environ.get("BENCH_EXTRA_PLANS_DIR")
PLAN_SUFFIX = os.environ.get("BENCH_EXTRA_PLAN_SUFFIX", "")
OUT = os.environ.get("BENCH_EXTRA_OUT", "/tmp/bench_extra.json")


def main() -> None:
    from __spark_entry__ import queries
    from logdata_anomaly_miner_spark.session import get_spark

    spark = get_spark(
        app_name="lams-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker

    def n_jobs() -> int:
        ids = tracker().getJobIdsForGroup(None) or []
        # job ids are monotonically increasing; use max+1 as "jobs so far"
        return (max(ids) + 1) if ids else 0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup identical in spirit to bench.py
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
    import glob
    for p in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()

    def cpu_probe() -> float:
        t0 = time.time()
        spark.range(0, 10_000_000 * CPUS, 1, CPUS * 2).selectExpr(
            "sum(xxhash64(id, id+1, id+2)/1e9)"
        ).collect()
        return time.time() - t0

    cpu_probe()  # JIT the probe

    qitems = queries()
    only = sys.argv[1:]
    if only:
        qitems = {k: qitems[k] for k in only}

    results: dict[str, dict] = {}
    for name, fn in qitems.items():
        recs = []
        for rep in range(REPEATS):
            probe = cpu_probe()
            sc.setJobDescription(f"{name}: build")
            j0 = n_jobs()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            j1 = n_jobs()
            sc.setJobDescription(f"{name}: exec")
            force(df)
            t2 = time.time()
            j2 = n_jobs()
            sc.setJobDescription(None)
            recs.append(
                {
                    "probe": round(probe, 3),
                    "t_build": round(t1 - t0, 3),
                    "t_exec": round(t2 - t1, 3),
                    "t_total": round(t2 - t0, 3),
                    "jobs_build": j1 - j0,
                    "jobs_exec": j2 - j1,
                }
            )
            if rep == 0 and PLANS_DIR:
                os.makedirs(PLANS_DIR, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(PLANS_DIR, f"{name}{PLAN_SUFFIX}.txt"), "w"
                ) as fh:
                    fh.write(plan)
        results[name] = {
            "runs": recs,
            "t_total_min": min(r["t_total"] for r in recs),
        }
        print(json.dumps({"query": name, **results[name]["runs"][0],
                          "t_total_min": results[name]["t_total_min"]}),
              flush=True)

    with open(OUT, "w") as fh:
        json.dump(
            {"sf_dir": SF_DIR, "cpus": CPUS, "repeats": REPEATS, "results": results},
            fh, indent=1,
        )
    print(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
