#!/usr/bin/env python
"""Benchmark harness.

Runs (a) every queries() entry from __spark_entry__.py against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and (b) the full
constraint-validation suite over a synthesized interleaved-span documents
table, on local[$SPARK_GRAFT_CPUS].

OUTPUT CONTRACT (round 7, VERDICT r6 item 1): the LAST stdout line is a
COMPACT headline JSON (metric/value/unit/sf/cpus/suite_docs_per_sec/
suite_metrics/cpu_ref — well under 1,500 chars, so the driver's 2,000-char
tail capture always parses it). Full per-query raw+normalized detail goes
to $SPARK_GRAFT_DETAIL_PATH (default BENCH/detail_r07.json), NOT stdout.

NORMALIZATION (round 7, VERDICT r6 item 2): the host is a burstable VM
whose CPU speed drifts up to ~3x WITHIN the query section (r6 probes:
fresh 1.02 / pre 2.91 / post 0.97 s), so a single mean slowdown factor
mis-attributes drift to individual queries. A short cpu_ref probe is now
interleaved every PROBE_EVERY queries and each segment is normalized by
its own bracketing probes:  norm = raw * fresh / mean(probe_before,
probe_after).  An untimed warm scan of every sf table precedes the first
timed query so the first segment doesn't absorb the first-scan cost.

Execution is forced with the noop sink (full computation, no driver
materialization). Scaling evidence (local[N] vs local[4N]) is produced by
scripts/rested_pair.sh into BENCH/NOTES.md + BASELINE.md.
"""

from __future__ import annotations

import glob
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
PROBE_EVERY = int(os.environ.get("SPARK_GRAFT_PROBE_EVERY", "10"))
DETAIL_PATH = os.environ.get(
    "SPARK_GRAFT_DETAIL_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "detail_r07.json"),
)


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

    # Warmup outside any timed segment. With the suite FIRST (round-5
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
    # Probe host CPU speed fresh (after warmup, before any timed work).
    # The first full-size probe is discarded (JVM tiered compilation), and
    # fresh = MIN of the next three: after a long idle the burstable host
    # ramps frequency over several seconds, so a single post-discard probe
    # can read ~1.8x high (observed 1.47 s vs a stable 0.8 s tail, r7) and
    # would inflate every normalized figure by that factor. The minimum is
    # the right anchor — it estimates the host's attainable speed, which
    # is what "normalized to fresh-host speed" means.
    cpu_probe()
    probe_fresh = min(cpu_probe() for _ in range(3))
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

    probes: list[float] = []
    seg_index: dict[str, int] = {}  # query name -> segment number
    queries_normalized: dict[str, float] | None = None
    if MODE in ("all", "queries"):
        # Untimed warm scan of every sf table: pulls pages into the OS
        # cache and pays parquet footer reads OUTSIDE the first timed
        # query (r6's first timed queries absorbed the sf first-scan and
        # read as phantom regressions).
        for p in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()

        qitems = list(queries().items())
        probes.append(cpu_probe())
        for i, (name, fn) in enumerate(qitems):
            if i > 0 and i % PROBE_EVERY == 0:
                probes.append(cpu_probe())
            seg_index[name] = len(probes) - 1
            t0 = time.time()
            force(fn(spark, SF_DIR))
            timings[name] = round(time.time() - t0, 3)
        probes.append(cpu_probe())
        # Piecewise normalization: each query is rescaled to fresh-host
        # speed using the mean of ITS OWN segment's bracketing probes.
        queries_normalized = {}
        for name in seg_index:
            s = seg_index[name]
            bracket = (probes[s] + probes[s + 1]) / 2.0
            queries_normalized[name] = round(
                timings[name] * probe_fresh / bracket, 3
            )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    slowdown = (
        round((sum(probes) / len(probes)) / probe_fresh, 3) if probes else None
    )
    cpu_ref = {
        "fresh_s": round(probe_fresh, 3),
        "probes_s": [round(p, 3) for p in probes],
        "mean_slowdown": slowdown,
    }
    detail = {
        "metric": "per-query wall seconds @ sf + validation suite "
                  f"on {SUITE_DOCS} synthetic interleaved-span documents",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "suite_docs": SUITE_DOCS,
        "queries": timings,
        "queries_normalized": queries_normalized,
        "probe_every": PROBE_EVERY,
        "query_segment": seg_index,
        "cpu_ref": cpu_ref,
        "suite_metrics": res.metrics if res else None,
    }
    detail_dir = os.path.dirname(DETAIL_PATH)
    if detail_dir:
        os.makedirs(detail_dir, exist_ok=True)
    with open(DETAIL_PATH, "w") as fh:
        json.dump(detail, fh, indent=1)
    headline = {
        "metric": "total wall time: all engine queries @ sf + full validation "
                  f"suite on {SUITE_DOCS} synthetic interleaved-span documents",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": detail["sf"],
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
        "queries_total_normalized": (
            round(sum(queries_normalized.values()), 3)
            if queries_normalized
            else None
        ),
        "suite_metrics": res.metrics if res else None,
        "cpu_ref": cpu_ref,
        "detail": os.path.relpath(
            DETAIL_PATH, os.path.dirname(os.path.abspath(__file__))
        ),
    }
    line = json.dumps(headline)
    # Hard guarantee for the driver's 2,000-char tail capture: if the
    # headline ever grows past 1,500 chars, shed the optional fields
    # rather than lose metric/value off the front of the window.
    if len(line) > 1500:
        for k in ("cpu_ref", "suite_metrics", "queries_total_normalized"):
            headline.pop(k, None)
            line = json.dumps(headline)
            if len(line) <= 1500:
                break
    print(line)


if __name__ == "__main__":
    main()
