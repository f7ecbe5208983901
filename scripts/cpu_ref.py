#!/usr/bin/env python
"""CPU-bound reference job for scaling measurements: sum(xxhash64) over
3e9 rows — pure whole-stage-codegen arithmetic, no shuffle, no Python.
Prints elapsed seconds. Usage: python scripts/cpu_ref.py <threads>."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from logdata_anomaly_miner_spark.session import get_spark  # noqa: E402

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.range(10_000_000).selectExpr("sum(xxhash64(id)/1e9)").collect()  # warmup
t0 = time.time()
spark.range(0, 3_000_000_000, 1, cpus * 2).selectExpr(
    "sum(xxhash64(id, id+1, id+2)/1e9)"
).collect()
print(round(time.time() - t0, 2))
