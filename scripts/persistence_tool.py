#!/usr/bin/env python
"""Baseline/persistence admin CLI (aminer-persistence.py analog,
reference: source/root/usr/lib/logdata-anomaly-miner/aminer-persistence.py).

  python scripts/persistence_tool.py manifest <manifest_dir>
      list checkpoint commits (snapshot, partition, rows, violations, wall)
  python scripts/persistence_tool.py export-ranges <ranges_parquet> <out.json>
      export a learned ranges baseline in the REFERENCE persistence JSON
      encoding (type-prefixed, byte-compatible with AMiner's files)
  python scripts/persistence_tool.py import-ranges <in.json> <out_parquet>
      import a reference persistence file as a ranges baseline table
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cmd = sys.argv[1]

    from logdata_anomaly_miner_spark.session import get_spark

    spark = get_spark(app_name="lams-persistence", master="local[2]", shuffle_partitions=2)

    if cmd == "manifest":
        from logdata_anomaly_miner_spark.plans.checkpoint import CheckpointManifest

        m = CheckpointManifest(spark, sys.argv[2]).read()
        for r in m.orderBy("snapshot_id", "partition").collect():
            print(
                f"snapshot={r['snapshot_id']} partition={r['partition']} "
                f"status={r['status']} rows={r['rows_scanned']} "
                f"violations={r['violations']} wall={r['wall_time_s']:.2f}s"
            )
        return 0

    if cmd == "export-ranges":
        from logdata_anomaly_miner_spark.plans.persistence import (
            write_ranges_reference_json,
        )

        ranges = spark.read.parquet(sys.argv[2])
        id_cols = [c for c in ranges.columns if c not in ("min", "max")]
        # streamed partition-at-a-time writer: driver memory stays bounded
        # even when the learned baseline has millions of keys
        write_ranges_reference_json(ranges, id_cols, sys.argv[3])
        print(f"wrote {sys.argv[3]}")
        return 0

    if cmd == "import-ranges":
        from logdata_anomaly_miner_spark.plans.persistence import (
            ranges_from_reference_json,
        )

        df = ranges_from_reference_json(spark, open(sys.argv[2]).read())
        df.write.mode("overwrite").parquet(sys.argv[3])
        print(f"wrote {sys.argv[3]} ({df.count()} groups)")
        return 0

    print(f"unknown command {cmd}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
