"""Benchmark harness: runs the full query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Execution is forced with the noop sink (full pipeline runs distributed; nothing
collects to the driver). One warmup query amortizes session/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from templatedb_spark.session import EngineConfig, build_session
    from templatedb_spark.suite import all_specs

    # Size the initial shuffle-partition count to the input volume (~32 MB per
    # partition, the same granularity as files.maxPartitionBytes), clamped to
    # [8, cpus]. AQE coalesces post-shuffle partitions at runtime, but the
    # *initial* count still drives task-scheduling overhead — at sf0.1 (~60 MB)
    # 8 partitions is right; at cluster scale the cap is the core count times
    # whatever oversubscription the deployment wants.
    total_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).glob("*.parquet") if f.is_file()
    )
    parts = max(8, min(int(cpus), total_bytes // (32 << 20) or 8))
    spark = build_session(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(parts))
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: session + codegen + parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name, spec in all_specs().items():
        t0 = time.time()
        try:
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failing query records -1, never kills the bench
            print(f"BENCH ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
            times[name] = -1.0

    sf = sf_dir.rstrip("/").split("sf")[-1]
    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
