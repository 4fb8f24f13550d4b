"""Isolated warm timing of named QuerySpecs: warm once, then N timed reps
(noop sink), reporting min/median — the paired-A/B measurement unit every
r10/r11 optimization claim uses (full-sweep numbers carry ±0.5-1 s ordering
noise; see OPTIMIZATION_r10.md "Methodology note").

Usage: python tools/iso_time.py name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
       ISO_REPS           (default 4)
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("ISO_REPS", "4"))

    from templatedb_spark.session import EngineConfig, build_session
    from templatedb_spark.suite import all_specs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    total_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).glob("*.parquet") if f.is_file()
    )
    parts = max(8, min(int(cpus), total_bytes // (32 << 20) or 8))
    spark = build_session(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(parts))
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    specs = all_specs()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        spec = specs[name]
        try:
            noop(spec.spark(spark, sf_dir))  # warm (page cache, codegen, memos)
        except Exception as e:
            print(f"warm ERR {name}: {e}")
            continue
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"iso:{name}")
            t0 = time.time()
            noop(spec.spark(spark, sf_dir))
            ts.append(time.time() - t0)
        print(
            f"{name:38s} min {min(ts):6.3f}  med {statistics.median(ts):6.3f}  "
            f"all {['%.3f' % t for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
