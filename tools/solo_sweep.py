"""Warm solo sweep: time every QuerySpec one-at-a-time in a warm session.

Methodology matches bench.py's solo-warm audit (same session config, noop
sink, warmup pass first) but covers the WHOLE registry — the per-operator
measurement base for optimization rounds. Not an official artifact; writes
bench_results/solo_sweep_<tag>.json.

Usage: python tools/solo_sweep.py TAG [SF_DIR] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]

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
    if only:
        specs = {n: specs[n] for n in only}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: one full pass (concurrent to keep it quick), untimed
    def warm_one(item) -> None:
        try:
            noop(item[1].spark(spark, sf_dir))
        except Exception:
            pass

    with ThreadPoolExecutor(max_workers=16) as pool:
        list(pool.map(warm_one, specs.items()))

    times: dict[str, float] = {}
    for name, spec in specs.items():
        spark.sparkContext.setJobDescription(f"solo:{name}")
        t0 = time.time()
        try:
            noop(spec.spark(spark, sf_dir))
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
        print(f"{times[name]:8.3f}  {name}", flush=True)

    out = Path(__file__).resolve().parents[1] / "bench_results" / f"solo_sweep_{tag}.json"
    out.write_text(
        json.dumps(
            {
                "tag": tag,
                "sf_dir": sf_dir,
                "total": round(sum(v for v in times.values() if v > 0), 3),
                "times": times,
            },
            indent=2,
        )
        + "\n"
    )
    print(f"TOTAL {sum(v for v in times.values() if v > 0):.1f}s -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
