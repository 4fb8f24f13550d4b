"""Engine-only timing probe: run named specs' SPARK side (noop sink, no
DuckDB oracle) warm at one or more sf dirs and print a JSON line per dir —
the cost-curve evidence for SCALE.md at tiers where running the SQL oracle
is beside the point (the differential equivalence is already established at
sf0.01/sf1/sf3; this measures how the ENGINE's cost grows).

Usage: python tools/engine_probe.py SF_DIR [SF_DIR ...] -- SPEC [SPEC ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    argv = sys.argv[1:]
    if "--" not in argv:
        print(__doc__)
        return 2
    cut = argv.index("--")
    dirs, names = argv[:cut], argv[cut + 1 :]

    from templatedb_spark.session import EngineConfig, build_session
    from templatedb_spark.suite import all_specs

    spark = build_session(EngineConfig(master="local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    specs = all_specs()
    for d in dirs:
        out = {}
        for name in names:
            spec = specs[name]
            try:
                spec.spark(spark, d).write.format("noop").mode("overwrite").save()  # warm
                t0 = time.time()
                spec.spark(spark, d).write.format("noop").mode("overwrite").save()
                out[name] = round(time.time() - t0, 2)
            except Exception as e:
                out[name] = f"ERR {type(e).__name__}"
        print(json.dumps({"sf_dir": d, "warm_sec": out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
