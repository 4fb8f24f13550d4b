"""Measure the DuckDB baseline: run every oracle SQL at a given sf dir
(default sf0.1), 1 warmup + 3 timed runs, median. Writes JSON to stdout.
This anchors the BENCH-vs-BASELINE gate (see BASELINE.md: the reference
publishes no numbers, so DuckDB on the same data is the recorded baseline).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import duckdb

    from templatedb_spark.catalog import SF_TABLES
    from templatedb_spark.suite import all_specs

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in SF_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    out: dict[str, float] = {}
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        try:
            con.sql(spec.oracle).fetchall()  # warmup
            runs = []
            for _ in range(3):
                t0 = time.time()
                con.sql(spec.oracle).fetchall()
                runs.append(time.time() - t0)
            out[name] = round(statistics.median(runs), 3)
        except Exception as e:
            print(f"BASELINE ERROR {name}: {e}", file=sys.stderr)
            out[name] = -1.0

    total = round(sum(v for v in out.values() if v >= 0), 3)
    print(json.dumps({"baseline": "duckdb", "sf_dir": sf_dir, "total_sec": total, "queries": out}))


if __name__ == "__main__":
    main()
