"""Dedup-family scale probe (VERDICT r6 #7): time the shingle/minhash/
containment family at a generated sf tier (sf3 = 30x the shipped bench
corpus: 150k docs) and report cold + warm wall per spec.

The family shares one cached hashed-shingle relation (operators/dedup.py),
so ordering matters: the first consumer pays the shingle build, later ones
reuse it — the same economics a suite run has. Cold = first execution in
the session (includes its share of the shared cache build), warm = second
execution (cache resident). Spark side only — the DuckDB oracle at this
tier is a separate question (the capped variants are the documented
at-scale path precisely because the UNCAPPED pair oracles go quadratic).

Usage: python tools/dedup_probe.py [sf_dir] [spec ...]   (one JSON line)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_SPECS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_capped",
    "dedup_ngram_prefix",
    "dedup_containment",
    "dedup_incremental",
    "dedup_cascade",
]


def main() -> int:
    from templatedb_spark.session import EngineConfig, build_session
    from templatedb_spark.suite import all_specs

    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "data/sf3"
    names = argv[1:] or DEFAULT_SPECS

    spark = build_session(EngineConfig(master="local[32]", shuffle_partitions=32))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # page-cache warm

    specs = all_specs()
    out: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        row: dict = {}
        for phase in ("cold", "warm"):
            t0 = time.time()
            try:
                spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
                row[phase] = round(time.time() - t0, 2)
            except Exception as e:
                row[phase] = -1.0
                row["err"] = f"{type(e).__name__}: {e}"[:200]
                break
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "specs": out}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
