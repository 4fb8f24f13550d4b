"""SparkSession factory tuned for the engine.

The reference executes single-node, single-thread-per-query over 1024-row Arrow
batches (reference: src/query_engine/src/executor/mod.rs:34, storage/csv.rs:100-108).
Spark replaces that with a distributed, spill-capable, whole-stage-codegen engine;
this module centralizes the configuration we want everywhere:

- **AQE on** (runtime re-plan, skew-join splitting, partition coalescing) — at 100 TB
  the static plan is never right; AQE fixes partition counts and skew at runtime.
- **Arrow on** for any pandas interchange (the slow path; we stay JVM-side whenever
  the built-in functions can express the semantics).
- **Shuffle partitions** default to the local core count for tests; a real cluster
  deployment overrides via `EngineConfig(shuffle_partitions=...)` — with AQE coalescing
  enabled the initial number only needs to be an upper bound.
- **Broadcast threshold** left at default 10 MB; dimension tables (region/nation/
  supplier/part at TPC-H shape) broadcast automatically, and operators that *know*
  a side is dimension-sized hint `broadcast()` explicitly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class EngineConfig:
    """Engine-level Spark configuration. Defaults target local[] testing;
    every knob scales to a cluster by overriding, not by code changes."""

    master: str | None = None  # None → respect existing session / spark-submit
    app_name: str = "templatedb-spark"
    shuffle_partitions: int = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ui_enabled: bool = False
    # local[N] runs driver AND all executor threads in ONE JVM whose heap
    # defaults to 1g — under 16-way concurrent query submission that
    # intermittently OOMs (measured: java.lang.OutOfMemoryError cascades into a
    # dead py4j gateway and ConnectionRefused for every in-flight query; the
    # round-2 bench lost 1-4 queries per run this way). Counter-intuitively,
    # BIG heaps are far worse than small ones here: the concurrent suite
    # makespan at sf0.1/local[32] measured 9.1 s @ 4g, 9.9 s @ 2g, 10.5 s @ 8g,
    # ~14 s @ 1g (with one OOM), 215 s @ 30g, 170 s @ 64g — a large G1 heap
    # lets the 32-thread allocation churn spread over tens of GB of freshly
    # page-faulted memory instead of recycling cache-hot pages. 4g is the
    # measured sweet spot; on a real cluster this maps to executor.memory.
    driver_memory: str = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
    extra: dict[str, str] = field(default_factory=dict)

    def builder(self) -> SparkSession.Builder:
        b = SparkSession.builder.appName(self.app_name)
        if self.master:
            b = b.master(self.master)
        conf = {
            # AQE: runtime partition coalescing + skew-join handling. At 100 TB the
            # right shuffle partition count differs per stage; AQE picks it.
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            # Arrow for the pandas-UDF slow path (vectorized batch transfer).
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            # ANSI off: the reference's v1 engine is permissive (arrow kernels);
            # strictness shims live in the binder layer (engine.py), not execution.
            "spark.sql.ansi.enabled": "false",
            "spark.ui.enabled": str(self.ui_enabled).lower(),
            # Parquet scans: pushdown + vectorized reader are on by default; pin
            # them so a misconfigured environment can't silently disable them.
            "spark.sql.parquet.filterPushdown": "true",
            "spark.sql.parquet.enableVectorizedReader": "true",
            # Applied only at JVM launch (getOrCreate on an existing session
            # keeps the old heap — the bench builds its session first).
            "spark.driver.memory": self.driver_memory,
        }
        conf.update(self.extra)
        for k, v in conf.items():
            b = b.config(k, v)
        return b


def build_session(config: EngineConfig | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    config = config or EngineConfig(
        master=os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    )
    return config.builder().getOrCreate()
