"""Task-retry chaos: a partition fails its first attempt mid-query; Spark's
retry machinery re-runs it and the result is identical — the determinism
contract every operator in this repo is built to satisfy (deterministic
sources, pure expressions, retry-safe sinks). The reference's single-process
executor has no retry concept at all; at 1000 executors, retries are routine.

Runs in a subprocess because task retries need `local[N, maxFailures]`, and
the shared test session is created with the default fail-fast local master.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import os
import sys
sys.path.insert(0, "/root/repo")
marker = sys.argv[1]
from pyspark import TaskContext
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4, 3]")  # up to 3 attempts per task
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("FATAL")

df = spark.range(0, 10000, 1, 4)  # deterministic source, 4 partitions

def chaos(it):
    ctx = TaskContext.get()
    if ctx.partitionId() == 2 and ctx.attemptNumber() == 0:
        with open(marker, "w") as f:
            f.write("attempt-0 failed")
        raise RuntimeError("chaos: injected first-attempt failure")
    for pdf in it:
        pdf["id2"] = pdf["id"] * 2
        yield pdf

out = df.mapInPandas(chaos, "id long, id2 long").groupBy().sum("id", "id2").collect()[0]
expected = (9999 * 10000) // 2
assert out["sum(id)"] == expected, out
assert out["sum(id2)"] == 2 * expected, out
print("RETRY_OK", out["sum(id)"], out["sum(id2)"])
"""


def test_injected_task_failure_retries_to_correct_result(tmp_path):
    marker = str(tmp_path / "chaos_marker")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, marker],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RETRY_OK 49995000 99990000" in proc.stdout
    # the injected failure really happened (attempt 0 raised before dying)
    assert (tmp_path / "chaos_marker").exists()
