"""Structured Streaming: the streaming rollup must agree with its batch twin
when the stream drains the full backlog (availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_stream_rollup_matches_batch(spark, tmp_path):
    from templatedb_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        windowed_rollup,
    )
    from templatedb_spark.suite import table

    # the file stream source requires a *directory* of files
    import shutil

    stage = tmp_path / "events_in"
    stage.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", stage / "part-0.parquet")
    stream = read_events_stream(spark, str(stage))
    rollup = windowed_rollup(stream, window="1 hour", watermark="2 hours")
    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in run_available_now(rollup, "t_stream_rollup")
    }

    batch = (
        table(spark, SF_SMALL, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    want = {(r.hour, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    assert got == want


def test_watermark_bounds_state(spark, tmp_path):
    """The rollup plan carries the watermark (state eviction contract)."""
    import shutil

    from templatedb_spark.streaming.events import read_events_stream, windowed_rollup

    stage = tmp_path / "events_in"
    stage.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", stage / "part-0.parquet")
    stream = read_events_stream(spark, str(stage))
    rollup = windowed_rollup(stream, watermark="2 hours")
    assert "EventTimeWatermark" in rollup._jdf.queryExecution().analyzed().toString()
