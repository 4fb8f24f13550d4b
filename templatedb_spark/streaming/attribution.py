"""Stateful streaming last-touch attribution with applyInPandasWithState.

Per-user state is the most recent touch (epoch-µs timestamp + type). Events
are applied in (ts, event_id) order: clicks/views update the state, purchases
emit an attribution row — the touch type when the stored touch falls inside
the 7-day lookback, else 'direct'. The batch twin is
operators/analytics.attributed_purchases (the pre-rollup relation of the
exact-oracle `attribution_last_touch` spec); both sides apply the identical
ordering and lookback rule, so stream output equals the batch relation
row-for-row (asserted in tests/test_stateful_streaming.py).

Scale: state is one (long, string) per active user, keyed and partitioned by
user_id — the canonical online-attribution job shape for an event firehose;
watermarking bounds state exactly as in streaming/stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOOKBACK_US = 7 * 86_400 * 1_000_000

_OUTPUT_SCHEMA = "user_id long, event_id long, touch string, value double"
_STATE_SCHEMA = "touch_ts long, touch_type string"


def _attr_group(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    (user_id,) = key
    touch_ts, touch_type = state.get if state.exists else (-1, "")

    events: list[tuple[int, int, str, float]] = []
    for pdf in pdfs:
        us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64").tolist()
        events += list(
            zip(us, pdf["event_id"].tolist(), pdf["event_type"].tolist(), pdf["value"].tolist())
        )
    events.sort(key=lambda e: (e[0], e[1]))

    out = []
    for ts_us, eid, etype, value in events:
        if etype in ("click", "view"):
            touch_ts, touch_type = ts_us, etype
        elif etype == "purchase":
            attributed = (
                touch_type
                if touch_ts >= 0 and touch_ts >= ts_us - LOOKBACK_US
                else "direct"
            )
            out.append(
                {"user_id": user_id, "event_id": eid, "touch": attributed, "value": value}
            )

    state.update((touch_ts, touch_type))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "touch", "value"])


def stream_attribution_last_touch(events: DataFrame) -> DataFrame:
    """Streaming per-purchase last-touch attribution."""
    return events.groupBy("user_id").applyInPandasWithState(
        _attr_group,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
