"""Streaming joins: stream-stream (time-bounded, watermarked) and
stream-static.

Stream-stream equi-joins need BOTH a watermark on each side and a time
bound in the join condition — they define how long each side's rows are
buffered in state. Without the bound the state grows forever; with it,
state per key is (watermark + bound) worth of rows. The batch twin is
operators/temporal.banded_range_join.

Stream-static joins (stream ⋈ dimension table) need no state at all —
the static side is just re-read per micro-batch (or broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_within(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    within: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Pairs (l, r) with equal key and r.ts in (l.ts, l.ts + within].
    Both sides watermarked so Spark can evict buffered state."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[on] == r[on])
        & (r[right_ts] > l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond)


def stream_static_enrich(stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str) -> DataFrame:
    """Enrich a stream with a static dimension — stateless; the dim is
    broadcast into every micro-batch."""
    return stream.join(F.broadcast(dim), stream[stream_key] == dim[dim_key], "left")
