"""Stream-stream joins and streaming deduplication (north-star streaming
surface beyond the reference's stateless map — `03. Inference.py:88-91`
never joins or dedups its stream).

Scale notes: a stream-stream inner join buffers both sides in state keyed
by the equi-join key; the watermark + time-interval condition bound how
long each row is retained (rows older than watermark - interval are
evicted), so state size is O(rate x window), not O(stream length).
Streaming dedup keeps one state entry per distinct key;
dropDuplicatesWithinWatermark is the bounded-state variant when keys
repeat far apart in event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    interval: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join of two event streams on `key` where the right event
    lands within [left.ts, left.ts + interval]. Both sides carry
    watermarks so the join state is evictable; with an availableNow
    bounded drain the emitted matches equal the batch join exactly
    (inner stream-stream joins emit on match, never on watermark)."""
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = right.withWatermark(ts_col, watermark).alias("r")
    return lw.join(
        rw,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {interval}")),
    )


def stream_dedup_keys(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Streaming exact dedup to distinct key combinations: stateful
    dropDuplicates projected to the keys (which row of a key survives is
    arrival-order-dependent; the key set itself is deterministic and
    equals batch DISTINCT). State is one entry per distinct key — use
    dropDuplicatesWithinWatermark when the key space is unbounded."""
    return stream.select(*keys).dropDuplicates(keys)
