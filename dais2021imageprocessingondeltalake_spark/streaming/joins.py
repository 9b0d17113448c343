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


def stream_dedup_keys_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", delay: str = "1 hour"
) -> DataFrame:
    """Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    evicts a key's state once the watermark passes its event time +
    delay — the unbounded-key-space variant of stream_dedup_keys (state
    is O(keys-within-horizon), not O(all keys ever)). Duplicates are only
    guaranteed suppressed when they arrive within `delay` of the first
    occurrence; a replay whose whole span fits inside `delay` therefore
    equals batch DISTINCT exactly (how the oracle checks it)."""
    return stream.select(ts_col, *keys).withWatermark(
        ts_col, delay
    ).dropDuplicatesWithinWatermark(keys).select(*keys)


def stream_static_join(
    stream: DataFrame, static: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Stream-static join: the static side is planned as a broadcast
    against every micro-batch (no state, no watermark needed — the
    standard enrichment join of a 100 TB event firehose against a
    dimension table). Static side re-reads per trigger, so at scale pin
    it small or cached."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(static), on, how)


def stream_stream_left_outer_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    interval: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER join of two event streams on `key` within
    [left.ts, left.ts + interval]. Unlike the inner variant (emit on
    match), the null-padded row for an unmatched left event can only be
    emitted once the watermark guarantees no matching right event can
    still arrive — i.e. when watermark > left.ts + interval. Both
    watermarks and the time-bound join condition are REQUIRED by Spark
    for exactly this reason: they bound the state AND define when
    unmatched rows are final.

    End-of-stream semantics (test-asserted): with an availableNow drain
    the final watermark rests at max(event time) - `watermark`, so left
    rows younger than max_ts - watermark - interval are still withheld
    in state when the query stops — the drained output equals the batch
    left join only on the FLUSHED REGION (left.ts + interval < final
    watermark). Registry query q_stream_left_join filters both sides to
    that region, making the comparison deterministic by construction."""
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = right.withWatermark(ts_col, watermark).alias("r")
    return lw.join(
        rw,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {interval}")),
        "left_outer",
    )
