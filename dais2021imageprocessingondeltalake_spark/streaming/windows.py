"""Event-time windowed aggregation with watermarks (SURVEY.md §2 H4).

Absent in the reference (its stream is a stateless map) — this is the
north-star streaming capability: `withWatermark` bounds state retention
(late rows older than the watermark are dropped; state for closed windows
is evicted — unbounded state is the classic 100 TB streaming failure),
`F.window` buckets rows into tumbling/sliding windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window_size: str,
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation; works identically on a
    bounded or streaming DataFrame (H2 polymorphism). On a stream, pass
    `watermark` (e.g. "10 minutes") to bound state."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, window_size), *extra_keys).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window_size: str,
    slide: str,
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: each row lands in window_size/slide buckets."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, window_size, slide), *extra_keys).agg(*aggs)
