"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 H4 extension: the genuinely-stateful piece Spark exposes for
logic watermark+window can't express).

The demo operator is a per-key running aggregate with explicit state:
each micro-batch updates (count, sum) state per key and emits the running
totals. State is bounded by key cardinality; a production op would attach
a timeout (`GroupStateTimeout.EventTimeTimeout`) to evict idle keys — the
unbounded-state failure mode is the streaming analogue of a skewed
shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(events: DataFrame, key: str = "event_type") -> DataFrame:
    """Stateful per-key running (count, cents-sum) over a stream."""

    def update(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(float(pdf["value"].sum()) * 100))
        state.update((n, cents))
        yield pd.DataFrame(
            {"key": [key_tuple[0]], "n": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType="key string, n long, total_value double",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
