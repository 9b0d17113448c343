"""Temporal operators Spark lacks natively: as-of join, range join,
sessionization (engine capability beyond the reference — SURVEY.md §2
notes range/as-of as deferred; this lands them Spark-first).

Scale design:
- as-of join: implemented as union + window (sort-merge shaped: one
  shuffle on the key, one per-partition ordered pass) rather than a
  per-key pandas merge_asof — no Python, no per-group materialization,
  no skew cliff on hot keys beyond what the window itself has.
- range join: equi-key + range predicate → Spark evaluates the range as
  a post-join filter on the equi-join; without an equi key it degrades
  to broadcast-nested-loop — callers must bucketize (bucket column =
  range quantum) to restore an equi key.
- sessionization: the lag/cumsum idiom — two window passes over one
  shuffle partition-by-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_right",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    greatest right.ts <= left.ts within the same key group (DuckDB/kdb
    `ASOF JOIN` semantics, pandas merge_asof direction='backward').
    `tolerance` (an INTERVAL string like '45 minutes') bounds staleness:
    a match older than left.ts - tolerance is dropped (all carried
    columns NULL), matching pandas merge_asof's tolerance.

    Requires right (on, ts) pairs to be unique — pre-aggregate the right
    side otherwise (ambiguous matches are engine-defined everywhere).

    Plan shape: unionByName(tagged sides) → window(partitionBy on,
    orderBy ts, side) → last(ignoreNulls) over unbounded-preceding →
    filter left side. One shuffle total; at equal ts the right row sorts
    first (side 0 < 1) so >= (inclusive) semantics hold.

    The carried right columns travel as ONE struct, filled with a single
    last(ignorenulls): filling columns independently would stitch values
    from *different* right rows whenever a carried column is legitimately
    NULL in the matched row (the per-column fill skips the NULL back to an
    older row)."""
    lt = left.withColumn("__side", F.lit(1))
    match_struct = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    rt = right.select(F.col(on), F.col(ts), match_struct.alias("__match")).withColumn(
        "__side", F.lit(0)
    )
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{ts}{suffix}"]
    unioned = lt.select(
        "*", F.lit(None).cast(rt.schema["__match"].dataType).alias("__match")
    ).unionByName(
        rt.select(
            on,
            ts,
            "__side",
            "__match",
            *[
                F.lit(None).cast(lt.schema[c].dataType).alias(c)
                for c in lt.columns
                if c not in (on, ts, "__side")
            ],
        )
    )
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.withColumn("__m", F.last("__match", ignorenulls=True).over(w))
    if tolerance is not None:
        # the filled struct carries the matched right ts; null the whole
        # match (one struct, so all carried columns together) when it is
        # staler than the tolerance window
        within = F.col(f"__m.{ts}{suffix}") >= F.col(ts) - F.expr(
            f"INTERVAL {tolerance}"
        )
        filled = filled.withColumn(
            "__m", F.when(within, F.col("__m")).otherwise(F.lit(None))
        )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__m.{c}").alias(c) for c in carried],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi + range join: Catalyst plans the equi part as a hash/sort-merge
    join and applies the range predicate as a join condition — never a
    cartesian product. (A pure range join with no equi key must bucketize
    the range dimension first.)"""
    return left.join(right, equi & range_cond, how)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds `gap_minutes`. Adds `session_id` (0-based
    per key). One shuffle (partitionBy key), two ordered passes."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    # microsecond precision: casting timestamp→long truncates to seconds,
    # which flips the break decision for gaps within 1s of the threshold
    gap_us = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
    is_break = F.when(
        gap_us.isNull() | (gap_us <= gap_minutes * 60 * 1_000_000), F.lit(0)
    ).otherwise(F.lit(1))
    return df.withColumn(
        "session_id",
        F.sum(is_break).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )


def session_stats(
    df: DataFrame, key: str, ts: str, gap_minutes: int = 30, order_tiebreak: str | None = None
) -> DataFrame:
    """Per-session aggregate: bounds + event count + duration seconds."""
    s = sessionize(df, key, ts, gap_minutes, order_tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.expr(
            f"(unix_micros(max({ts})) - unix_micros(min({ts}))) div 1000000"
        ).alias("duration_sec"),
    )


_STEP_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86400 * 1_000_000,
}


def _step_micros(step: str) -> int:
    """Parse '15 minutes' / '1 hour' / '2 days' into microseconds.
    Calendar-variable units (month/year) are rejected — a fixed-width
    grid can't represent them."""
    parts = step.strip().split()
    if len(parts) != 2:
        raise ValueError(f"gap_fill step must be '<n> <unit>', got {step!r}")
    n, unit = int(parts[0]), parts[1].rstrip("s").lower()
    if unit not in _STEP_UNIT_US or n <= 0:
        raise ValueError(
            f"gap_fill step unit must be one of {sorted(_STEP_UNIT_US)} with n>0, got {step!r}"
        )
    return n * _STEP_UNIT_US[unit]


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    agg_col,
    step: str = "1 hour",
) -> DataFrame:
    """Hypertable-style gap filling: bucket events to a fixed grid,
    materialize EVERY (key, bucket) cell of the time range — including
    empty ones — and carry values forward into gaps (last non-null per
    key, ordered by bucket). Output: key, bucket, total (0 for empty
    cells), total_ffill (forward-filled, NULL before a key's first data).

    The bucket is floor(unix_micros(ts) / step)*step — derived from
    `step` itself, so the event bucketing, the grid bounds, and the
    sequence stride always share one grid for ANY fixed-width step
    ('15 minutes', '1 hour', '2 days', ...); for '1 hour' this floor is
    identical to date_trunc('hour'). A step-vs-truncation mismatch would
    silently land every joined total on an off-grid cell (0/ffill).

    Scale shape: the grid is |keys| x |buckets| — built from a broadcast
    1-row bounds aggregate crossed with the distinct-key dimension, so no
    full-data shuffle creates it; the left join back to the bucketed
    aggregate shuffles on (key, bucket); the forward fill is a per-key
    window (parallel across keys). The grid row count, not the raw event
    count, bounds the window state."""
    from pyspark.sql import Window

    step_us = _step_micros(step)
    # pmod (not %) so pre-epoch timestamps still floor downward
    bucket = F.timestamp_micros(
        F.unix_micros(F.col(ts_col)) - F.pmod(F.unix_micros(F.col(ts_col)), F.lit(step_us))
    )
    hourly = df.groupBy(F.col(key_col), bucket.alias("h")).agg(agg_col.alias("total"))
    bounds = df.agg(F.min(bucket).alias("lo"), F.max(bucket).alias("hi"))
    grid_h = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))).alias("h")
    )
    keys = df.select(key_col).distinct()
    grid = keys.crossJoin(F.broadcast(grid_h))
    joined = grid.join(hourly, [key_col, "h"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.col("h").alias("bucket"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
        F.last("total", ignorenulls=True).over(w).alias("total_ffill"),
    )


def scd2_from_history(
    events: DataFrame,
    key: str,
    ts: str,
    attr: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change-event
    history: one row per (key, attribute-run) with [valid_from, valid_to)
    validity and an is_current flag. Consecutive events carrying the SAME
    attribute value collapse into one version (only actual changes open a
    new row) — the standard SCD2 contract for dimension tables fed from a
    CDC/event stream.

    Implementation is two window passes over ONE shuffle partitioned by
    key: lag() marks change points, a running count of change points
    numbers the runs, then a per-run aggregate takes (min ts, next run's
    min ts) via lead over the distinct runs. No self-join of the history
    against itself (the naive SQL formulation), no Python.

    At 100 TB: dimension histories are heavily skewed by key activity,
    but the per-key window state is O(1) (lag/cumsum stream through
    sorted rows); hot keys cost sort time, not memory. Ties on ts within
    a key are broken by the attribute value so run numbering is
    deterministic under any input order, and the validity chain orders by
    (valid_from, run) — two runs share a valid_from when duplicate
    timestamps carry different attributes, and the run id keeps the
    lead() deterministic there too."""
    order = W.partitionBy(key).orderBy(ts, attr)
    marked = events.select(key, ts, attr).withColumn(
        "__chg",
        F.when(
            F.lag(attr).over(order).isNull()
            | (F.lag(attr).over(order) != F.col(attr)),
            1,
        ).otherwise(0),
    )
    runs = marked.withColumn("__run", F.sum("__chg").over(order)).groupBy(
        key, "__run"
    ).agg(
        F.first(attr).alias(attr),
        F.min(ts).alias("valid_from"),
    )
    nxt = W.partitionBy(key).orderBy("valid_from", "__run")
    return runs.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        F.lead("valid_from").over(nxt).isNull().alias("is_current"),
    )


def scd2_apply_history(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts: str,
    attr: str,
) -> DataFrame:
    """Incrementally fold a batch of change events into an existing SCD2
    dimension (the per-batch MERGE a warehouse runs): versions for keys
    untouched by the batch pass through without rewrite; touched keys
    have their version runs rebuilt from (their current rows + the new
    events) — correct even when the batch carries out-of-order or
    no-op (unchanged-value) events. Complements merge.scd2_apply, the
    simpler close-out MERGE for strictly in-order, already-deduped
    updates; this form is for CDC feeds that can replay or arrive late.

    Scale shape: one semi/anti join on key splits the dimension into
    untouched (pass-through, never shuffled beyond the join) and touched
    partitions; only the touched slice — |active keys in batch| rows —
    pays the window rebuild. This mirrors Delta MERGE's touched-file
    rewrite, expressed engine-agnostically."""
    touched_keys = updates.select(key).distinct()
    untouched = dim.join(touched_keys, [key], "left_anti")
    touched_history = (
        dim.join(touched_keys, [key], "left_semi")
        .select(key, F.col("valid_from").alias(ts), attr)
        .unionByName(updates.select(key, ts, attr))
    )
    rebuilt = scd2_from_history(touched_history, key=key, ts=ts, attr=attr)
    return untouched.unionByName(rebuilt)


def scd2_from_history_multi(
    events: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
) -> DataFrame:
    """Multi-attribute SCD2: track a SET of columns as one version — a
    new version opens when ANY tracked attribute changes. Implemented by
    packing the attributes into a struct (Spark structs compare
    field-wise, so lag()-based change marking and the rarity ordering
    work unchanged) and unpacking after the single-attribute core runs.
    Same one-shuffle plan as scd2_from_history."""
    packed = events.select(
        key, ts, F.struct(*[F.col(a) for a in attrs]).alias("__attrs")
    )
    out = scd2_from_history(packed, key=key, ts=ts, attr="__attrs")
    return out.select(
        key,
        *[F.col(f"__attrs.{a}").alias(a) for a in attrs],
        "valid_from",
        "valid_to",
        "is_current",
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the earliest time of step
    1, then the earliest step-2 event STRICTLY AFTER it, and so on — the
    product-analytics primitive (view -> click -> purchase conversion)
    that plain groupBy can't express because each step's window depends
    on the previous step's result.

    Implementation: one min-aggregate per step, each joined back on the
    user key with the strictly-after predicate. Every shuffle is on the
    same key, so Spark reuses the exchange across steps; no windows, no
    per-user sorting — per step it is filter + co-partitioned join +
    partial-agg min. Strict `>` makes same-timestamp events not advance
    the funnel (deterministic, engine-portable).

    Returns one row per user who completed step 1: t_<step> timestamp
    columns (NULL once the funnel is abandoned) + `stage` = number of
    completed steps."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    u, t = F.col(user_col), F.col(ts_col)
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{steps[0]}"))
    )
    for prev, step in zip(steps, steps[1:]):
        nxt = (
            df.filter(F.col(type_col) == step)
            .join(cur.select(user_col, f"t_{prev}"), user_col)
            .filter(t > F.col(f"t_{prev}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{step}"))
        )
        cur = cur.join(nxt, user_col, "left")
    stage = F.lit(1)
    for step in steps[1:]:
        stage = stage + F.when(F.col(f"t_{step}").isNotNull(), 1).otherwise(0)
    return cur.withColumn("stage", stage.cast("bigint"))


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their first-seen
    week; each (cohort_week, week_offset) cell counts distinct users from
    that cohort active `week_offset` weeks later — the standard
    engagement-decay report. Weeks are epoch-day // 7 (fixed 7-day
    buckets from the epoch: engine-portable, no locale/week-start
    dependence).

    Scale shape: one min-agg per user (first seen), a co-partitioned
    join back on the user key, then one distinct-count agg over
    (cohort, offset) — shuffle keys only, never event payloads."""
    week = (F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date"))
            / 7).cast("bigint")
    ev = df.select(F.col(user_col), week.alias("wk"))
    first = ev.groupBy(user_col).agg(F.min("wk").alias("cohort_week"))
    return (
        ev.join(first, user_col)
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
