"""MERGE / upsert emulation (CDC pattern).

The reference relies on Delta for table mutation (overwrite +
mergeSchema); Delta's `MERGE INTO` isn't available without the Delta jar,
so the engine ships the standard emulation (SURVEY.md guide pitfalls:
"CDC / SCD2 → anti-join + union"): deterministic, pure DataFrame ops,
one shuffle per side. On a Delta-enabled cluster, `upsert` dispatches to
the native MERGE (HAS_DELTA branch in sources/tables.py) which rewrites
only touched files instead of the full table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE semantics: rows matching on `keys` are replaced by source
    (WHEN MATCHED THEN UPDATE); unmatched source rows are inserted
    (WHEN NOT MATCHED THEN INSERT); target rows with no match survive.
    When `delete_col` names a boolean source column, those matches are
    deleted instead of updated (WHEN MATCHED AND cond THEN DELETE)."""
    keep = target.join(source.select(*keys), list(keys), "left_anti")
    if delete_col is not None:
        source = source.filter(~F.col(delete_col)).drop(delete_col)
    return keep.unionByName(source.select(*target.columns))


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    end_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current versions of
    changed keys (set valid_to = update ts) and append the new versions
    as open rows (valid_to = NULL). `current` rows must carry `end_col`;
    open rows have it NULL."""
    upd_keys = updates.select(*keys, F.col(ts_col).alias("__new_ts"))
    closed = (
        current.join(upd_keys, list(keys), "inner")
        .filter(F.col(end_col).isNull())
        .withColumn(end_col, F.col("__new_ts"))
        .drop("__new_ts")
    )
    untouched_open = current.filter(F.col(end_col).isNull()).join(
        upd_keys.select(*keys), list(keys), "left_anti"
    )
    history = current.filter(F.col(end_col).isNotNull())
    new_rows = updates.withColumn(end_col, F.lit(None).cast(current.schema[end_col].dataType))
    return history.unionByName(untouched_open).unionByName(closed).unionByName(
        new_rows.select(*current.columns)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Derive a CDC feed by diffing two snapshots of a table: full outer
    join on the key, classify each key as insert (new only), delete
    (old only), or update (present in both with any compared column
    changed); unchanged rows drop out. The parquet-world equivalent of
    Delta's change-data-feed read — run it between daily snapshots to
    feed incremental consumers (scd2_apply_history, streaming MERGE)
    without replaying full tables.

    Scale shape: one co-partitioned full outer join on the key; the
    change classification is a projection. Output carries the key, the
    change_type, and old/new values for every compared column."""
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, list(keys), "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~(
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        )
    ctype = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", ctype)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
