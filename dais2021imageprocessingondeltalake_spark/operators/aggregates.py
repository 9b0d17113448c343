"""Aggregations (SURVEY.md §2 D1-D5).

Reference sites: count `00. Explore.py:79`, distinct `01. Ingest.py:76`,
distinct-count `02.a Train - TensorFlow Distributed.py:78`, groupBy (as
grouped-map partitioner) `01. Ingest.py:126`. Full `groupBy().agg()` is
the capability gap the engine fills (D5).

Scale notes: Spark's hash aggregate is partial+final (map-side combine)
by default — a groupBy on a low-cardinality key shuffles only
|partitions|x|groups| pre-aggregated rows, not the raw data. Exact
countDistinct adds a second shuffle (expand + two-phase agg); at 100 TB
prefer approx_count_distinct (HLL, one pass) unless exactness is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def money_cents(col: Column, decimals: int = 2) -> Column:
    """Fixed-point view of an exact-decimal double column (e.g. prices
    generated with 2 decimals): value*10^d rounded to long. Makes sums
    exact, order-independent, and ~2x faster than DECIMAL aggregation
    (integer sum vs BigDecimal). round() is safe here: the scaled value
    is within 1 ulp of an integer, never at a .5 boundary.

    Overflow bound: long holds ±9.2e18 — at 2 decimals that is ±9.2e16
    currency units per aggregation group; beyond that use DECIMAL sums
    (exactness over speed)."""
    return F.round(col * (10**decimals), 0).cast("long")


def exact_money_sum(col: Column, decimals: int = 2) -> Column:
    """Deterministic double-valued sum of an exact-decimal column:
    integer-cents sum divided back once (one IEEE division — identical in
    any engine, unlike order-dependent double summation)."""
    return F.sum(money_cents(col, decimals)) / F.lit(float(10**decimals))


def count_rows(df: DataFrame) -> int:
    """D1 — global count action."""
    return df.count()


def count_rows_df(df: DataFrame, alias: str = "n") -> DataFrame:
    """D1 as a relation (for oracle-checkable pipelines)."""
    return df.agg(F.count(F.lit(1)).alias(alias))


def distinct_rows(df: DataFrame, *cols: str) -> DataFrame:
    """D2 — distinct over a projection (hash aggregate on all columns)."""
    return (df.select(*cols) if cols else df).distinct()


def distinct_count(df: DataFrame, col: str, approx: bool = False, alias: str | None = None) -> DataFrame:
    """D3 — exact or HLL-approximate distinct count, as a 1-row relation."""
    alias = alias or f"n_{col}"
    agg = F.approx_count_distinct(col) if approx else F.countDistinct(col)
    return df.agg(agg.alias(alias))


def grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """D4+D5 — hash aggregate with map-side combine. Every agg Column must
    carry an explicit .alias() so result schemas are stable."""
    return df.groupBy(*keys).agg(*aggs)


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Grouping-sets rollup (Spark builtin `df.rollup`)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Grouping-sets cube (Spark builtin `df.cube`)."""
    return df.cube(*keys).agg(*aggs)


def sketch_rollup(
    df: DataFrame,
    group_col: str,
    bucket_col: Column,
    distinct_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Two-tier distinct-count rollup over MERGEABLE HLL sketches (Apache
    DataSketches via hll_sketch_agg/hll_union_agg): tier 1 builds one
    sketch per (group, bucket); tier 2 unions buckets into a per-group
    sketch and estimates.

    This is THE pattern behind 100 TB distinct-count dashboards: the
    per-bucket (e.g. per-day, per-partition) sketches are small fixed-size
    binaries that persist alongside the data, and any time range or
    regrouping is answered by unioning sketches — never rescanning raw
    rows. exact count(DISTINCT) can't pre-aggregate this way (distinct
    sets don't merge by addition); sketches trade a ~1-2% relative error
    (lg_k=12 -> ~1.6%) for mergeability. Both tiers are ordinary
    map-side-combinable aggregates: tier 1 shuffles (group, bucket)
    partials, tier 2 shuffles |buckets| sketch binaries per group."""
    tier1 = df.groupBy(F.col(group_col), bucket_col.alias("__bucket")).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("sketch")
    )
    return tier1.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


def histogram_quantiles(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo: float,
    hi: float,
    nbins: int = 64,
    ps: Sequence[float] = (0.5, 0.95),
) -> DataFrame:
    """Per-group quantile estimates from a fixed-bin histogram sketch —
    the MERGEABLE alternative to exact percentiles: a group's sketch is
    just `nbins` counts, so partial aggregates combine associatively
    (map-side combine works, re-grouping unions bin counts, a two-tier
    rollup never rescans raw rows), unlike exact `percentile`, whose
    state is the whole value multiset. The estimate returned for
    probability p is the RIGHT EDGE of the first bin where the running
    count covers a p-fraction of the group (cum/total >= p) — i.e. the
    bin holding the lower-quantile ORDER STATISTIC, so the estimate is
    within one bin width above it. The fraction compare (not
    ceil(p*total) ranks) matters: 0.95*300 is 285.00000000000003 in
    IEEE, so a ceil-rank rule silently targets rank 286 at exact
    boundaries, while cum/total and the literal p round to the SAME
    double when the true fraction equals p — deterministic and
    reproducible cross-engine (the driver-gate property
    approx_percentile's GK sketch lacks). Values outside [lo, hi)
    clamp into the edge bins.

    Output: (key, p_XX columns as double bin-edge estimates). Error is
    bounded by one bin width — pick nbins for the precision the SLO
    needs; 64 doubles per group is still ~nothing at 100 TB.
    """
    from pyspark.sql import Window

    width = (hi - lo) / nbins
    raw = F.floor((F.col(val_col) - F.lit(lo)) / F.lit(width))
    bin_col = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), raw)).cast("int")
    hist = df.groupBy(F.col(key_col), bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key_col)
    cum = hist.select(
        key_col,
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    aggs = []
    for p in ps:
        covered = F.col("cum") / F.col("total") >= F.lit(p)
        hit_bin = F.min(F.when(covered, F.col("bin")))
        aggs.append(
            (F.lit(lo) + (hit_bin + 1) * F.lit(width)).alias(
                f"p{str(p).replace('0.', '').ljust(2, '0')}"
            )
        )
    return cum.groupBy(key_col).agg(*aggs)


def partial_agg_states(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Mergeable per-group aggregate STATE (n, sum, min, max) over
    `value_col` — the materialized form an incremental pipeline persists
    per batch/partition instead of final answers. States compose under
    `merge_agg_states`, so re-aggregation never rescans source rows (the
    algebraic-aggregate half of the story; the HLL sketch_rollup tier
    covers distinct counts)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_agg_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Combine partial states from any number of batches: counts and
    sums add, mins/maxes fold — one union + one shuffle over STATE rows
    (|groups| x |batches|, never source-sized). Emits the final
    (n, sum_v, min_v, max_v, avg_v) per group."""
    if not states:
        raise ValueError("merge_agg_states needs at least one state frame")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return (
        u.groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .withColumn("avg_v", F.round(F.col("sum_v") / F.col("n"), 6))
    )


def ranked_auc(
    df: DataFrame,
    label_col,
    score_col,
    scale: int = 1_000_000,
) -> DataFrame:
    """ROC-AUC as the Mann-Whitney U rank statistic with midrank tie
    handling — one row (n_pos, n_neg, auc_x1e6) — entirely in INTEGER
    arithmetic, so the oracle replays it bit-for-bit with no float
    rounding anywhere.

    Derivation: with per-distinct-score counts (cnt, cnt_pos) and
    ``before`` = rows with strictly smaller score, each tied group's
    midrank is before + (cnt+1)/2, so DOUBLED midranks are the integers
    2*before + cnt + 1 and

        sum_pos_2r = sum(cnt_pos * (2*before + cnt + 1))
        AUC        = (sum_pos_2r - n_pos*(n_pos+1)) / (2*n_pos*n_neg)

    emitted as ``(scale * numerator) div denominator`` — exact integer
    division (Spark `div` == DuckDB `//` on non-negatives).

    Scale shape: one groupBy(score) shuffle; the cumulative ``before``
    is an exclusive prefix sum over the DISTINCT-score table via the
    two-pass parallel scan (sort.parallel_prefix_sum: range partition,
    per-partition cumsum, broadcast |partitions|-row offsets) — so the
    operator holds for ANY score cardinality, a CONTINUOUS unrounded
    score column included, where distinct-count ~ N and the previous
    single-reducer window over the distinct table silently funneled the
    corpus through one task (VERDICT r6 item 5). Integer counts sum
    associatively, so the two-pass ``before`` is bit-identical to the
    window's for any boundary placement.
    NULL scores are dropped up front (unrankable — and Spark's
    nulls-first window order vs the oracle's nulls-last would silently
    shift every real rank). A single-class input (n_pos or n_neg = 0,
    where AUC is undefined) reports NULL rather than throwing ANSI
    DIVIDE_BY_ZERO. BIGINT headroom: scale*sum_pos_2r < 2^63 up to
    ~3e9/sqrt(scale) rows — at larger N switch the two products to
    DECIMAL(38,0).
    """
    from .sort import parallel_prefix_sum

    label = F.col(label_col) if isinstance(label_col, str) else label_col
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    df = df.filter(score.isNotNull())
    g = df.groupBy(score.alias("__s")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.when(label, 1).otherwise(0)).alias("__pos"),
    )
    ranked = parallel_prefix_sum(g, ["__s"], "__cnt", out_col="__before").select(
        "__cnt", "__pos", "__before"
    )
    return ranked.agg(
        F.sum("__pos").cast("bigint").alias("n_pos"),
        (F.sum("__cnt") - F.sum("__pos")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("__pos") * (F.lit(2) * F.col("__before") + F.col("__cnt") + 1)
        ).alias("__sum_pos_2r"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS BIGINT) ELSE "
            f"CAST(({scale} * (__sum_pos_2r - n_pos * (n_pos + 1))) div "
            "(2 * n_pos * n_neg) AS BIGINT) END"
        ).alias("auc_x1e6"),
    )


def _midranks2(df: DataFrame, col, alias: str) -> DataFrame:
    """Per-distinct-value DOUBLED midranks for `col`: (value, 2*before +
    cnt + 1) — the integer form shared by ranked_auc and spearman_rho.
    One row per distinct value; ``before`` comes from the two-pass
    parallel prefix scan, not a partitionless window, so the table is
    computed scalably even when the column is continuous and
    distinct-count ~ N (VERDICT r6 item 5)."""
    from .sort import parallel_prefix_sum

    c = F.col(col) if isinstance(col, str) else col
    g = df.groupBy(c.alias(f"__v_{alias}")).agg(F.count(F.lit(1)).alias("__cnt"))
    pre = parallel_prefix_sum(g, [f"__v_{alias}"], "__cnt", out_col="__before")
    return pre.select(
        f"__v_{alias}",
        (F.lit(2) * F.col("__before") + F.col("__cnt") + 1).alias(f"__r2_{alias}"),
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Spearman rank correlation with midrank ties — one row
    (n, rho_x1e6) — as Pearson on DOUBLED midranks: every moment is an
    exact BIGINT (sums of integer rank products), and the single
    float step is the final variance sqrt + division, one fixed IEEE
    expression both engines replay identically before the floor-scale.

    Scale shape: two midrank tables (one groupBy per column + a
    two-pass parallel prefix scan each — scalable for continuous
    columns where distinct-count ~ N), joined back onto the rows with
    NO forced broadcast: AQE converts the join to broadcast-hash at
    runtime exactly when the midrank table is small (quantized scores),
    and keeps a shuffled join when it is corpus-sized (continuous
    scores) — hinting broadcast would OOM the driver in the latter
    case. Then ONE moment aggregate. Rows where either column is
    NULL are dropped up front (pairwise-complete semantics) — they are
    not rankable, and leaving them in would silently shift every real
    rank. Numeric headroom: the per-row moments stay BIGINT-exact
    (sum(rx*ry) ~ 4n^3 fits to n~1.3M); the cross-moment products
    (sx*sy ~ n^4, which overflows BIGINT at n~55k) are formed in
    DOUBLE — each factor casts exactly below 2^53, so the statistic is
    bit-exact to n~130k and deterministic (same IEEE tree in both
    engines) at any n.
    """
    df = df.na.drop(subset=[x_col, y_col])
    rx = _midranks2(df, x_col, "x")
    ry = _midranks2(df, y_col, "y")
    joined = (
        df.select(F.col(x_col).alias("__v_x"), F.col(y_col).alias("__v_y"))
        .join(rx, "__v_x")
        .join(ry, "__v_y")
    )
    m = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__r2_x").alias("__sx"),
        F.sum("__r2_y").alias("__sy"),
        F.sum(F.col("__r2_x") * F.col("__r2_x")).alias("__sxx"),
        F.sum(F.col("__r2_y") * F.col("__r2_y")).alias("__syy"),
        F.sum(F.col("__r2_x") * F.col("__r2_y")).alias("__sxy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        # products formed in DOUBLE: n^4-scale terms overflow BIGINT at
        # n~55k under ANSI; double factors cast exactly below 2^53 and
        # the expression tree replays identically in the oracle
        F.expr(
            f"CAST(floor({float(scale)} * ("
            "(CAST(n AS DOUBLE) * CAST(__sxy AS DOUBLE)"
            " - CAST(__sx AS DOUBLE) * CAST(__sy AS DOUBLE)) / "
            "sqrt((CAST(n AS DOUBLE) * CAST(__sxx AS DOUBLE)"
            " - CAST(__sx AS DOUBLE) * CAST(__sx AS DOUBLE)) * "
            "(CAST(n AS DOUBLE) * CAST(__syy AS DOUBLE)"
            " - CAST(__sy AS DOUBLE) * CAST(__sy AS DOUBLE))))) AS BIGINT)"
        ).alias("rho_x1e6"),
    )
