"""Partitioning / sampling / driver hand-off (SURVEY.md §2 J1-J3).

Reference sites: `randomSplit([0.6,0.4], seed=12345)`
`02.a Train - TensorFlow Distributed.py:79`; `repartition(2)` `02.a:82-83`;
`collect()`/`toPandas()` `01. Ingest.py:76,135`.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def random_split(
    df: DataFrame, weights: Sequence[float], seed: int = 12345
) -> list[DataFrame]:
    """J1 — seeded per-partition Bernoulli split (no shuffle). Splits are
    disjoint and exhaustive; exact membership varies with partitioning, so
    tests assert invariants, not row identity (SURVEY.md §7 hard part b)."""
    return df.randomSplit(list(weights), seed=seed)


def ensure_min_partitions(df: DataFrame, n: int) -> DataFrame:
    """J2 — parallelism floor: the reference repartitions to >= #training
    workers (`02.a:82-83`). Round-robin shuffle only when actually below."""
    return df.repartition(n) if df.rdd.getNumPartitions() < n else df


def collect_sample(df: DataFrame, n: int = 10) -> pd.DataFrame:
    """J3 — bounded debug sample to the driver (Arrow-accelerated), the
    reference's `limit(10).toPandas()` iteration loop (`01. Ingest.py:135`).
    Always limits first: never an unbounded collect on the data path."""
    return df.limit(n).toPandas()


def local_rows_df(spark, rows, schema) -> DataFrame:
    """Driver-local rows -> DataFrame as an Arrow-backed LocalTableScan.

    `createDataFrame(list_of_tuples)` parallelizes the rows into
    defaultParallelism pickled-row partitions, so every downstream action
    pays one Python-worker round-trip PER TASK just to re-read rows the
    driver already holds (measured at 32 cores: ~0.36 s warm / ~1.7 s
    cold for THREE rows — the single largest stage of q_logreg_grid and
    q_heavy_hitters in the r12 profile). Routing the same rows through a
    pandas frame + the session's Arrow path plans as a LocalTableScan:
    the rows live in the JVM plan itself, execution never touches a
    Python worker (~0.06 s for the same write).

    Values are preserved exactly — dtype=object keeps None as null (a
    float64 column would coerce None to NaN) and Python floats cross
    Arrow bit-identically (asserted in tests). Empty input falls back to
    the classic path, which is schema-only and cheap."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.DataFrame(rows, dtype=object), schema)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 12345
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`df.sampleBy`) — the class-balance
    tool for training-set construction (downsample majority classes,
    keep rare ones whole). Executes as a per-partition filter with a
    seeded RNG: no shuffle, no driver collection, linear scan at any
    scale. Rows-only checkable (engines differ in RNG streams); the
    invariants — subset-of-input, only listed strata, approximate
    per-stratum rates, seed determinism — are asserted in tests."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def _md5_threshold(rate: float) -> str:
    """First-8-hex-chars md5 threshold for a Bernoulli keep-rate.

    md5 hex is lowercase in both Spark and DuckDB and hex digits sort
    lexicographically in value order ('0'..'9' < 'a'..'f'), so a
    fixed-width string compare IS a uniform numeric compare — no hex
    parsing needed (the engines disagree on hex→int builtins, not on
    md5 itself)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    md5(key || salt)[:8] < threshold(rate).

    This is how a 100 TB curation pipeline samples — `df.sample()` is
    seed-AND-partitioning dependent (a repartition changes the sample),
    while a content-hash keep rule is reproducible across runs, engines,
    cluster sizes, and incremental re-ingests: the same document always
    makes the same keep/drop decision. `salt` derives independent
    samples from the same keys (vary it to draw a fresh replicate).
    Pure projection+filter, no shuffle, fully pushed down."""
    from pyspark.sql import functions as F

    if rate >= 1.0:
        return df
    thr = _md5_threshold(rate)
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.filter(F.substring(digest, 1, 8) < F.lit(thr))


def hash_sample_stratified(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing primitive
    (sample web text at 10%, keep books at 100%, ...). The per-row
    threshold is a CASE over the stratum column; everything else matches
    hash_sample. Rates ≥ 1.0 keep the whole stratum; strata not listed
    fall back to default_rate."""
    from pyspark.sql import functions as F

    thr_col = F.lit(_md5_threshold(min(default_rate, 1.0)))
    for stratum, rate in sorted(rates.items()):
        thr_col = F.when(
            F.col(strata_col) == stratum, F.lit(_md5_threshold(min(rate, 1.0)))
        ).otherwise(thr_col)
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    full = {s for s, r in rates.items() if r >= 1.0}
    keep = F.substring(digest, 1, 8) < thr_col
    if full:
        keep = keep | F.col(strata_col).isin(*sorted(full))
    if default_rate >= 1.0:
        keep = keep | ~F.col(strata_col).isin(*sorted(rates))
    return df.filter(keep)


def _hex_threshold_col(rate_col):
    """Column form of `_md5_threshold` for DATA-DEPENDENT keep-rates.

    `_md5_threshold` needs the rate at plan-build time; aggregated rates
    (e.g. per-language balance factors) only exist inside the plan. The
    same 8-hex-digit compare works in-engine: floor(rate * 2^32) → hex →
    lower/lpad to width 8. Rates >= 1.0 map to 'g' (every md5 digit is
    < 'g', so the stratum is kept whole — and it sidesteps lpad's
    silent truncation of the 9-digit hex of 2^32). The rate must be
    round()-ed BEFORE calling this (libm-derived rates differ by an ulp
    across engines; floor would amplify that to a whole threshold step)."""
    from pyspark.sql import functions as F

    return F.when(rate_col >= 1.0, F.lit("g")).otherwise(
        F.lower(
            F.lpad(F.hex(F.floor(rate_col * F.lit(4294967296.0)).cast("bigint")), 8, "0")
        )
    )


def temperature_rebalance(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weight_col,
    alpha: float = 0.3,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based corpus rebalancing (the mT5/XLM-R α-sampling
    policy, downsample-only form): strata (languages, domains) are kept
    at rate (w_min / w_s)^(1-α), where w_s is the stratum's total weight
    (token count) — α=1 keeps the natural distribution, α=0 thins every
    stratum to the smallest one's weight, α≈0.3 is the multilingual
    pretraining default. The rarest stratum always keeps everything, so
    no upsampling/duplication is ever needed.

    Unlike the static-rate `hash_sample_stratified`, the rates here are
    DERIVED FROM THE DATA inside the plan (one tiny per-stratum
    aggregate, broadcast back), so the policy self-adjusts as the corpus
    grows — and stays fully deterministic: rates round to 6dp before the
    in-engine hex-threshold conversion, and the per-row decision is the
    same md5(key||salt) Bernoulli as every other sampler here. Scale
    shape: one |strata|-row aggregate + a broadcast join + a projection
    filter; the corpus never shuffles. Returns the kept rows with a
    `keep_rate` audit column."""
    from pyspark.sql import functions as F

    rates = temperature_rates(df, strata_col, weight_col, alpha)
    return apply_rate_table(df, rates, key_col, strata_col, salt)


def temperature_rates(
    df: DataFrame, strata_col: str, weight_col, alpha: float
) -> DataFrame:
    """The (stratum, keep_rate) table temperature_rebalance derives —
    exposed separately because the STREAMING shape computes rates from
    the existing corpus SNAPSHOT (batch aggregate) and applies them
    in-flight to arriving documents via a stream-static broadcast join
    (a global aggregate can't run statelessly inside the stream)."""
    from pyspark.sql import functions as F

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    weight = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = df.groupBy(strata_col).agg(F.sum(weight.cast("double")).alias("__w"))
    minw = w.agg(F.min("__w").alias("__minw"))
    return w.crossJoin(F.broadcast(minw)).select(
        strata_col,
        F.round(
            F.pow(F.col("__minw") / F.col("__w"), F.lit(1.0 - alpha)), 6
        ).alias("keep_rate"),
    )


def apply_rate_table(
    df: DataFrame,
    rates: DataFrame,
    key_col: str,
    strata_col: str,
    salt: str = "temp",
) -> DataFrame:
    """Apply a (stratum, keep_rate) table to rows (batch OR streaming
    micro-batch): broadcast join + the md5 hex-threshold Bernoulli.
    Stateless per row given the rate table, so it runs unchanged as a
    stream-static join transform."""
    from pyspark.sql import functions as F

    digest = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
    )
    return df.join(F.broadcast(rates), strata_col).filter(
        digest < _hex_threshold_col(F.col("keep_rate"))
    )


def unimax_alloc(
    df: DataFrame,
    strata_col: str,
    weight_col,
    budget_mult: float,
    epoch_cap: float,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR 2023): distribute a
    total training-token budget B = budget_mult x corpus tokens across
    strata (languages, domains) as UNIFORMLY as possible, subject to no
    stratum repeating more than `epoch_cap` epochs of its own data.
    The fourth mixing mechanism next to temperature rebalancing
    (token-share-only), DSIR (per-doc importance), and DoReMi
    (loss-aware tilt) — UniMax alone reasons about REPETITION: a tail
    stratum stops absorbing budget at epoch_cap x its size instead of
    being oversampled into memorization, and the head strata share the
    remainder evenly.

    Exact waterfilling, not an iterative approximation: sort strata by
    capacity c_s = epoch_cap x tokens_s ascending (stratum-name
    tie-break), and stratum i is capped iff every j <= i satisfies
    c_j * (D - j + 1) <= B - cumsum_{j-1}(c) — the capped set is always
    a prefix of this order, so one running-min over the per-row
    condition replays the whole loop. Uncapped strata split the
    leftover budget evenly (the water level).

    Engine-deterministic BY CONSTRUCTION, not by rounding: capacities
    and their prefix sums are integer-valued doubles (exact at any
    addition order), B rounds once from an exact integer total, and
    every comparison uses the same single-rounded operands on both
    engines; only the emitted level/epochs/share quotients round to
    6dp. Scale shape: one |strata|-row aggregate, two windows and one
    aggregate over that |strata|-row frame (bounded by the stratum
    vocabulary, never data-sized), one scalar broadcast back.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if budget_mult <= 0.0:
        raise ValueError(f"budget_mult must be > 0, got {budget_mult}")
    if epoch_cap <= 0.0:
        raise ValueError(f"epoch_cap must be > 0, got {epoch_cap}")
    weight = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # The |strata|-row aggregate feeds FOUR downstream subtrees (budget,
    # ranking, cap frame, water level); without truncation each replays
    # the corpus scan — 4 full passes at 100 TB for 5 rows of state.
    # localCheckpoint pins the tiny frame so the corpus is read ONCE.
    dom = (
        df.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(weight.cast("bigint")).alias("n_tokens"),
        )
        .localCheckpoint()
    )
    tot = dom.agg(
        (F.sum("n_tokens").cast("double") * F.lit(float(budget_mult))).alias(
            "__budget"
        ),
        F.count(F.lit(1)).alias("__d"),
    )
    # dim-sized window: input is the post-agg |strata|-row frame
    # (languages/domains — a vocabulary, not the corpus), so the
    # partitionless sort is bounded regardless of corpus size.
    w_ord = Window.orderBy("capacity", strata_col)
    ranked = (
        dom.crossJoin(F.broadcast(tot))
        .withColumn(
            "capacity", F.col("n_tokens").cast("double") * F.lit(float(epoch_cap))
        )
        .withColumn("__rn", F.row_number().over(w_ord))
        .withColumn(
            "__cum_prev",
            F.coalesce(
                F.sum("capacity").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
    )
    cond = ranked.withColumn(
        "__cond",
        F.when(
            F.col("capacity") * (F.col("__d") - F.col("__rn") + F.lit(1))
            <= F.col("__budget") - F.col("__cum_prev"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    capped = cond.withColumn(
        "capped",
        F.min("__cond").over(
            # dim-sized window: same |strata|-row frame as w_ord above.
            Window.orderBy("__rn").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        == F.lit(1),
    )
    lvl = capped.agg(
        F.sum(F.when(F.col("capped"), F.col("capacity")).otherwise(0.0)).alias(
            "__capped_cap"
        ),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("__n_capped"),
    )
    alloc = (
        F.when(F.col("capped"), F.col("capacity"))
        .otherwise(
            F.when(
                F.col("__d") > F.col("__n_capped"),
                (F.col("__budget") - F.col("__capped_cap"))
                / (F.col("__d") - F.col("__n_capped")),
            ).otherwise(F.lit(0.0))
        )
    )
    return capped.crossJoin(F.broadcast(lvl)).select(
        strata_col,
        "n_docs",
        "n_tokens",
        "capacity",
        "capped",
        F.round(alloc, 6).alias("alloc_tokens"),
        # a zero-token stratum (capacity 0, always capped, alloc 0) would
        # make alloc/n_tokens NULL and silently drop the stratum's docs
        # from the repetition manifest downstream — emit epochs=0.0 so
        # _unimax_plan's n_full/frac stay non-null (ADVICE r8)
        F.when(F.col("n_tokens") > 0, F.round(alloc / F.col("n_tokens"), 6))
        .otherwise(F.lit(0.0))
        .alias("epochs"),
        F.round(alloc / F.col("__budget"), 6).alias("budget_share"),
    )


def _md5_uniform(key_col: str, salt: str):
    """Deterministic uniform in (0, 1]: (int(md5[:8], 16) + 1) / (2^32+1).
    Engines disagree on hex→int BUILTINS, not on arithmetic — so the
    integer is rebuilt portably as a positional polynomial of strpos
    lookups over the hex alphabet (8 terms, constant-folded weights)."""
    from pyspark.sql import functions as F

    d = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    val = None
    for i in range(8):
        term = (F.instr(F.lit("0123456789abcdef"), F.substring(d, i + 1, 1)) - 1) * F.lit(
            float(16 ** (7 - i))
        )
        val = term if val is None else val + term
    return (val + F.lit(1.0)) / F.lit(float(16**8 + 1))


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsk",
    round_dp: int = 12,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k rows
    (Efraimidis–Spirakis 2006): each row draws u ~ Uniform(0,1] from its
    content hash and keeps key = u^(1/w); the k largest keys are a
    weighted sample without replacement. The curation use: draw a
    quality-weighted eval/inspection set where a 2x-quality doc is 2x as
    likely, reproducibly — same corpus, same sample, on any engine,
    layout, or rerun (df.sample can do none of this, and rate-based
    hash_sample can't target EXACTLY k).

    Scale shape: pure projection (md5 + 8-term polynomial + one pow) then
    global top-k = TakeOrderedAndProject (per-partition heaps of k, no
    full sort). Keys round to `round_dp` before ranking with an id
    tie-break, so selection is engine-deterministic (round-before-rank
    convention). Rows with weight <= 0 are excluded (u^(1/w) undefined).
    Emits the input columns + `sample_key`."""
    from pyspark.sql import functions as F

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = _md5_uniform(key_col, salt)
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), round_dp)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(key_col))
        .limit(k)
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    quality_col: str = "q_score",
    token_col: str = "n_tokens",
    bins: int = 32,
) -> DataFrame:
    """Greedy token-budget selection: keep documents in (quality desc, id)
    order until the token budget is spent — "train on the best N tokens",
    the data-constrained-training selection policy. A row is kept iff the
    EXCLUSIVE prefix-sum of tokens before it (in that global order) is
    still below `budget`, so the budget may be exceeded by at most one
    document and the kept set is a deterministic function of the corpus.

    The naive form is a global-order window cumsum — a single-partition
    WindowExec that moves the whole corpus through one task. This
    implementation decomposes it exactly: quality bins by value
    (floor(q·bins), monotone in q, so bin order IS global order), a
    |bins|-row cumulative total across bins, then a per-bin window for
    the within-bin prefix — parallel across bins, each seeing ~1/bins of
    the data. Quality must be in [0, 1] (values at 1.0 clamp into the
    top bin); ties across a bin boundary are impossible because equal
    quality means equal bin. Token counts are integers, so every prefix
    sum is exact (oracle-safe without rounding)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = F.least(F.floor(F.col(quality_col) * bins), F.lit(bins - 1)).cast("int")
    t = df.withColumn("__bin", b)
    bin_tot = t.groupBy("__bin").agg(F.sum(token_col).alias("__bt"))
    # dim-sized window: exactly |bins| rows (the cross-bin prefix of the
    # two-level decomposition; the data-sized prefix runs per-bin below)
    wb = (
        Window.orderBy(F.col("__bin").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bin_prior = bin_tot.select(
        "__bin", F.coalesce(F.sum("__bt").over(wb), F.lit(0)).alias("__prior_bins")
    )
    ww = (
        Window.partitionBy("__bin")
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.join(F.broadcast(bin_prior), "__bin")
        .withColumn("__prior_in_bin", F.coalesce(F.sum(token_col).over(ww), F.lit(0)))
        .filter(F.col("__prior_bins") + F.col("__prior_in_bin") < budget)
        .drop("__bin", "__prior_bins", "__prior_in_bin")
    )


def hash_sample_fixed_k(
    df: DataFrame, key_col: str, strata_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic EXACTLY-k-per-stratum sample: rank rows within each
    stratum by md5(key || salt) (ties by key) and keep the k smallest —
    the fixed-budget companion to rate-based hash_sample (e.g. 'exactly
    10k eval docs per domain'), equally layout/engine/rerun-stable.

    Scale shape: one shuffle on the stratum key + a per-stratum sort on
    an 8-byte digest prefix; k << |stratum|, and the rank filter
    short-circuits via WindowGroupLimit (Spark pushes rn <= k into the
    sort, keeping per-partition heaps of k, not full sorts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(digest, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def proportional_allocate(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    num: int,
    den: int,
    salt: str = "",
) -> DataFrame:
    """EXACT-size stratified sample by largest-remainder apportionment
    (Hamilton's method): select floor(n * num/den) rows IN TOTAL, with
    per-stratum quotas proportional to stratum size — floor(n_s*num/den)
    each, plus one extra for the strata with the largest remainders
    (ties to the lexicographically smaller stratum) until the total
    quota is met. Within a stratum, membership is the deterministic md5
    rank (hash_sample_fixed_k idiom): layout-, rerun-, and
    engine-stable. The fraction arrives as an exact rational num/den so
    every quota is INTEGER arithmetic — no float targets, no rounding
    disagreements, and the sizes are certifiable: sum of per-stratum
    selections == floor(n*num/den) exactly, the property a fixed-budget
    eval carve must prove.

    Scale shape: one stratum-size agg (dimension-sized), the
    apportionment over |strata| rows (dim-sized window), a broadcast
    quota join back, and a per-stratum rank filter that short-circuits
    via WindowGroupLimit. Returns the selected rows with their input
    columns."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if num < 0 or den <= 0 or num > den:
        raise ValueError(f"need 0 <= num <= den and den > 0, got {num}/{den}")
    sizes = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    tot = sizes.agg(F.sum("__n").alias("__tot"))
    # `div` (SQL integer division) keeps every quota in pure integer
    # arithmetic at any scale (ADVICE r4): floor(n*num/den) via double
    # division is exact only while n*num < 2^53 — a silent departure
    # from the exact-rational idiom this operator advertises. Counts are
    # non-negative, so truncating `div` equals floor.
    base = sizes.crossJoin(F.broadcast(tot)).select(
        "__s",
        "__n",
        F.expr(f"(__n * {num}) div {den}").cast("long").alias("__base"),
        ((F.col("__n") * num) % F.lit(den)).alias("__rem"),
        F.expr(f"(__tot * {num}) div {den}").cast("long").alias("__quota_tot"),
    )
    # dim-sized window: |strata| rows (post-agg apportionment table)
    w_rem = Window.orderBy(F.col("__rem").desc(), F.col("__s"))
    alloc = (
        base.withColumn("__base_sum", F.sum("__base").over(
            # dim-sized window: |strata| rows
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ))
        .withColumn("__rk", F.row_number().over(w_rem))
        .withColumn(
            "__alloc",
            F.col("__base")
            + F.when(
                F.col("__rk") <= F.col("__quota_tot") - F.col("__base_sum"), 1
            ).otherwise(0),
        )
        .select(F.col("__s").alias(strata_col), "__alloc")
    )
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w_in = Window.partitionBy(strata_col).orderBy(digest, F.col(key_col))
    return (
        df.join(F.broadcast(alloc), strata_col)
        .withColumn("__rn", F.row_number().over(w_in))
        .filter(F.col("__rn") <= F.col("__alloc"))
        .drop("__rn", "__alloc")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epochs: int = 2,
    n_shards: int = 8,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic multi-epoch training-order shuffle with round-robin
    shard assignment — the reproducible global permutation every
    pretraining data loader needs (each epoch must visit the corpus in a
    different but RERUNNABLE order, and the order must be materializable
    as ~equal shard files).

    Epoch e permutes the corpus by the md5 digest of
    ``f"{salt}:e{e}:{id}"`` — the portable-hash idiom (identical strings
    digest identically in Spark and DuckDB, and across reruns, so the
    order is a pure function of ids, not of partitioning or timing).
    The global position within an epoch comes from
    :func:`~.sort.parallel_global_rank` (range shuffle + parallel
    per-partition rank + broadcast prefix offsets), so no stage funnels
    the corpus through a single-reducer window at any scale. Shard id is
    ``(position - 1) % n_shards``: round-robin off the position, so
    shard sizes differ by at most one document per epoch.

    Cost: `epochs` range shuffles over an (id, 32-hex-char digest)
    projection — never the full document rows; the caller joins
    positions back to content when writing shards.
    """
    from pyspark.sql import functions as F

    from .sort import parallel_global_rank

    if epochs < 1 or n_shards < 1:
        raise ValueError("epochs and n_shards must be >= 1")
    out = None
    for e in range(1, epochs + 1):
        keyed = df.select(
            F.col(id_col),
            F.md5(
                F.concat(
                    F.lit(f"{salt}:e{e}:"), F.col(id_col).cast("string")
                )
            ).alias("__k"),
        )
        ranked = parallel_global_rank(
            keyed, [F.col("__k"), F.col(id_col)], rank_col="position"
        ).select(
            F.col(id_col),
            F.lit(e).cast("int").alias("epoch"),
            F.col("position").cast("bigint").alias("position"),
            ((F.col("position") - 1) % n_shards).cast("bigint").alias("shard"),
        )
        out = ranked if out is None else out.unionByName(ranked)
    return out


def _md5_int60(col, salt: str = "fp"):
    """Portable 60-bit integer from md5(salt:value): positional
    polynomial over the first 15 hex chars (the _md5_uniform idiom
    widened to BIGINT — engines disagree on hex→int builtins, never on
    integer arithmetic). Max 16^15-1 ≈ 1.15e18, comfortably in BIGINT."""
    from pyspark.sql import functions as F

    d = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    val = None
    for i in range(15):
        term = (
            F.instr(F.lit("0123456789abcdef"), F.substring(d, i + 1, 1)) - 1
        ).cast("bigint") * F.lit(16 ** (14 - i)).cast("bigint")
        val = term if val is None else val + term
    return val


def shard_manifest(
    shuffled: DataFrame,
    payload: DataFrame | None,
    id_col: str,
    weight_col: str | None = None,
    salt: str = "fp",
) -> DataFrame:
    """Per-(epoch, shard) manifest over an epoch_shuffle output: doc
    count, position range, optional payload weight sum, and an
    ORDER-INDEPENDENT content fingerprint — bit_xor of a portable
    60-bit md5 integer per id. XOR is commutative/associative, so the
    fingerprint is a pure function of shard MEMBERSHIP: any rerun, any
    partitioning, any engine reproduces it, and a single flipped id
    flips it — the certificate a training run records so "which data
    was in shard 3 of epoch 2" is auditable forever. All aggregates are
    map-side-combinable; the optional payload join is the only shuffle
    beyond the groupBy. The payload joins LEFT: an id missing from the
    payload contributes a NULL weight (sum skips it) but stays in
    n_docs and the fingerprint — membership is attested by the shuffle
    output alone, never silently narrowed by an incomplete payload."""
    from pyspark.sql import functions as F

    src = shuffled if payload is None else shuffled.join(payload, id_col, "left")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min("position").alias("min_pos"),
        F.max("position").alias("max_pos"),
        F.bit_xor(_md5_int60(F.col(id_col), salt)).alias("fingerprint"),
    ]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("sum_weight"))
    return src.groupBy("epoch", "shard").agg(*aggs)


def negative_sample(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic contrastive negatives: for every anchor, k
    pseudo-random corpus documents chosen by a portable hash ring —
    negative j of anchor a is the document at global position
    ``1 + (md5int60(salt:j:a) % N)`` in the doc_id ordering. A pure
    function of ids, so reruns, repartitioning, and the SQL oracle all
    reproduce the same negatives (the requirement for resumable
    contrastive training). Self-collisions (negative == anchor) are
    filtered, so an anchor occasionally yields fewer than k rows.
    Distinct j values may also hash to the SAME position (probability
    ~k^2/2N per anchor), in which case the duplicate (anchor, neg) pair
    is emitted under both j's — identically in engine and oracle;
    callers needing strictly distinct negatives dedupe on
    (anchor_id, neg_id) downstream.

    Scale shape: the position index is parallel_global_rank (range
    shuffle, no single-reducer window); candidates are |anchors| x k
    rows equi-joined to the index on position — one shuffle join, never
    a cartesian against the corpus. N = max(position) comes from the
    already-materialized index (broadcast 1-row aggregate), not a
    second corpus scan."""
    from pyspark.sql import functions as F

    from .sort import parallel_global_rank

    if k < 1:
        raise ValueError("k must be >= 1")
    idx = parallel_global_rank(
        corpus.select(id_col), [F.col(id_col)], rank_col="position"
    )
    n = idx.agg(F.max("position").cast("bigint").alias("__n"))
    cand = (
        anchors.select(F.col(id_col).alias("anchor_id"))
        .crossJoin(F.broadcast(n))
        .select(
            "anchor_id",
            "__n",
            F.explode(F.expr(f"sequence(1, {k})")).alias("j"),
        )
        .select(
            "anchor_id",
            "j",
            (
                F.lit(1)
                + _md5_int60(
                    F.concat(F.col("j").cast("string"), F.lit(":"), F.col("anchor_id").cast("string")),
                    salt,
                )
                % F.col("__n")
            ).alias("position"),
        )
    )
    return (
        cand.join(idx, "position")
        .filter(F.col(id_col) != F.col("anchor_id"))
        .select("anchor_id", "j", F.col(id_col).alias("neg_id"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col,
    capacity: int,
    order: Sequence | None = None,
    base_offset: int = 0,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-pretraining layout:
    documents are concatenated in a deterministic total order and the
    token stream is cut into fixed-`capacity` training sequences; a
    document crossing a cut contributes a span to each side. Unlike
    bin-packing heuristics (first-fit etc., inherently sequential),
    concat-and-chunk is a PURE function of the global token offset, so
    it distributes: offsets come from parallel_prefix_sum (range
    shuffle + per-partition scan, no single-reducer window) and every
    remaining step is a row-local projection + a bounded explode
    (straddle rows only). Zero padding waste by construction — the
    complement of the padding_waste report, which measures what
    per-example batching would have wasted.

    Emits one row per (document, sequence) span:
      seq_id     — 0-based training-sequence index
      doc_from   — first token of the doc in this span (0-based, incl.)
      doc_to     — end of the span within the doc (exclusive)
      pos_in_seq — where the span starts inside the sequence
      n_tok      — span length (= doc_to - doc_from)
    Every sequence except the last is exactly full:
    sum(n_tok) per seq_id == capacity. Zero-length documents emit no
    rows (they occupy no tokens). All arithmetic is integer (DIV, not
    floating division — offsets stay exact past 2^53 tokens).

    `order` defaults to (md5(id), id) — the repo's deterministic-
    shuffle idiom: layout- and rerun-stable, engine-portable, and a
    fresh salt re-deals the concatenation for another epoch.

    `base_offset` shifts the whole token stream: an INCREMENTAL caller
    (the streamed packing fold) packs each new slice starting where the
    previous one ended, and because chunking is a pure function of the
    global offset, the union of incrementally-packed spans equals one
    pack of the whole concatenation — the carry-over algebra
    q_stream_pack certifies."""
    if capacity < 1:
        raise ValueError(f"pack_sequences needs capacity >= 1, got {capacity}")
    from pyspark.sql import functions as F

    from .sort import parallel_prefix_sum

    lc = F.col(len_col) if isinstance(len_col, str) else len_col
    order = list(order) if order is not None else [
        F.md5(F.col(id_col).cast("string")),
        F.col(id_col),
    ]
    # order expressions are evaluated against the CALLER's frame and
    # aliased into the projection, so they may reference any input
    # column (e.g. a micro-batch id), not just id/len
    okeys = [
        (F.col(c) if isinstance(c, str) else c).alias(f"__o{i}")
        for i, c in enumerate(order)
    ]
    rows = df.select(
        F.col(id_col), lc.cast("long").alias("__len"), *okeys
    ).filter(F.col("__len") > 0)
    offs = parallel_prefix_sum(
        rows, [f"__o{i}" for i in range(len(order))], "__len", out_col="__off"
    )
    if base_offset:
        offs = offs.withColumn(
            "__off", F.col("__off") + F.lit(int(base_offset)).cast("long")
        )
    spans = offs.select(
        F.col(id_col),
        F.col("__len"),
        F.col("__off"),
        F.explode(
            F.sequence(
                F.expr(f"__off DIV {capacity}"),
                F.expr(f"(__off + __len - 1) DIV {capacity}"),
            )
        ).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * F.lit(capacity).cast("long")
    doc_from = F.greatest(F.lit(0).cast("long"), seq_start - F.col("__off"))
    doc_to = F.least(
        F.col("__len"), seq_start + F.lit(capacity).cast("long") - F.col("__off")
    )
    pos_in_seq = F.greatest(F.lit(0).cast("long"), F.col("__off") - seq_start)
    return spans.select(
        F.col(id_col),
        F.col("seq_id"),
        doc_from.alias("doc_from"),
        doc_to.alias("doc_to"),
        pos_in_seq.alias("pos_in_seq"),
        (doc_to - doc_from).alias("n_tok"),
    )
