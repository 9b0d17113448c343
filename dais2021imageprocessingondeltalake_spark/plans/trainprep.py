"""Training-data preparation — reference parity (`02.a:74-101` /
`02.b:80-106`, traced at SURVEY.md §3.2):

    scan → select(content, cast(label_index as long)) → limit
    → distinct-count classes → seeded randomSplit → repartition floor
    → parquet cache write (1 MB row groups, uncompressed)

Engine scope ends at the cache write; `read_training_batches` (r6) is
the petastorm-equivalent data plane over that cache — deterministic
row-group shuffle, epochs, TransformSpec-style hook — leaving only the
one-line TF/Torch binding (`to_ml_dataset`) external. Experiment
tracking lives in `functions/tracking.py` (same J6 narrowing).
"""

from __future__ import annotations

import random
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..operators.sampling import ensure_min_partitions, random_split
from ..sources.tables import write_table


def prepare_training_data(
    df: DataFrame,
    feature_col: str = "content",
    label_col: str = "label_index",
    limit: int | None = 100,
    weights: tuple[float, float] = (0.9, 0.1),
    seed: int = 12345,
    min_partitions: int = 2,
) -> tuple[DataFrame, DataFrame, int]:
    """Returns (train, val, n_classes) — the exact `02.a:74-83` flow:
    project/cast → limit → distinct-count → split → parallelism floor."""
    projected = df.select(feature_col, df[label_col].cast("long").alias(label_col))
    if limit:
        projected = projected.limit(limit)
    n_classes = projected.select(label_col).distinct().count()  # :78
    train, val = random_split(projected, list(weights), seed=seed)  # :79
    return (
        ensure_min_partitions(train, min_partitions),  # :82-83
        ensure_min_partitions(val, min_partitions),
        n_classes,
    )


def write_training_cache(df: DataFrame, path: str) -> str:
    """The make_spark_converter materialization (`02.a:93-97`): parquet
    cache with 1 MB row groups (:95-96 — default 32 MiB 'too high' for
    image rows) and uncompressed codec for binary payloads."""
    write_table(df, path, binary_payload=True, row_group_bytes=1_000_000)
    return path


def read_training_batches(
    cache_path: str,
    batch_size: int = 64,
    num_epochs: int = 1,
    shuffle_seed: int | None = None,
    columns: list[str] | None = None,
    transform=None,
    cur_shard: int | None = None,
    shard_count: int | None = None,
):
    """Petastorm-equivalent DATA PLANE over the parquet ML cache
    (narrows the J6 seam, r6): a generator of dict[str, np.ndarray]
    batches — exactly what `make_tf_dataset` / `make_torch_dataloader`
    wrap (`02.a:240-243`, `02.b:367-370`), minus the one-line framework
    binding (`tf.data.Dataset.from_generator` / torch `IterableDataset`
    over this iterator), which needs TF/Torch and stays the declared
    external step.

    Mirrors petastorm's public semantics:
    - `num_epochs` passes over the cache; each epoch re-reads (the cache
      is the materialization — nothing is re-derived from the source).
    - `shuffle_seed`: DETERMINISTIC shuffle at ROW-GROUP granularity
      (petastorm's own shuffle unit — row groups were sized to 1 MB at
      write time for exactly this), permuted per epoch from
      (seed, epoch) so epochs differ but reruns reproduce bit-identical
      order. None = file order.
    - `transform`: callable dict→dict applied per batch — the
      TransformSpec seam (`02.a:173-180`); runs AFTER decode, before
      the consumer, like petastorm's.
    - binary/string columns arrive as object ndarrays, numerics as
      native dtypes — the consumer reshapes to tensors.
    - `cur_shard` / `shard_count`: petastorm's rank-sharded reader
      contract (`make_tf_dataset(cur_shard=hvd.rank(),
      shard_count=hvd.size())`, reference `02.a:325-329`): rank i reads
      row groups `order[i::n]` of the epoch's (seed, epoch)-permuted
      row-group list — so the n shards are DISJOINT, their union is
      EXACTLY the epoch's row set (every row group appears in precisely
      one shard), each rank's stream is deterministic for a given
      (seed, epoch, rank), and the per-epoch permutation rebalances
      which rank reads which groups. Both params must be given
      together; rows are sharded at ROW-GROUP granularity (petastorm's
      own unit), so ranks may differ by up to one row group's rows —
      the standard contract (Horovod averages gradients over whatever
      each rank holds)."""
    import pyarrow.parquet as pq

    # validate EAGERLY (this is a plain function returning a generator,
    # not itself a generator) so a bad rank config fails at call time,
    # not at the first batch deep inside a training loop
    if (cur_shard is None) != (shard_count is None):
        raise ValueError("cur_shard and shard_count must be given together")
    if shard_count is not None:
        if shard_count < 1:
            raise ValueError(f"shard_count must be >= 1, got {shard_count}")
        if not (0 <= cur_shard < shard_count):
            raise ValueError(
                f"cur_shard must be in [0, {shard_count}), got {cur_shard}"
            )
    files = sorted(
        str(p) for p in Path(cache_path).rglob("*.parquet") if p.is_file()
    )
    if not files:
        raise ValueError(f"no parquet files under {cache_path!r}")
    groups = [
        (f, g) for f in files for g in range(pq.ParquetFile(f).num_row_groups)
    ]
    return _iterate_training_batches(
        groups, batch_size, num_epochs, shuffle_seed, columns, transform,
        cur_shard, shard_count,
    )


def _iterate_training_batches(
    groups, batch_size, num_epochs, shuffle_seed, columns, transform,
    cur_shard, shard_count,
):
    import numpy as np
    import pyarrow.parquet as pq

    for epoch in range(num_epochs):
        order = list(groups)
        if shuffle_seed is not None:
            # string seed: Random() rejects tuples, and (seed, epoch)
            # must produce independent permutations per epoch
            random.Random(f"{shuffle_seed}:{epoch}").shuffle(order)
        if shard_count is not None:
            # shard AFTER the epoch permutation: disjoint strided cover
            # of the permuted list — every group lands in exactly one
            # rank's stream, and reshuffling per epoch rotates the
            # assignment
            order = order[cur_shard::shard_count]
        pending: dict[str, list] = {}
        n_pending = 0
        for f, g in order:
            tbl = pq.ParquetFile(f).read_row_group(g, columns=columns)
            cols = {c: tbl.column(c).to_numpy(zero_copy_only=False) for c in tbl.column_names}
            n = len(tbl)
            pos = 0
            while pos < n:
                take = min(batch_size - n_pending, n - pos)
                for c, arr in cols.items():
                    pending.setdefault(c, []).append(arr[pos : pos + take])
                n_pending += take
                pos += take
                if n_pending == batch_size:
                    batch = {c: np.concatenate(parts) for c, parts in pending.items()}
                    yield transform(batch) if transform else batch
                    pending, n_pending = {}, 0
        if n_pending:
            batch = {c: np.concatenate(parts) for c, parts in pending.items()}
            yield transform(batch) if transform else batch


def to_ml_dataset(cache_path: str, framework: str = "tf"):
    """The LAST external step of J6: binding read_training_batches to a
    framework dataset object. On a training cluster:
    `tf.data.Dataset.from_generator(lambda: read_training_batches(...))`
    or a torch IterableDataset whose __iter__ is the same call. TF/Torch
    are not in this container, so the binding — and ONLY the binding —
    raises."""
    raise NotImplementedError(
        "TF/Torch are not present in this container; iterate "
        f"read_training_batches({cache_path!r}) directly — the framework "
        "wrapper is the one remaining external line"
    )
