"""Training-data preparation — reference parity (`02.a:74-101` /
`02.b:80-106`, traced at SURVEY.md §3.2):

    scan → select(content, cast(label_index as long)) → limit
    → distinct-count classes → seeded randomSplit → repartition floor
    → parquet cache write (1 MB row groups, uncompressed)

Engine scope ends at the cache write (the petastorm → TF/Torch hand-off
is external ML infra, SURVEY.md §2 J6); `to_ml_dataset` is the declared
adapter seam.
"""

from __future__ import annotations

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


def to_ml_dataset(cache_path: str, framework: str = "tf"):
    """J4 adapter seam: petastorm/TF/Torch are external ML infra
    (SURVEY.md §2 J6 — out of engine scope). On a training cluster this
    returns make_tf_dataset/make_torch_dataloader over the cache."""
    raise NotImplementedError(
        "ML-framework hand-off (petastorm make_spark_converter equivalent) "
        "requires TF/Torch, not present in this container; the parquet cache "
        f"at {cache_path!r} is the engine's contract boundary"
    )
