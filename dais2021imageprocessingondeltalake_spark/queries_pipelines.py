"""Pipeline query registrations: the reference's three lifecycles
(SURVEY.md §3) as driver-contract entries. All rows-only (binary fixture
content has no SQL mirror); invariants are enforced in
tests/test_pipelines.py.
"""

from __future__ import annotations

import json
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.multimodal import image_features, resize_images
from .operators.sampling import local_rows_df
from .plans.inference import batch_inference, score_transform
from .plans.ingest import ingest_pipeline, load_labeled
from .plans.trainprep import prepare_training_data, write_training_cache
from .registry import query
from .sources.fixtures import LABELS, image_fixture_dir


@query("q_ingest_pipeline", oracle=None)
def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full `01. Ingest.py` parity flow on the PNG fixtures (§3.1):
    binaryFile scan → label regex → size UDF → broadcast dense-index →
    grouped-map augmentation → fan-out left join."""
    out = ingest_pipeline(spark, image_fixture_dir())
    return out.select(
        "path", "label", "label_index", F.col("size.width").alias("w"), "grayscale_format"
    )


@query("q_train_prep", oracle=None)
def q_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`02.a:74-101` parity (§3.2): project/cast → limit → distinct-count
    → seeded split → partition floor → parquet cache."""
    labeled = load_labeled(spark, image_fixture_dir())
    train, _val, _n = prepare_training_data(labeled, limit=18, weights=(0.6, 0.4))
    cache = tempfile.mkdtemp(prefix="dais_q_trainprep_") + "/train"
    write_training_cache(train, cache)
    return spark.read.parquet(cache).select("label_index")


@query("q_inference_batch", oracle=None)
def q_inference_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`03. Inference.py` batch parity (§3.3): model UDF over a struct of
    inputs, reference-shaped [prediction, probabilities-JSON] output."""

    def predict(batch: pd.DataFrame):
        return [
            [LABELS[int(n) % len(LABELS)], json.dumps({"p": int(n) % 100})]
            for n in batch["length"]
        ]

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.png")
        .load(image_fixture_dir())
        .select("path", "length")
    )
    scored = batch_inference(raw, score_transform(predict, ["length"]))
    return scored.select(
        "path",
        F.element_at("my_predictions", 1).alias("prediction"),
        F.element_at("my_predictions", 2).alias("probabilities"),
    )


@query("q_multimodal_features", oracle=None)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode path: real pixel decode (PNG via zlib, baseline
    JPEG via the pure-numpy DCT codec) → resize → feature extraction, all
    partition-local mapInPandas."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.{png,jpg}")
        .load(image_fixture_dir())
        .select("path", "content")
    )
    resized = resize_images(df, 4, 4)
    feats = image_features(resized, content_col="resized")
    return feats.select("path", F.element_at("features", 1).alias("mean_pixel"))


@query("q_scan_image", oracle=None)
def q_scan_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image source scan (A1, `00. Explore.py:45`): the portable
    re-implementation — binaryFile + header-decoded metadata struct —
    yielding the image-struct shape without a JVM codec."""
    from .sources.binaryfiles import scan_images

    df = scan_images(spark, image_fixture_dir())
    return df.select(
        F.col("image.origin").alias("origin"),
        F.col("image.size.width").alias("width"),
        F.col("image.size.height").alias("height"),
        F.col("image.nBytes").alias("n_bytes"),
    )


@query(
    "q_partitioned_write",
    oracle="SELECT event_id, value FROM events WHERE event_type = 'purchase'",
)
def q_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-encoded layout (§1.3: the reference's label=daisy/ dirs,
    `00. Explore.py:41,49`): write events partitioned by event_type, read
    back one partition — the filter becomes directory-level partition
    pruning (PartitionFilters, zero data files of other types touched)."""
    import tempfile

    from .catalog import load_table

    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    out = tempfile.mkdtemp(prefix="dais_part_") + "/events_by_type"
    ev.write.partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return back.select("event_id", "value")


@query("q_audio_features", oracle=None)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality: binaryFile scan of raw-PCM clips → numpy DSP
    features (RMS / zero-crossing rate / peak / duration) via mapInPandas.
    frombuffer IS the decode for raw PCM; compressed codecs are the
    declared NotImplementedError seam."""
    from .operators.multimodal import audio_features
    from .sources.fixtures import audio_fixture_dir

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pcm")
        .load(audio_fixture_dir())
        .select("path", "content")
    )
    return audio_features(df).select("path", "rms", "zcr", "peak", "duration_sec")


@query("q_frame_sample", oracle=None)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-ish modality: frame-packed binary payloads → every-nth frame
    rows (explode-shaped mapInPandas). Real video needs ffmpeg (declared
    stub); the Spark plumbing — schema, batching, row explosion — is real."""
    from .operators.multimodal import sample_frames

    src = local_rows_df(
        spark, [(f"video_{i}", bytes(range(256)) * 4) for i in range(4)],
        ["path", "content"]
    )
    return sample_frames(src, every_nth=3, frame_bytes=256)


@query("q_image_near_dup", oracle=None)
def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over the textured PNG corpus:
    perceptual hash (mapInPandas) → banded Hamming self-join — the
    multimodal twin of SimHash text dedup (rows-only: pixel decode has no
    SQL mirror; planted-variant recall asserted in tests)."""
    from .operators.multimodal import image_near_dup
    from .sources.fixtures import textured_image_fixture_dir

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(textured_image_fixture_dir())
        .select("path", "content")
    )
    pairs = image_near_dup(df, id_col="path", max_hamming=8, bands=8)
    return pairs.select(
        F.element_at(F.split("doc_a", "/"), -1).alias("img_a"),
        F.element_at(F.split("doc_b", "/"), -1).alias("img_b"),
        "hamming",
    )
