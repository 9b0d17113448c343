"""PySpark-native analytics engine with the capabilities of the reference
pipeline (jarobey/DAIS2021ImageProcessingOnDeltaLake — six Databricks
notebooks for multimodal ETL + ML on Delta Lake), rebuilt Spark-first.

Everything here is plain public PySpark (DataFrame / SQL / Structured
Streaming / Arrow-vectorized pandas UDFs). No custom Catalyst rules are
needed for the reference surface (SURVEY.md §4.1).

Layout:
  session     — SparkSession builder tuned for the local harness
  catalog     — synthetic-corpus loaders (/root/testdata/sf*)
  sources/    — binaryFile/image-style sources, parquet/delta sinks
  operators/  — relational ops, joins, aggregates, dedup, similarity, text
  functions/  — scalar function helpers + pandas-UDF factories
  plans/      — reference-parity pipelines (ingest, train-prep, inference)
  streaming/  — source-polymorphic streaming builders, windowed aggs
"""

from .session import get_spark

__all__ = ["get_spark"]
