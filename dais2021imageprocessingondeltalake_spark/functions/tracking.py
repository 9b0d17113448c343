"""Experiment tracking — the engine-side equivalent of the MLflow
surface the reference leans on (`02.a Train - TF.py:292-351`,
`02.b Train - PyTorch Distributed.py:423-485`: `mlflow.log_param`,
`mlflow.log_metric`, autolog, run registry staging). SURVEY.md §2 J6
scoped this out as external infra; this module narrows that seam the
same way `sources/versioned.py` narrowed the Delta seam — by
implementing the PUBLIC SEMANTICS on plain files, leaving only the
hosted-service/UI binding external.

Store layout (one directory per run, queryable as tables):

    <root>/<run_id>/meta.json       {run_id, name, status, params{}, tags{}}
    <root>/<run_id>/metrics.jsonl   {run_id, key, value, step} per line
    <root>/<run_id>/artifacts/      copied artifact files

Design choices, in the repo's idiom:
- Run ids are DETERMINISTIC (zero-padded counter scanned from the store,
  not a uuid/timestamp), so a tracking lifecycle is oracle-replayable.
- meta.json is written ONCE at run end via write-temp-then-rename (the
  exclusive-publication move from the versioned-table log): a reader
  never observes a half-written run; `status` records success/failure.
- `runs_table` / `metrics_table` read the store back as Spark
  DataFrames with PINNED schemas (schema inference is not a contract),
  so tracked history is queryable/joinable like any other table —
  which is the actual analytics requirement behind "MLflow" here.
"""

from __future__ import annotations

import json
import os
import shutil
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)


class _ActiveRun:
    """Handle exposed inside ``start_run``: accumulates params/tags in
    memory and appends metrics to the run's jsonl as they arrive
    (append-per-call, so a crashed run keeps its logged history —
    MLflow's behavior)."""

    def __init__(self, root: str, run_id: str, name: str | None):
        self.run_id = run_id
        self.name = name or run_id
        self._dir = os.path.join(root, run_id)
        self._params: dict[str, str] = {}
        self._tags: dict[str, str] = {}
        self._metric_steps: dict[str, int] = {}
        os.makedirs(os.path.join(self._dir, "artifacts"), exist_ok=True)

    def log_param(self, key: str, value) -> None:
        self._params[str(key)] = str(value)

    def log_params(self, params: dict) -> None:
        for k, v in params.items():
            self.log_param(k, v)

    def set_tag(self, key: str, value) -> None:
        self._tags[str(key)] = str(value)

    def log_metric(self, key: str, value: float, step: int | None = None) -> None:
        if step is None:
            step = self._metric_steps.get(key, -1) + 1
        self._metric_steps[key] = step
        with open(os.path.join(self._dir, "metrics.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "run_id": self.run_id,
                        "key": str(key),
                        "value": float(value),
                        "step": int(step),
                    }
                )
                + "\n"
            )

    def log_artifact(self, local_path: str, artifact_name: str | None = None) -> str:
        dest = os.path.join(
            self._dir, "artifacts", artifact_name or os.path.basename(local_path)
        )
        shutil.copyfile(local_path, dest)
        return dest

    def _finish(self, status: str) -> None:
        meta = {
            "run_id": self.run_id,
            "name": self.name,
            "status": status,
            "params": self._params,
            "tags": self._tags,
        }
        tmp = os.path.join(self._dir, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, sort_keys=True)
        os.replace(tmp, os.path.join(self._dir, "meta.json"))


class ExperimentTracker:
    """File-backed experiment store rooted at one directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _next_run_id(self) -> str:
        existing = [
            d
            for d in os.listdir(self.root)
            if d.startswith("run_") and os.path.isdir(os.path.join(self.root, d))
        ]
        return f"run_{len(existing):04d}"

    @contextmanager
    def start_run(self, run_name: str | None = None, run_id: str | None = None):
        run = _ActiveRun(self.root, run_id or self._next_run_id(), run_name)
        try:
            yield run
        except Exception:
            run._finish("FAILED")
            raise
        run._finish("FINISHED")


_META_SCHEMA = (
    "run_id string, name string, status string, "
    "params map<string,string>, tags map<string,string>"
)
_METRIC_SCHEMA = "run_id string, key string, value double, step bigint"


def runs_table(spark: SparkSession, root: str) -> DataFrame:
    """Finished/failed runs as a DataFrame (one row per run; params and
    tags as map columns — `F.col("params")["lr"]` to filter)."""
    return spark.read.schema(_META_SCHEMA).json(os.path.join(root, "*", "meta.json"))


def metrics_table(spark: SparkSession, root: str) -> DataFrame:
    """Every logged metric point as (run_id, key, value, step)."""
    return spark.read.schema(_METRIC_SCHEMA).json(
        os.path.join(root, "*", "metrics.jsonl")
    )
