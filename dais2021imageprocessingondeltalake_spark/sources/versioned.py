"""Versioned table layer: a minimal Delta-style transaction log over
parquet (SURVEY.md §2 A5/A6 extension; VERDICT r2 "What's missing" #2).

The reference runs Delta-native everywhere — versioned overwrites, time
travel, DESCRIBE HISTORY, VACUUM (`00. Explore.py:66,90`,
`01. Ingest.py:180`, `03. Inference.py:73-77`). The delta-spark package
does not exist in this container, so `sources/tables.py` degrades those
semantics to plain parquet. This module restores the SEMANTICS with the
same mechanism Delta itself uses: an append-only commit log of JSON
entries, each naming the data directories that a version adds (append)
or replaces the live set with (overwrite). A snapshot at version N is the
log replayed through N; time travel is replay-to-an-older-N; history IS
the log; vacuum deletes data directories no retained version references.

Layout:
    <table>/_txn_log/<020d version>.json   # one commit per version
    <table>/v<version>/part-*.parquet      # that commit's data files

Commit protocol: data files land first, then the log entry is published
with an EXCLUSIVE create (os.O_CREAT | os.O_EXCL) — the version is taken
by whoever creates the log file, readers never see a version whose data
is incomplete, and a lost race surfaces as `VersionConflictError` (retry
with the next number = optimistic concurrency, exactly Delta's protocol;
on S3-class stores the atomic put-if-absent needs a coordination service,
which is where the real Delta log store plugs in — documented seam).

Scale note: replaying the log is O(#versions) driver-side JSON reads of
a few hundred bytes each — never data-sized — until `checkpoint(table)`
compacts it: a checkpoint file snapshots the replayed state at version N
plus a `_last_checkpoint` pointer (Delta's exact mechanism,
`_delta_log/_last_checkpoint`), after which every log read loads ONE
checkpoint + only the commits newer than it, O(tail) instead of
O(#versions). `expire_log` then deletes the pre-checkpoint commit files
(Delta's log-retention cleanup) — at a production cadence of a commit a
minute, this is the difference between reading a handful of files per
snapshot and half a million. Snapshot reads hand Spark the live
directory list; partition pruning, pushdown, and parallelism are
untouched parquet-scan behavior.
"""

from __future__ import annotations

import json
import os
import threading
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txn_log"
_LAST_CKPT = "_last_checkpoint"


class VersionConflictError(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency): re-read the log and retry with the next number."""


def _log_path(table: str) -> Path:
    return Path(table) / _LOG_DIR


def _entry_path(table: str, version: int) -> Path:
    return _log_path(table) / f"{version:020d}.json"


def _ckpt_path(table: str, version: int) -> Path:
    return _log_path(table) / f"{version:020d}.checkpoint.json"


def _read_last_checkpoint(table: str) -> dict | None:
    p = _log_path(table) / _LAST_CKPT
    if not p.is_file():
        return None
    with open(p) as f:
        return json.load(f)


def _read_log_once(table: str) -> list[dict]:
    log_dir = _log_path(table)
    if not log_dir.is_dir():
        return []
    last = _read_last_checkpoint(table)
    entries: list[dict] = []
    floor_name = ""
    if last is not None:
        with open(log_dir / last["path"]) as f:
            ckpt = json.load(f)
        entries = list(ckpt["entries"])
        floor_name = f"{last['version']:020d}.json"
    for p in sorted(log_dir.glob("*.json")):
        if p.name.endswith(".checkpoint.json") or p.name <= floor_name:
            continue
        with open(p) as f:
            entries.append(json.load(f))
    return entries


def _read_log(table: str) -> list[dict]:
    """Full ordered entry list, checkpoint-aware: with a checkpoint at
    version N, this reads ONE checkpoint file plus only the commit files
    newer than N (their zero-padded names sort after the checkpoint's),
    reconstructing exactly the list a full replay would produce — so
    every consumer (snapshot reads, history, vacuum, the stream sink's
    batch_id dedup, the next writer's version assignment) is checkpoint-
    transparent.

    The pointer-then-glob sequence is NOT atomic against a concurrent
    checkpoint() + expire_log(): a reader holding a pre-checkpoint
    pointer can glob AFTER the old commit files are deleted, silently
    losing the log prefix (or crash opening a just-deleted file). Every
    VALID entry list starts at version 0 and is gap-free (a checkpoint
    stores the FULL replayed list through its version), so both races
    are detectable — on a truncated/gapped read or a vanished file,
    re-read the (by then advanced) pointer and retry."""
    last_parse_error: Exception | None = None
    for attempt in range(8):
        try:
            entries = _read_log_once(table)
        except FileNotFoundError:
            last_parse_error = None
            continue  # commit file expired between glob and open — retry
        except (json.JSONDecodeError, KeyError) as e:
            # third race variant: a commit/checkpoint file created via
            # O_EXCL whose json.dump has not finished yet (or a torn
            # file). Unlike the vanished-file race (which resolves on
            # the very next glob), an in-progress writer may legitimately
            # be stalled mid-json.dump for a while (GC pause, slow or
            # remote filesystem) — give the decode path an exponential
            # backoff (10ms..1.28s, ~2.5s total grace) instead of the
            # old flat 5x10ms (~50ms) that failed spuriously. No sleep
            # after the FINAL attempt (ADVICE r10): the loop exits to
            # raise corruption either way, and the extra 1.28s only
            # delays the error.
            last_parse_error = e
            if attempt < 7:
                time.sleep(0.01 * (2**attempt))
            continue
        last_parse_error = None
        if not entries:
            return entries
        versions = [e["version"] for e in entries]
        if versions[0] == 0 and versions == list(
            range(versions[0], versions[0] + len(versions))
        ):
            return entries
    if last_parse_error is not None:
        # exhausted the decode-grace window: the file is still unparseable
        # after ~2.5s — report it as corruption (with the parse error),
        # not as a checkpoint/expire race.
        raise VersionConflictError(
            f"log read of {table} found a commit/checkpoint file that "
            f"stayed unparseable through 8 backoff attempts (~2.5s) — the "
            f"file is torn/corrupt, not merely mid-write: {last_parse_error}"
        ) from last_parse_error
    raise VersionConflictError(
        f"log read of {table} kept racing concurrent checkpoint/expire "
        "cycles (8 attempts) — the table's log is being rewritten faster "
        "than it can be read, or the log is corrupt (missing versions)"
    )


def latest_version(table: str) -> int | None:
    log = _read_log(table)
    return log[-1]["version"] if log else None


def versioned_write(
    df: DataFrame,
    table: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> int:
    """Commit `df` as the next version of `table`; returns the version.

    mode='append' adds the new files to the live set; mode='overwrite'
    replaces the live set (prior versions stay readable via time travel
    until vacuumed — the Delta overwrite semantics the plain-parquet
    fallback cannot give)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    log = _read_log(table)
    version = (log[-1]["version"] + 1) if log else 0
    data_dir = f"v{version}"
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(Path(table) / data_dir))
    entry = {
        "version": version,
        "timestamp": time.time(),
        "operation": mode,
        "data_dir": data_dir,
        "num_columns": len(df.columns),
    }
    _log_path(table).mkdir(parents=True, exist_ok=True)
    try:
        fd = os.open(
            _entry_path(table, version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
        )
    except FileExistsError as e:
        raise VersionConflictError(
            f"version {version} of {table} was committed concurrently"
        ) from e
    with os.fdopen(fd, "w") as f:
        json.dump(entry, f)
    return version


def _live_dirs(log: list[dict], version: int | None) -> list[str]:
    live: list[str] = []
    for entry in log:
        if version is not None and entry["version"] > version:
            break
        if entry["operation"] == "overwrite":
            live = [entry["data_dir"]]
        else:
            live.append(entry["data_dir"])
    return live


def versioned_read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    timestamp: float | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Snapshot read: latest by default, `version=` for VERSION AS OF,
    `timestamp=` for TIMESTAMP AS OF (greatest version committed at or
    before it). `merge_schema=True` unions the live directories' schemas
    (columns added by later appends surface as NULL in older files) —
    Delta's mergeSchema evolution semantics on the txn-log layer."""
    log = _read_log(table)
    if not log:
        raise FileNotFoundError(f"no versioned table at {table}")
    if version is not None and timestamp is not None:
        raise ValueError("pass version or timestamp, not both")
    if timestamp is not None:
        at_or_before = [e["version"] for e in log if e["timestamp"] <= timestamp]
        if not at_or_before:
            raise ValueError(f"no version of {table} existed at {timestamp}")
        version = at_or_before[-1]
    if version is not None and version > log[-1]["version"]:
        raise ValueError(
            f"version {version} does not exist (latest is {log[-1]['version']})"
        )
    dirs = _live_dirs(log, version)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", True)
    return reader.parquet(*[str(Path(table) / d) for d in dirs])


def checkpoint(table: str) -> int:
    """Compact the log at the latest version (Delta protocol
    checkpoints): write `<v>.checkpoint.json` holding the full replayed
    entry list through v, then atomically repoint `_last_checkpoint`
    (temp file + rename — readers see the old pointer or the new one,
    never a partial). Subsequent log reads load the checkpoint + only
    newer commits; prior commit files become deletable via expire_log.
    Publication uses the same exclusive-create as commits, so two
    concurrent checkpointers cannot interleave a torn file. An existing
    checkpoint file at this version is recovered, not refused: its
    content is deterministic (the replayed log through v), so whether it
    came from a concurrent checkpointer or a crash BETWEEN the file
    write and the pointer replace (the orphan that would otherwise block
    re-checkpointing this version forever), repointing `_last_checkpoint`
    at it completes the interrupted operation idempotently. A pointer
    already at (or past) this version means another checkpointer fully
    won — that surfaces as VersionConflictError for symmetry with
    commits. Returns the checkpointed version."""
    log = _read_log(table)
    if not log:
        raise FileNotFoundError(f"no versioned table at {table}")
    version = log[-1]["version"]
    ckpt = {"version": version, "timestamp": time.time(), "entries": log}
    path = _ckpt_path(table, version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as e:
        last = _read_last_checkpoint(table)
        if last is not None and last["version"] >= version:
            raise VersionConflictError(
                f"checkpoint at version {version} of {table} already exists"
            ) from e
        # orphan from a crash between file write and pointer replace:
        # finish the interrupted publication — but VALIDATE first. A
        # crash mid-json.dump (or a concurrent checkpointer still
        # writing through its own fd) leaves a torn/empty file;
        # publishing it as authoritative would make every subsequent
        # _read_log raise and let expire_log delete the only copy of
        # the pre-checkpoint commits. Adopt the orphan only if it
        # parses AND replays to exactly this log; otherwise rewrite it
        # atomically (temp file + os.replace) before repointing.
        try:
            with open(path) as f:
                existing = json.load(f)
            intact = (
                existing.get("version") == version
                and existing.get("entries") == log
            )
        except (json.JSONDecodeError, OSError):
            intact = False
        if not intact:
            # per-writer-unique temp name: two concurrent checkpointers
            # that both observe the torn orphan must not share a temp
            # file, or their writes interleave and os.replace publishes
            # a NEW torn checkpoint as authoritative — the same O_EXCL
            # discipline commits get, applied to the rewrite path.
            tmp_ckpt = (
                _log_path(table) / f".{path.name}.{os.getpid()}.{threading.get_ident()}.tmp"
            )
            with open(tmp_ckpt, "w") as f:
                json.dump(ckpt, f)
            os.replace(tmp_ckpt, path)
    else:
        with os.fdopen(fd, "w") as f:
            json.dump(ckpt, f)
    pointer = {"version": version, "path": path.name}
    tmp = _log_path(table) / f".{_LAST_CKPT}.tmp"
    with open(tmp, "w") as f:
        json.dump(pointer, f)
    os.replace(tmp, _log_path(table) / _LAST_CKPT)
    _sweep_stale_tmps(table)
    return version


#: Grace window before an orphaned `.*.tmp` in the log dir is swept: a
#: LIVE writer holds its temp for the duration of one json.dump +
#: os.replace (milliseconds); 10 minutes is ~5 orders of magnitude of
#: slack, so anything older is a crash leftover, never an in-flight write.
_TMP_SWEEP_GRACE_SECS = 600.0


def _sweep_stale_tmps(table: str, grace_secs: float = _TMP_SWEEP_GRACE_SECS) -> list[str]:
    """Remove crash-orphaned temp files from the log directory (ADVICE
    r10): the per-writer-unique checkpoint temp names
    (`.<name>.<pid>.<tid>.tmp`) that make concurrent torn-checkpoint
    repair safe are — unlike the old fixed name — never overwritten by
    a later repairer, so a crash between open and os.replace would leak
    them forever. Swept during checkpoint() and expire_log(), the two
    log-maintenance entry points. Only files older than `grace_secs`
    go: a live writer publishes (or dies) within milliseconds, so the
    window can never race an in-flight os.replace into a missing-source
    error. Returns the swept names."""
    now = time.time()
    removed = []
    for p in _log_path(table).glob(".*.tmp"):
        try:
            if now - p.stat().st_mtime > grace_secs:
                p.unlink()
                removed.append(p.name)
        except FileNotFoundError:
            continue  # another sweeper (or the owner's os.replace) won
    return removed


def expire_log(table: str) -> list[str]:
    """Delete commit files the current checkpoint already contains
    (Delta's log-retention cleanup): every `<v>.json` with v <= the
    `_last_checkpoint` version is redundant — its entry lives in the
    checkpoint — so snapshot reads, history, time travel, vacuum, and
    the stream sink's dedup are all unaffected (tested). Without a
    checkpoint this is a no-op. Returns the deleted file names."""
    last = _read_last_checkpoint(table)
    if last is None:
        return []
    floor_name = f"{last['version']:020d}.json"
    removed = []
    for p in sorted(_log_path(table).glob("*.json")):
        if p.name.endswith(".checkpoint.json") or p.name > floor_name:
            continue
        p.unlink()
        removed.append(p.name)
    _sweep_stale_tmps(table)
    return removed


def history(table: str) -> list[dict]:
    """DESCRIBE HISTORY: the commit log, newest first (Delta's order)."""
    return list(reversed(_read_log(table)))


def vacuum(table: str, retain_last: int = 1) -> list[str]:
    """Delete data directories referenced by NO retained snapshot: the
    live sets of the newest `retain_last` versions survive, everything
    else is removed. Time travel older than the retention horizon stops
    working — same contract as Delta VACUUM. Returns the deleted dirs."""
    import shutil

    if retain_last < 1:
        raise ValueError(f"retain_last must be >= 1, got {retain_last}")
    log = _read_log(table)
    if not log:
        return []
    keep: set[str] = set()
    for entry in log[-retain_last:]:
        keep.update(_live_dirs(log, entry["version"]))
    removed = []
    for entry in log:
        d = entry["data_dir"]
        if d not in keep and (Path(table) / d).is_dir():
            shutil.rmtree(Path(table) / d)
            removed.append(d)
    return removed


def versioned_merge(
    spark: SparkSession,
    source: DataFrame,
    table: str,
    keys: list[str],
    delete_col: str | None = None,
) -> int:
    """MERGE INTO the versioned table (Delta's flagship write op,
    `03. Inference.py` pattern): read the latest snapshot, apply the
    engine's upsert set-algebra (update on key match, insert on miss,
    optional delete flag), commit the result as a new OVERWRITE version.
    The prior state stays time-travelable until vacuumed, so a bad merge
    is one `versioned_read(version=n-1)` away from recovery — the
    operational property that makes MERGE safe to automate. Returns the
    new version."""
    from ..operators.merge import upsert

    current = versioned_read(spark, table)
    merged = upsert(current, source, keys, delete_col=delete_col)
    # materialize before the overwrite commit: `merged` reads the live
    # snapshot lazily, and writing a new version does not disturb old
    # dirs — but localCheckpoint keeps the read/write phases disjoint.
    return versioned_write(merged.localCheckpoint(), table, mode="overwrite")


def versioned_stream_sink(
    streaming_df: DataFrame,
    table: str,
    checkpoint_dir: str,
) -> None:
    """Exactly-once streaming appends into the versioned table — Delta's
    idempotent-writes pattern (txnAppId/txnVersion) on the txn log:
    foreachBatch commits each micro-batch as an append version whose log
    entry records the stream `batch_id`; a restart that replays a batch
    (checkpoint wrote offsets but the sink died mid-commit) finds the
    batch_id already in the log and SKIPS it, so at-least-once foreachBatch
    delivery becomes exactly-once table content. The structured-streaming
    checkpoint handles source offsets; the log handles sink idempotence —
    the two halves of the Delta sink contract."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        done = {
            e.get("stream_batch_id") for e in _read_log(table)
        }
        if batch_id in done:
            return  # replayed batch: already committed, exactly-once skip
        log = _read_log(table)
        version = (log[-1]["version"] + 1) if log else 0
        data_dir = f"v{version}"
        batch_df.write.mode("errorifexists").parquet(str(Path(table) / data_dir))
        entry = {
            "version": version,
            "timestamp": time.time(),
            "operation": "append",
            "data_dir": data_dir,
            "stream_batch_id": batch_id,
        }
        _log_path(table).mkdir(parents=True, exist_ok=True)
        try:
            fd = os.open(
                _entry_path(table, version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError as e:
            raise VersionConflictError(
                f"version {version} of {table} was committed concurrently"
            ) from e
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)

    (
        streaming_df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
