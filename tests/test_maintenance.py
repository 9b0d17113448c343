"""Table-maintenance ops (SURVEY.md §2 A10/A11): compaction and drop."""

from __future__ import annotations

import tempfile
from pathlib import Path

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.sources.tables import (
    compact_table,
    drop_table,
)

from .conftest import SF_DIR


def test_compact_many_small_files(spark):
    docs = load_table(spark, "documents", SF_DIR)
    path = tempfile.mkdtemp(prefix="dais_compact_") + "/t"
    docs.repartition(16).write.parquet(path)  # deliberately fragmented
    before = len(list(Path(path).rglob("*.parquet")))
    assert before == 16
    n = docs.count()
    after = compact_table(spark, path)
    assert after < before
    assert spark.read.parquet(path).count() == n  # lossless rewrite


def test_drop_table(spark):
    docs = load_table(spark, "documents", SF_DIR)
    path = tempfile.mkdtemp(prefix="dais_drop_") + "/t"
    docs.write.parquet(path)
    assert Path(path).exists()
    drop_table(spark, path)
    assert not Path(path).exists()


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    """Overwriting a frame containing only partition X must replace X and
    leave the other partitions' data intact (static mode would truncate
    the whole table) — the idempotent daily-batch re-run pattern."""
    from pyspark.sql import functions as F

    from dais2021imageprocessingondeltalake_spark.sources.tables import (
        overwrite_partitions_dynamic,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10), ("c", 100)], ["part", "v"]
    )
    base.write.partitionBy("part").parquet(path)
    fresh = spark.createDataFrame([("b", 99)], ["part", "v"])
    overwrite_partitions_dynamic(fresh, path, ["part"])
    got = {
        (r["part"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {("a", 1), ("a", 2), ("b", 99), ("c", 100)}


class TestVersionedTable:
    """Transaction-log layer (sources/versioned.py): the Delta semantics
    the reference uses — versioned overwrite, time travel, history,
    vacuum — restored over parquet with an exclusive-create commit."""

    def _mk(self, spark, tmp_path):
        from dais2021imageprocessingondeltalake_spark.sources import versioned as V

        t = str(tmp_path / "tbl")
        a = spark.range(0, 10).withColumnRenamed("id", "k")
        b = spark.range(100, 105).withColumnRenamed("id", "k")
        c = spark.range(200, 203).withColumnRenamed("id", "k")
        assert V.versioned_write(a, t, mode="overwrite") == 0
        assert V.versioned_write(b, t, mode="overwrite") == 1
        assert V.versioned_write(c, t, mode="append") == 2
        return V, t

    def test_snapshot_semantics(self, spark, tmp_path):
        V, t = self._mk(spark, tmp_path)
        ks = lambda df: sorted(r["k"] for r in df.collect())
        assert ks(V.versioned_read(spark, t)) == [100, 101, 102, 103, 104, 200, 201, 202]
        assert ks(V.versioned_read(spark, t, version=0)) == list(range(10))
        assert ks(V.versioned_read(spark, t, version=1)) == [100, 101, 102, 103, 104]

    def test_timestamp_as_of(self, spark, tmp_path):
        V, t = self._mk(spark, tmp_path)
        h = V.history(t)  # newest first
        ts_v1 = [e for e in h if e["version"] == 1][0]["timestamp"]
        df = V.versioned_read(spark, t, timestamp=ts_v1)
        assert sorted(r["k"] for r in df.collect()) == [100, 101, 102, 103, 104]
        import pytest

        with pytest.raises(ValueError, match="no version"):
            V.versioned_read(spark, t, timestamp=h[-1]["timestamp"] - 1.0)

    def test_history_is_newest_first_log(self, spark, tmp_path):
        V, t = self._mk(spark, tmp_path)
        h = V.history(t)
        assert [e["version"] for e in h] == [2, 1, 0]
        assert [e["operation"] for e in h] == ["append", "overwrite", "overwrite"]

    def test_vacuum_keeps_retained_and_breaks_older_travel(self, spark, tmp_path):
        import pytest

        V, t = self._mk(spark, tmp_path)
        removed = V.vacuum(t, retain_last=2)
        # latest live set {v1,v2}; version-1 live set {v1}; only v0 goes
        assert removed == ["v0"]
        assert V.versioned_read(spark, t).count() == 8
        assert V.versioned_read(spark, t, version=1).count() == 5
        with pytest.raises(Exception):
            V.versioned_read(spark, t, version=0).count()

    def test_checkpoint_compacts_log_reads(self, spark, tmp_path):
        """Delta-protocol log checkpoints (r8): after checkpoint(), every
        log consumer (snapshot, time travel, history, vacuum, the next
        writer's version assignment) reads ONE checkpoint + only newer
        commits — proven by expire_log deleting every pre-checkpoint
        commit file and ALL semantics surviving, including commits made
        AFTER the checkpoint."""
        V, t = self._mk(spark, tmp_path)
        ks = lambda df: sorted(r["k"] for r in df.collect())
        before_latest = ks(V.versioned_read(spark, t))
        before_v1 = ks(V.versioned_read(spark, t, version=1))
        assert V.checkpoint(t) == 2
        removed = V.expire_log(t)
        assert removed == [f"{v:020d}.json" for v in (0, 1, 2)]
        # all reads identical post-expiry: the checkpoint carries the state
        assert ks(V.versioned_read(spark, t)) == before_latest
        assert ks(V.versioned_read(spark, t, version=1)) == before_v1
        assert [e["version"] for e in V.history(t)] == [2, 1, 0]
        # the log keeps growing past the checkpoint: tail commits compose
        d = spark.range(300, 302).withColumnRenamed("id", "k")
        assert V.versioned_write(d, t, mode="append") == 3
        assert ks(V.versioned_read(spark, t)) == before_latest + [300, 301]
        assert ks(V.versioned_read(spark, t, version=2)) == before_latest
        # a second checkpoint folds the tail in; expiry again leaves reads intact
        assert V.checkpoint(t) == 3
        assert V.expire_log(t) == [f"{3:020d}.json"]
        assert ks(V.versioned_read(spark, t)) == before_latest + [300, 301]
        # vacuum still sees the full live-set lineage through checkpoints
        assert V.vacuum(t, retain_last=1) == ["v0"]
        # double-checkpoint at the same version is a detected conflict
        import pytest

        with pytest.raises(V.VersionConflictError):
            V.checkpoint(t)
        # expire without any checkpoint is a no-op
        t2 = str(tmp_path / "tbl_nockpt")
        V.versioned_write(spark.range(2).withColumnRenamed("id", "k"), t2)
        assert V.expire_log(t2) == []

    def test_checkpoint_sweeps_stale_tmps_keeps_fresh(self, spark, tmp_path):
        """ADVICE r10: crash-orphaned per-writer temp files
        (`.<name>.<pid>.<tid>.tmp`) must not leak in the log dir
        forever — checkpoint()/expire_log() sweep temps older than the
        grace window, while a FRESH temp (a possibly-live writer) is
        left alone."""
        import os

        V, t = self._mk(spark, tmp_path)
        logdir = V._log_path(t)
        stale = logdir / ".00000000000000000002.checkpoint.json.999.888.tmp"
        stale.write_text("{torn")
        old = V._TMP_SWEEP_GRACE_SECS + 60
        os.utime(stale, (stale.stat().st_atime - old, stale.stat().st_mtime - old))
        fresh = logdir / ".00000000000000000002.checkpoint.json.111.222.tmp"
        fresh.write_text("{in-flight")
        V.checkpoint(t)
        assert not stale.exists(), "stale orphan temp survived the sweep"
        assert fresh.exists(), "fresh (possibly live) temp was swept"
        # expire_log sweeps too once the fresh temp ages past the window
        os.utime(fresh, (fresh.stat().st_atime - old, fresh.stat().st_mtime - old))
        V.expire_log(t)
        assert not fresh.exists()

    def test_checkpoint_preserves_stream_sink_idempotence(self, spark, tmp_path):
        """The stream sink's batch_id dedup reads the log; a checkpoint
        + expiry between restarts must not resurrect an already-applied
        batch (the stream_batch_id entries live in the checkpoint)."""
        from dais2021imageprocessingondeltalake_spark.sources import versioned as V

        t = str(tmp_path / "tbl_stream")
        # simulate two committed micro-batches via the sink's log shape
        for bid in (0, 1):
            df = spark.range(bid * 10, bid * 10 + 3).withColumnRenamed("id", "k")
            log = V._read_log(t)
            version = (log[-1]["version"] + 1) if log else 0
            df.write.mode("errorifexists").parquet(f"{t}/v{version}")
            V._log_path(t).mkdir(parents=True, exist_ok=True)
            V._entry_path(t, version).write_text(
                f'{{"version": {version}, "timestamp": 0, "operation": '
                f'"append", "data_dir": "v{version}", "stream_batch_id": {bid}}}'
            )
        V.checkpoint(t)
        V.expire_log(t)
        done = {e.get("stream_batch_id") for e in V._read_log(t)}
        assert done == {0, 1}  # replayed batches still dedup post-expiry

    def test_version_conflict_detected(self, spark, tmp_path, monkeypatch):
        """Optimistic concurrency: a writer whose log read went stale
        (another writer published the same version number between read
        and publish) must fail the EXCLUSIVE create with
        VersionConflictError, never silently clobber the log entry."""
        import pytest

        from dais2021imageprocessingondeltalake_spark.sources import versioned as V

        t = str(tmp_path / "tbl2")
        df = spark.range(3).withColumnRenamed("id", "k")
        V.versioned_write(df, t, mode="overwrite")
        stale = V._read_log(t)  # sees only version 0
        # racing writer publishes version 1 AFTER our log read
        V._entry_path(t, 1).write_text(
            '{"version": 1, "timestamp": 0, "operation": "append", "data_dir": "v1x"}'
        )
        monkeypatch.setattr(V, "_read_log", lambda _t: stale)
        with pytest.raises(V.VersionConflictError):
            V.versioned_write(df, t, mode="append")

    def test_nonexistent_version_rejected(self, spark, tmp_path):
        import pytest

        V, t = self._mk(spark, tmp_path)
        with pytest.raises(ValueError, match="does not exist"):
            V.versioned_read(spark, t, version=9)

    def test_versioned_merge_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from dais2021imageprocessingondeltalake_spark.sources import versioned as V

        t = str(tmp_path / "tbl3")
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
        )
        V.versioned_write(base, t, mode="overwrite")
        src = spark.createDataFrame(
            [(2, "B", False), (3, "c", True), (4, "d", False)], ["k", "v", "del"]
        )
        v = V.versioned_merge(spark, src, t, keys=["k"], delete_col="del")
        assert v == 1
        latest = {(r["k"], r["v"]) for r in V.versioned_read(spark, t).collect()}
        assert latest == {(1, "a"), (2, "B"), (4, "d")}  # update/delete/insert
        # pre-merge state still time-travelable
        old = {(r["k"], r["v"]) for r in V.versioned_read(spark, t, version=0).collect()}
        assert old == {(1, "a"), (2, "b"), (3, "c")}

    def test_schema_evolution_across_versions(self, spark, tmp_path):
        """An append with an extra column + mergeSchema read: new column
        surfaces, old rows show NULL — Delta's mergeSchema semantics on
        the txn log. Without mergeSchema the first file's schema wins."""
        from dais2021imageprocessingondeltalake_spark.sources import versioned as V

        t = str(tmp_path / "tbl4")
        V.versioned_write(
            spark.createDataFrame([(1, "a")], ["k", "v"]), t, mode="overwrite"
        )
        V.versioned_write(
            spark.createDataFrame([(2, "b", 9.5)], ["k", "v", "score"]),
            t,
            mode="append",
        )
        evolved = V.versioned_read(spark, t, merge_schema=True)
        assert set(evolved.columns) == {"k", "v", "score"}
        rows = {r["k"]: r["score"] for r in evolved.collect()}
        assert rows == {1: None, 2: 9.5}
        # time travel to v0 keeps the original schema
        assert set(V.versioned_read(spark, t, version=0).columns) == {"k", "v"}


def test_forget_then_vacuum_completes_erasure(spark, tmp_path):
    """The full GDPR lifecycle q_forget_rows documents: MERGE-delete the
    target rows (serving table clean immediately, history retained for
    the audit window), then VACUUM retires the pre-delete snapshot —
    after which the deleted rows are unreachable by ANY read path:
    the live set lacks them, time travel to v0 fails, and the v0 data
    directory is physically gone."""
    import pytest

    from dais2021imageprocessingondeltalake_spark.sources import versioned as V

    t = str(tmp_path / "gdpr")
    rows = [(i, f"user{i}") for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "payload"])
    V.versioned_write(df, t, mode="overwrite")
    from pyspark.sql import functions as F

    forget = df.filter(df.id % 5 == 0).withColumn("__f", F.lit(True))
    V.versioned_merge(spark, forget, t, keys=["id"], delete_col="__f")
    # audit window: deletes left the live set, history still travels
    live = {r["id"] for r in V.versioned_read(spark, t).collect()}
    assert live == {i for i in range(20) if i % 5 != 0}
    assert {r["id"] for r in V.versioned_read(spark, t, version=0).collect()} == set(
        range(20)
    )
    # compliance deadline: purge history
    removed = V.vacuum(t, retain_last=1)
    assert removed, "vacuum must retire the pre-delete snapshot"
    assert {r["id"] for r in V.versioned_read(spark, t).collect()} == live
    with pytest.raises(Exception):
        V.versioned_read(spark, t, version=0).collect()


class TestCheckpointRecovery:
    """Crash/race hardening of the checkpoint protocol (r8 review): an
    orphaned checkpoint file must be recoverable, and a reader racing a
    concurrent checkpoint+expire must never silently serve a truncated
    log."""

    @staticmethod
    def _mk(spark, tmp_path):
        from dais2021imageprocessingondeltalake_spark.sources import versioned as V

        t = str(tmp_path / "tbl_rec")
        for lo in (0, 10, 20):
            V.versioned_write(
                spark.range(lo, lo + 3).withColumnRenamed("id", "k"),
                t,
                mode="append",
            )
        return V, t

    def test_orphan_checkpoint_file_is_recovered(self, spark, tmp_path):
        """A crash between the <v>.checkpoint.json write and the
        _last_checkpoint pointer replace leaves an orphan; the next
        checkpoint() call at that version must FINISH the interrupted
        publication (identical content) instead of refusing forever."""
        import json

        V, t = self._mk(spark, tmp_path)
        # simulate the crash: write the checkpoint file, no pointer
        log = V._read_log(t)
        version = log[-1]["version"]
        orphan = V._ckpt_path(t, version)
        with open(orphan, "w") as f:
            json.dump(
                {"version": version, "timestamp": 0.0, "entries": log}, f
            )
        assert V._read_last_checkpoint(t) is None
        assert V.checkpoint(t) == version  # recovery, not conflict
        assert V._read_last_checkpoint(t)["version"] == version
        # a completed checkpoint at the version is still a conflict
        import pytest

        with pytest.raises(V.VersionConflictError):
            V.checkpoint(t)
        # and the recovered table keeps full semantics through expiry
        assert V.expire_log(t) == [f"{v:020d}.json" for v in (0, 1, 2)]
        assert sorted(r["k"] for r in V.versioned_read(spark, t).collect()) == [
            0, 1, 2, 10, 11, 12, 20, 21, 22,
        ]

    def test_torn_orphan_checkpoint_is_rewritten(self, spark, tmp_path):
        """ADVICE r8 (high): a crash MID-json.dump leaves a torn/empty
        orphan checkpoint file. Recovery must validate the orphan before
        repointing _last_checkpoint at it — publishing the torn file
        would make every subsequent _read_log raise and let expire_log
        destroy the only copy of the pre-checkpoint commits."""
        import json

        V, t = self._mk(spark, tmp_path)
        log = V._read_log(t)
        version = log[-1]["version"]
        for torn in ("", '{"version": 2, "entr'):  # empty / mid-dump crash
            with open(V._ckpt_path(t, version), "w") as f:
                f.write(torn)
            assert V.checkpoint(t) == version  # rewrite, not adopt
            # the published checkpoint must parse and replay the full log
            with open(V._ckpt_path(t, version)) as f:
                ckpt = json.load(f)
            assert ckpt["entries"] == log
            assert V._read_log(t) == log
            # reset pointer so the next torn variant re-exercises recovery
            import os

            os.remove(V._log_path(t) / V._LAST_CKPT)
        # a stale-but-valid orphan whose entries mismatch (e.g. a bug or a
        # foreign table's file landing here) is also rewritten, not adopted
        with open(V._ckpt_path(t, version), "w") as f:
            json.dump({"version": version, "timestamp": 0.0, "entries": log[:1]}, f)
        assert V.checkpoint(t) == version
        with open(V._ckpt_path(t, version)) as f:
            assert json.load(f)["entries"] == log
        assert V.expire_log(t) == [f"{v:020d}.json" for v in (0, 1, 2)]
        assert sorted(r["k"] for r in V.versioned_read(spark, t).collect()) == [
            0, 1, 2, 10, 11, 12, 20, 21, 22,
        ]

    def test_torn_commit_file_read_raises_after_retries(self, spark, tmp_path):
        """ADVICE r8 (medium): a commit file created via O_EXCL whose
        json.dump has not finished parses as torn JSON. _read_log must
        treat it like a vanished file (retry — in production the writer
        finishes within the grace window) and surface the bounded-retry
        VersionConflictError if it never heals, not JSONDecodeError."""
        import pytest

        V, t = self._mk(spark, tmp_path)
        with open(V._entry_path(t, 3), "w") as f:
            f.write('{"version": 3, "op')  # torn: writer died mid-dump
        with pytest.raises(V.VersionConflictError, match="racing|corrupt"):
            V._read_log(t)

    def test_truncated_log_read_is_detected(self, spark, tmp_path):
        """A log whose version-0 prefix vanished WITHOUT a checkpoint
        pointer (the reader side of the checkpoint+expire race, or real
        corruption) must raise, never return a silently truncated entry
        list (which would reassign version 0 and serve wrong data)."""
        import os
        import pytest

        V, t = self._mk(spark, tmp_path)
        os.remove(V._entry_path(t, 0))
        with pytest.raises(V.VersionConflictError, match="racing|missing"):
            V._read_log(t)
