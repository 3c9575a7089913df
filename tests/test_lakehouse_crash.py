"""Crash consistency of the lakehouse manifest protocol: a reader
must see a COMPLETE version no matter where a merge dies.

cow_merge on a versioned table performs, in order: (1) write the
merged output to a _cow_ temp dir (JVM-side), (2) shutil.move each
part into the table dir, (3) snapshot_commit — manifest JSON to a
.tmp name, then one atomic os.rename.  We enumerate EVERY
driver-side kill point (each move, the rename, and the boundaries)
— exhaustive beats sampling here because the op space is tiny — and
assert after each crash:

- the latest readable version returns exactly the OLD contents
  (crash before the rename) or exactly the NEW contents (crash at or
  after it) — never a partial mix;
- version 0 stays time-travel readable;
- re-running the SAME merge converges to the post-merge contents
  (the documented crash-repair path).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _fresh_table(spark, path, n=400):
    spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(path)


def _contents(spark, path, version=None):
    from cassandra_data_migration_spark.sources.lakehouse import read_snapshot

    return {
        (r["k"], r["v"]) for r in read_snapshot(spark, path, version).collect()
    }


class _Kill(Exception):
    pass


class _OpCounter:
    """Raises _Kill when the shared op budget is exhausted."""

    def __init__(self, budget):
        self.budget = budget
        self.seen = 0

    def tick(self):
        self.seen += 1
        if self.budget is not None and self.seen > self.budget:
            raise _Kill(f"injected crash at op {self.seen}")


def _run_merge_with_kill(spark, path, budget):
    """cow_merge with shutil.move / os.rename instrumented; returns
    the number of driver-side ops a clean run performs."""
    from cassandra_data_migration_spark.sources import lakehouse

    counter = _OpCounter(budget)
    real_move, real_rename = shutil.move, os.rename

    def move(*a, **kw):
        counter.tick()
        return real_move(*a, **kw)

    def rename(*a, **kw):
        counter.tick()
        return real_rename(*a, **kw)

    upd = spark.createDataFrame(
        [(7, -7), (401, -401)], "k long, v long"
    )  # one update, one insert
    shutil.move_orig = real_move
    try:
        shutil.move = move
        os.rename = rename
        lakehouse.cow_merge(
            spark, path, upd, "k", delete_keys=spark.createDataFrame(
                [(13,)], "k long"
            ),
        )
    finally:
        shutil.move = real_move
        os.rename = real_rename
    return counter.seen


def test_crash_at_every_kill_point_keeps_versions_complete(spark, tmp_path):
    from cassandra_data_migration_spark.sources.lakehouse import (
        snapshot_commit,
        snapshot_versions,
    )

    # clean run to learn the op count and the expected end state
    ref = str(tmp_path / "ref")
    _fresh_table(spark, ref)
    snapshot_commit(ref)
    old = _contents(spark, ref)
    n_ops = _run_merge_with_kill(spark, ref, budget=None)
    new = _contents(spark, ref)
    assert n_ops >= 2  # at least one move + the manifest rename
    assert (7, -7) in new and (401, -401) in new
    assert not any(k == 13 for k, _ in new)

    for kill_at in range(n_ops):
        path = str(tmp_path / f"t{kill_at}")
        _fresh_table(spark, path)
        snapshot_commit(path)
        with pytest.raises(_Kill):
            _run_merge_with_kill(spark, path, budget=kill_at)

        versions = snapshot_versions(path)
        got = _contents(spark, path)
        if versions == [0]:
            # died before the manifest rename: reader sees the old
            # version, bit-exact
            assert got == old, f"kill@{kill_at}: partial state visible"
        else:
            # rename happened: the new version is complete
            assert versions == [0, 1]
            assert got == new, f"kill@{kill_at}: committed version partial"
        # v0 always stays time-travel readable
        assert _contents(spark, path, 0) == old

        # crash-repair: rerunning the SAME merge converges
        _run_merge_with_kill(spark, path, budget=None)
        assert _contents(spark, path) == new, f"kill@{kill_at}: rerun diverged"


def test_snapshot_commit_tmp_never_listed(tmp_path):
    """A crashed commit's .tmp manifest must be invisible to
    snapshot_versions (it only matches the v<N>.json shape)."""
    from cassandra_data_migration_spark.sources.lakehouse import (
        snapshot_versions,
    )

    d = tmp_path / "t" / "_manifests"
    d.mkdir(parents=True)
    (d / "v0.json").write_text('{"version": 0, "files": []}')
    (d / ".v1.json.tmp").write_text('{"version": 1, "files": ["x"]}')
    assert snapshot_versions(str(tmp_path / "t")) == [0]
