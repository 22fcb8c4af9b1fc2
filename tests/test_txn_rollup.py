"""Transactional roll-up: atomicity, replay idempotence, kill-mid-merge.

The contract under test (operators/txn_rollup.py): a merge is visible if and
only if its commit file exists; the epoch id rides inside the commit, so a
crashed merge replays to the SAME table (no double count, no torn days).
Closes VERDICT r1 #4 (marker-write crash window, non-atomic dynamic
partition overwrite).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from qradar_restapi_kafka_datapipeline_spark.operators.rollup import summing_rollup
from qradar_restapi_kafka_datapipeline_spark.operators.txn_rollup import TxnRollupTable


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "Start_Time STRING, domainId BIGINT, eventName STRING, Event_Count BIGINT"
    ).withColumn("Start_Time", F.to_timestamp("Start_Time"))


def _table_hash(df) -> str:
    rows = sorted(
        "|".join(str(v) for v in r)
        for r in df.select(
            "Start_Time", "domainId", "eventName", "Event_Count", "event_date"
        ).collect()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.fixture()
def batches(spark):
    b0 = _events(
        spark,
        [
            ("2024-01-05 10:15:00", 1, "login", 2),
            ("2024-01-05 10:45:00", 1, "login", 3),  # same hour → collapses
            ("2024-01-06 09:00:00", 2, "logout", 1),
        ],
    )
    b1 = _events(
        spark,
        [
            ("2024-01-05 10:59:00", 1, "login", 5),  # late row, same hour as b0
            ("2024-01-07 23:30:00", 3, "login", 7),
        ],
    )
    return b0, b1


def _expected(spark, b0, b1):
    return summing_rollup(b0.unionByName(b1))


def test_merge_equals_batch_rollup(spark, tmp_path, batches):
    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "t"))
    t.merge(b0, epoch=0)
    t.merge(b1, epoch=1)
    assert _table_hash(t.read()) == _table_hash(_expected(spark, b0, b1))


def test_replayed_epoch_is_skipped(spark, tmp_path, batches):
    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "t"))
    t.merge(b0, epoch=0)
    t.merge(b1, epoch=1)
    h = _table_hash(t.read())
    t.merge(b1, epoch=1)  # at-least-once replay of a COMMITTED epoch
    assert _table_hash(t.read()) == h  # no double count
    assert t.committed_epochs() == {0, 1}


def test_kill_mid_merge_replays_to_same_hash(spark, tmp_path, batches):
    """Crash AFTER the new version dirs are written but BEFORE the commit
    rename: the old snapshot must stay intact (no torn days), the epoch must
    read as uncommitted, and the replay must converge to the one-shot hash."""
    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "t"))
    t.merge(b0, epoch=0)
    h_before = _table_hash(t.read())

    with pytest.raises(RuntimeError, match="injected crash"):
        t.merge(b1, epoch=1, _crash_before_commit=True)

    # torn-merge window: data dirs exist on disk, table is unchanged
    assert _table_hash(t.read()) == h_before
    assert t.committed_epochs() == {0}

    t.merge(b1, epoch=1)  # the replay
    # the crashed attempt's version dir is REUSED by the replay (commit ids
    # derive from the commit log, not the filesystem), so no orphan survives
    assert _table_hash(t.read()) == _table_hash(_expected(spark, b0, b1))


def test_vacuum_reclaims_superseded_versions(spark, tmp_path, batches):
    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "t"))
    t.merge(b0, epoch=0)   # v1: days 05, 06
    t.merge(b1, epoch=1)   # v2: days 05, 07
    t.merge(b0, epoch=2)   # v3: days 05, 06  → v1 now unreachable
    h = _table_hash(t.read())
    removed = t.vacuum(keep_commits=1)
    assert removed == 1    # v1 reclaimed; v2 still live (day 07)
    assert _table_hash(t.read()) == h  # reads unaffected by vacuum


def test_empty_increment_is_noop(spark, tmp_path, batches):
    b0, _ = batches
    t = TxnRollupTable(spark, str(tmp_path / "t"))
    t.merge(b0, epoch=0)
    h = _table_hash(t.read())
    t.merge(b0.limit(0), epoch=5)
    assert _table_hash(t.read()) == h


def test_vacuum_keeps_epoch_ledger(spark, tmp_path, batches):
    """Pruning commit FILES must not forget committed epochs: a checkpoint
    replay of an old epoch after vacuum() would otherwise double-count."""
    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "t_vac"))
    t.merge(b0, epoch=5)
    t.merge(b1, epoch=None)  # maintenance merge, no epoch
    t.vacuum(keep_commits=1)
    # fresh handle = fresh cache warm from the surviving log only
    t2 = TxnRollupTable(spark, str(tmp_path / "t_vac"))
    assert 5 in t2.committed_epochs()
    before = _table_hash(t2.read())
    t2.merge(b0, epoch=5)  # replayed old epoch must be a no-op
    assert _table_hash(t2.read()) == before


def test_writer_cache_tracks_own_commits(spark, tmp_path, batches):
    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "t_cache"))
    t.merge(b0, epoch=1)
    t.merge(b1, epoch=2)
    assert t.committed_epochs() == {1, 2}
    # a second handle sees the same ledger from disk
    assert TxnRollupTable(spark, str(tmp_path / "t_cache")).committed_epochs() == {1, 2}


def test_vacuum_migrates_pre_ledger_commits(spark, tmp_path, batches):
    """Vacuum on a log written by pre-ledger code (commits carry only their
    own 'epoch', no cumulative 'epochs') must not forget pruned epochs — it
    re-publishes the newest snapshot with the full ledger first (ADVICE r2)."""
    import glob
    import json as _json
    import os as _os

    b0, b1 = batches
    path = str(tmp_path / "t_mig")
    t = TxnRollupTable(spark, path)
    t.merge(b0, epoch=5)
    t.merge(b1, epoch=7)
    # simulate the old wire format: strip the cumulative ledger field
    # (and drop the Hadoop LocalFileSystem .crc sidecars the out-of-band
    # rewrite invalidates)
    for f in glob.glob(_os.path.join(path, "_commits", "*.json")):
        with open(f) as fh:
            c = _json.load(fh)
        c.pop("epochs", None)
        with open(f, "w") as fh:
            _json.dump(c, fh)
    for crc in glob.glob(_os.path.join(path, "_commits", ".*.crc")):
        _os.remove(crc)
    t2 = TxnRollupTable(spark, path)
    t2.vacuum(keep_commits=1)
    # a cold handle over the pruned log still knows both epochs …
    t3 = TxnRollupTable(spark, path)
    assert {5, 7} <= t3.committed_epochs()
    # … so a checkpoint replay of the pruned epoch is a no-op, not a
    # double-count
    before = _table_hash(t3.read())
    t3.merge(b0, epoch=5)
    assert _table_hash(t3.read()) == before


def test_read_at_time_travel(spark, tmp_path, batches):
    """Round 11: VERSION AS OF — read_at(commit_id) reproduces the exact
    historical snapshot (commit files carry full mappings over immutable
    version dirs); read_at(epoch) resolves to the commit that epoch's
    merge published; both error paths are explicit."""
    import pytest as _pytest

    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "tt"))
    t.merge(b0, epoch=0)
    snap1 = _table_hash(t.read())
    t.merge(b1, epoch=1)
    assert _table_hash(t.read()) != snap1  # the table moved on
    assert _table_hash(t.read_at(commit_id=1)) == snap1
    assert _table_hash(t.read_at(epoch=0)) == snap1
    assert _table_hash(t.read_at(epoch=1)) == _table_hash(t.read())
    assert t.read_at(commit_id=0) is None   # before the first commit
    assert t.read_at(epoch=99) is None      # unknown epoch
    with _pytest.raises(ValueError):
        t.read_at()
    with _pytest.raises(ValueError):
        t.read_at(commit_id=1, epoch=0)


def test_read_at_respects_vacuum_retention(spark, tmp_path, batches):
    """Time travel is bounded by retention: after vacuum(keep_commits=1)
    the superseded version dirs are gone, so the historical read fails
    loudly instead of returning partial data."""
    import pytest as _pytest

    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "tt_vac"))
    t.merge(b0, epoch=0)
    t.merge(b1, epoch=1)
    latest = _table_hash(t.read())
    t.vacuum(keep_commits=1)
    assert _table_hash(t.read()) == latest  # the live snapshot is intact
    with _pytest.raises(Exception):
        t.read_at(commit_id=1).collect()


def test_read_at_epoch_none_after_vacuum(spark, tmp_path, batches):
    """ADVICE r11 (medium): epoch reads must resolve the PUBLISHING commit
    (payload epoch == e), never the cumulative replay ledger — after vacuum
    prunes the publisher, the surviving commit's ledger still CONTAINS the
    old epoch, and the pre-fix containment match silently served the newer
    snapshot as if it were the historical one.  Post-fix: None."""
    b0, b1 = batches
    t = TxnRollupTable(spark, str(tmp_path / "tt_ep"))
    t.merge(b0, epoch=0)
    t.merge(b1, epoch=1)
    t.vacuum(keep_commits=1)
    # the survivor's ledger carries epoch 0 (replay safety), but the commit
    # that PUBLISHED epoch 0 is gone — the historical read must say so
    assert 0 in t.committed_epochs()
    assert t.read_at(epoch=0) is None
    # the surviving publisher still resolves
    assert t.read_at(epoch=1) is not None
