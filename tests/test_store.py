"""SnapshotStore: append/read isolation, time travel, rollback, checkpoints."""

from __future__ import annotations

from distributed_webcrawler_spark.sources.store import SnapshotStore


def test_append_read_timetravel_rollback(spark, warehouse):
    store = SnapshotStore(warehouse)
    t = store.table("t")
    assert t.read(spark) is None
    t.append(spark.range(0, 5))
    t.append(spark.range(5, 9))
    assert t.snapshot_id() == 2
    assert t.read(spark).count() == 9
    assert t.read(spark, as_of=1).count() == 5       # time travel
    t.rollback(1)
    assert t.read(spark).count() == 5
    t.append(spark.range(100, 103))
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2, 3, 4, 100, 101, 102]


def test_checkpoints(spark, warehouse):
    store = SnapshotStore(warehouse)
    t = store.table("x")
    t.append(spark.range(3))
    store.write_checkpoint({"round": 1, "tables": {"x": 1}})
    t.append(spark.range(3))
    store.write_checkpoint({"round": 2, "tables": {"x": 2}})
    t.append(spark.range(3))  # torn (no checkpoint)
    ckpt = store.latest_checkpoint()
    assert ckpt["round"] == 2
    store.rollback_to_checkpoint(ckpt)
    assert t.read(spark).count() == 6
    # rolling back to round 1 drops round-2 data and the newer checkpoint
    store.rollback_to_checkpoint(store.read_checkpoints()[0])
    assert t.read(spark).count() == 3
    assert store.latest_checkpoint()["round"] == 1
