"""Sink catalog: keyed upsert (ReplacingMergeTree/MERGE analog, K4)."""

from __future__ import annotations

from sts_opentelemetry_collector_spark.plans.sinks import SinkCatalog


def test_upsert_last_writer_wins(spark, tmp_path):
    cat = SinkCatalog(str(tmp_path))
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, v long"
    )
    cat.upsert(v1, "dim", keys=["id"], order_col="v")
    assert cat.read(spark, "dim").count() == 2

    v2 = spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], "id long, name string, v long"
    )
    cat.upsert(v2, "dim", keys=["id"], order_col="v")
    got = {r.id: (r.name, r.v) for r in cat.read(spark, "dim").collect()}
    assert got == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)}

    # idempotent: re-upserting the same batch changes nothing
    cat.upsert(v2, "dim", keys=["id"], order_col="v")
    got2 = {r.id: (r.name, r.v) for r in cat.read(spark, "dim").collect()}
    assert got2 == got


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """An upsert must leave untouched buckets' files byte-identical
    (mtime + contents) — the dynamic-partition-overwrite contract."""
    import os
    import time

    cat = SinkCatalog(str(tmp_path))
    base = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(64)], "id long, name string, v long"
    )
    cat.upsert(base, "dim", keys=["id"], order_col="v", n_buckets=8)

    root = cat.path("dim")
    before = {}
    for d in os.listdir(root):
        if d.startswith("_bucket="):
            for f in os.listdir(os.path.join(root, d)):
                p = os.path.join(root, d, f)
                before[p] = (os.path.getmtime(p), os.path.getsize(p))

    time.sleep(0.05)
    single = spark.createDataFrame([(3, "updated", 999)], "id long, name string, v long")
    cat.upsert(single, "dim", keys=["id"], order_col="v", n_buckets=8)

    # exactly one bucket dir rewritten; all others byte-untouched
    import pyspark.sql.functions as F

    touched_bucket = single.select(
        F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("b")
    ).collect()[0].b
    untouched_still_there = 0
    for p, (mt, sz) in before.items():
        if f"_bucket={touched_bucket}/" in p or p.endswith(f"_bucket={touched_bucket}"):
            continue
        assert os.path.exists(p), f"untouched file vanished: {p}"
        assert os.path.getmtime(p) == mt and os.path.getsize(p) == sz, (
            f"untouched file modified: {p}"
        )
        untouched_still_there += 1
    assert untouched_still_there > 0

    got = {r.id: (r.name, r.v) for r in cat.read(spark, "dim").collect()}
    assert got[3] == ("updated", 999)
    assert len(got) == 64


def test_upsert_crash_recovery_and_legacy_migration(spark, tmp_path):
    """Crash-matrix healing: a bucket stranded aside mid-swap is restored;
    a leftover aside after commit is purged; a legacy (unbucketed) table
    migrates via full staged rewrite instead of erroring."""
    import os
    import shutil

    cat = SinkCatalog(str(tmp_path))
    base = spark.createDataFrame(
        [(i, f"n{i}", i) for i in range(32)], "id long, name string, v long"
    )
    cat.upsert(base, "dim", keys=["id"], order_col="v", n_buckets=4)
    root = cat.path("dim")

    # simulate crash between rename-aside and move-in for bucket 2
    bdir = os.path.join(root, "_bucket=2")
    aside = f"{root}__aside_bucket_2"
    os.rename(bdir, aside)
    assert not os.path.exists(bdir)
    cat.upsert(
        spark.createDataFrame([(0, "upd", 99)], "id long, name string, v long"),
        "dim", keys=["id"], order_col="v", n_buckets=4,
    )
    assert os.path.exists(bdir) and not os.path.exists(aside)  # healed
    got = {r.id: r.v for r in cat.read(spark, "dim").collect()}
    assert len(got) == 32 and got[0] == 99  # nothing lost, update applied

    # simulate crash AFTER move-in (stale aside) + stale staging
    os.makedirs(f"{root}__aside_bucket_1/x", exist_ok=True)
    os.makedirs(f"{root}__stage_deadbeef/x", exist_ok=True)
    cat.upsert(
        spark.createDataFrame([(1, "u2", 100)], "id long, name string, v long"),
        "dim", keys=["id"], order_col="v", n_buckets=4,
    )
    assert not os.path.exists(f"{root}__aside_bucket_1")
    assert not os.path.exists(f"{root}__stage_deadbeef")
    assert cat.read(spark, "dim").count() == 32

    # legacy unbucketed layout migrates cleanly
    legacy = spark.createDataFrame(
        [(i, f"L{i}", i) for i in range(10)], "id long, name string, v long"
    )
    legacy.write.mode("overwrite").parquet(cat.path("old_dim"))
    cat.upsert(
        spark.createDataFrame([(3, "new", 50)], "id long, name string, v long"),
        "old_dim", keys=["id"], order_col="v", n_buckets=4,
    )
    got = {r.id: (r.name, r.v) for r in cat.read(spark, "old_dim").collect()}
    assert len(got) == 10 and got[3] == ("new", 50)
