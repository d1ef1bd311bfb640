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
