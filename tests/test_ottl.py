"""P14: OTTL set/delete_key statement compilation + ordering."""

from __future__ import annotations

import pyspark.sql.functions as F

from sts_opentelemetry_collector_spark.operators.ottl import (
    OttlStatement,
    apply_ottl,
    parse_statement,
)


def test_parse_statement_forms():
    s = parse_statement('delete_key(attrs, "k8s.cluster.name")')
    assert (s.op, s.target_col, s.key) == ("delete_key", "attrs", "k8s.cluster.name")
    s = parse_statement('set(attrs["env"], \'prod\') where host = \'h1\'')
    assert s.op == "set" and s.key == "env" and s.condition == "host = 'h1'"


def test_statements_apply_in_order(spark):
    """Later statements see earlier writes: set then delete removes the
    just-set key; delete then set keeps it."""
    df = spark.createDataFrame([("h1",)], "host string").withColumn(
        "attrs", F.create_map(F.lit("a"), F.lit("1"))
    )
    r1 = apply_ottl(df, ['set(attrs["x"], \'v\')', 'delete_key(attrs, "x")'])
    assert r1.collect()[0].attrs == {"a": "1"}
    r2 = apply_ottl(df, ['delete_key(attrs, "x")', 'set(attrs["x"], \'v\')'])
    assert r2.collect()[0].attrs == {"a": "1", "x": "v"}


def test_where_gate_and_null_set(spark):
    df = spark.createDataFrame(
        [("h1", "2"), ("h2", None)], "host string, maybe string"
    ).withColumn("attrs", F.create_map(F.lit("a"), F.lit("1")))
    out = apply_ottl(
        df,
        [
            OttlStatement("set", "attrs", "m", "maybe"),        # null => no key
            'delete_key(attrs, "a") where host = \'h2\'',
        ],
    )
    got = {r.host: r.attrs for r in out.collect()}
    assert got["h1"] == {"a": "1", "m": "2"}
    assert got["h2"] == {}
