"""Driver-mirror correctness harness: run every entry_queries query in
Spark AND its DuckDB oracle on the same parquet, compare row count, schema
(column names), and exact values — the same gate the driver applies at
sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from sts_opentelemetry_collector_spark.entry_queries import ORACLES, QUERIES

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            bad = [
                (x, y)
                for x, y in zip(av, bv)
                if not (
                    (math.isnan(x) and math.isnan(y)) or x == y
                )
            ]
            assert not bad, f"{name}.{c}: {len(bad)} float mismatches, first: {bad[:3]}"
        else:
            mism = (av.astype(str) != bv.astype(str))
            assert not mism.any(), (
                f"{name}.{c}: {mism.sum()} mismatches, e.g. "
                f"{av[mism].head(3).tolist()} vs {bv[mism].head(3).tolist()}"
            )


def _assert_cache_hygiene(spark, name: str) -> None:
    """Every catalog query must leave ZERO cached/checkpointed RDD blocks
    behind once its registered caches are released (VERDICT r4 Wrong #1):
    a long-lived service running the catalog repeatedly must not
    accumulate executor storage."""
    from sts_opentelemetry_collector_spark.operators.cache import release_caches

    release_caches()
    left = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert left == 0, (
        f"{name}: {left} cached/checkpointed RDDs survive release_caches()"
    )


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = ddb.execute(ORACLES[name]).fetchdf()
    _compare(name, sdf, odf)
    _assert_cache_hygiene(spark, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0
    _assert_cache_hygiene(spark, name)
