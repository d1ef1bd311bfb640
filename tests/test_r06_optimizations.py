"""Round-6 optimization pins: every rewrite that changed an operator's
INTERNALS must be provably result-identical to the shape it replaced.

- Arrow kernels (similarity.py) vs the JVM fold expressions they replace:
  EXACT equality, no rounding — the kernels claim bit-identical IEEE
  semantics (left-associative sums from +0.0, widen-then-multiply).
- SimHash Hamming-ball query expansion vs brute-force Hamming pairs:
  the equi-join on xor-masked probes must emit exactly the true pair set.
- dedup_within_refresh_window (min_by hash/sort aggregate) vs the
  row_number-window reference it replaced.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (
            i,
            [
                float(((i * 31 + d * 7) % 29) - 14) + (0.5 if (i + d) % 3 else 0.0)
                for d in range(64)
            ],
        )
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_arrow_dot_and_cos_bit_equal_fold(spark, emb):
    from sts_opentelemetry_collector_spark.operators.similarity import (
        _cos_arrow,
        _dot,
        _dot_arrow,
        _norm,
    )

    a = emb.alias("a")
    b = emb.select(
        (F.col("vec_id") + 1).alias("vid_b"), F.col("embedding").alias("eb")
    ).alias("b")
    j = a.join(b, F.col("a.vec_id") == F.col("vid_b") % 200)
    ea, eb = F.col("a.embedding"), F.col("eb")
    bad = j.select(
        (_dot(ea, eb) != _dot_arrow(ea, eb)).alias("d"),
        (
            (_dot(ea, eb) / (_norm(ea) * _norm(eb))) != _cos_arrow(ea, eb)
        ).alias("c"),
    ).where(F.col("d") | F.col("c"))
    assert bad.count() == 0


def test_arrow_band_buckets_bit_equal_expr(spark, emb):
    from sts_opentelemetry_collector_spark.operators.similarity import (
        _band_buckets_arrow,
        lsh_bucket_expr,
    )

    for n_planes, bands in ((4, 1), (8, 2)):
        expr_buckets = F.array(
            *[
                lsh_bucket_expr(
                    F.col("embedding"), n_planes, plane_offset=b * n_planes
                )
                for b in range(bands)
            ]
        )
        udf_buckets = _band_buckets_arrow(n_planes, bands)(F.col("embedding"))
        bad = (
            emb.select(
                expr_buckets.alias("e"), udf_buckets.alias("u")
            )
            .where(F.col("e") != F.col("u"))
            .count()
        )
        assert bad == 0, f"bucket mismatch at planes={n_planes} bands={bands}"


def test_arrow_normalize_bit_equal_transform(spark, emb):
    from sts_opentelemetry_collector_spark.operators.similarity import (
        _norm,
        _normalize_arrow,
    )

    ref = F.transform(
        F.col("embedding"), lambda x: x.cast("double") / F.col("_n")
    )
    bad = (
        emb.withColumn("_n", _norm(F.col("embedding")))
        .select(ref.alias("r"), _normalize_arrow(F.col("embedding")).alias("u"))
        .where(F.col("r") != F.col("u"))
        .count()
    )
    assert bad == 0


def test_simhash_mask_expansion_equals_bruteforce(spark):
    from sts_opentelemetry_collector_spark.operators.textops import (
        simhash16,
        simhash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta {i % 5} gamma delta {i % 3} epsilon {i % 11}")
            for i in range(120)
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(docs, max_hamming=2).collect()
    }
    sigs = {r.doc_id: r.simhash for r in simhash16(docs).collect()}
    want = set()
    ids = sorted(sigs)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            h = bin(sigs[da] ^ sigs[db]).count("1")
            if h <= 2:
                want.add((da, db, h))
    assert got == want
    assert want, "fixture produced no pairs — test would be vacuous"


def test_refresh_window_minby_equals_window_reference(spark):
    from pyspark.sql import Window

    from sts_opentelemetry_collector_spark.operators.dedup import (
        dedup_within_refresh_window,
    )

    df = spark.createDataFrame(
        [
            (i, i % 7, f"k{i % 3}", float(i % 5), f"2024-01-01 00:{i % 40:02d}:00")
            for i in range(200)
        ],
        "event_id long, user_id long, event_type string, value double, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    got = dedup_within_refresh_window(
        df, ["user_id", "event_type"], ts_col="ts", ttl_seconds=900,
        refresh_fraction=0.5, order_col="event_id",
    )
    refresh_s = 450
    bucket = (F.unix_timestamp(F.col("ts")) / refresh_s).cast("long")
    w = Window.partitionBy("user_id", "event_type", "_refresh_bucket").orderBy(
        F.col("event_id").asc(), *[F.col(c) for c in df.columns if c != "ts"]
    )
    want = (
        df.withColumn("_refresh_bucket", bucket)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_refresh_bucket")
    )
    gs = {tuple(r) for r in got.collect()}
    ws = {tuple(r) for r in want.collect()}
    assert gs == ws
