"""Vector similarity over the `embeddings` table (array<float> column).

- Brute-force cosine top-k: the correctness baseline. Dot products via
  zip_with + aggregate HOFs — JVM-side, no Python.
- Sign-LSH bucketing: the scale path — 100 TB of vectors can't all-pairs;
  random-hyperplane signs bucket vectors so search touches one bucket.
  Hyperplanes are deterministic ±1 patterns (engine-portable, matching the
  DuckDB oracle) rather than RNG-dependent floats.
- Near-dup pairs: label-blocked cosine threshold — embedding-cosine
  near-duplicate detection for training-data dedup.

All math is done in double precision after casting the float32 input, with
left-to-right summation in both engines, so results are bit-comparable
with the oracle after rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k vs one stored vector (broadcast the query:
    a 1-row cross join never shuffles the big side)."""
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qv"))
                / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
                4,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def _plane_sign(i_col, j: int):
    """Deterministic ±1 hyperplane component: +1 iff (i*7 + j*13) % 3 < 2.
    1-based dim index i (element_at convention), plane index j."""
    return F.when(((i_col * 7 + F.lit(j * 13)) % 3) < 2, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket_expr(emb_col, n_planes: int = 4):
    """Sign-LSH bucket id: bit j set iff dot(v, plane_j) > 0."""
    def plane_dot(j: int):
        # single-arg-pair lambda via closure: a default parameter would be
        # mis-parsed by PySpark's HOF arity inspection
        return lambda acc, i: acc + F.element_at(emb_col, i.cast("int")).cast(
            "double"
        ) * _plane_sign(i, j)

    bucket = F.lit(0)
    for j in range(n_planes):
        dot_j = F.aggregate(F.sequence(F.lit(1), F.lit(DIM)), F.lit(0.0), plane_dot(j))
        bucket = bucket + F.when(dot_j > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_buckets(embeddings: DataFrame, n_planes: int = 4) -> DataFrame:
    """Bucket histogram: the IVF/LSH partitioning an ANN query would probe."""
    return (
        embeddings.select(lsh_bucket_expr(F.col("embedding"), n_planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
    )


def ann_lsh_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10, n_planes: int = 4
) -> DataFrame:
    """ANN: probe only the query's LSH bucket, then exact cosine within it.
    At scale: bucket becomes the partition key (one-bucket scan)."""
    with_bucket = embeddings.withColumn(
        "bucket", lsh_bucket_expr(F.col("embedding"), n_planes)
    )
    q = with_bucket.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    candidates = with_bucket.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).where(F.col("vec_id") != query_vec_id)
    scored = candidates.select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("qv"))
            / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
            4,
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def ivf_assign(
    embeddings: DataFrame, n_centroids: int = 8
) -> DataFrame:
    """IVF-style partition assignment: each vector joins its nearest
    centroid (deterministic centroids = the first K stored vectors; a real
    build would k-means them — the ASSIGNMENT plan is identical).

    At 100 TB this is the ANN partitioner: vectors land in centroid-keyed
    partitions and queries probe one (or few) partitions. Plan shape:
    broadcast K centroids x fact side, per-row argmin — no shuffle of the
    vectors themselves."""
    return (
        ivf_assignments(embeddings, n_centroids)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )


def ivf_assignments(embeddings: DataFrame, n_centroids: int = 8) -> DataFrame:
    """Per-vector nearest-centroid assignment (vec_id, centroid_id,
    embedding) — the IVF partitioning used by both the build-side
    histogram (ivf_assign) and the query-side probe (ivf_topk)."""
    from pyspark.sql import Window

    cents = embeddings.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "centroid_id",
        F.round(
            _dot(F.col("embedding"), F.col("cv"))
            / (_norm(F.col("embedding")) * _norm(F.col("cv"))),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "sim")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search (query half of ivf_assign): probe only the nprobe
    centroids nearest the query, exact cosine within their clusters. At
    100 TB the assignment is the table's partition key, so this plan scans
    nprobe/n_centroids of the data — the whole point of IVF."""
    assigned = ivf_assignments(embeddings, n_centroids)
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    cents = embeddings.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(
                _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))), 4
            ).alias("qsim"),
        )
        .orderBy(F.desc("qsim"), F.asc("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    candidates = assigned.join(F.broadcast(probe), on="centroid_id").where(
        F.col("vec_id") != query_vec_id
    )
    scored = candidates.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("qv"))
            / (_norm(F.col("embedding")) * _norm(F.col("qv"))),
            4,
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-dup pair counts per block (label-blocked
    all-pairs; at scale the block key is the LSH bucket)."""
    t = embeddings.select(
        F.col("vec_id"), F.col(block_col).alias("_b"), F.col("embedding")
    )
    a, b = t.alias("a"), t.alias("b")
    cos = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))),
        4,
    )
    return (
        a.join(b, (F.col("a._b") == F.col("b._b")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a._b").alias("label"), cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("near_dup_pairs"))
    )


def near_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.9, n_planes: int = 4
) -> DataFrame:
    """Embedding near-dup, LSH-candidate form — the 100 TB path promised in
    near_dup_pairs' docstring: candidate pairs come from an equi-join on
    the sign-LSH bucket (never all-pairs / label-blocked), then exact
    cosine filters. Sign-LSH recall: P(same bucket) = (1 - theta/pi)^planes
    — near-dups at cos>=0.9 (theta<=25.8 deg) survive a 4-plane bucket
    ~54% per band; stack bands (like the text MinHash r/b knob) to trade
    compute for recall."""
    # normalize ONCE per vector: cosine of candidates is then a single
    # dot fold instead of dot + two norm folds per pair. The norm is
    # materialized as its own column FIRST — a _norm() embedded in the
    # transform lambda would be re-folded per element (interpreted HOFs
    # have no CSE), turning O(dim) into O(dim^2) per vector.
    base = embeddings.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("_n"),
        lsh_bucket_expr(F.col("embedding"), n_planes).alias("bucket"),
    )
    t = base.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") / F.col("_n")
        ).alias("nv"),
        "bucket",
    )
    a, b = t.alias("a"), t.alias("b")
    cos = F.round(_dot(F.col("a.nv"), F.col("b.nv")), 4)
    return (
        a.join(b, on="bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
