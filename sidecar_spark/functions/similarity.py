"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane signs → bucket equi-join) is the scale path:
at 100 TB the cross join is infeasible, but hyperplane bucketing turns
it into an equi-join on short signatures with a verify step — the same
candidate-generation shape as MinHash LSH.

All vector math is JVM-side (zip_with/aggregate) in double precision,
sequential over the array — bit-identical to DuckDB's list functions,
so cosine scores are oracle-checkable after round(., 6).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sidecar_spark.functions.common import spread
from sidecar_spark.functions.dedup import hash60


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def as_double(a) -> Column:
    return F.col(a).cast("array<double>") if isinstance(a, str) else a.cast("array<double>")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    vector corpus, rank per query. One pass over the corpus, no
    corpus-side shuffle beyond the per-query top-k aggregation."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
    )
    v = spread(vectors).select(
        F.col(id_col).alias("vec_id"),
        as_double(F.col(vec_col)).alias("v_vec"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("v_vec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rk")
    )


def hyperplane_signature(vec_col, dim: int, num_planes: int = 8) -> Column:
    """Sign-of-projection LSH signature as a ``num_planes``-char bit
    string. Hyperplane components are deterministic pseudo-random
    values derived from hash60(plane:i) scaled to [-1, 1] — fully
    reproducible in SQL, no RNG state."""

    def _component(p: int):
        # 1-arg lambda via closure — a defaulted 2nd lambda param would
        # be bound by PySpark to the array index column (see dedup.py)
        prefix = f"hp{p}:"

        def comp(i) -> Column:
            h = hash60(F.concat(F.lit(prefix), i.cast("string")))
            return (h % 2001 - 1000) / F.lit(1000.0)

        return comp

    def plane_sign(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec_col.cast("array<double>"),
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _component(p)),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[plane_sign(p) for p in range(num_planes)])


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket; exact cosine + rank within the bucket. At scale the bucket
    join replaces the cross join — recall is tunable via num_planes
    (fewer planes → bigger buckets → higher recall, more compute)."""
    from pyspark.sql import Window as W

    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        as_double(F.col(vec_col)).alias("v_vec"),
    ).withColumn("bucket", hyperplane_signature(F.col("v_vec"), dim, num_planes))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("bucket", hyperplane_signature(F.col("q_vec"), dim, num_planes))
    scored = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("v_vec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rk")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: Optional[int] = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = False,
    num_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t).
    Brute force for correctness; ``use_lsh`` switches to bucketed
    candidate generation for scale."""
    # norms are precomputed once per vector (not once per pair) — the
    # per-pair work is the dot product only
    v = spread(vectors).select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("vec"),
    ).withColumn("nrm", norm(F.col("vec")))
    if use_lsh:
        if dim is None:
            raise ValueError("dim required for LSH mode")
        v = v.withColumn("bucket", hyperplane_signature(F.col("vec"), dim, num_planes))
        a = v.alias("a")
        b = v.alias("b")
        pairs = a.join(
            b, (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")))
    else:
        a = v.alias("a")
        b = v.alias("b")
        pairs = a.join(b, F.col("a.vid") < F.col("b.vid"))
    denom = F.col("a.nrm") * F.col("b.nrm")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        dot(F.col("a.vec"), F.col("b.vec")) / denom)
    return (
        pairs.select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
