"""Reusable iterative graph operators over edge DataFrames.

The reference has no graph operators (SURVEY.md §2.7); these supply
the iterative-algorithm class a training-data platform needs (source
authority weighting, duplicate-cluster communities).  All follow the
same 100 TB contract: the caller aggregates the fact-scale data down
to an entity-level edge list ONCE; iterations then touch only
|V|/|E|-scale frames, with the small iterating state broadcast.

Determinism: ties in argmax decisions break on the smallest label,
and edge weights are expected integral (counts), so every decision is
bit-identical across engines — the queries' DuckDB oracles replay the
same iterations in chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both orientations (x, y, w) of an undirected (u, v, w) list."""
    return (edges.select(F.col("u").alias("x"), F.col("v").alias("y"), "w")
            .union(edges.select(F.col("v").alias("x"),
                                F.col("u").alias("y"), "w")))


def pagerank(edges: DataFrame, iters: int = 3,
             damping: float = 0.85) -> DataFrame:
    """PageRank over a DIRECTED weighted edge list (src, dst, w) —
    ``iters`` synchronous iterations from the uniform vector.
    Returns (node, pr).  Each iteration: one broadcast of the
    |V|-sized rank vector against the edge list, one aggregate on
    dst — no per-iteration rescan of anything fact-scale."""
    edges = edges.localCheckpoint(eager=True)
    outw = edges.groupBy("src").agg(F.sum("w").alias("total_w"))
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    n_nodes = nodes.count()
    rank = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    contrib_base = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("total_w")).alias("share"))
    )
    for _ in range(iters):
        contrib = (
            contrib_base
            .join(F.broadcast(rank), F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("share")).alias("mass"))
        )
        rank = (
            nodes.join(F.broadcast(contrib),
                       F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                ((1 - damping) / n_nodes
                 + damping * F.coalesce(F.col("mass"), F.lit(0.0)))
                .alias("pr"))
        )
    return rank


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Weighted synchronous label propagation over an UNDIRECTED edge
    list (u, v, w): every node starts as its own label; per iteration
    each node adopts the neighbor label with the highest total
    incident weight (ties → smallest label).  Returns (node, lbl).
    Deterministic when weights are integral.  Per iteration: one
    shuffle on the vertex key + a |V|-scale window rank — the
    GraphX/Pregel LPA shape with labels as the only iterating
    state."""
    from pyspark.sql import Window as W

    sym = symmetrize(edges)
    labels = sym.select(F.col("x").alias("node")).distinct() \
        .withColumn("lbl", F.col("node"))
    for _ in range(iters):
        scored = (
            sym.join(F.broadcast(labels.withColumnRenamed("node", "y")
                                 .withColumnRenamed("lbl", "nlbl")), "y")
            .groupBy(F.col("x").alias("node"), F.col("nlbl").alias("cand"))
            .agg(F.sum("w").alias("tw")))
        best = (
            scored.withColumn(
                "rk", F.row_number().over(
                    W.partitionBy("node")
                    .orderBy(F.desc("tw"), F.asc("cand"))))
            .where(F.col("rk") == 1)
            .select("node", F.col("cand").alias("new_lbl")))
        labels = (
            labels.join(F.broadcast(best), "node", "left")
            .select("node",
                    F.coalesce("new_lbl", "lbl").alias("lbl")))
        labels = labels.localCheckpoint(eager=True)
    return labels
