"""Truncated Girvan-Newman edge betweenness (SURVEY §2.9 G5-G8).

The reference computes this with GraphX Pregel shortestPaths over
all-vertex landmark batches, motif enumeration, SQL path reconstruction
and ragged e_i columns (graph_tools/graph_tools.py:74-286) — ~200 LoC
and two parquet round-trips. Both shipped configs truncate at
max_sp_length = 2 (confs/quakers.yml:62), where the whole computation
is two self-joins of the symmetrized edge table:

- distance-1 ordered pairs: the edges themselves;
- distance-2 ordered pairs: 2-paths a→m→z with (a,z) not adjacent.

Betweenness of an edge = number of shortest paths crossing it. Two
semantics are offered:

- default (``compat_single_path=False``): classic GN — each ordered
  pair distributes 1 unit of credit over its σ(a,z) shortest paths
  (fractional 1/σ per path), the principled count;
- compat: the reference keeps ONE surviving path per ordered pair
  (dropDuplicates(["a","z"]), graph_tools/graph_tools.py:208 — SURVEY
  §8.2), so each pair credits exactly one path. We pick the path with
  the smallest midpoint to stay deterministic (the reference's pick is
  whatever dropDuplicates happens to keep).

Output is canonical (src < dst) with contributions from both
orientations summed — the reference instead keeps directed edge structs
and probes both orientations at every downstream join (main.py:130-134);
canonical form halves that work (SURVEY §8.7).

Scale shape: one shuffle for the midpoint self-join, one anti-join to
drop adjacent pairs, one window (or groupBy) for σ, one final groupBy
on the canonical edge key. No driver collect — the reference's
all-vertex landmark collect (main.py:254) has no equivalent here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from hgn_spark.graph.core import symmetrize


def shortest_path_lengths(edges: DataFrame, max_len: int = 2) -> DataFrame:
    """Ordered-pair BFS distances ≤ max_len → (src, dst, distance).

    Iterated frontier expansion: distance d pairs = (d-1)-pairs joined
    one more hop, minus already-seen pairs. For the reference's k=2 this
    is a single self-join; general k costs k-1 joins, each shuffling on
    the frontier key — the distributed analogue of the reference's
    batched Pregel shortestPaths (graph_tools/graph_tools.py:115-153)
    without the landmark collect.
    """
    sym = symmetrize(edges)
    known = sym.withColumn("distance", F.lit(1))
    frontier = sym
    for d in range(2, max_len + 1):
        a = frontier.alias("a")
        b = sym.alias("b")
        nxt = (
            a.join(b, F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .join(known.select("src", "dst"), ["src", "dst"], "left_anti")
            .withColumn("distance", F.lit(d))
        )
        known = known.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.drop("distance")
    return known


def shortest_paths(edges: DataFrame, max_len: int = 2) -> DataFrame:
    """All shortest paths ≤ max_len as (src, dst, distance, path) with
    path: array<struct<src,dst>> — one VARIABLE-LENGTH array column
    instead of the reference's ragged e_0..e_k columns padded with
    dummy structs (G6/G7; spark_manager.py:411-453 P9 padding made
    obsolete by the array representation).
    """
    if max_len > 2:
        raise NotImplementedError("path enumeration implemented for max_len<=2")
    sym = symmetrize(edges)
    edge_struct = lambda s, d: F.struct(  # noqa: E731
        F.col(s).alias("src"), F.col(d).alias("dst")
    )
    p1 = sym.select(
        "src",
        "dst",
        F.lit(1).alias("distance"),
        F.array(edge_struct("src", "dst")).alias("path"),
    )
    if max_len < 2:
        return p1
    a = sym.alias("a")
    b = sym.alias("b")
    p2 = (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("src"),
            F.col("a.dst").alias("mid"),
            F.col("b.dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .join(sym.select("src", "dst"), ["src", "dst"], "left_anti")
        .select(
            "src",
            "dst",
            F.lit(2).alias("distance"),
            F.array(
                F.struct(F.col("src").alias("src"), F.col("mid").alias("dst")),
                F.struct(F.col("mid").alias("src"), F.col("dst").alias("dst")),
            ).alias("path"),
        )
    )
    return p1.unionByName(p2)


def edge_betweenness(
    edges: DataFrame, max_sp_length: int = 2, compat_single_path: bool = False
) -> DataFrame:
    """→ (src, dst, betweenness) on canonical src < dst edges.

    Only max_sp_length ≤ 2 is supported for path enumeration (both
    reference configs use 2); `shortest_path_lengths` generalizes the
    distance computation for larger k.
    """
    if max_sp_length > 2:
        raise NotImplementedError(
            "path enumeration implemented for max_sp_length<=2 "
            "(both reference configs use 2)"
        )
    sym = symmetrize(edges)

    # Distance-1: every ordered adjacent pair credits its own edge once.
    d1 = sym.select(
        F.least("src", "dst").alias("e_src"),
        F.greatest("src", "dst").alias("e_dst"),
        F.lit(1.0).alias("w"),
    )
    if max_sp_length < 2:
        return d1.groupBy(F.col("e_src").alias("src"), F.col("e_dst").alias("dst")).agg(
            F.sum("w").alias("betweenness")
        )

    # Distance-2 ordered pairs: 2-paths whose endpoints are not adjacent.
    a = sym.alias("a")
    b = sym.alias("b")
    p2 = (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("src"),
            F.col("a.dst").alias("mid"),
            F.col("b.dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .join(sym.select("src", "dst"), ["src", "dst"], "left_anti")
    )

    if compat_single_path:
        # Reference quirk §8.2: one surviving path per ordered pair.
        w_pick = W.partitionBy("src", "dst").orderBy("mid")
        p2 = p2.withColumn("rn", F.row_number().over(w_pick)).filter(
            F.col("rn") == 1
        ).withColumn("w", F.lit(1.0))
    else:
        w_sig = W.partitionBy("src", "dst")
        p2 = p2.withColumn("w", F.lit(1.0) / F.count(F.lit(1)).over(w_sig))

    first_leg = p2.select(
        F.least("src", "mid").alias("e_src"),
        F.greatest("src", "mid").alias("e_dst"),
        "w",
    )
    second_leg = p2.select(
        F.least("mid", "dst").alias("e_src"),
        F.greatest("mid", "dst").alias("e_dst"),
        "w",
    )
    return (
        d1.unionByName(first_leg)
        .unionByName(second_leg)
        .groupBy(F.col("e_src").alias("src"), F.col("e_dst").alias("dst"))
        .agg(F.sum("w").alias("betweenness"))
    )
