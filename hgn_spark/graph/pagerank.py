"""PageRank by power iteration on plain DataFrames.

Engine extension (SURVEY §2.9 lists no centrality beyond betweenness —
the reference computes edge betweenness only, graph_tools/
graph_tools.py:184-265); a graph-analytics engine is expected to ship
the standard centrality next to degrees/components/triangles.

Formulation: the undirected graph is symmetrized, so every vertex has
out-degree ≥ 1 and there are no dangling nodes; the update is the
classic

    pr'(v) = (1 - d) / N  +  d * Σ_{u→v} pr(u) / outdeg(u)

run for a FIXED number of iterations from the uniform start — fixed
iteration count (not a convergence test) keeps the result
deterministic and the job count known in advance. Each iteration is
one equi-join (rank against edges on src) plus one map-side-combinable
aggregation by dst — the same shape GraphX's Pregel emits per
superstep, expressed declaratively so AQE picks partition counts and
handles hub skew.

Scale notes:

- State per iteration is one (id, pr) frame of |V| rows; the
  superseded generation is released eagerly (CheckpointJanitor), so
  the loop carries exactly one generation — bounded memory at any
  scale, same discipline as the HGN loop and connected components.
- The join shuffles edges by src once per iteration; at 100 TB the
  edge table would be pre-bucketed by src (operators/scale.py) to
  make that shuffle a one-time cost instead of per-iteration.
- Lineage is truncated every ``checkpoint_interval`` iterations
  (localCheckpoint): unbounded chaining grows the plan linearly per
  iteration until Catalyst analysis time dominates, while truncating
  every round pays one eager action per iteration — the interval
  trades the two (timings in the function docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hgn_spark.checkpoint import CheckpointJanitor
from hgn_spark.graph.core import symmetrize


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 20,
    checkpoint_interval: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over the symmetrized graph →
    ``(id, pagerank)``, one row per non-isolated vertex, ranks summing
    to ~1 (exact up to float addition order).

    Matches the textbook power iteration (networkx's update) on
    undirected graphs — same update, same uniform start; parity pinned
    in tests/test_graph.py — when both run the same iteration count.

    ``checkpoint_interval``: iterations between lineage truncations.
    Each checkpoint is an eager action; letting a few iterations chain
    lazily amortizes that cost (measured 6.3 s at interval 1, 4.2 s at
    5, 3.1 s at 10 for 20 rounds on the sf0.1 derived graph) while the
    plan stays shallow enough that Catalyst analysis time never
    dominates. State behavior is unchanged: exactly one materialized
    generation is carried.
    """
    spark = edges.sparkSession
    jan = CheckpointJanitor(spark)
    sym, sym_ids = jan.checkpoint(symmetrize(edges))
    out_deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # (src, dst, out_deg(src)) — constant across iterations, so the
    # per-iteration join hits a materialized table, not the degree agg.
    links, links_ids = jan.checkpoint(
        sym.join(out_deg.withColumnRenamed("id", "src"), "src")
    )
    jan.release(sym_ids)
    # One distinct over the links table, materialized once: it feeds
    # both the vertex count and the uniform initial ranks (computing it
    # twice would run the edge-set-sized shuffle twice at startup).
    verts, vert_ids = jan.checkpoint(links.select("src").distinct())
    n = verts.count()
    if n == 0:
        jan.release(vert_ids)
        jan.release(links_ids)
        return spark.createDataFrame([], "id long, pagerank double")

    pr = verts.select(F.col("src").alias("id"), F.lit(1.0 / n).alias("pr"))
    pr, pr_ids = jan.checkpoint(pr)
    jan.release(vert_ids)
    base = (1.0 - damping) / n
    for it in range(1, n_iter + 1):
        contrib = (
            links.join(pr.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("pr") / F.col("out_deg")).alias("in_sum"))
        )
        pr = contrib.select(
            "id", (F.lit(base) + F.lit(damping) * F.col("in_sum")).alias("pr")
        )
        if it % checkpoint_interval == 0 or it == n_iter:
            pr, new_ids = jan.checkpoint(pr)
            jan.release(pr_ids)
            pr_ids = new_ids
    out = pr.select("id", F.col("pr").alias("pagerank"))
    # The final frame is checkpointed (no lineage into links) — the
    # link table's blocks are dead weight from here.
    jan.release(links_ids)
    return out


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    n_iter: int = 20,
    checkpoint_interval: int = 10,
) -> DataFrame:
    """Personalized (seeded) PageRank → ``(id, pagerank)``: the
    teleport mass returns to the SEED set instead of spreading
    uniformly, so ranks measure relevance TO the seeds — the standard
    seed-expansion primitive (related-item discovery, community seeds,
    contamination spread). ``seeds``: a frame with an ``id`` column;
    teleport splits uniformly across the seeds present in the graph.

        pr'(v) = (1-d)·[v ∈ S]/|S| + d · Σ_{u→v} pr(u)/outdeg(u)

    This is the standard PPR power iteration run for a FIXED ``n_iter``
    starting from the teleport distribution itself — pinned exactly
    (1e-9) against an independent pure-Python mirror of that recurrence
    in tests/test_graph.py, and against the same recurrence unrolled in
    SQL in tests/test_oracle_parity.py. networkx.pagerank differs by
    protocol, not by formula: it starts from a uniform ``nstart`` and
    iterates to a convergence tolerance, so at small fixed iteration
    counts the two differ by O(damping^n_iter). Non-seed vertices
    unreachable from any seed converge to 0 and still appear (one row
    per non-isolated vertex).

    Same scale shape as `pagerank`: one equi-join + one
    map-side-combinable aggregation per round, one materialized
    generation carried, lineage cut every ``checkpoint_interval``
    rounds. The seed frame joins in as a (usually broadcastable)
    left-join flag — no driver-side seed list.
    """
    spark = edges.sparkSession
    jan = CheckpointJanitor(spark)
    sym, sym_ids = jan.checkpoint(symmetrize(edges))
    out_deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    links, links_ids = jan.checkpoint(
        sym.join(out_deg.withColumnRenamed("id", "src"), "src")
    )
    jan.release(sym_ids)
    verts, vert_ids = jan.checkpoint(
        links.select("src")
        .distinct()
        .select(F.col("src").alias("id"))
        .join(
            seeds.select("id").distinct().withColumn("is_seed", F.lit(1)),
            "id",
            "left",
        )
        .select("id", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
    )
    n_seeds = verts.agg(F.sum("is_seed")).first()[0] or 0
    if n_seeds == 0:
        jan.release(vert_ids)
        jan.release(links_ids)
        raise ValueError(
            "personalized_pagerank: no seed id appears in the graph"
        )
    # Start from the teleport distribution itself.
    base = F.col("is_seed") * F.lit((1.0 - damping) / n_seeds)
    pr = verts.select(
        "id", "is_seed", (F.col("is_seed") / F.lit(float(n_seeds))).alias("pr")
    )
    pr, pr_ids = jan.checkpoint(pr)
    for it in range(1, n_iter + 1):
        contrib = (
            links.join(
                pr.select(F.col("id").alias("src"), "pr"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("pr") / F.col("out_deg")).alias("in_sum"))
        )
        pr = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                "is_seed",
                (
                    base
                    + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("pr"),
            )
        )
        if it % checkpoint_interval == 0 or it == n_iter:
            pr, new_ids = jan.checkpoint(pr)
            jan.release(pr_ids)
            pr_ids = new_ids
    out = pr.select("id", F.col("pr").alias("pagerank"))
    jan.release(vert_ids)
    jan.release(links_ids)
    return out
