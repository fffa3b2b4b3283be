"""The HGN divisive community-detection loop (SURVEY §2.9 G11-G12, §3.1).

Orchestrates the pieces exactly as the reference's main loop does
(main.py:144-213): cosine similarities and truncated betweenness once
up front (the cacheable init step, main.py:243-258), then per
iteration r-metrics → hybrid edge weights → deletion rule → anti-join,
until no edge qualifies or max_steps is hit. Communities are the final
connected components.

Deliberate divergences from the reference (each documented in SURVEY §8):

- §8.1 the force-keep union could duplicate edges — we never re-add
  keepit edges (the anti-join already kept them), so no duplicates;
- §8.2 betweenness defaults to correct GN fractional counting
  (compat flag available in betweenness.edge_betweenness);
- canonical src<dst edges + canonical betweenness mean ONE deletion
  join instead of the reference's both-orientation pair (main.py:130-134)
  and ONE anti-join instead of two (main.py:201-205);
- lineage is truncated with localCheckpoint per iteration instead of a
  parquet write+read (spark_manager.py:215-231).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hgn_spark.graph.betweenness import edge_betweenness
from hgn_spark.graph.components import connected_components
from hgn_spark.graph.core import canonicalize, drop_isolated_vertices
from hgn_spark.graph.rmetrics import r_metrics_edges
from hgn_spark.graph.weights import hybrid_edge_weights, one_hot_cosine_similarities


@dataclass
class HGNParams:
    """Knobs mirroring the reference's run_options config section
    (confs/quakers.yml:55-68)."""

    r_lvl1_thres: float = 0.5
    r_lvl2_thres: float = 0.5
    max_edge_weight: float = 0.5
    betweenness_thres: float = 5.0
    feature_min_avg: float = 0.5
    max_steps: int = 10
    max_sp_length: int = 2
    min_comp_size: int = 1


def hgn_communities(
    vertices: DataFrame,
    edges: DataFrame,
    feature_cols: list[str],
    params: HGNParams | None = None,
) -> DataFrame:
    """Run the full loop → (id, component).

    ``vertices``: (id, *features); ``edges``: (src, dst) any orientation.
    """
    p = params or HGNParams()
    e = canonicalize(edges).localCheckpoint(eager=True)

    # --- init step (computed once, like main.py:243-258) ---------------
    sims = one_hot_cosine_similarities(e, vertices, feature_cols)
    # Symmetrize similarities so common-neighbor membership checks see
    # both orientations; the hybrid ratio is invariant to the doubling
    # (numerator and denominator scale together).
    sims = sims.union(
        sims.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "similarity")
    ).localCheckpoint(eager=True)
    betw = edge_betweenness(e, max_sp_length=p.max_sp_length).localCheckpoint(eager=True)

    # --- main loop ------------------------------------------------------
    for _step in range(1, p.max_steps + 1):
        edges_r = r_metrics_edges(e, p.r_lvl1_thres, p.r_lvl2_thres)
        weights = hybrid_edge_weights(edges_r, sims, p.feature_min_avg)
        # Canonical edges → single equi-join against canonical betweenness
        # (the reference probes both orientations, main.py:130-134).
        to_delete = (
            weights.join(betw, ["src", "dst"], "inner")
            .filter(
                (F.col("edge_weight") < p.max_edge_weight)
                | (
                    (F.col("edge_weight") >= p.max_edge_weight)
                    & (F.col("betweenness") > p.betweenness_thres)
                )
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        if to_delete.isEmpty():
            break
        e = (
            e.join(to_delete, ["src", "dst"], "left_anti")
            .localCheckpoint(eager=True)
        )

    survivors = drop_isolated_vertices(vertices.select("id"), e)
    return connected_components(e, survivors)
