"""r-metric edge scoring (SURVEY.md §2.9 G4) with native expressions.

The reference computes r11/r12 (level-1) and r21/r22 (level-2) per edge
with five row-at-a-time Python UDFs (graph_tools/graph_tools.py:389-404)
— every row pays a JVM→Python worker hop. Here the same math is four
joins plus native array functions (UD2→array_intersect/array_except,
UD3→size, UD4→when/otherwise, UD5→boolean expr), so the whole pipeline
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hgn_spark.graph.core import neighbors


def _common_count(nb_src: Column, nb_dst: Column, src: Column, dst: Column) -> Column:
    """|(N(src) \\ {src,dst}) ∩ (N(dst) \\ {src,dst})| — the reference's
    udf_merge_neighbors + udf_add_counts (graph_tools.py:389-399)."""
    ends = F.array(src, dst)
    return F.size(F.array_intersect(F.array_except(nb_src, ends), F.array_except(nb_dst, ends)))


def _ratio(common: Column, count: Column) -> Column:
    """common/count guarding div-by-0 — udf_calculate_r_metrics
    (graph_tools.py:400-401)."""
    return F.when(count > 0, common.cast("double") / count).otherwise(F.lit(0.0))


def r_metrics_edges(
    edges: DataFrame,
    r_lvl1_thres: float,
    r_lvl2_thres: float,
) -> DataFrame:
    """Score every edge with r11/r12/r21/r22 and the keep decision.

    Returns (src, dst, common_neighbors, r11, r12, r21, r22, keepit)
    where common_neighbors is the LEVEL-2 common set (that is what the
    reference carries forward into the edge-weight pipeline,
    graph_tools/graph_tools.py:425-433) and
    keepit = r11>t1 OR r12>t1 OR r21>t2 OR r22>t2 (udf_keep_edge_condition).

    Plan shape: two neighbor aggregations (one shuffle each), then four
    src/dst-keyed joins against the edge list. Neighbor frames are much
    smaller than the edge list on dense graphs — AQE broadcasts them
    when they fit; otherwise the joins co-shuffle on the id key.
    """
    lvl1 = neighbors(edges, level=1)
    lvl2 = neighbors(edges, level=2)
    e = edges.select("src", "dst")

    def _join_level(frame: DataFrame, lvl: DataFrame, tag: str) -> DataFrame:
        s = lvl.select(
            F.col("id").alias(f"{tag}_sid"),
            F.col("count").alias(f"cnt_src_{tag}"),
            F.col("neighbors").alias(f"nb_src_{tag}"),
        )
        d = lvl.select(
            F.col("id").alias(f"{tag}_did"),
            F.col("count").alias(f"cnt_dst_{tag}"),
            F.col("neighbors").alias(f"nb_dst_{tag}"),
        )
        return (
            frame.join(s, frame["src"] == s[f"{tag}_sid"], "inner")
            .join(d, frame["dst"] == d[f"{tag}_did"], "inner")
            .drop(f"{tag}_sid", f"{tag}_did")
        )

    scored = (
        _join_level(e, lvl1, "l1")
        .withColumn(
            "cc1",
            _common_count(
                F.col("nb_src_l1"), F.col("nb_dst_l1"), F.col("src"), F.col("dst")
            ),
        )
        .withColumn("r11", _ratio(F.col("cc1"), F.col("cnt_src_l1")))
        .withColumn("r12", _ratio(F.col("cc1"), F.col("cnt_dst_l1")))
        .select("src", "dst", "r11", "r12")
    )

    scored = _join_level(scored, lvl2, "l2")
    common2 = F.array_intersect(
        F.array_except(F.col("nb_src_l2"), F.array(F.col("src"), F.col("dst"))),
        F.array_except(F.col("nb_dst_l2"), F.array(F.col("src"), F.col("dst"))),
    )
    scored = (
        scored.withColumn("common_neighbors", common2)
        .withColumn("r21", _ratio(F.size("common_neighbors"), F.col("cnt_src_l2")))
        .withColumn("r22", _ratio(F.size("common_neighbors"), F.col("cnt_dst_l2")))
        .select("src", "dst", "common_neighbors", "r11", "r12", "r21", "r22")
        .withColumn(
            "keepit",
            (F.col("r11") > r_lvl1_thres)
            | (F.col("r12") > r_lvl1_thres)
            | (F.col("r21") > r_lvl2_thres)
            | (F.col("r22") > r_lvl2_thres),
        )
    )
    return scored
