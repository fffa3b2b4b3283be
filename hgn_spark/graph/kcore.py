"""k-core decomposition (core numbers) by iterative peeling.

Engine extension (SURVEY §2.9 — the reference has no cohesion
analysis): core(v) is the largest k such that v survives repeated
deletion of all vertices with degree < k. Standard corpus/community
tooling next to triangles and components.

Algorithm — the distributed peeling formulation: for k = 1, 2, ...,
repeatedly drop vertices whose CURRENT degree is below k until the
k-core stabilizes; vertices removed while peeling at level k have core
number k - 1, and when the graph empties the last non-empty survivor
set holds the maximum core. Each peel step is one degree aggregation
plus one semi/anti join pair — all equi-keyed, no driver-side vertex
lists (the only actions are tiny isEmpty probes, the same loop-control
discipline as connected components).

Scale notes: the number of outer levels is the graph's degeneracy
(small for sparse real-world graphs; ~2m/n average bounds it), and
every inner iteration strictly removes vertices, so the total work is
O(levels x peel-rounds) bounded shuffles over a shrinking edge set.
Superseded edge-set generations are released eagerly (one generation
carried, as in the HGN loop / CC / PageRank)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hgn_spark.checkpoint import CheckpointJanitor
from hgn_spark.graph.core import symmetrize


def core_numbers(edges: DataFrame, max_levels: int = 100) -> DataFrame:
    """→ ``(id, core)`` for every vertex with at least one edge.

    Matches ``networkx.core_number`` (parity pinned in
    tests/test_graph.py). ``max_levels`` bounds the outer loop as a
    runaway guard; the loop exits when the graph empties.
    """
    spark = edges.sparkSession
    jan = CheckpointJanitor(spark)
    cur, cur_ids = jan.checkpoint(symmetrize(edges))
    # Explicit alive-vertex frame: a vertex whose last edge is removed
    # mid-peel has ZERO rows in the edge set — without this frame it
    # would silently vanish instead of being peeled (degree 0 < k) and
    # labeled at the current level.
    alive, alive_ids = jan.checkpoint(
        cur.select(F.col("src").alias("id")).distinct()
    )
    done: list[DataFrame] = []
    done_ids: set[int] = set()

    k = 1
    while k <= max_levels:
        if alive.isEmpty():
            break
        # Peel vertices with current degree < k to a fixpoint.
        while True:
            deg = cur.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("deg")
            )
            low = (
                alive.join(deg, "id", "left")
                .filter(F.coalesce(F.col("deg"), F.lit(0)) < k)
                .select("id")
            )
            low, low_ids = jan.checkpoint(low)
            if low.isEmpty():
                jan.release(low_ids)
                break
            # Removed while peeling level k → survived level k-1.
            done.append(low.select("id", F.lit(k - 1).alias("core")))
            done_ids |= set(low_ids)
            new_alive, new_alive_ids = jan.checkpoint(
                alive.join(low, "id", "left_anti")
            )
            nxt, nxt_ids = jan.checkpoint(
                cur.join(low.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(low.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .select("src", "dst")
            )
            alive, cur = new_alive, nxt
            jan.release(alive_ids)
            jan.release(cur_ids)
            # `low` stays persisted: `done` references it until the
            # caller materializes the union (vertex-list-sized blocks).
            alive_ids, cur_ids = new_alive_ids, nxt_ids
        k += 1

    if not alive.isEmpty():
        # max_levels hit with survivors: their true core number is >=
        # max_levels, so any label emitted here would be a silent lower
        # bound (e.g. a 150-clique at the default guard). Fail loudly —
        # the caller raises max_levels, which is cheap (the loop already
        # exits early at the degeneracy for any real graph). Release
        # every persisted generation first — INCLUDING the per-level
        # `low` frames behind the discarded `done` list: the advised
        # re-run happens in the same session, and leaked blocks from
        # failed attempts would accumulate across retries.
        jan.release(cur_ids)
        jan.release(alive_ids)
        jan.release(frozenset(done_ids))
        raise RuntimeError(
            f"core_numbers: max_levels={max_levels} reached with vertices "
            "still alive — the graph's degeneracy exceeds the guard; "
            "re-run with a larger max_levels"
        )
    jan.release(cur_ids)
    if not done:
        return spark.createDataFrame([], "id long, core int")
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out
