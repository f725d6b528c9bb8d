"""Multi-source breadth-first search: shortest hop distances over an
edge DataFrame.

Completes the graph-analytics family (degree / motif / connected
components / PageRank / triangles) with the remaining classic: hop
distance from a seed set — "how far is every user from an elite
reviewer", graph-locality features for ranking models, reachability
radii for integrity checks (reference neo4j_test.cypher's relationship
checks are the 1-hop special case).

Scale design (the 100 TB shape)
-------------------------------
Frontier iteration, the textbook BSP/Pregel BFS expressed as DataFrame
ops: per level ONE equi-join (frontier x edges on the source vertex)
plus ONE anti-join against the visited set — both keyed on vertex id so
AQE co-partitions them. The frontier is the only iterated state; at
every level it holds exactly the newly-discovered vertices, so per-level
cost is proportional to the frontier's edge fan-out, never the whole
graph. Lineage is cut per level (``localCheckpoint``, the repo's
iterative pattern — pagerank/star-CC), and the visited set grows by
unionAll of checkpointed frontiers (each union member is already
materialized, so the union never recomputes history). Termination: the
frontier count (one 1-row aggregate per level, same job as the
checkpoint read) hits zero, or ``max_depth`` raises loudly.

Directed by default; pass the symmetrized edge set (union both
directions) for undirected distance, exactly like the other graph
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_depth: int = 30,
    checkpoint: bool = True,
) -> DataFrame:
    """(id, dist): minimum hop count from any seed in ``sources`` (a
    one-column DataFrame of vertex ids, dist 0) to every reachable
    vertex. Unreachable vertices are absent from the output (left-join
    against a vertex frame and fill if a dense result is needed).

    Raises RuntimeError when a frontier still exists after ``max_depth``
    levels — distances beyond the cap would be silently wrong, so the
    cap fails loudly (the star-CC convention).
    """

    def _cp(df: DataFrame) -> DataFrame:
        return df.localCheckpoint() if checkpoint else df

    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).filter(
        F.col("_s").isNotNull() & F.col("_d").isNotNull()
    )
    frontier = _cp(
        sources.select(F.col(id_col).alias("id")).distinct().withColumn(
            "dist", F.lit(0)
        )
    )
    visited = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.id == e._s)
            .select(F.col("_d").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("dist", F.lit(depth))
        )
        nxt = _cp(nxt)
        if nxt.limit(1).count() == 0:
            return visited
        # every member of the union is an already-materialized checkpoint:
        # the growing lineage is a union of RDD scans, never recomputation.
        visited = visited.unionAll(nxt)
        frontier = nxt
    # Raise only if the final frontier can still reach an UNVISITED
    # vertex — frontier edges back into the visited set (every undirected
    # graph has them) do not mean the search is incomplete.
    remaining = (
        frontier.join(e, frontier.id == e._s)
        .select(F.col("_d").alias("id"))
        .join(visited, "id", "left_anti")
    )
    if remaining.limit(1).count() > 0:
        raise RuntimeError(
            f"bfs_distances: frontier not exhausted after max_depth={max_depth}; "
            "raise the cap or check for unexpectedly long paths"
        )
    return visited
