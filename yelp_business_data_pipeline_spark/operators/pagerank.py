"""PageRank over the DataFrame edge table — the iterative-analytics
exemplar next to connected_components (same lineage discipline).

The classic damped power iteration (Page, Brin, Motwani & Winograd 1999):
``rank = (1-d)/N + d * (contributions from in-neighbors + dangling mass
/ N)``. Spark-first shape per round: one equi-join (edges x ranks on the
source), one groupBy on the destination — both shuffles keyed on vertex
id, so a round costs exactly the same partitioning twice and AQE reuses
it. Dangling vertices (no out-edges) redistribute their mass globally via
a 1-row aggregate crossed onto the update (a broadcast of ONE value, not
a collect of the rank vector). Lineage is cut with ``localCheckpoint``
each round like connected_components — without it the plan doubles per
iteration; swap for reliable ``checkpoint()`` on a real cluster.

Deterministic: no RNG, fixed iteration count or an exact L1-convergence
test computed distributedly (1-row agg). No reference counterpart (the
reference has no iterative analytics); extends the graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(id, rank) for every vertex in ``edges``; ranks sum to 1.

    Stops when the L1 delta between rounds drops below ``tol`` (computed
    as a 1-row distributed aggregate) or after ``max_iter`` rounds.
    Parallel edges are collapsed (a duplicated edge must not double a
    contribution); self-loops count like any other edge.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    ranks = vertices.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()

    for _ in range(max_iter):
        with_deg = ranks.join(out_deg, "id", "left")
        # mass from vertices WITH out-edges flows along them; dangling mass
        # spreads uniformly (1-row agg -> crossJoin of a single row, i.e. a
        # broadcast scalar, never a driver-side rank collect)
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contribs = (
            e.join(with_deg.filter(F.col("deg").isNotNull()), e.a == with_deg.id)
            .select(F.col("b").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            vertices.join(contribs, "id", "left")
            .crossJoin(dangling)
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("_dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "id")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
            .first()["d"]
        )
        ranks = new_ranks
        if delta < tol:
            break
    return ranks
