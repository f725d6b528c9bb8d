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
    personalize: DataFrame | None = None,
    check_every: int = 4,
    stats: dict | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """(id, rank) for every vertex in ``edges``; ranks sum to 1.

    Stops when the L1 delta between rounds drops below ``tol`` (computed
    as a 1-row distributed aggregate) or after ``max_iter`` rounds. The
    delta is evaluated only every ``check_every``-th round: each check is
    a driver action (a full job submission, ~constant scheduling cost at
    cluster scale), so batching cuts driver round-trips ``check_every``×
    at the price of up to ``check_every - 1`` extra cheap iterations past
    convergence. ``check_every=1`` restores the per-round test; the delta
    compared is always consecutive-round L1, so ``tol`` semantics are
    unchanged. Pass a ``stats`` dict to receive
    ``{"iterations": n, "delta_checks": n}`` (observability + test probe).
    ``checkpoint=False`` skips the per-round localCheckpoint lineage cuts
    so the RETURNED plan shows the genuine per-round join+groupBy shape
    (plan inspection / EXPLAIN.md only — never run many iterations with
    it, the plan doubles per round).
    Parallel edges are collapsed (a duplicated edge must not double a
    contribution); self-loops count like any other edge.

    ``personalize`` (a one-column DataFrame of vertex ids) switches to
    PERSONALIZED PageRank: teleport mass — the (1-d) restart AND dangling
    mass — lands uniformly on the SEED SET instead of all vertices, so
    ranks measure proximity to the seeds (the recommendation variant: seed
    a user's friends, rank the graph around them). Seeds not present in
    the edge set are ignored; an empty intersection raises. The teleport
    vector is a broadcast-joined indicator column, never a driver-side
    rank collect — the seed set can itself be large.
    """
    # pure-python argument checks FIRST: failing after the edge/vertex
    # materialization jobs would waste minutes of cluster work on a typo
    if check_every < 1:
        raise ValueError(f"pagerank: check_every must be >= 1, got {check_every}")

    def _cp(df: DataFrame) -> DataFrame:
        return df.localCheckpoint() if checkpoint else df

    e = _cp(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct())
    vertices = _cp(
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .distinct()
    )
    n = vertices.count()
    if n == 0:
        if personalize is not None:
            # the documented loud failure must fire on an empty graph too —
            # the seed/vertex intersection is necessarily empty
            raise ValueError("pagerank: no personalization seed exists in the graph")
        return vertices.withColumn("rank", F.lit(0.0))

    if personalize is not None:
        seed_col = personalize.columns[0]
        seeds = personalize.select(F.col(seed_col).alias("id")).distinct()
        # checkpoint so the caller's (possibly expensive) personalize
        # lineage runs once, not once for the count and again in the join
        in_graph = _cp(vertices.join(seeds, "id", "left_semi"))
        n_seeds = in_graph.count()
        if n_seeds == 0:
            raise ValueError("pagerank: no personalization seed exists in the graph")
        teleport = vertices.join(
            in_graph.withColumn("_t", F.lit(1.0 / n_seeds)), "id", "left"
        ).select("id", F.coalesce(F.col("_t"), F.lit(0.0)).alias("t"))
        teleport = _cp(teleport)
    else:
        teleport = _cp(vertices.withColumn("t", F.lit(1.0 / n)))

    out_deg = e.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    # teleport is already checkpointed; the rename needs no second copy
    ranks = teleport.select("id", F.col("t").alias("rank"))

    if stats is None:
        stats = {}
    stats["iterations"] = 0
    stats["delta_checks"] = 0
    for it in range(max_iter):
        with_deg = ranks.join(out_deg, "id", "left")
        # mass from vertices WITH out-edges flows along them; dangling mass
        # teleports (1-row agg -> crossJoin of a single row, i.e. a
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
            teleport.join(contribs, "id", "left")
            .crossJoin(dangling)
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("_dm") * F.col("t"))
                ).alias("rank"),
            )
        )
        new_ranks = _cp(new_ranks)
        stats["iterations"] = it + 1
        # Convergence is tested only on check rounds (and never on the final
        # round, where the loop exits regardless) — the L1 aggregate is
        # 1-row-cheap to compute but each .first() is a full job submission.
        if (it + 1) % check_every == 0 and it + 1 < max_iter:
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .first()["d"]
            )
            stats["delta_checks"] += 1
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks
