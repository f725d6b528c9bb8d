"""Connected components + entity resolution — the clustering stage that
turns verified duplicate PAIRS into ENTITIES.

Every large-scale dedup/linkage pipeline ends the same way: blocking
(deletion-neighborhood / MinHash-LSH / cross-polytope) -> pairwise verify
(levenshtein / Jaccard / cosine) -> CONNECTED COMPONENTS over the match
graph -> one canonical record per component. The first two stages live in
``operators.dedup`` / ``operators.similarity``; this module supplies the
last two.

Algorithm: hash-min label propagation (the standard map-reduce CC — e.g.
Rastogi et al. 2013 "Finding Connected Components in Map-Reduce in
Logarithmic Rounds" use this as the HCC baseline): every vertex starts
labeled with its own id; each round every vertex takes the min label in
its closed neighborhood; converged when no label changes. Rounds are
bounded by the graph diameter — dup-cluster graphs are shallow (stars /
short chains), so 3-5 rounds typically converge; ``max_iter`` caps
runaway graphs and convergence is checked with a cheap aggregate, not a
collect.

Spark shapes: one shuffle per round (groupBy vertex on the propagated
labels); lineage is cut with localCheckpoint each round so the iterative
plan does not snowball (the classic iterative-DataFrame trap). Fully
deterministic: min over int64 ids, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``pairs``; component =
    min vertex id reachable. Raises if ``max_iter`` rounds don't converge
    (a diameter that deep means the input is not a dup-pair graph)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def resolve_entities(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Entity resolution tail: records + verified duplicate pairs ->
    records with ``entity_id`` (the component's min member id; singletons
    keep their own id) and ``is_canonical`` (true for the min-id member —
    the deterministic representative)."""
    comp = connected_components(pairs, src, dst)
    out = (
        records.join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("entity_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("comp")
    )
    w = Window.partitionBy("entity_id").orderBy(F.col(id_col))
    return out.withColumn("is_canonical", F.row_number().over(w) == 1)
