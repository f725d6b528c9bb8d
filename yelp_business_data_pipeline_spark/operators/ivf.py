"""IVF (inverted-file) approximate nearest neighbors.

The second ANN scale path next to sign-LSH (operators/similarity.py): a
coarse k-means quantizer partitions the corpus into ``n_lists`` inverted
lists; a query probes its ``nprobe`` nearest centroids and brute-forces
cosine only within those lists. Unlike sign-LSH, IVF adapts to the data
distribution, so it wins on clustered embeddings (sign-LSH wins on
adversarially uniform ones).

Spark-first shapes:

- **Training (Lloyd's iterations)** — assignment is a broadcast cross join
  corpus x centroids + ``min_by`` (no shuffle of the corpus); the centroid
  update is posexplode(vec) -> groupBy(list, dim).avg -> rebuild array —
  one shuffle of (corpus x dim) skinny rows per iteration. Deterministic:
  init = lowest-id vectors, fixed iteration count, no RNG.
- **Index** — one extra int column (list id) on the corpus; at 100 TB you
  would partitionBy(list) on write so probes prune files.
- **Search** — probe selection is query x centroids (broadcast, tiny);
  candidate scoring joins corpus on the list id — an equi-join Catalyst
  shuffles on a low-cardinality key, AQE-coalesced.

The centroid table is collected to the driver between stages: it is
n_lists x dim floats (bounded small by construction — the coarse quantizer
is MEANT to be tiny; 4096 x 1024 doubles = 32 MB worst case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot, l2_norm


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def _centroids_df(df: DataFrame, id_col: str, vec_col: str, n_lists: int) -> DataFrame:
    return df.orderBy(id_col).limit(n_lists).select(
        F.monotonically_increasing_id().alias("list_id"), F.col(vec_col).alias("cv")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Deterministic Lloyd's k-means: init from the ``n_lists`` lowest-id
    vectors, ``iters`` assign/update rounds. Returns (list_id, cv)."""
    centroids = _centroids_df(corpus, id_col, vec_col, n_lists)
    base = corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    for _ in range(iters):
        assigned = (
            base.crossJoin(F.broadcast(centroids))
            .groupBy("_vid")
            .agg(
                F.min_by("list_id", _sq_dist(F.col("_v"), F.col("cv"))).alias("list_id"),
                F.first("_v").alias("_v"),
            )
        )
        dims = assigned.select(
            "list_id", F.posexplode("_v").alias("dim", "x")
        )
        centroids = (
            dims.groupBy("list_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s.getField("m")
                ).alias("cv")
            )
        )
    return centroids


def ivf_index(corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Assign each corpus vector to its nearest centroid's inverted list."""
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(centroids))
        .groupBy(id_col)
        .agg(
            F.min_by("list_id", _sq_dist(F.col(vec_col), F.col("cv"))).alias("list_id"),
            F.first(vec_col).alias(vec_col),
        )
    )


def ivf_ann_topk(
    queries: DataFrame,
    indexed_corpus: DataFrame,
    centroids: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "v",
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """Top-k cosine among the ``nprobe`` nearest inverted lists per query."""
    w_probe = Window.partitionBy(query_id).orderBy(
        F.asc("_cdist"), F.asc("list_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_cdist", _sq_dist(F.col(vec_col), F.col("cv")))
        .withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= nprobe)
        .select(query_id, F.col(vec_col).alias("_qv"), l2_norm(F.col(vec_col)).alias("_qn"), "list_id")
    )
    cand = indexed_corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("_cv"), l2_norm(F.col(vec_col)).alias("_cn"), "list_id"
    ).join(F.broadcast(probes), "list_id")
    cos = F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6)
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        cand.select(query_id, corpus_id, cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "rnk", "cosine")
    )
