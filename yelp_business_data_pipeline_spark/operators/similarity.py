"""Embedding similarity search (SURVEY.md §2.9; BASELINE.json north-star).

- **Brute-force cosine top-k** — the exactness baseline: broadcast the query
  set, cross-join against the corpus, fold the dot product with higher-order
  functions (JVM-side, no UDF), per-query top-k via window. At 100 TB the
  corpus side stays partitioned; only the (small) query side is broadcast,
  so the scan is embarrassingly parallel with no shuffle until the final
  per-query top-k (k rows per partition per query via AQE).
- **Random-hyperplane LSH (SimHash for vectors, Charikar 2002)** — the scale
  path: sign-pattern bucket per vector from deterministic pseudo-random
  hyperplanes; candidate pairs/neighbors only within a bucket (or within
  Hamming-adjacent buckets for higher recall). Bucketing is a single
  projection + one groupBy/join on the bucket key.

Vectors are ``array<float>`` columns cast to ``array<double>`` for math
(exact widening, deterministic left-to-right folds — oracle-reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash


def as_double_vec(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of the elementwise product (deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "v",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` and ``corpus``: (id, vec) with ``vec_col`` as array<double>.
    Cosine is rounded to 6 decimals BEFORE ranking so ordering is stable
    across engines/partitionings; ties break on corpus id.
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv"), l2_norm(F.col(vec_col)).alias("_qn")
    )
    c = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("_cv"), l2_norm(F.col(vec_col)).alias("_cn")
    )
    pairs = c.crossJoin(F.broadcast(q))
    cos = F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6)
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "rnk", "cosine")
    )


def hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane weights in [-1, 1].

    Derived from md5 so any engine (and the test oracle) can reproduce them:
    ``w[d] = (bigint(hex8(md5('p:d'))) % 2001 - 1000) / 1000``.
    """
    import hashlib

    w = []
    for d in range(dim):
        h = int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:8], 16)
        w.append((h % 2001 - 1000) / 1000.0)
    return w


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-pattern bucket id from ``n_planes`` fixed hyperplanes.

    bucket = sum over planes of 2^p * [dot(vec, plane_p) > 0]. Pure column
    arithmetic (the plane weights are literals folded into codegen).
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        w = hyperplane(dim, p)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in w]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "v",
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: brute-force cosine only within the query's LSH
    bucket. Recall < 1 by design; raise by lowering n_planes or probing
    neighboring buckets. The bucket equi-join replaces the cross join —
    expected candidate count shrinks by ~2^n_planes.
    """
    qb = queries.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    cb = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    q = qb.select(
        query_id, "_bucket", F.col(vec_col).alias("_qv"), l2_norm(F.col(vec_col)).alias("_qn")
    )
    c = cb.select(
        corpus_id, "_bucket", F.col(vec_col).alias("_cv"), l2_norm(F.col(vec_col)).alias("_cn")
    )
    pairs = c.join(F.broadcast(q), "_bucket")
    cos = F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6)
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "rnk", "cosine")
    )
