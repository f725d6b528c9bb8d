"""Distributed k-means (full-corpus Lloyd's) over embedding columns.

The missing third leg of the clustering stack: ``ivf.train_ivf_centroids``
fits a coarse quantizer on a bounded DRIVER sample (constant driver cost —
right for IVF, whose quantizer only needs the density shape), and
``ivf.ivf_index`` assigns the corpus with a zero-shuffle Arrow argmin.
This module refines those sample-fit centroids against the ENTIRE corpus
distributively — the step that matters when the sample is not
representative (curation-grade cluster balance, SemDeDup-style cluster
pools, cluster-stratified mixing) and the corpus is 100 TB.

Per-iteration shape (the Spark-correct Lloyd's update):

1. ``mapInPandas`` streams Arrow batches; each batch does ONE
   (batch x k) matmul argmin and emits <= k PARTIAL rows
   (cluster, sum-vector, n, inertia) — the corpus (vectors attached)
   never shuffles.
2. Partials posexplode to skinny (cluster, pos, v) rows and aggregate by
   (cluster, pos) — Catalyst's map-side partial aggregation means the
   exchange carries at most k x dim x n_tasks scalar rows, independent of
   corpus size.
3. Exactly k merged rows collect to the driver (bounded by construction;
   ``max_k`` guards the k x dim driver matrix the same way the IVF sample
   is byte-capped), centroids update, next iteration broadcasts them back
   through the closure.

So each iteration is one job, one tiny exchange, zero corpus shuffles —
the same per-round cost model as the Pregel operators (pagerank/bfs),
which are this family's registration precedent (iterative => rows-only
tracker + from-scratch python-model pin, tests/test_kmeans.py).

Determinism: lowest-id seeds (inherited from the IVF trainer), fixed
iteration count (no float-dependent early stop on the fit path — shift
history is RECORDED for observability, never branched on), empty clusters
keep their previous centroid, argmin ties take the lowest cluster id.
Float caveat, stated honestly: partial sums are float64 and their merge
order follows the partition layout, so centroids are layout-stable only
to ~1e-12 relative — integer outputs (assignments, sizes) are pinned
exact across layouts; float outputs are pinned at rel 1e-9 against the
python model and rounded to 6 decimals in the panel per the repo rule.

No reference counterpart (the reference has no clustering at all);
public recipe: Lloyd 1982, the standard map-side-combine formulation
(e.g. Spark MLlib's KMeans aggregates per-partition sum/count the same
way — re-expressed here DataFrame-first, not RDD treeAggregate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ivf import ivf_index, train_ivf_centroids

#: Hard ceiling on k: the driver holds k x dim doubles (and the per-batch
#: matmul is batch x k) — 65536 x 1024 doubles is 512 MB, already generous.
MAX_K = 65536

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.LongType(), False),
        T.StructField("vsum", T.ArrayType(T.DoubleType()), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("inertia", T.DoubleType(), False),
    ]
)


def _iteration_partials(corpus: DataFrame, vec_col: str, c_mat, c_sq) -> DataFrame:
    """One Lloyd's pass: per-Arrow-batch assign + local reduce. Emits at
    most k rows per batch regardless of batch size."""
    import numpy as np

    k = len(c_mat)

    def _partials(batches):
        for pdf in batches:
            vecs = pdf[vec_col][pdf[vec_col].notna()]
            if len(vecs) == 0:
                continue
            m = np.asarray(vecs.tolist(), dtype=np.float64)  # .tolist() + asarray: the measured 5x batch-conversion form
            d = (m * m).sum(1)[:, None] + c_sq[None, :] - 2.0 * (m @ c_mat.T)
            assign = d.argmin(1)
            present = np.unique(assign)
            sums = np.zeros((k, m.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k)
            # d's diagonal trick leaves tiny negative residue for points
            # AT a centroid; clamp so inertia is a true sum of squares
            best = np.maximum(d[np.arange(len(assign)), assign], 0.0)
            iner = np.zeros(k, dtype=np.float64)
            np.add.at(iner, assign, best)
            yield pd.DataFrame(
                {
                    "cluster": present.astype("int64"),
                    "vsum": [sums[j].tolist() for j in present],
                    "n": counts[present].astype("int64"),
                    "inertia": iner[present],
                }
            )

    return corpus.select(vec_col).mapInPandas(_partials, schema=_PARTIAL_SCHEMA)


def _merge_partials(partials: DataFrame) -> list:
    """Skinny-row merge: posexplode -> (cluster, pos) partial-aggregated
    sums -> rebuild arrays -> EXACTLY k (or fewer) rows to the driver.
    Scalar legs (n, inertia) ride the pos=0 rows so one exchange serves
    all three aggregates."""
    exploded = partials.select(
        "cluster",
        "n",
        "inertia",
        F.posexplode("vsum").alias("pos", "v"),
    )
    by_dim = exploded.groupBy("cluster", "pos").agg(
        F.sum("v").alias("s"),
        F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("pos") == 0, F.col("inertia"))).alias("i0"),
    )
    merged = by_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda st: st["s"]
        ).alias("vsum"),
        F.max("n0").alias("n"),
        F.max("i0").alias("inertia"),
    )
    return merged.collect()


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    *,
    iters: int = 3,
) -> tuple[DataFrame, list[dict]]:
    """Refine a materialized centroid table (``list_id bigint, cv
    array<double>`` — the ``train_ivf_centroids`` contract) with ``iters``
    full-corpus Lloyd's iterations. Returns the refined centroid table
    (same schema, MATERIALIZED values) plus a per-iteration history:
    ``{iter, inertia, n_assigned, n_empty, max_shift}``.

    ``max_shift`` (largest centroid L2 move) is recorded so callers can
    SEE convergence; the loop never branches on it — fixed iteration
    count keeps the fit deterministic and every run's job graph
    identical (the pagerank/bfs house rule for iterative operators)."""
    import numpy as np

    cent_rows = centroids.orderBy("list_id").collect()
    if len(cent_rows) > MAX_K:
        raise ValueError(
            f"kmeans_refine: k={len(cent_rows)} exceeds MAX_K={MAX_K} — "
            "the driver update holds k x dim doubles; shard the corpus or "
            "lower k"
        )
    c_mat = np.array([r.cv for r in cent_rows], dtype=np.float64)
    ids = [int(r.list_id) for r in cent_rows]
    history: list[dict] = []
    src = corpus.select(vec_col).filter(F.col(vec_col).isNotNull())
    for it in range(iters):
        c_sq = (c_mat * c_mat).sum(1)
        rows = _merge_partials(_iteration_partials(src, vec_col, c_mat, c_sq))
        new = c_mat.copy()  # empty clusters keep their centroid
        total_inertia, total_n = 0.0, 0
        for r in rows:
            new[r.cluster] = np.asarray(r.vsum, dtype=np.float64) / r.n
            total_inertia += r.inertia
            total_n += r.n
        shift = float(np.sqrt(((new - c_mat) ** 2).sum(1)).max()) if len(new) else 0.0
        history.append(
            {
                "iter": it,
                "inertia": total_inertia,
                "n_assigned": total_n,
                "n_empty": len(c_mat) - len(rows),
                "max_shift": shift,
            }
        )
        c_mat = new
    out = centroids.sparkSession.createDataFrame(
        [(ids[j], [float(v) for v in c_mat[j]]) for j in range(len(ids))],
        "list_id bigint, cv array<double>",
    )
    return out, history


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    seed_iters: int = 5,
    refine_iters: int = 3,
    sample_n: int | None = None,
    sample_bytes: int = 128 << 20,
) -> tuple[DataFrame, list[dict]]:
    """Seed on a bounded driver sample (``train_ivf_centroids`` — lowest-id
    rows, byte-capped collect), then refine against the full corpus
    distributively. The standard large-scale recipe: cheap approximate
    init, exact distributed iterations."""
    seeds = train_ivf_centroids(
        corpus, id_col, vec_col, n_lists=k, iters=seed_iters,
        sample_n=sample_n, sample_bytes=sample_bytes,
    )
    return kmeans_refine(corpus, seeds, vec_col, iters=refine_iters)


def assign_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Final assignment = the IVF Arrow argmin kernel (zero shuffle),
    renamed to the clustering vocabulary."""
    return ivf_index(corpus, centroids, id_col, vec_col).withColumnRenamed(
        "list_id", cluster_col
    )


def cluster_profile(
    assigned: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Per-cluster curation panel: size + mean within-cluster squared
    distance (rounded to 6 decimals per the repo rounding rule). One
    broadcast join (k rows) + one aggregate."""
    sq = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        assigned.join(
            F.broadcast(centroids.withColumnRenamed("list_id", cluster_col)),
            cluster_col,
        )
        .select(cluster_col, sq.alias("sq"))
        .groupBy(cluster_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("sq"), 6).alias("mean_sq_dist"),
        )
    )
