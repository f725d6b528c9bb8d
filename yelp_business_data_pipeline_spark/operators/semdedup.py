"""SemDeDup-style semantic deduplication over an embedding column.

Near-duplicate SEMANTIC documents (paraphrases, templated rewrites,
boilerplate variants) survive exact/MinHash dedup because their token
sets differ; SemDeDup (Abbas, Tirumala, Simig, Ganguli & Morcos 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540) removes them in embedding space:
k-means-cluster the corpus, then within each cluster drop every point
whose cosine similarity to an already-kept point exceeds a threshold.
Comparing only within clusters turns the O(n^2) all-pairs problem into
sum-over-clusters O(c^2) with c ~ n/k — the paper dedups LAION-440M
with 50k clusters this way.

Spark-first shape
-----------------
1. **Cluster** — reuse the IVF coarse quantizer (`ivf.train_ivf_centroids`
   — deterministic sample-trained Lloyd's; `ivf.ivf_index` — zero-shuffle
   Arrow assignment). No new machinery, and the same centroids can serve
   ANN search and dedup.
2. **Within-cluster greedy scan** — ONE shuffle (groupBy cluster), then
   an ``applyInPandas`` kernel per cluster: points are visited in a
   deterministic order and a point is REMOVED when its cosine to any
   already-KEPT point exceeds ``threshold`` (the greedy prefix rule —
   first occurrence survives, later near-copies fall). The kept matrix
   grows incrementally and candidates score against it in one numpy
   matmul per chunk, so per-cluster cost is O(c * kept * dim) and
   memory O(c * dim).

Determinism: visit order is total (``keep="min_id"`` sorts by id;
``keep="far_from_centroid"`` sorts by descending distance to the cluster
centroid with id tiebreak — the paper's best-performing variant, which
keeps the cluster's outskirts and drops the dense middle), centroids are
sample-trained deterministically, and cosine comparisons use float64.

Cluster-size contract (the 100-TB knob): ``applyInPandas`` holds ONE
cluster in executor memory, so pick ``n_clusters ~ corpus_size /
target_cluster_rows`` (the paper's ratio is ~9k rows/cluster). Skewed
clusters are the quantizer's problem — retrain with more lists rather
than special-casing here. Cross-cluster near-dups are missed BY DESIGN
(the paper's accepted trade: boundary pairs are rare at sane k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import ivf_index, train_ivf_centroids


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    threshold: float = 0.96,
    n_clusters: int = 16,
    keep: str = "min_id",
    centroids: DataFrame | None = None,
    chunk: int = 1024,
) -> DataFrame:
    """Per-vector verdicts: ``(id, list_id, keep boolean, dup_of, max_kept_sim)``.

    ``keep=False`` rows are semantic near-duplicates of an earlier-kept
    point in their cluster: ``dup_of`` names the kept point with the
    HIGHEST cosine to this one (ties: lowest id), ``max_kept_sim`` is
    that cosine rounded to 6 dp (observability only — the keep decision
    is made on the raw float64). Pass pre-trained ``centroids`` to share
    the quantizer with an IVF search index; otherwise one is trained
    here. ``threshold`` compares strictly greater (cosine == threshold
    survives). NULL vectors are dropped (they cannot be compared).

    The kept SET is what a training pipeline joins back against; filter
    ``keep`` and semi-join the document table on ``id``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"semantic_dedup: threshold in (0, 1], got {threshold}")
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"semantic_dedup: unknown keep rule {keep!r}")
    if centroids is None:
        centroids = train_ivf_centroids(corpus, id_col, vec_col, n_lists=n_clusters)
    assigned = ivf_index(corpus, centroids, id_col, vec_col)

    cent_rows = centroids.orderBy("list_id").collect()
    cent = {int(r.list_id): np.asarray(r.cv, dtype=np.float64) for r in cent_rows}
    far = keep == "far_from_centroid"

    id_type = corpus.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("list_id", T.LongType()),
            T.StructField("keep", T.BooleanType()),
            T.StructField("dup_of", id_type),
            T.StructField("max_kept_sim", T.DoubleType()),
        ]
    )

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        x = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (c, dim)
        norms = np.sqrt((x * x).sum(1))
        norms[norms == 0.0] = 1.0  # zero vectors: cosine defined as 0
        xn = x / norms[:, None]
        lid = int(pdf["list_id"].iloc[0])
        if far:
            d = x - cent[lid][None, :]
            # farthest-first with ascending-id tiebreak: lexsort's last
            # key is primary, and negating distance flips to descending
            order = np.lexsort((ids, -(d * d).sum(1)))
        else:
            order = np.argsort(ids, kind="stable")
        keep_rows = np.zeros(len(ids), dtype=bool)
        dup_of = np.full(len(ids), None, dtype=object)
        # object dtype so kept rows surface as SQL NULL, not NaN
        max_sim = np.full(len(ids), None, dtype=object)
        kept_idx: list[int] = []
        for start in range(0, len(order), chunk):
            cand = order[start : start + chunk]
            sims = (
                xn[cand] @ xn[kept_idx].T
                if kept_idx
                else np.zeros((len(cand), 0))
            )
            # within-chunk shadowing: process in order, appending to the
            # kept matrix as we go; sims vs the pre-chunk kept set came
            # from ONE matmul, in-chunk comparisons are rank-1 updates
            for row, i in enumerate(cand):
                n_pre = sims.shape[1]
                best = -1.0
                best_j = -1
                if n_pre:
                    j = int(np.argmax(sims[row, :n_pre]))
                    best, best_j = float(sims[row, j]), kept_idx[j]
                for j in kept_idx[n_pre:]:  # kept points added this chunk
                    s = float(xn[i] @ xn[j])
                    if s > best:
                        best, best_j = s, j
                if best > threshold:
                    dup_of[i] = ids[best_j]
                    max_sim[i] = round(best, 6)
                else:
                    keep_rows[i] = True
                    kept_idx.append(i)
        return pd.DataFrame(
            {
                id_col: ids,
                "list_id": np.full(len(ids), lid, dtype=np.int64),
                "keep": keep_rows,
                "dup_of": dup_of,
                "max_kept_sim": max_sim,
            }
        )

    return assigned.groupBy("list_id").applyInPandas(dedup_cluster, schema)


def semantic_dedup_stats(verdicts: DataFrame) -> DataFrame:
    """Cluster-level rollup of :func:`semantic_dedup` verdicts:
    ``(list_id, n_vectors, n_kept, n_dups, mean_dup_sim)`` — the
    monitoring surface (dedup rate per cluster; a cluster deduping to
    ~1 point means the threshold is too loose or the cluster collapsed)."""
    return verdicts.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dups"),
        F.round(F.avg("max_kept_sim"), 6).alias("mean_dup_sim"),
    )
