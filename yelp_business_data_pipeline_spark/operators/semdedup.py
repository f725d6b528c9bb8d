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


def calibrate_threshold(
    corpus: DataFrame,
    target_kept_fraction: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_clusters: int = 16,
    keep: str = "min_id",
    centroids: DataFrame | None = None,
    sample_fraction: float = 1.0,
    tol: float = 0.02,
    max_refine: int = 10,
    chunk: int = 1024,
) -> dict:
    """Pick the :func:`semantic_dedup` ``threshold`` that keeps
    ``target_kept_fraction`` of the corpus (±``tol``).

    SemDeDup's paper tunes to a KEPT FRACTION, not a raw cosine — the
    right cosine depends entirely on the embedding model and corpus
    geometry (an isotropic synthetic corpus dedups at ~0.45 where a
    web-text CLIP space needs ~0.95+), so a hardcoded threshold is a
    magic number. Two stages:

    1. **Quantile seed** — one distributed pass computing, per point in
       the greedy visit order, the max cosine to ANY earlier point of
       its cluster (prefix-max via the same chunked-matmul kernel shape
       as the dedup itself). A point is dropped at threshold ``t``
       roughly when this statistic exceeds ``t``, so the
       ``target_kept_fraction`` quantile of the statistic is a close
       seed. (It is only a surrogate: the real rule compares against
       earlier KEPT points, a subset, so the stat over-states similarity
       and the seed skews slightly conservative.)
    2. **Refinement** — bisection on the ACTUAL kept fraction, running
       :func:`semantic_dedup` (a count per probe) until within ``tol``.
       Kept fraction is monotone non-decreasing in ``t`` (raising ``t``
       only ever turns drops into keeps), so bisection converges.

    Scale shape: calibrate on a ``sample_fraction``
    (:func:`sampling.hash_sample` — deterministic, partition-stable);
    the quantile pass and every probe run distributed on the sample, the
    driver sees only scalar fractions. The returned threshold then
    drives the full-corpus dedup. Shares ``centroids`` with the dedup /
    ANN index (pass them in; otherwise trained here on the sample).

    Returns ``{"threshold", "kept_fraction", "probes", "seed"}``.
    Raises if the target is unreachable within ``max_refine`` probes —
    a target below the fraction of clusters' first-visited points (those
    always survive) cannot be hit by any threshold.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if not 0.0 < target_kept_fraction <= 1.0:
        raise ValueError(
            f"calibrate_threshold: target_kept_fraction in (0, 1], got "
            f"{target_kept_fraction}"
        )
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"calibrate_threshold: unknown keep rule {keep!r}")
    sample = corpus.filter(F.col(vec_col).isNotNull())
    if sample_fraction < 1.0:
        from .sampling import hash_sample

        sample = hash_sample(sample, id_col, sample_fraction, salt="cal:")
    sample = sample.localCheckpoint()  # probes re-read it; scan once
    try:
        if centroids is None:
            centroids = train_ivf_centroids(sample, id_col, vec_col, n_lists=n_clusters)
        assigned = ivf_index(sample, centroids, id_col, vec_col)

        cent_rows = centroids.orderBy("list_id").collect()
        cent = {int(r.list_id): np.asarray(r.cv, dtype=np.float64) for r in cent_rows}
        far = keep == "far_from_centroid"

        stat_schema = T.StructType([T.StructField("stat", T.DoubleType())])

        def prefix_max_stats(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf[id_col].to_numpy()
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.sqrt((x * x).sum(1))
            norms[norms == 0.0] = 1.0
            xn = x / norms[:, None]
            if far:
                d = x - cent[int(pdf["list_id"].iloc[0])][None, :]
                order = np.lexsort((ids, -(d * d).sum(1)))
            else:
                order = np.argsort(ids, kind="stable")
            xo = xn[order]
            n = len(order)
            stats = np.full(n, -1.0)
            for start in range(0, n, chunk):
                end = min(start + chunk, n)
                if start:
                    stats[start:end] = (xo[start:end] @ xo[:start].T).max(1)
                block = xo[start:end] @ xo[start:end].T
                for row in range(1, end - start):
                    m = float(block[row, :row].max())
                    if m > stats[start + row]:
                        stats[start + row] = m
            return pd.DataFrame({"stat": stats})

        stats_df = assigned.groupBy("list_id").applyInPandas(
            prefix_max_stats, stat_schema
        )
        seed = stats_df.agg(
            F.percentile_approx("stat", float(target_kept_fraction), 10_000).alias("q")
        ).collect()[0]["q"]
        if seed is None:
            raise ValueError(
                "calibrate_threshold: the calibration sample is empty (all-null "
                f"vectors, or sample_fraction too small for this corpus) — "
                "raise sample_fraction or check the vector column"
            )
        seed = min(max(float(seed), 1e-6), 1.0)

        def kept_at(t: float) -> float:
            v = semantic_dedup(
                sample, id_col, vec_col, threshold=t, centroids=centroids,
                keep=keep, chunk=chunk,
            )
            row = v.agg(
                F.sum(F.col("keep").cast("long")).alias("k"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            return row["k"] / row["n"]

        t, probes = seed, 0
        lo, hi = 0.0, 1.0  # kept(1.0) == 1.0: nothing exceeds cosine 1 strictly
        best = None
        while probes < max_refine:
            f = kept_at(t)
            probes += 1
            if best is None or abs(f - target_kept_fraction) < abs(
                best[1] - target_kept_fraction
            ):
                best = (t, f)
            if abs(f - target_kept_fraction) <= tol:
                return {
                    "threshold": t,
                    "kept_fraction": f,
                    "probes": probes,
                    "seed": seed,
                }
            if f < target_kept_fraction:
                lo = t
            else:
                hi = t
            t = (lo + hi) / 2.0
        raise RuntimeError(
            f"calibrate_threshold: no threshold within tol={tol} of "
            f"target={target_kept_fraction} after {max_refine} probes — best was "
            f"kept={best[1]:.4f} at threshold={best[0]:.4f}. Targets below the "
            "always-kept floor (one point per cluster-visit prefix) are "
            "unreachable; raise the target, tol, or max_refine."
        )
    finally:
        # release the checkpointed blocks: repeated calibrations in
        # one session must not accumulate executor storage for the
        # session lifetime
        sample.unpersist()


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
