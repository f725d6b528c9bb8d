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

The centroid table is trained driver-side on a bounded sample and
MATERIALIZED (explicit list_id values, not a lazy plan): it is n_lists x
dim floats (bounded small by construction — the coarse quantizer is MEANT
to be tiny; 4096 x 1024 doubles = 32 MB worst case).

Honest frontier on isotropic corpora (measured, sf0.01): recall/coverage
0.74/0.27 (nlist=32, nprobe=8), 0.80/0.49 (+2-way corpus multi-assign),
0.94/0.69 (nlist=64, assign=2, nprobe=24) — IVF cannot reach recall 0.9
under 50% coverage when the data has no cluster structure; the
cross-polytope LSH path (operators/similarity.py) does. IVF is registered
as the clustered-data scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot, l2_norm


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def _train_sample_cap(
    n_lists: int, dim: int, sample_n: int | None, sample_bytes: int
) -> int:
    """Rows to collect for quantizer training: FAISS's 256-vectors-per-
    centroid rule unless the caller asks for more, and in every case bounded
    so ``rows x dim x 8`` bytes fits ``sample_bytes`` — a row cap alone is
    unbounded in BYTES at high dim (100k x 1024-dim doubles = ~800 MB on
    the driver). Never below n_lists (k-means needs k seeds; a byte budget
    too small for that is a misconfiguration worth failing loudly)."""
    want = sample_n if sample_n is not None else n_lists * 256
    by_bytes = max(1, sample_bytes // (dim * 8))
    cap = min(want, by_bytes)
    if cap < n_lists:
        # name the knob that actually bound the sample — misdiagnosing the
        # byte budget when sample_n was the limiter sends the operator
        # debugging the wrong setting
        limiter = (
            f"sample_bytes={sample_bytes}" if by_bytes < want else f"sample_n={sample_n}"
        )
        raise ValueError(
            f"{limiter} admits only {cap} x {dim}-dim vectors "
            f"but n_lists={n_lists} centroids need at least that many seeds "
            f"(sample_bytes admits {by_bytes} rows, sample_n asks for {want})"
        )
    return cap


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 16,
    iters: int = 5,
    sample_n: int | None = None,
    sample_bytes: int = 128 << 20,
) -> DataFrame:
    """Deterministic Lloyd's k-means on a driver-side SAMPLE, returning a
    MATERIALIZED centroid table (explicit sequential list_id, values fixed
    at train time — never a lazy plan whose re-execution could scramble
    list assignments).

    Sample-training is the standard coarse-quantizer recipe (FAISS trains
    IVF on <=256 vectors/centroid — the ``sample_n=None`` default): the
    quantizer needs only the coarse density shape, so a bounded sample
    (here: the lowest-id vectors via TakeOrderedAndProject — swap for a
    hash-sample ``WHERE xxhash64(id) % m = 0`` when low ids are not
    representative) collects to the driver, numpy runs the assign/update
    rounds in milliseconds, and only ASSIGNMENT (ivf_index) touches the
    full corpus distributed. The collect is bounded in BYTES, not only
    rows: ``sample_bytes`` (default 128 MB) caps rows x dim x 8, probed
    from one corpus row, so a high-dim corpus can never balloon the
    driver. Deterministic: lowest-id init, fixed iteration count, no RNG.
    """
    import numpy as np

    first_dim = corpus.select(F.size(vec_col).alias("d")).filter("d IS NOT NULL").first()
    dim = int(first_dim["d"]) if first_dim is not None else 1
    cap = _train_sample_cap(n_lists, dim, sample_n, sample_bytes)
    # NULL vectors can't train (np.array would raise on the None row);
    # ivf_index drops them at assignment for the same reason
    rows = (
        corpus.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(cap)
        .collect()
    )
    if not rows:
        raise ValueError(
            "train_ivf_centroids: no non-null vectors to train the "
            "quantizer on — the corpus is empty or every embedding is NULL"
        )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n_lists = min(n_lists, len(x))
    cent = x[:n_lists].copy()
    x_sq = (x * x).sum(1)  # fixed across iterations
    for _ in range(iters):
        # |x-c|^2 = |x|^2 + |c|^2 - 2 x.c as one (n, k) matmul — the
        # broadcasted (n, k, dim) difference tensor would be
        # sample_n*n_lists*dim*8 bytes (terabytes at the docstring's
        # 4096x1024 quantizer scale) reallocated per iteration.
        d = x_sq[:, None] + (cent * cent).sum(1)[None, :] - 2.0 * (x @ cent.T)
        assign = d.argmin(1)
        for j in range(n_lists):
            members = assign == j
            if members.any():
                cent[j] = x[members].mean(0)
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(j, [float(v) for v in cent[j]]) for j in range(n_lists)],
        "list_id bigint, cv array<double>",
    )


def ivf_index(corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Assign each corpus vector to its nearest centroid's inverted list.

    Arrow kernel: the (tiny by construction) centroid matrix is
    closure-captured and each corpus partition streams through one
    (batch x n_lists) matmul — ZERO shuffle. The previous shape
    (crossJoin-broadcast x n_lists + interpreted HOF distances + a
    groupBy(id) min_by) shuffled the ENTIRE corpus with vectors attached
    times n_lists expansion — the real 100 TB defect; locally it also
    measures ~4x slower warm (2.9s vs 0.7s at sf0.1). Ties go to the
    lowest list_id (argmin first index over the sorted centroid table) —
    deterministic.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cent_rows = centroids.orderBy("list_id").collect()
    c_mat = np.array([r.cv for r in cent_rows], dtype=np.float64)  # (k, dim)
    list_ids = np.array([r.list_id for r in cent_rows], dtype=np.int64)
    c_sq = (c_mat * c_mat).sum(1)

    schema = T.StructType(
        [
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField(vec_col, T.ArrayType(T.DoubleType())),
            T.StructField("list_id", T.LongType()),
        ]
    )

    def _assign(batches):
        for pdf in batches:
            # NULL vectors cannot be assigned (and would break the batch
            # matmul); drop them — an unindexable vector is useless to ANN.
            # Ragged dims remain a caller contract (fixed-dim corpus).
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            m = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)  # .tolist() + asarray: 5x faster than np.array(list(...)) per batch (measured)
            d = (m * m).sum(1)[:, None] + c_sq[None, :] - 2.0 * (m @ c_mat.T)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "list_id": list_ids[d.argmin(1)],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(_assign, schema=schema)


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
