"""Product quantization (PQ) approximate nearest neighbors.

The third ANN scale path next to cross-polytope LSH (similarity.py) and
IVF (ivf.py), and the one that changes the STORAGE equation: PQ (Jegou,
Douze & Schmid, "Product quantization for nearest neighbor search",
IEEE TPAMI 2011 — the FAISS `PQx` index family) splits each vector into
``m`` subspaces, k-means-quantizes each subspace independently, and stores
a vector as ``m`` small code ids — 64 dims of float32 become 8 bytes at
m=8 (32x), so a 100 TB embedding corpus scans as ~3 TB of codes.

Spark-first shapes (mirroring ivf.py's conventions):

- **Training** — per-subspace Lloyd's on a driver-side sample bounded in
  BYTES (shares ivf.py's ``_train_sample_cap``); deterministic: lowest-id
  init, fixed iterations, no RNG. Codebooks are MATERIALIZED as a
  (subspace, code, cv) DataFrame — explicit values, never a lazy plan.
- **Encode** — Arrow ``mapInPandas`` kernel: each corpus partition streams
  once through an argmin against the closure-captured codebook tensor.
  ZERO shuffle, like ivf_index.
- **Search (ADC)** — asymmetric distance computation: per query build an
  (m, n_codes) lookup table of squared subspace distances, then a corpus
  code row scores as m table lookups + a sum — the codes table streams
  once, queries are closure-captured, partial top-k per batch, one final
  per-query window. No shuffle of anything corpus-sized.
- **Rerank** — ADC is a lossy shortlist; ``pq_ann_topk(rerank=R)`` takes
  the top-R ADC candidates and rescores them EXACTLY by joining back the
  R x n_queries vectors (an equi-join on corpus id — at 100 TB this
  fetches R vectors per query, not the corpus). The standard IVFADC+R
  recipe; recall pins live in tests/test_pq.py.

All distances are squared L2. Unit-normalize vectors first (the
registered query does) and L2 order equals cosine order: |a-b|^2 = 2-2cos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ivf import _train_sample_cap


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    n_codes: int = 32,
    iters: int = 5,
    sample_n: int | None = None,
    sample_bytes: int = 128 << 20,
) -> DataFrame:
    """Train per-subspace codebooks, returned MATERIALIZED as
    (subspace int, code int, cv array<double>).

    The vector dim must divide evenly into ``m`` subspaces (raises
    otherwise — silent padding would corrupt every downstream distance).
    Sample bounded in bytes exactly like IVF training; ``n_codes`` per
    subspace follows the FAISS default family (256 = 1 byte/code; smaller
    here because the test corpora are small).
    """
    import numpy as np

    first = corpus.select(F.size(vec_col).alias("d")).filter("d IS NOT NULL").first()
    dim = int(first["d"]) if first is not None else 0
    if dim == 0 or dim % m != 0:
        raise ValueError(f"PQ needs dim % m == 0; got dim={dim}, m={m}")
    sub = dim // m
    cap = _train_sample_cap(n_codes, dim, sample_n, sample_bytes)
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(cap).collect()
    x = np.array([r[1] for r in rows], dtype=np.float64)  # (n, dim)

    out = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]  # (n, sub)
        kk = min(n_codes, len(xs))
        cent = xs[:kk].copy()
        xs_sq = (xs * xs).sum(1)
        for _ in range(iters):
            d = xs_sq[:, None] + (cent * cent).sum(1)[None, :] - 2.0 * (xs @ cent.T)
            assign = d.argmin(1)
            for ci in range(kk):
                members = assign == ci
                if members.any():
                    cent[ci] = xs[members].mean(0)
        out.extend(
            (j, ci, [float(v) for v in cent[ci]]) for ci in range(kk)
        )
    return corpus.sparkSession.createDataFrame(
        out, "subspace int, code int, cv array<double>"
    )


def _codebook_tensor(codebooks: DataFrame):
    """Collect the (small by construction) codebook table into an
    (m, n_codes, sub) tensor; code ids are dense per subspace."""
    import numpy as np

    rows = codebooks.orderBy("subspace", "code").collect()
    if not rows:
        raise ValueError("empty codebook table — train_pq_codebooks first")
    m = rows[-1].subspace + 1
    per = [[r.cv for r in rows if r.subspace == j] for j in range(m)]
    # Ragged per-subspace code counts (a filtered or hand-edited codebook
    # table) must fail loudly: zero-padding the short subspaces would mint
    # phantom all-zero centroids that argmin can legally pick for
    # near-origin vectors, silently corrupting codes and ADC distances.
    counts = {j: len(p) for j, p in enumerate(per)}
    if len(set(counts.values())) != 1 or 0 in counts.values():
        raise ValueError(
            f"codebook table is ragged: per-subspace code counts {counts}; "
            "every subspace must carry the same (non-zero) number of codes"
        )
    n_codes = counts[0]
    sub = len(per[0][0])
    tens = np.zeros((m, n_codes, sub), dtype=np.float64)
    for j, p in enumerate(per):
        tens[j] = np.array(p, dtype=np.float64)
    return tens


def pq_encode(
    corpus: DataFrame, codebooks: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Encode each vector as its per-subspace nearest-code ids:
    (id, codes array<int>). Arrow kernel, zero shuffle; NULL vectors are
    dropped (unencodable). Ties go to the lowest code id (argmin first
    index) — deterministic."""
    import numpy as np
    import pandas as pd

    tens = _codebook_tensor(codebooks)  # (m, k, sub)
    m, _k, sub = tens.shape
    c_sq = (tens * tens).sum(2)  # (m, k)

    schema = T.StructType(
        [
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def _encode(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)  # (b, dim)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d = (xs * xs).sum(1)[:, None] + c_sq[j][None, :] - 2.0 * (xs @ tens[j].T)
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return corpus.select(id_col, vec_col).mapInPandas(_encode, schema=schema)


def _query_lut(queries: DataFrame, tens, query_id: str, vec_col: str):
    """(q_ids, lut): per-query LUT of squared subspace distances,
    (nq, m, n_codes) — queries are small by contract (collected)."""
    import numpy as np

    m, n_codes, sub = tens.shape
    q_rows = queries.select(query_id, vec_col).collect()  # small by contract
    if not q_rows:
        raise ValueError("pq_adc_topk: empty query set — nothing to search for")
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    lut = np.empty((len(q_ids), m, n_codes), dtype=np.float64)
    for j in range(m):
        qs = q_mat[:, j * sub : (j + 1) * sub]  # (nq, sub)
        lut[:, j, :] = (
            (qs * qs).sum(1)[:, None]
            + (tens[j] * tens[j]).sum(1)[None, :]
            - 2.0 * (qs @ tens[j].T)
        )
    return q_ids, lut


def _adc_rank(scored: DataFrame, query_id: str, corpus_id: str, k: int) -> DataFrame:
    w = Window.partitionBy("q_id_").orderBy(F.asc("adc_dist"), F.asc("c_id_"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("q_id_").alias(query_id),
            F.col("c_id_").alias(corpus_id),
            "rnk",
            "adc_dist",
        )
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "v",
    k: int = 10,
) -> DataFrame:
    """Top-k by asymmetric distance: exact query subvectors vs quantized
    corpus codes. Returns (q_id, c_id, rnk, adc_dist); distances rounded
    to 6 decimals before ranking, ties on corpus id — deterministic."""
    import numpy as np
    import pandas as pd

    tens = _codebook_tensor(codebooks)
    m, n_codes, sub = tens.shape
    q_ids, lut = _query_lut(queries, tens, query_id, vec_col)

    # id columns keep their source dtypes (string business keys work, not
    # only long vec_ids) — hardcoding LongType made Arrow reject any other
    # id type deep inside the kernel.
    out_schema = T.StructType(
        [
            T.StructField("q_id_", queries.schema[query_id].dataType),
            T.StructField("c_id_", codes.schema[corpus_id].dataType),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (b, m)
            c_ids = pdf[corpus_id].to_numpy()
            # dists[(q, b)] = sum_j lut[q, j, cmat[b, j]]
            dists = np.zeros((len(q_ids), len(cmat)))
            for j in range(m):
                dists += lut[:, j, cmat[:, j]]
            # Round BEFORE the partial selection: the global window ranks by
            # (rounded dist, c_id), so the per-batch top-k must use the same
            # order or batch/partition layout could drop the row the window
            # would have kept at a rounded-tie boundary. lexsort gives the
            # full deterministic (dist, c_id) order per query.
            dists = np.round(dists, 6)
            take = min(k, dists.shape[1])
            order = np.lexsort((np.broadcast_to(c_ids, dists.shape), dists), axis=1)
            idx = order[:, :take]  # (nq, take)
            yield pd.DataFrame(
                {
                    "q_id_": np.repeat(q_ids, take),
                    "c_id_": c_ids[idx].ravel(),
                    "adc_dist": np.take_along_axis(dists, idx, 1).ravel(),
                }
            )

    scored = codes.select(corpus_id, "codes").mapInPandas(_score, schema=out_schema)
    return _adc_rank(scored, query_id, corpus_id, k)


def pq_adc_topk_fused(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "v",
    k: int = 10,
) -> DataFrame:
    """Encode + ADC fused into ONE Arrow pass over the raw corpus vectors:
    each batch is argmin-encoded against the codebook tensor and
    immediately LUT-scored, so the corpus crosses the JVM<->Python
    boundary once instead of twice (encode kernel -> exchange -> score
    kernel). Bit-identical to ``pq_encode`` |> ``pq_adc_topk`` by
    construction — the same argmin, the same LUT, the same rounded
    lexsort partial top-k (equality pinned in tests/test_pq.py).

    Use when codes are NOT pre-materialized (ad-hoc search over a vector
    table). When a persisted codes table exists — the 100 TB steady state,
    where the whole point of PQ is scanning 16x-smaller codes — use
    ``pq_adc_topk`` on the codes directly."""
    import numpy as np
    import pandas as pd

    tens = _codebook_tensor(codebooks)
    m, n_codes, sub = tens.shape
    c_sq = (tens * tens).sum(2)  # (m, k) — for the encode argmin
    q_ids, lut = _query_lut(queries, tens, query_id, vec_col)

    out_schema = T.StructType(
        [
            T.StructField("q_id_", queries.schema[query_id].dataType),
            T.StructField("c_id_", corpus.schema[corpus_id].dataType),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def _encode_score(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)  # (b, dim)
            c_ids = pdf[corpus_id].to_numpy()
            dists = np.zeros((len(q_ids), len(x)))
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d = (xs * xs).sum(1)[:, None] + c_sq[j][None, :] - 2.0 * (xs @ tens[j].T)
                dists += lut[:, j, d.argmin(1)]
            dists = np.round(dists, 6)
            take = min(k, dists.shape[1])
            order = np.lexsort((np.broadcast_to(c_ids, dists.shape), dists), axis=1)
            idx = order[:, :take]
            yield pd.DataFrame(
                {
                    "q_id_": np.repeat(q_ids, take),
                    "c_id_": c_ids[idx].ravel(),
                    "adc_dist": np.take_along_axis(dists, idx, 1).ravel(),
                }
            )

    scored = corpus.select(corpus_id, vec_col).mapInPandas(
        _encode_score, schema=out_schema
    )
    return _adc_rank(scored, query_id, corpus_id, k)


def pq_ann_topk(
    queries: DataFrame,
    codes: DataFrame | None,
    corpus: DataFrame,
    codebooks: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "v",
    k: int = 10,
    rerank: int = 50,
) -> DataFrame:
    """ADC shortlist of ``rerank`` candidates per query, then EXACT cosine
    rescoring of only those candidates (equi-join on corpus id fetches
    rerank x n_queries vectors — never the corpus). Returns
    (q_id, c_id, rnk, cosine) like the exact path, so recall is directly
    comparable. The standard two-stage PQ recipe: codes answer "who is
    close", the shortlist join answers "exactly how close".

    ``codes=None`` takes the FUSED path: encode + ADC in one Arrow pass
    over ``corpus`` (``pq_adc_topk_fused``) — for ad-hoc searches with no
    persisted codes table; identical results either way (pinned)."""
    from .similarity import dot, l2_norm

    if codes is None:
        shortlist = pq_adc_topk_fused(
            queries, corpus, codebooks, query_id, corpus_id, vec_col, k=rerank
        ).select(query_id, corpus_id)
    else:
        shortlist = pq_adc_topk(
            queries, codes, codebooks, query_id, corpus_id, vec_col, k=rerank
        ).select(query_id, corpus_id)
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv"), l2_norm(F.col(vec_col)).alias("_qn")
    )
    c = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("_cv"), l2_norm(F.col(vec_col)).alias("_cn")
    )
    scored = (
        shortlist.join(F.broadcast(q), query_id)
        .join(c, corpus_id)
        .withColumn(
            "cosine",
            F.round(dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, corpus_id, "rnk", "cosine")
    )
