"""Hashed linear quality classifier — GPT-3 / CCNet-style quality
filtering for a pretraining corpus.

The published recipe (Brown et al. 2020 appendix A; CCNet, Wenzek et al.
2020): train a cheap linear classifier to distinguish a REFERENCE corpus
(WebText / Wikipedia — here the corpus's English slice stands in, the
same convention as the DSIR panel) from the raw crawl, score every
document, and keep a document when ``score > 1 - pareto_draw`` — the
"noisy threshold" that keeps mostly-high-quality docs while letting some
lower-scored ones through for diversity.

Spark-first decomposition:

- **Features** ride THE shared hashed unigram+bigram stream
  (``dsir._gram_stream`` — one definition, so classifier features cannot
  drift from the DSIR/decontam gram semantics). A document's feature
  vector is its L1-normalized hashed gram histogram (``cnt / n_grams``),
  ``buckets`` dimensions.
- **Training is driver-side on a FIXED-SIZE deterministic sample** (the
  IVF/PQ pattern): the ``n_train`` lowest ``hash_unit(id)`` docs via
  TakeOrdered — a classifier's accuracy saturates long before the corpus
  ends, so the driver cost is CONSTANT in corpus size (the 100-TB shape:
  training never scales with the data; only scoring does, and scoring is
  distributed). Full-batch logistic regression in float64 numpy with a
  fixed epoch count, lowest-id row order, and no RNG — bit-deterministic
  across layouts and reruns. The gram-row collect is row-capped with a
  loud ValueError (the ``max_bench_rows`` pattern), never silent.
- **Scoring is one distributed pass**: the ``<= buckets``-row weight
  table broadcasts, the gram stream left-joins it map-side (sentinel
  rows cover gramless docs, the ``_gram_stream(sentinel=True)``
  construction), and ONE groupBy(id) folds dot product and gram count —
  a single exchange keyed on the doc id, JVM end to end (no Python in
  the scoring path). ``sigmoid(bias + dot/n)``; gramless docs get
  ``sigmoid(bias)`` by definition.
- **The keep rule is deterministic**: GPT-3's ``score > 1 -
  np.random.pareto(alpha)`` draw is replaced by the inverse-CDF
  transform of a ``hash_unit`` draw (``(1-u)^(-1/alpha) - 1`` is a
  Lomax/Pareto-II sample), so keep decisions are a pure function of the
  doc id — stable across partitioning, retries, and scale factors, and
  exactly reproducible in the DuckDB twin (md5 end to end).

No reference counterpart (the reference pipeline has no corpus-quality
surface); first-class LLM-pipeline operator per the build brief,
alongside DSIR (domain match) and the Gopher/C4 gates (rule-based
quality) — this is the learned-quality leg of that family.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dsir import _gram_stream
from .sampling import hash_unit


@dataclass(frozen=True)
class QualityModel:
    """A trained hashed-feature linear classifier: ``buckets`` weights +
    bias, plus the hashing config scoring must replay (same buckets and
    salt, or the features don't line up)."""

    weights: tuple[float, ...]
    bias: float
    buckets: int
    salt: str
    n_train: int = 0
    meta: dict = field(default_factory=dict)


def _sigmoid_col(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_quality_classifier(
    df: DataFrame,
    positive: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "qclf:",
    n_train: int = 512,
    max_rows: int = 2_000_000,
    epochs: int = 600,
    lr: float = 2.0,
    l2: float = 1e-6,
) -> QualityModel:
    """Fit the reference-vs-raw logistic regression on a deterministic
    fixed-size sample and return the (driver-sized) model.

    ``positive`` is the reference-class predicate (boolean Column over
    ``df``'s rows — e.g. ``F.col("lang") == "en"``). The sample is the
    ``n_train`` docs with the smallest ``hash_unit(id)`` draw (ties by
    id) — representative, sf-independent in COST, and deterministic.
    ``max_rows`` bounds the driver collect of (doc, bucket, cnt) gram
    rows; exceeding it raises with the observed size (shorten docs via
    ``n_train``/``buckets`` or raise the bound deliberately).

    Descent is full-batch ADAGRAD with L2 (skipping the bias), float64,
    fixed ``epochs`` — no RNG, no early stopping, no data-dependent
    stopping rule, so two runs (or two cluster layouts) produce
    bit-identical weights. Adagrad rather than plain GD because the
    L1-normalized features make raw gradients tiny (measured: plain GD
    at lr=2 was still at chance after 80 epochs; lr=20 oscillated) —
    the per-coordinate accumulator self-scales them; the tuned defaults
    reach ~0.97 train accuracy on the synthetic corpus in <1 s
    driver-side.
    """
    import numpy as np

    # a NULL predicate result (e.g. lang IS NULL — routine in crawl
    # data) must not enter the label vector: cast keeps NULL, NULL
    # becomes NaN in numpy, and one NaN label poisons EVERY weight in
    # epoch 1 — a silent all-NaN model. NULL label = "not the reference
    # class" (the GPT-3 reference-vs-rest semantics).
    labeled = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(positive.cast("int"), F.lit(0)).alias("_y"),
        F.col(text_col).alias("_text"),
    )
    sample = labeled.orderBy(
        hash_unit("_id", salt=salt + "train:").asc(), F.col("_id").asc()
    ).limit(n_train)
    pdf = (
        _gram_stream(sample, "_id", "_text", buckets, salt, carry=("_y",), sentinel=True)
        .groupBy("_id", "_y", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .limit(max_rows + 1)
        .toPandas()  # Arrow batch transfer — far cheaper than Row collect
    )
    if len(pdf) > max_rows:
        raise ValueError(
            f"train_quality_classifier: the {n_train}-doc sample produced "
            f"more than max_rows={max_rows} (doc, bucket) gram rows — "
            "lower n_train/buckets, or raise max_rows deliberately"
        )
    if len(pdf) == 0:
        raise ValueError("train_quality_classifier: empty training sample")
    # doc-major deterministic order (transfer order varies with layout)
    pdf = pdf.sort_values(["_id", "bucket"], kind="mergesort", ignore_index=True)
    ids = pdf["_id"].unique()  # sorted already; one row group per doc
    n = len(ids)
    doc_ix = {did: i for i, did in enumerate(ids)}
    X = np.zeros((n, buckets), dtype=np.float64)
    y = np.zeros(n, dtype=np.float64)
    rows_i = pdf["_id"].map(doc_ix).to_numpy()
    y[rows_i] = pdf["_y"].to_numpy()
    real = pdf["bucket"].to_numpy() >= 0  # sentinel -1 = gramless doc
    X[rows_i[real], pdf["bucket"].to_numpy()[real]] = pdf["cnt"].to_numpy()[real]
    totals = X.sum(axis=1, keepdims=True)
    np.divide(X, totals, out=X, where=totals > 0)
    w = np.zeros(buckets, dtype=np.float64)
    b = 0.0
    acc_w = np.zeros(buckets, dtype=np.float64)
    acc_b = 0.0
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        gw = (X.T @ g) / n + l2 * w
        gb = float(g.mean())
        acc_w += gw * gw
        acc_b += gb * gb
        w -= lr * gw / np.sqrt(acc_w + 1e-8)
        b -= lr * gb / (acc_b + 1e-8) ** 0.5
    return QualityModel(
        weights=tuple(float(v) for v in w),
        bias=float(b),
        buckets=buckets,
        salt=salt,
        n_train=n,
        meta={"epochs": epochs, "lr": lr, "l2": l2},
    )


def score_quality(
    df: DataFrame,
    model: QualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
    score_col: str = "quality_score",
) -> DataFrame:
    """(id, [carry...], score) — one row per input doc, JVM end to end.

    The weight table is ``<= model.buckets`` rows and BROADCASTS; the
    hashed gram stream (sentinel rows keep gramless docs in frame)
    left-joins it map-side, then ONE groupBy(id) folds the dot product
    and the gram count — a single exchange keyed on the doc id, no
    Python worker anywhere. ``score = sigmoid(bias + dot/n_grams)``
    (L1-normalized features, matching training); gramless docs score
    ``sigmoid(bias)``.
    """
    spark = df.sparkSession
    wtab = spark.createDataFrame(
        [(i, v) for i, v in enumerate(model.weights) if v != 0.0],
        "bucket bigint, _w double",
    )
    grams = _gram_stream(
        df, id_col, text_col, model.buckets, model.salt, carry=carry, sentinel=True
    )
    agg = (
        grams.join(F.broadcast(wtab), "bucket", "left")
        .groupBy(id_col, *carry)
        .agg(
            F.sum(F.coalesce(F.col("_w"), F.lit(0.0))).alias("_dot"),
            F.sum(F.when(F.col("bucket") >= 0, 1).otherwise(0))
            .cast("double")
            .alias("_n"),
        )
    )
    z = F.lit(model.bias) + F.when(
        F.col("_n") > 0, F.col("_dot") / F.col("_n")
    ).otherwise(F.lit(0.0))
    return agg.select(id_col, *carry, _sigmoid_col(z).alias(score_col))


def pareto_keep(
    score: Column | str,
    id_col: Column | str,
    alpha: float = 9.0,
    salt: str = "qclf-pareto:",
) -> Column:
    """GPT-3's noisy quality threshold, made deterministic: keep a doc
    when ``score > 1 - pareto_draw`` where the Pareto(alpha) draw is the
    inverse-CDF transform ``(1-u)^(-1/alpha) - 1`` of the doc's
    ``hash_unit`` draw (a Lomax sample — exactly ``numpy.random.pareto``'s
    distribution, without the RNG). A pure function of the doc id: keep
    decisions survive repartitioning, retries, and engine swaps (md5 in
    both Spark and the DuckDB twin)."""
    s = F.col(score) if isinstance(score, str) else score
    u = hash_unit(id_col, salt=salt)
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return s > (F.lit(1.0) - draw)


def save_quality_model(model: QualityModel, path: str) -> None:
    """Persist the trained model as a single JSON artifact — the classic
    'fit once on yesterday's corpus, score every new crawl batch' shape:
    training is driver-side anyway, so the artifact is driver-sized by
    construction (buckets floats + config), and JSON keeps it
    engine/version-portable (no pickle).

    ATOMIC (tmp + os.replace — a crash mid-write must not destroy the
    previous good artifact at the canonical path) and STRICT JSON
    (allow_nan=False: a diverged NaN/inf weight raises loudly instead of
    emitting the non-RFC tokens other engines reject)."""
    import json
    import os

    if len(model.weights) != model.buckets:
        raise ValueError(
            f"save_quality_model: {len(model.weights)} weights for "
            f"buckets={model.buckets} — refusing to persist an "
            "inconsistent model"
        )
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "weights": list(model.weights),
                "bias": model.bias,
                "buckets": model.buckets,
                "salt": model.salt,
                "n_train": model.n_train,
                "meta": model.meta,
            },
            fh,
            allow_nan=False,
        )
    os.replace(tmp, path)


def load_quality_model(path: str) -> QualityModel:
    """Inverse of :func:`save_quality_model`; round-trip is exact (JSON
    float repr is shortest-round-trip in python). Validates the artifact
    shape — a truncated/hand-edited file whose weights length disagrees
    with ``buckets`` would otherwise score every doc silently wrong
    (missing buckets contribute zero weight, no error anywhere)."""
    import json

    with open(path) as fh:
        d = json.load(fh)
    if len(d["weights"]) != d["buckets"]:
        raise ValueError(
            f"load_quality_model: artifact at {path} carries "
            f"{len(d['weights'])} weights for buckets={d['buckets']} — "
            "corrupted or hand-edited; refusing to score with it"
        )
    return QualityModel(
        weights=tuple(d["weights"]),
        bias=d["bias"],
        buckets=d["buckets"],
        salt=d["salt"],
        n_train=d["n_train"],
        meta=d["meta"],
    )
