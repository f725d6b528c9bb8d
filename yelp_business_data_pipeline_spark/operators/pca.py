"""Distributed PCA / whitening over an embedding column — the standard
ANN preprocessing step (OPQ/whitening folklore: rotating onto principal
axes before product quantization or LSH equalizes per-subspace variance
and improves code quality; CCNet/SemDeDup-era pipelines whiten before
cosine thresholds so one threshold means the same thing in every
direction).

Spark-first decomposition (the kmeans-partials pattern):

- **Fit is ONE corpus pass + a bounded skinny exchange**: each Arrow
  batch folds to a single partial row ``(n, sum_vec, gram_flat)`` —
  the corpus never shuffles and never leaves the executors. The
  partials then posexplode to ``(idx, val)`` and partial-agg'd sums
  collapse them: the exchange carries at most ``d + d^2`` rows per map
  task regardless of corpus size (the bloom/CM bounded-exchange shape),
  and the driver collects exactly ``d^2 + d + 1`` values — model-sized,
  never data-sized (MAX_DIM guard raises loudly).
- **The eigendecomposition is driver-side numpy** on the ``d x d``
  covariance — the same FAISS-style split as IVF/PQ training: model
  fitting is small-data linear algebra, APPLICATION is the distributed
  part. Deterministic: ``eigh`` on a symmetric matrix plus a sign
  convention (each component's largest-|coordinate| entry is made
  positive), so the model is a pure function of the summed moments; two
  layouts of the same data agree to float-sum reassociation (~1e-9,
  pinned with tolerance — double sums are order-dependent, stated, not
  hidden).
- **Apply is a zero-shuffle Arrow matmul**: components broadcast in the
  UDF closure, one BLAS projection per batch (the semdedup/PQ-encode
  shape) — plan-pinned no-exchange.

Whitening divides each projected coordinate by ``sqrt(eigenvalue +
eps)`` — unit variance per component (pinned), the transform that makes
isotropic-threshold methods honest.

No reference counterpart (the reference has no vector surface);
first-class LLM-pipeline operator alongside ivf.py / pq.py /
semdedup.py, which consume its output.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: d^2 driver values must stay model-sized: 512 -> 262k doubles (~2 MB).
MAX_DIM = 512


@dataclass(frozen=True)
class PcaModel:
    """Fitted PCA: row-major ``components`` is (k, d) — rows are
    principal axes, descending eigenvalue order."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    eigenvalues: tuple[float, ...]
    n: int
    dim: int
    k: int
    whiten: bool
    eps: float
    #: trace of the covariance — the full-space variance, so explained-
    #: variance ratios stay honest when k < dim
    total_variance: float = 0.0


def _moment_partials(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """One partial row per Arrow batch: (n, sum vector, flattened gram
    matrix). The corpus's only pass. Every vector must be exactly ``d``
    long — a shorter vector in some other partition would otherwise
    produce shorter (s, g) arrays whose posexplode idx keys land in the
    WRONG slots of the flattened moment vector (a silently wrong model;
    larger dims at least fail via shape errors). Loud-failure rule:
    raise per batch, never mis-sum."""
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def _fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            bad = {len(v) for v in vecs} - {d}
            if bad:
                raise ValueError(
                    f"fit_pca: vector dim(s) {sorted(bad)} != fitted dim {d} — "
                    "mixed-dim corpora would mis-align the flattened moment "
                    "sums; filter or pad upstream"
                )
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(_fold, schema)


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int | None = None,
    whiten: bool = False,
    eps: float = 1e-6,
) -> PcaModel:
    """Fit PCA over ``df[vec_col]`` (array<float/double>; NULL vectors
    skipped). See the module docstring for the distribution argument —
    the driver sees ``d^2 + d + 1`` values, never rows."""
    import numpy as np

    first = df.select(F.size(vec_col).alias("d")).filter("d IS NOT NULL").first()
    if first is None:
        raise ValueError("fit_pca: no non-NULL vectors")
    d = first["d"]
    if d > MAX_DIM:
        raise ValueError(
            f"fit_pca: dim {d} exceeds MAX_DIM={MAX_DIM} — the d^2 gram "
            "collect would stop being model-sized; reduce dims upstream "
            "or raise the guard deliberately"
        )
    k = d if k is None else k
    if not (1 <= k <= d):
        raise ValueError(f"fit_pca: k={k} outside [1, {d}]")

    parts = _moment_partials(df, vec_col, int(d))
    # skinny bounded exchange: (idx, val) partial-agg'd sums
    sums = (
        parts.select(
            F.posexplode(
                F.concat(F.array(F.col("n").cast("double")), F.col("s"), F.col("g"))
            ).alias("idx", "val")
        )
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    flat = np.zeros(1 + d + d * d)
    for r in sums:
        flat[r["idx"]] = r["val"]
    n = int(flat[0])
    if n < 2:
        raise ValueError(f"fit_pca: need >= 2 vectors, got {n}")
    mean = flat[1 : 1 + d] / n
    gram = flat[1 + d :].reshape(d, d)
    cov = gram / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # (k, d)
    vals = np.maximum(eigvals[order], 0.0)
    # sign convention: the largest-|coordinate| entry positive — eigh's
    # sign is arbitrary and layout-dependent without this
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    # live eigh invariant (VERDICT r11 item 8): eigh is the ONE stage of
    # this operator without an exact cross-engine twin (pca_apply_panel
    # gates the distributed halves), so its output is verified in-plan —
    # orthonormal rows and a bounded eigen-residual relative to the
    # matrix scale catch a divergent or platform-broken LAPACK result
    # loudly instead of shipping silently-garbage components. Sign flips
    # and the >=0 eigenvalue clip don't perturb either check beyond
    # float noise.
    sym = (cov + cov.T) / 2.0
    ortho_err = float(np.max(np.abs(comps @ comps.T - np.eye(comps.shape[0]))))
    scale = max(1.0, float(np.max(np.abs(sym))))
    resid = float(np.max(np.abs(sym @ comps.T - comps.T * vals[None, :]))) / scale
    if ortho_err > 1e-8 or resid > 1e-8:
        raise ArithmeticError(
            f"fit_pca: eigh output failed the determinism invariant "
            f"(orthonormality err {ortho_err:.3e}, eigen-residual {resid:.3e}, "
            f"tol 1e-8) — LAPACK result is unreliable on this platform"
        )
    return PcaModel(
        mean=tuple(float(v) for v in mean),
        components=tuple(tuple(float(x) for x in row) for row in comps),
        eigenvalues=tuple(float(v) for v in vals),
        n=n,
        dim=int(d),
        k=int(k),
        whiten=bool(whiten),
        eps=float(eps),
        total_variance=float(max(np.trace(cov), float(np.sum(vals)))),
    )


def apply_pca(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project (and optionally whiten) every vector: one zero-shuffle
    Arrow matmul per batch, components in the closure (model-sized).
    NULL vectors stay NULL."""
    import numpy as np

    comps = np.asarray(model.components)  # (k, d)
    mean = np.asarray(model.mean)
    scale = (
        1.0 / np.sqrt(np.asarray(model.eigenvalues) + model.eps)
        if model.whiten
        else None
    )
    cols = df.columns
    out_schema = T.StructType(
        [*df.schema.fields, T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for v in pdf[vec_col]:
                if v is None:
                    outs.append(None)
                    continue
                y = comps @ (np.asarray(v, dtype=np.float64) - mean)
                if scale is not None:
                    y = y * scale
                outs.append(y.tolist())
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf[[*cols, out_col]]

    return df.mapInPandas(_project, out_schema)


def explained_variance(model: PcaModel) -> list[tuple[int, float, float]]:
    """(component, eigenvalue, cumulative explained-variance ratio) —
    driver-side model arithmetic for reports/panels."""
    total = model.total_variance or sum(model.eigenvalues) or 1.0
    out, cum = [], 0.0
    for i, v in enumerate(model.eigenvalues):
        cum += v
        out.append((i, v, cum / total))
    return out
