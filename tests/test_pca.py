"""Distributed PCA/whitening (operators/pca.py): numpy full-data model
equality, whitening variance, layout tolerance, zero-shuffle apply plan,
NULL handling, guards, and the registered panel's python-model pin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators.pca import (
    MAX_DIM,
    apply_pca,
    explained_variance,
    fit_pca,
)


def _data(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = np.asarray(
        [r.embedding for r in df.select("embedding").orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    return df, x


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    vals, vecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(vals[order], 0.0)


def test_fit_matches_numpy_full_data_model(spark, sf_dir):
    df, x = _data(spark, sf_dir)
    k = 8
    m = fit_pca(df, k=k)
    mean, comps, vals = _numpy_pca(x, k)
    assert m.n == x.shape[0] and m.dim == x.shape[1] and m.k == k
    assert np.allclose(m.mean, mean, atol=1e-9)
    assert np.allclose(m.eigenvalues, vals, atol=1e-9)
    assert np.allclose(m.components, comps, atol=1e-7)
    # orthonormal axes, descending variance
    c = np.asarray(m.components)
    assert np.allclose(c @ c.T, np.eye(k), atol=1e-9)
    assert all(a >= b - 1e-12 for a, b in zip(m.eigenvalues, m.eigenvalues[1:]))
    # projections equal the numpy projection
    got = {
        r.vec_id: np.asarray(r.pca)
        for r in apply_pca(df, m).select("vec_id", "pca").collect()
    }
    ids = [r.vec_id for r in df.select("vec_id").orderBy("vec_id").collect()]
    want = (x - mean) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-9), vid


def test_whitening_gives_unit_variance_components(spark, sf_dir):
    df, x = _data(spark, sf_dir)
    m = fit_pca(df, k=6, whiten=True)
    y = np.asarray([r.pca for r in apply_pca(df, m).select("pca").collect()])
    var = y.var(axis=0)
    assert np.allclose(var, 1.0, atol=1e-3)  # eps shifts it slightly


def test_layout_tolerance_and_determinism(spark, sf_dir):
    """Two layouts of the same data agree to float-sum reassociation;
    the same layout twice is bit-identical."""
    df, _ = _data(spark, sf_dir)
    m1 = fit_pca(df, k=4)
    m2 = fit_pca(df.repartition(7), k=4)
    m3 = fit_pca(df, k=4)
    assert m1 == m3  # same layout: pure function of the data
    assert np.allclose(m1.eigenvalues, m2.eigenvalues, rtol=1e-9, atol=1e-9)
    assert np.allclose(m1.components, m2.components, atol=1e-6)


def test_apply_is_zero_shuffle_and_null_safe(spark, sf_dir):
    from tests.test_plans import plan_str

    df, _ = _data(spark, sf_dir)
    m = fit_pca(df, k=4)
    out = apply_pca(df, m)
    assert "Exchange" not in plan_str(out)
    withnull = df.withColumn(
        "embedding", F.when(F.col("vec_id") % 5 != 0, F.col("embedding"))
    )
    rows = apply_pca(withnull, m).select("vec_id", "pca").collect()
    for r in rows:
        assert (r.pca is None) == (r.vec_id % 5 == 0), r.vec_id
    # and fit skips NULLs instead of crashing
    m2 = fit_pca(withnull, k=2)
    assert m2.n == sum(1 for r in rows if r.pca is not None)


def test_guards_and_explained_variance(spark, sf_dir):
    df, _ = _data(spark, sf_dir)
    with pytest.raises(ValueError, match="outside"):
        fit_pca(df, k=0)
    with pytest.raises(ValueError, match="outside"):
        fit_pca(df, k=10_000)
    empty = df.filter("vec_id < 0")
    with pytest.raises(ValueError, match="no non-NULL vectors"):
        fit_pca(empty)
    assert MAX_DIM >= 64
    m = fit_pca(df, k=8)
    ev = explained_variance(m)
    ratios = [r for _, _, r in ev]
    assert all(a <= b + 1e-12 for a, b in zip(ratios, ratios[1:]))
    assert 0 < ratios[-1] <= 1.0 + 1e-12
    # k < dim: the top-8 of 64 isotropic-ish dims explain well under all
    assert ratios[-1] < 1.0


def test_mixed_dims_fail_loudly(spark, sf_dir):
    """ADVICE r10 (medium): a corpus mixing vector dims must raise, not
    silently mis-align the flattened moment sums — a SHORTER vector's
    (s, g) partials would land in the wrong posexplode idx slots and fit
    a wrong model without any error. The dim comes from the first row,
    so put the short vectors in a separate input partition."""
    df, _ = _data(spark, sf_dir)
    short = spark.createDataFrame(
        [(10**9, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    mixed = df.select("vec_id", "embedding").unionByName(short)
    # the executor-side ValueError surfaces wrapped (PythonException /
    # Py4JJavaError depending on runner); match the message, not the type
    with pytest.raises(Exception, match="mixed-dim"):
        fit_pca(mixed)
    # and the clean path still fits fine with the check in place
    assert fit_pca(df, k=2).k == 2


def test_pca_panel_matches_python_model(spark, sf_dir):
    """The registered tracker re-derives per-component eigenvalues and
    cumulative ratios; pin it against the from-scratch numpy model."""
    from yelp_business_data_pipeline_spark.plans import QUERIES

    _, x = _data(spark, sf_dir)
    rows = QUERIES["pca_embeddings_panel"].spark(spark, sf_dir).collect()
    mean, comps, vals = _numpy_pca(x, 8)
    total = np.trace((x - x.mean(0)).T @ (x - x.mean(0)) / x.shape[0])
    assert [r.component for r in rows] == list(range(8))
    cum = 0.0
    for r in rows:
        assert abs(r.eigenvalue - vals[r.component]) < 1e-6
        cum += vals[r.component]
        assert abs(r.cum_explained - round(float(cum / total), 6)) < 1e-9


def test_pca_registry_tail_layout():
    from yelp_business_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    assert names.index("pca_embeddings_panel") >= 50
    assert QUERIES["pca_embeddings_panel"].oracle is None
    # promoted by the sixth r11 swap — gated WITH its twin
    from yelp_business_data_pipeline_spark.plans.extensions import (
        PCA_APPLY_ORACLE,
    )

    assert names.index("pca_apply_panel") < 50
    assert QUERIES["pca_apply_panel"].oracle == PCA_APPLY_ORACLE


def test_pca_apply_panel_matches_duckdb_twin(spark, sf_dir):
    """Rotation-queue twin pin (VERDICT r10 item 2): the REAL apply_pca
    matmul under an exactly-reproducible powers-of-two literal model, and
    the REAL _moment_partials fold + posexplode/groupBy(idx) exchange,
    must equal PCA_APPLY_ORACLE's direct SQL re-derivation row-for-row."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        PCA_APPLY_ORACLE,
    )

    from .oracle_harness import duck_con

    srows = sorted(
        tuple(r) for r in QUERIES["pca_apply_panel"].spark(spark, sf_dir).collect()
    )
    drows = sorted(duck_con(sf_dir).execute(PCA_APPLY_ORACLE).fetchall())
    # floats already rounded in-plan on both sides; compare exactly
    assert len(srows) == len(drows)
    for s, d in zip(srows, drows):
        assert s[:3] == d[:3]
        assert s[3] == pytest.approx(d[3], abs=1e-9), (s, d)
    parts = {r[0] for r in srows}
    assert parts == {"proj", "n", "sum", "gram"}
    # the moment grain: one n row, d sum rows, diagonal+stride gram cells
    assert sum(1 for r in srows if r[0] == "n") == 1
    assert sum(1 for r in srows if r[0] == "sum") == 64
    assert sum(1 for r in srows if r[0] == "proj") >= 4  # vec_id<100 slice


def test_eigh_invariant_holds_and_reconstruction_closes(spark, sf_dir):
    """VERDICT r11 item 8: the driver-side eigh is the one un-twinned
    stage; its LIVE invariant (in-plan orthonormality + eigen-residual
    guard) must hold on real data, and at k=d the model must reconstruct
    inputs to float precision — a from-scratch consequence of a correct
    eigen-decomposition that no single-stage pin implies."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    m = fit_pca(e, "embedding")  # k=d — guard ran in-plan without firing
    C = np.array(m.components)
    assert np.max(np.abs(C @ C.T - np.eye(m.k))) < 1e-8
    X = np.array(
        [r.embedding for r in e.limit(50).collect() if r.embedding is not None],
        dtype=np.float64,
    )
    Xc = X - np.array(m.mean)
    recon = Xc @ C.T @ C
    denom = max(1.0, float(np.max(np.abs(Xc))))
    assert float(np.max(np.abs(recon - Xc))) / denom < 1e-6


def test_eigh_invariant_guard_fires_on_bad_lapack(spark, sf_dir, monkeypatch):
    """A platform whose eigh returns non-orthonormal garbage must fail
    LOUDLY, not ship silently-wrong components."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    real_eigh = np.linalg.eigh

    def bad_eigh(a):
        vals, vecs = real_eigh(a)
        return vals, vecs * 1.001  # breaks orthonormality AND the residual

    monkeypatch.setattr(np.linalg, "eigh", bad_eigh)
    with pytest.raises(ArithmeticError, match="determinism invariant"):
        fit_pca(e, "embedding")
