"""Deterministic sampling and corpus-mixing operators (SURVEY.md §2.9 —
training-data composition; no reference counterpart, the engine adds them
as first-class LLM-pipeline surface).

Training corpora are MIXED, not dumped: each source gets a sampling rate
(up- or down-weighting) and a token budget, and the selection must be
**deterministic** — re-running the pipeline on the same snapshot must pick
the same documents, or downstream dedup/eval splits silently shift. Spark's
``df.sample`` is seed-stable only per partition layout, so these operators
derive keep/drop decisions from a content-independent portable hash of the
document key instead:

- :func:`hash_unit` — md5-based uniform draw in [0, 1) per key. Portable:
  the DuckDB oracle reproduces the identical doubles, and the decision
  survives repartitioning, cluster resize, and engine swap.
- :func:`hash_sample` — Bernoulli(p) sampling by hash threshold. At 100 TB
  this is a narrow (shuffle-free) transformation: the filter is pushed to
  the scan and every executor decides locally.
- :func:`stratified_sample` — per-stratum rates from a rate expression or
  a small dict (broadcast-join-free: the rate is a column expression).
- :func:`select_to_token_budget` — per-stratum quality-ranked selection up
  to a token budget: one window (single shuffle on the stratum key) whose
  running token sum caps each source's contribution. The standard
  "N billion tokens from source X, best-first" composition step.

Determinism rule: every ordering used for budget selection carries a full
tie-break (metric, then key) so the selected set is reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash

#: 2^32 — portable_hash's range; divides a hash into a unit uniform.
_HASH_RANGE = float(1 << 32)


def hash_unit(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1) from a key column.

    ``md5(salt || key)`` first-8-hex-digits / 2^32 — i.i.d. across distinct
    keys, reproducible anywhere md5 exists. DuckDB twin::

        ('0x' || substr(md5(salt || CAST(key AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0

    Non-string keys are cast to string first (both engines render integers
    identically). Distinct salts give independent draws for the same key —
    use one salt per sampling decision (sample vs holdout vs shard).
    """
    c = F.col(key) if isinstance(key, str) else key
    return portable_hash(c.cast("string"), salt=salt) / F.lit(_HASH_RANGE)


def hash_sample(df: DataFrame, key: str, fraction: float, salt: str = "s:") -> DataFrame:
    """Deterministic Bernoulli(fraction) sample: keep rows whose
    :func:`hash_unit` draw falls below ``fraction``.

    Unlike ``df.sample(fraction, seed)`` the decision is a pure function of
    the key — stable across partitioning, retries, and scale factors
    (a doc kept at sf0.01 is kept at sf100). Narrow op: no shuffle."""
    return df.filter(hash_unit(key, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    key: str,
    rate: Column | dict[str, float],
    stratum: str = "source",
    salt: str = "mix:",
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus mixing / re-weighting).

    ``rate`` is either a column expression computing the stratum's keep
    probability, or a dict {stratum_value: rate} (compiled to a CASE chain;
    unlisted strata drop to 0.0). Keeps the rate as a ``_rate`` column so
    downstream stages (budgeting, reporting) can account for the applied
    weights. Shuffle-free: rate lookup and hash draw are row-local."""
    if isinstance(rate, dict):
        expr: Column = F.lit(0.0)
        # Build when-chain in sorted order for a deterministic plan.
        chain = None
        for k, v in sorted(rate.items()):
            cond = F.col(stratum) == k
            chain = F.when(cond, float(v)) if chain is None else chain.when(cond, float(v))
        expr = chain.otherwise(0.0) if chain is not None else expr
    else:
        expr = rate
    out = df.withColumn("_rate", expr)
    return out.filter(hash_unit(key, salt) < F.col("_rate"))


def select_to_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    stratum: str = "source",
    order_by: list[Column] | None = None,
    cum_col: str = "_cum_tokens",
) -> DataFrame:
    """Quality-ranked token-budget selection per stratum.

    Orders each stratum by ``order_by`` (default: ``token_col`` desc with
    key-free tie-break — callers should pass a full tie-breaking order) and
    keeps every row that STARTS within the budget: rows where the running
    token sum before the row is < ``budget``. The last selected row may
    overflow the budget (document granularity — standard for corpus
    composition; trim at the packing stage if exact budgets matter).

    One shuffle (window partition on the stratum); the running sum is
    integer-exact so the selection is engine-portable. DuckDB twin::

        SUM(tok) OVER (PARTITION BY stratum ORDER BY ... ROWS UNBOUNDED
        PRECEDING) - tok < budget
    """
    if order_by is None:
        order_by = [F.desc(token_col)]
    w = (
        Window.partitionBy(stratum)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(cum_col, F.sum(F.col(token_col)).over(w))
    return out.filter(F.col(cum_col) - F.col(token_col) < F.lit(int(budget)))


def leakage_safe_splits(
    df: DataFrame,
    group_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Dedup-aware train/val/test assignment: the split is a function of
    the GROUP key (a dup-cluster id, fingerprint, or connected-component
    label from the dedup family), never the row, so every member of a
    near-duplicate cluster lands in the SAME split — the leakage-control
    rule for eval sets (a test document with a train near-dup is a leaked
    answer; splitting by doc id cannot prevent it, splitting by cluster id
    prevents it by construction).

    Assignment is the same portable ``hash_unit`` draw the samplers use:
    deterministic across reruns, repartitioning, and engines, and
    independent of the draw used by ``hash_sample`` (different salt) so
    sampling and splitting don't correlate. Shuffle-free: a per-row
    expression over cumulative split boundaries.

    ``splits`` maps name -> fraction (must sum to 1 within 1e-9; default
    90/5/5 train/val/test). Iteration order fixes boundary order, so pass
    an ordered dict — the default is train, val, test.

    NULL group keys raise at execution time: ``hash_unit`` of NULL is
    NULL, which would silently fall through every boundary into the LAST
    split — polluting exactly the eval set with exactly the malformed
    documents. Clean or fill cluster keys first.
    """
    if splits is None:
        splits = {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = hash_unit(group_col, salt)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = u < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    guard = F.when(
        F.col(group_col).isNull(),
        F.raise_error(
            F.lit(
                f"leakage_safe_splits: NULL {group_col} cannot be split "
                "deterministically — fill or drop null cluster keys first"
            )
        ).cast("string"),
    ).otherwise(expr)
    return df.withColumn(out_col, guard)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    stratum: str | None = None,
    salt: str = "ws:",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, A-ES): inclusion probability proportional to
    ``weight_col``, selection reproducible across reruns, repartitioning,
    and engines.

    Each row gets an exponential race time ``-ln(u) / w`` from the same
    portable :func:`hash_unit` draw the other samplers use; the ``k``
    SMALLEST times win (per ``stratum`` when given, else globally). This
    is the distributed-safe form of weighted reservoir sampling: no
    sequential reservoir, no RNG state — a per-row expression plus one
    top-k. Globally that compiles to TakeOrderedAndProject (per-partition
    heaps, no global sort); per-stratum it is one window shuffle on the
    stratum key.

    Ordering ties break on the key, so the selected set is a pure
    function of (keys, weights, salt) — PROVIDED key values are unique
    (duplicate keys share one hash draw and one tie-break value, so the
    row chosen among duplicates at the k-boundary is arbitrary; validate
    with ``cleaning.assert_unique_keys`` first, the ``table_diff``
    convention). Rows with NULL keys or non-positive/NULL weights are
    dropped (a weight of zero can never win a race; a NULL key has no
    reproducible draw). A hash draw of exactly 0 yields race time
    +infinity explicitly (Spark's ``ln(0)`` is NULL, which would sort
    FIRST ascending — the guard pins the paper's u^(1/w) = 0 "never
    wins" convention instead): such a key loses to every positive draw
    and is selected only when fewer than k positive-draw rows exist.

    Output: the surviving rows with ``rank_col`` (1-based selection
    order, best first) appended.
    """
    if k <= 0:
        raise ValueError(f"weighted_sample: k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    eligible = df.filter(
        F.col(key_col).isNotNull() & w.isNotNull() & (w > 0)
    )
    u = hash_unit(key_col, salt)
    race = F.when(u == 0, F.lit(float("inf"))).otherwise(-F.log(u) / w)
    scored = eligible.withColumn("_race", race)
    if stratum is None:
        ranked = (
            scored.orderBy(F.asc("_race"), F.asc(key_col))
            .limit(k)
            .withColumn(
                rank_col,
                F.row_number().over(
                    Window.orderBy(F.asc("_race"), F.asc(key_col))
                ),
            )
        )
    else:
        win = Window.partitionBy(stratum).orderBy(F.asc("_race"), F.asc(key_col))
        ranked = scored.withColumn(rank_col, F.row_number().over(win)).filter(
            F.col(rank_col) <= k
        )
    return ranked.drop("_race")


def temperature_mix_rates(
    df: DataFrame,
    stratum: str = "source",
    token_col: str = "tok",
    alpha: float = 0.5,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-based corpus mixture weights (the multilingual-LM
    exponentiated-smoothing rule — Lample & Conneau 2019 §3.1, XLM-R;
    the same family as GPT-3's hand-set mixture, Brown et al. 2020
    Table 2.2 — derived here from data instead of hand-set):

    - domain token shares ``p_d = t_d / T`` flatten to ``q_d = t_d^alpha
      / sum_e t_e^alpha`` (``alpha=1`` natural, ``alpha -> 0`` uniform);
    - a token ``budget`` turns weights into per-domain sampling rates
      ``rate_d = min(1, budget * q_d / t_d)`` — the cap marks domains
      whose full data can't meet their target without up-sampling
      (reported as ``implied_epochs``, the UniMax-style diagnostic —
      Chung et al. 2023; this operator never up-samples).

    Output (one row per domain — always a SMALL frame, broadcastable):
    ``stratum, tokens (exact bigint), share, rate, implied_epochs``.
    ``share`` and ``rate`` are rounded to 9 decimals BEFORE any
    comparison downstream (the rounded-before-threshold rule the
    semantic-decontam cosines established) so the kept SET is identical
    across engines despite last-ulp ``pow`` differences. Zero-token
    domains get rate 0.0 (nothing to sample), never NaN.

    Plan shape: one partial-agg'd groupBy(stratum) over the corpus, a
    1-row total, and arithmetic on the domains frame — the corpus is
    scanned once and never shuffled."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"temperature_mix_rates: alpha must be in (0, 1], got {alpha}")
    if budget < 1:
        raise ValueError(f"temperature_mix_rates: budget must be >= 1, got {budget}")
    doms = df.groupBy(stratum).agg(
        F.sum(token_col).cast("bigint").alias("tokens")
    )
    t = F.col("tokens").cast("double")
    pw = F.pow(t, F.lit(float(alpha)))
    denom = doms.agg(F.sum(pw).alias("_z"))
    q = pw / F.col("_z")
    raw_rate = F.lit(float(budget)) * q / t
    return doms.crossJoin(F.broadcast(denom)).select(
        stratum,
        "tokens",
        F.round(F.when(t > 0, q).otherwise(0.0), 9).alias("share"),
        F.round(
            F.when(t > 0, F.least(F.lit(1.0), raw_rate)).otherwise(0.0), 9
        ).alias("rate"),
        F.round(F.when(t > 0, raw_rate).otherwise(0.0), 9).alias("implied_epochs"),
    )


def temperature_sample(
    df: DataFrame,
    key: str,
    stratum: str = "source",
    token_col: str = "tok",
    alpha: float = 0.5,
    budget: int = 1_000_000,
    salt: str = "tmix:",
) -> DataFrame:
    """Deterministic temperature mixing: compute
    :func:`temperature_mix_rates` and keep each row whose portable
    :func:`hash_unit` draw falls under its domain's rate — the
    :func:`stratified_sample` contract (``_rate`` kept as a column for
    downstream budgeting/reporting) with rates DERIVED from the corpus
    instead of caller-supplied. Two corpus scans total (one to weigh
    domains, one to sample — the rates frame is tiny and broadcast), no
    corpus shuffle, repartition-invariant kept set.

    The rates join is NULL-SAFE on the stratum: a NULL stratum (lang-ID
    failure — routine on crawl data, the ``bucket_by_thresholds``
    precedent) is a real domain here — ``temperature_mix_rates`` counts
    its tokens in the normalizer and emits its rate row, so a plain
    equi-join would silently drop every NULL-stratum row while still
    letting them deflate the other domains' rates."""
    rates = temperature_mix_rates(df, stratum, token_col, alpha, budget)
    r = F.broadcast(
        rates.select(
            F.col(stratum).alias("_stratum"), F.col("rate").alias("_rate")
        )
    )
    out = df.join(r, on=F.col(stratum).eqNullSafe(F.col("_stratum"))).drop(
        "_stratum"
    )
    return out.filter(hash_unit(key, salt) < F.col("_rate"))


def unimax_mix_allocation(
    df: DataFrame,
    stratum: str = "source",
    token_col: str = "tok",
    budget: int = 1_000_000,
    max_epochs: float = 1.0,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023: spread the budget as
    uniformly as possible across domains, but never take more than
    ``max_epochs`` passes over any domain). The iterative
    give-equal-shares-until-caps-bind procedure has the closed
    waterfilling form: ``alloc_d = min(cap_d, u)`` with ``cap_d =
    max_epochs * t_d`` and the water level ``u`` set so allocations sum
    to the budget (when the total capacity doesn't cover the budget,
    every domain caps and the leftover is visible as epochs ==
    max_epochs everywhere and a NULL water level).

    Relational closed form, no driver iteration: sort domains by cap
    (ties by name), prefix-sum; domain j of n is CAPPED iff serving
    every smaller cap fully and giving everyone from j onward ``cap_j``
    still fits the budget (``prefix_{j-1} + cap_j * (n - j + 1) <=
    budget``); the water level is the budget left after the capped
    prefix, split over the uncapped rest. The window runs over the
    DOMAINS frame (rows == distinct strata, tiny by contract — the
    rates-frame rule), never the corpus: the corpus contributes one
    partial-agg'd groupBy, exactly like :func:`temperature_mix_rates`.

    Prefix sums are ordered identically in every engine (the window
    ORDER BY), so the capped set is bit-deterministic; outputs round to
    9 decimals (the rounded-before-threshold rule). Output per domain:
    ``stratum, tokens, cap_tokens, alloc_tokens, epochs, water_level``
    (``epochs = alloc/tokens`` — > 1 means training-time repetition,
    which UniMax permits and this operator reports but never applies;
    zero-token domains allocate 0)."""
    if budget < 1:
        raise ValueError(f"unimax_mix_allocation: budget must be >= 1, got {budget}")
    if max_epochs <= 0.0:
        raise ValueError(
            f"unimax_mix_allocation: max_epochs must be > 0, got {max_epochs}"
        )
    doms = df.groupBy(stratum).agg(
        F.sum(token_col).cast("bigint").alias("tokens")
    )
    cap = (F.col("tokens").cast("double") * F.lit(float(max_epochs))).alias("_cap")
    w = Window.orderBy(F.asc("_cap"), F.asc(stratum))
    j = F.row_number().over(w)
    pfx = F.sum("_cap").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    b = F.lit(float(budget))
    ranked = doms.select(stratum, "tokens", cap).select(
        stratum,
        "tokens",
        "_cap",
        ((pfx - F.col("_cap")) + F.col("_cap") * (n - j + 1) <= b).alias("_capped"),
        n.alias("_n"),
    )
    totals = ranked.agg(
        F.coalesce(F.sum(F.when(F.col("_capped"), F.col("_cap"))), F.lit(0.0)).alias("_pk"),
        F.coalesce(F.sum(F.when(F.col("_capped"), 1)), F.lit(0)).alias("_k"),
    )
    u = F.when(
        F.col("_k") < F.col("_n"),
        (b - F.col("_pk")) / (F.col("_n") - F.col("_k")),
    )
    alloc = F.when(F.col("_capped"), F.col("_cap")).otherwise(u)
    return ranked.crossJoin(F.broadcast(totals)).select(
        stratum,
        "tokens",
        F.round(F.col("_cap"), 9).alias("cap_tokens"),
        F.round(alloc, 9).alias("alloc_tokens"),
        F.round(
            F.when(F.col("tokens") > 0, alloc / F.col("tokens").cast("double"))
            .otherwise(0.0),
            9,
        ).alias("epochs"),
        F.round(u, 9).alias("water_level"),
    )


def materialize_epochs(
    df: DataFrame,
    epochs: DataFrame,
    stratum: str,
    key: str,
    salt: str = "ep:",
    copy_col: str = "epoch_copy",
    max_materialized_epochs: float = 100.0,
) -> DataFrame:
    """Turn a per-stratum epoch allocation into an ACTUAL training stream:
    each row materializes ``floor(e)`` copies plus one more with
    probability ``frac(e)`` via the portable :func:`hash_unit` draw on
    ``key`` — so ``E[rows out] = e * rows in`` per stratum exactly, and
    the realized stream is a pure function of (key, salt): stable across
    partitioning, retries, and engines. ``e < 1`` subsamples (floor 0 +
    fractional draw == :func:`hash_sample`), ``e > 1`` up-samples — the
    missing tail between :func:`unimax_mix_allocation` (which REPORTS
    epochs) and a trainer that needs concrete rows. Output rows carry
    ``copy_col`` in ``1..n_copies`` so downstream shuffling/packing can
    treat copies as distinct examples.

    ``epochs`` is a (stratum, epochs) frame — tiny by the rates-frame
    contract, broadcast-joined; the corpus never shuffles. The explode is
    ``sequence(1, n)`` guarded to the empty array at ``n == 0``
    (``sequence(1, 0)`` counts DOWN — the silent-reversal trap). In-plan
    ``raise_error`` guards fire loudly on strata missing from the frame,
    NULL/negative epochs, and epochs above ``max_materialized_epochs``
    (a fat-finger 1000.0 would otherwise quietly 1000x the corpus).

    Shuffle budget: 0 — broadcast rates join + row-local draw + explode;
    output size is the allocation itself.
    """
    if copy_col in df.columns:
        raise ValueError(f"materialize_epochs: output column {copy_col!r} already exists")
    for c in ("_ep", "_ncopies"):
        if c in df.columns:
            raise ValueError(
                f"materialize_epochs: input carries the internal column name {c!r} — "
                "rename it first"
            )
    ecols = epochs.columns
    if stratum not in ecols or "epochs" not in ecols:
        raise ValueError(
            f"materialize_epochs: epochs frame needs ({stratum!r}, 'epochs'), got {ecols}"
        )
    rates = F.broadcast(
        epochs.select(F.col(stratum), F.col("epochs").cast("double").alias("_ep"))
    )
    joined = df.join(rates, stratum, "left")
    e = F.col("_ep")
    bad = (
        e.isNull()
        | (e < 0)
        | (e > F.lit(float(max_materialized_epochs)))
    )
    n_copies = F.when(
        bad,
        F.raise_error(
            # concat would NULL the whole message when a piece is NULL
            # (the very case being reported) — coalesce each piece
            F.concat(
                F.lit(
                    "materialize_epochs: stratum missing from the epochs frame, "
                    "or epochs outside [0, "
                ),
                F.lit(str(float(max_materialized_epochs))),
                F.lit("]: stratum="),
                F.coalesce(F.col(stratum).cast("string"), F.lit("NULL")),
                F.lit(" epochs="),
                F.coalesce(e.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint"),
    ).otherwise(
        F.floor(e).cast("bigint")
        + (hash_unit(F.col(key), salt) < (e - F.floor(e))).cast("bigint")
    )
    staged = joined.withColumn("_ncopies", n_copies).drop("_ep")
    copies = F.when(
        F.col("_ncopies") >= 1, F.sequence(F.lit(1).cast("bigint"), F.col("_ncopies"))
    ).otherwise(F.array().cast("array<bigint>"))
    return staged.select(*df.columns, F.explode(copies).alias(copy_col))
