"""LLM-data-pipeline query pack (SURVEY.md §2.9; BASELINE.json north-star):
dedup (exact / MinHash-LSH / SimHash / Jaccard), similarity search, text
analysis — over the driver's ``documents`` and ``embeddings`` tables.

Oracle parity: sketch hashes use ``operators.dedup.portable_hash`` (md5-based)
so even MinHash/SimHash are exactly reproducible in DuckDB; only the
LSH-bucketed ANN variant ships without an oracle (rows-only check) because
its hyperplane literals would bloat the SQL — its recall is pytest-verified
against the brute-force oracle instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sentiment import sentiment_label_expr, sentiment_oracle_sql, sentiment_score_expr
from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text as tx
from .registry import query, tbl

# ---------------------------------------------------------------------------
# SQL helpers (DuckDB dialect) mirroring the operators' portable expressions
# ---------------------------------------------------------------------------

TOKS = "string_split(text, ' ')"


def _sql_hash(expr: str, salt: str) -> str:
    return f"(('0x' || substr(md5('{salt}' || {expr}), 1, 8))::BIGINT)"


def _sql_shingles(n: int = 3) -> str:
    # 1-based list indexing; range(a, b) is [a, b).
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len(t) - {n - 2}), i -> {parts})"


def _sql_shingle_hashes() -> str:
    from ..operators.dedup import MINHASH_MOD, SHINGLE_C1, SHINGLE_C2

    return (
        f"list_transform(range(1, len(th) - 1), "
        f"i -> (th[i] * {SHINGLE_C1} + th[i+1] * {SHINGLE_C2} + th[i+2]) % {MINHASH_MOD})"
    )


def _sql_minhash_bands(k: int = 8, rows_per_band: int = 2) -> str:
    from ..operators.dedup import MINHASH_MOD, SHINGLE_C1, SHINGLE_C2, minhash_params

    sigs = ",\n      ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_MOD})) AS s{j}"
        for j, (a, b) in enumerate(minhash_params(k))
    )
    band_selects = []
    for bi, b in enumerate(range(0, k, rows_per_band)):
        cols = " || ',' || ".join(f"s{j}::VARCHAR" for j in range(b, b + rows_per_band))
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, md5({cols}) AS band_hash FROM sig"
        )
    bands = "\n      UNION ALL\n      ".join(band_selects)
    shingle = (
        f"(th[i] * {SHINGLE_C1} + th[i+1] * {SHINGLE_C2} + th[i+2]) % {MINHASH_MOD}"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {TOKS} AS t FROM documents WHERE len({TOKS}) >= 3
    ), tokh AS (
      SELECT doc_id, list_transform(t, tok -> {_sql_hash('tok', 'mh:')}) AS th FROM toks
    ), hsh AS (
      SELECT doc_id, list_transform(range(1, len(th) - 1), i -> {shingle}) AS hs FROM tokh
    ), sig AS (
      SELECT doc_id,
      {sigs}
      FROM hsh
    ), bands AS (
      {bands}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


def _sql_simhash(bits: int = 16) -> str:
    words = []
    for i in range(bits):
        vote = (
            f"list_sum(list_transform({TOKS}, t -> "
            f"CASE WHEN ({_sql_hash('t', 'sh:')} >> {i}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        words.append(f"CASE WHEN {vote} > 0 THEN {1 << i} ELSE 0 END")
    total = " + ".join(words)
    return f"SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM documents"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _sql_lang_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang])
    return f"len(list_filter({TOKS}, t -> list_contains([{words}], t)))"


def _sql_guessed_lang() -> str:
    """Stopword-hit argmax with the deterministic en>fr>de>es tie order —
    the SQL twin of ``tx.lang_id``."""
    return f"""CASE
               WHEN {_sql_lang_hits('en')} >= {_sql_lang_hits('fr')}
                AND {_sql_lang_hits('en')} >= {_sql_lang_hits('de')}
                AND {_sql_lang_hits('en')} >= {_sql_lang_hits('es')} THEN 'en'
               WHEN {_sql_lang_hits('fr')} >= {_sql_lang_hits('de')}
                AND {_sql_lang_hits('fr')} >= {_sql_lang_hits('es')} THEN 'fr'
               WHEN {_sql_lang_hits('de')} >= {_sql_lang_hits('es')} THEN 'de'
               ELSE 'es'
             END"""


@query(
    "doc_stats_panel",
    f"""
    WITH q AS (
      SELECT lang, n_chars,
             {_sql_guessed_lang()} AS guessed_lang,
             len({TOKS}) AS n_tokens,
             len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}')) AS n_bpe,
             round(len(list_distinct({TOKS}))::DOUBLE / len({TOKS}), 6) AS distinct_ratio,
             round(len(list_filter({TOKS}, t -> list_contains(['the','a','of','and','to','in','is','it'], t)))::DOUBLE
                   / len({TOKS}), 6) AS stopword_ratio,
             CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
                  ELSE round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
                             / length(text), 6) END AS punct_ratio,
             round(list_max(list_transform(list_distinct({TOKS}),
                   u -> len(list_filter({TOKS}, t -> t = u))))::DOUBLE
                   / len({TOKS}), 6) AS top_token_ratio
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT)::DOUBLE / COUNT(*) AS avg_tokens,
           round(CAST(CAST(SUM(CAST(distinct_ratio AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS avg_distinct_ratio,
           round(CAST(CAST(SUM(CAST(stopword_ratio AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS avg_stopword_ratio,
           round(CAST(CAST(SUM(CAST(punct_ratio AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS avg_punct_ratio,
           round(CAST(CAST(SUM(CAST(top_token_ratio AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS avg_top_token_ratio,
           CAST(COUNT(*) FILTER (distinct_ratio >= 0.3) AS BIGINT) AS n_quality_pass,
           CAST(COUNT(*) FILTER (guessed_lang = 'en') AS BIGINT) AS n_guessed_en,
           CAST(COUNT(*) FILTER (guessed_lang = 'fr') AS BIGINT) AS n_guessed_fr,
           CAST(COUNT(*) FILTER (guessed_lang = 'de') AS BIGINT) AS n_guessed_de,
           CAST(COUNT(*) FILTER (guessed_lang = 'es') AS BIGINT) AS n_guessed_es
    FROM q GROUP BY lang
    """,
    doc="Token counting AND quality scoring AND language-ID per corpus "
    "slice in ONE scan (round-2 registered token/quality as two queries, "
    "merged r3; the round-3 lang_id_confusion query merged here in r7 to "
    "free an oracle slot for gopher_repetition_panel — its full confusion "
    "matrix survives as the pivoted n_guessed_{{en,fr,de,es}} columns, true "
    "lang = row, guessed lang = column). One pass is the right 100 TB "
    "shape anyway: every per-doc stat shares the same tokenization. Two "
    "tokenizers (whitespace words + BPE-ish regex, identical semantics "
    "under Java regex and RE2), the standard corpus-cleaning panel — "
    "lexical diversity, stopword density, punctuation density (C4-style "
    "boilerplate signal), top-token concentration (Gopher-style "
    "repetition) — plus the stopword-hit-argmax lang-ID guess "
    "(tx.lang_id, deterministic tie order), aggregated per lang with "
    "decimal-routed double sums plus the quality-gate pass count. "
    "Per-doc ratios are rounded before summing so both engines "
    "aggregate identical doubles.",
)
def doc_stats_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    raw_ratio = (
        F.size(F.array_distinct(tx.tokens_col(F.col("text")))).cast("double")
        / F.size(tx.tokens_col(F.col("text")))
    )

    def _avg6(col: str) -> F.Column:
        return F.round(
            F.sum(F.col(col).cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
        )

    return (
        d.withColumn("n_tokens", tx.token_count(F.col("text")))
        .withColumn("n_bpe", tx.bpe_ish_token_count(F.col("text")))
        .withColumn("distinct_ratio", tx.distinct_token_ratio(F.col("text")))
        .withColumn("stopword_ratio", tx.stopword_ratio(F.col("text"), "en"))
        .withColumn("punct_ratio", tx.punct_ratio(F.col("text")))
        .withColumn("top_token_ratio", tx.top_token_ratio(F.col("text")))
        .withColumn("quality_pass", (raw_ratio >= 0.3).cast("int"))
        .withColumn("guessed_lang", tx.lang_id(F.col("text")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            _avg6("distinct_ratio").alias("avg_distinct_ratio"),
            _avg6("stopword_ratio").alias("avg_stopword_ratio"),
            _avg6("punct_ratio").alias("avg_punct_ratio"),
            _avg6("top_token_ratio").alias("avg_top_token_ratio"),
            F.sum("quality_pass").alias("n_quality_pass"),
            *[
                F.sum((F.col("guessed_lang") == lang).cast("long")).alias(
                    f"n_guessed_{lang}"
                )
                for lang in ("en", "fr", "de", "es")
            ],
        )
    )


@query(
    "sentiment_by_source",
    f"""
    WITH s AS (
      SELECT source, {sentiment_oracle_sql('text')} AS score FROM documents
    )
    SELECT source,
           CASE WHEN score >= 0.05 THEN 'positive'
                WHEN score <= -0.05 THEN 'negative'
                ELSE 'neutral' END AS sentiment_label,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(score AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) AS score_sum
    FROM s GROUP BY 1, 2
    """,
    doc="U1 sentiment semantics (reference Review_ETL.py:73-85: VADER compound "
    "+ +-0.05 label thresholds) via the deterministic lexicon scorer — "
    "codegen'd expressions, no UDF on the bench path.",
)
def sentiment_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return (
        d.withColumn("score", sentiment_score_expr(F.col("text")))
        .withColumn("sentiment_label", sentiment_label_expr(F.col("score")))
        .groupBy("source", "sentiment_label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("score").cast("decimal(18,12)")).cast("double").alias("score_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@query(
    "fingerprint_dup_groups",
    f"""
    SELECT md5(array_to_string(list_slice({TOKS}, 1, 2), ' ')) AS fp,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM documents
    GROUP BY 1 HAVING COUNT(*) > 1
    """,
    doc="Exact-dedup blocking: md5 prefix fingerprint -> hash groupBy -> "
    "duplicate groups with deterministic keeper (min id). One shuffle on "
    "the fingerprint; no self-join (the scalable exact-dedup shape).",
)
def fingerprint_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", tx.fingerprint(F.col("text"), 2))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "jaccard_pairs_panel",
    f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 80),
    toks AS (
      SELECT doc_id, unnest(list_distinct({TOKS})) AS tok FROM docs
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), tok_pairs AS (
      SELECT id_a, id_b,
             round(n_inter::DOUBLE / (sa.n_tok + sb.n_tok - n_inter), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON inter.id_a = sa.doc_id
      JOIN sizes sb ON inter.id_b = sb.doc_id
      WHERE round(n_inter::DOUBLE / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.5
    ),
    ndocs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    tokh AS (
      SELECT doc_id, list_transform({TOKS}, tok -> {_sql_hash('tok', 'mh:')}) AS th
      FROM ndocs WHERE len({TOKS}) >= 3
    ), nsh AS (
      SELECT doc_id, unnest(list_distinct({_sql_shingle_hashes()})) AS shingle
      FROM tokh
    ), nsizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM nsh GROUP BY doc_id
    ), ninter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM nsh a JOIN nsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), ngram_pairs AS (
      SELECT id_a, id_b,
             round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      FROM ninter
      JOIN nsizes sa ON ninter.id_a = sa.doc_id
      JOIN nsizes sb ON ninter.id_b = sb.doc_id
      WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.02
    )
    SELECT 'token' AS family, * FROM tok_pairs
    UNION ALL
    SELECT 'ngram3' AS family, * FROM ngram_pairs
    UNION ALL
    SELECT 'minhash_lsh' AS family, doc_a AS id_a, doc_b AS id_b,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM ({_sql_minhash_bands(k=8, rows_per_band=2)})
    """,
    doc="The near-dup pair family in one result (round-2 registered these "
    "as three queries; merged for the 50-slot gate — the r7 merge folds "
    "minhash_lsh_candidate_pairs in to free a slot for "
    "exact_substring_decontam): family='token' is distinct-token-set "
    "Jaccard >= 0.5 on a bounded doc window — the verification stage of "
    "near-dup dedup; family='ngram3' is word-3-gram Jaccard >= 0.02 over "
    "shingle hashes shared with the MinHash pipeline (doc_id < 200, "
    "measured ~57 pairs at sf0.001 / ~58 at sf0.01 with max J ~0.98 — "
    "non-vacuous at both SFs); family='minhash_lsh' is the full-table "
    "MinHash (k=8, md5-portable hashes) + LSH banding (4 bands x 2 rows) "
    "candidate set, jaccard=NULL (candidates are pre-verification by "
    "definition), oracle reproducing the exact signatures in SQL. The "
    "exact families are inverted-index self-joins on bounded windows; "
    "the LSH family is the 100 TB dedup shape — per-row signatures via "
    "higher-order functions (no explode), band equi-join shuffling only "
    "uniform band hashes, no self-join, distinct pairs.",
)
def jaccard_pairs_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d80 = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    tok_pairs = dd.token_jaccard_pairs(d80, "doc_id", "text", threshold=0.5)

    d200 = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.col("text"), " ")
    hashed = d200.filter(F.size(toks) >= 3).select(
        "doc_id",
        F.transform(toks, lambda t: dd.portable_hash(t, salt="mh:")).alias("_th"),
    )
    sh = hashed.select(
        "doc_id",
        F.explode(
            F.array_distinct(dd.shingle_hashes_from_tokens(F.col("_th"), 3))
        ).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    ngram_pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.02)
        .select("id_a", "id_b", "jaccard")
    )
    lsh_pairs = dd.minhash_lsh_candidates(
        tbl(spark, sf_dir, "documents"), "doc_id", "text", k=8, rows_per_band=2, shingle_n=3
    ).select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    return (
        tok_pairs.withColumn("family", F.lit("token"))
        .select("family", "id_a", "id_b", "jaccard")
        .unionAll(
            ngram_pairs.withColumn("family", F.lit("ngram3")).select(
                "family", "id_a", "id_b", "jaccard"
            )
        )
        .unionAll(
            lsh_pairs.withColumn("family", F.lit("minhash_lsh")).select(
                "family", "id_a", "id_b", "jaccard"
            )
        )
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprints (16-bit, portable hash): bit-majority
    vote over token hashes, per-row fold, zero shuffle. Near-dups differ
    in few bits; pair generation at scale = equality or banded-prefix join.
    Oracle-gated as the ``simhash`` branch of ``text_fingerprints_panel``."""
    d = tbl(spark, sf_dir, "documents")
    return dd.with_simhash(d, "text", "simhash", bits=16).select("doc_id", "simhash")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "ann_cosine_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
          FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS c_id, v AS cv, sqrt(list_dot_product(v, v)) AS cn
          FROM e WHERE vec_id >= 5)
    SELECT q_id, c_id, rnk, cosine FROM (
      SELECT q_id, c_id,
             round(list_dot_product(qv, cv) / (qn * cn), 6) AS cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id
               ORDER BY round(list_dot_product(qv, cv) / (qn * cn), 6) DESC, c_id) AS INTEGER) AS rnk
      FROM c, q
    ) WHERE rnk <= 10
    """,
    doc="Brute-force cosine top-k over array<float> embeddings: broadcast "
    "query set x partitioned corpus, higher-order-function dot product "
    "(JVM, no UDF), per-query window top-k. The exactness baseline for ANN; "
    "the LSH variant (lsh_ann_topk) is the scale path.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "v")
    c = e.filter(F.col("vec_id") >= 5).select(F.col("vec_id").alias("c_id"), "v")
    return sim.cosine_topk(q, c, "q_id", "c_id", "v", k=10)


@query(
    "tfidf_top_terms",
    f"""
    WITH bounded AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    n_total AS (SELECT COUNT(*) AS n FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest({TOKS}) AS tok FROM bounded)
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, unnest(list_distinct({TOKS})) AS tok FROM documents)
      GROUP BY tok
    )
    SELECT doc_id, tok, rnk, score FROM (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln((n_total.n + 1.0) / (df.df + 1.0)), 6) AS score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * ln((n_total.n + 1.0) / (df.df + 1.0)), 6) DESC, tf.tok
             ) AS INTEGER) AS rnk
      FROM tf JOIN df USING (tok) CROSS JOIN n_total
    ) WHERE rnk <= 5
    """,
    doc="TF-IDF top terms per document (SURVEY §2.9 text analysis: "
    "'TF-IDF via explode+groupBy+join'): corpus-wide document frequency, "
    "bounded output window, rank by rounded score for cross-engine "
    "determinism. At scale the df table is the only corpus-wide shuffle.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    toks = tx.tokens_col(F.col("text"))
    n_total = d.agg(F.count(F.lit(1)).alias("n"))
    tf = (
        d.filter(F.col("doc_id") < 20)
        .select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = (
        d.select("doc_id", F.explode(F.array_distinct(toks)).alias("tok"))
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "tok", "rnk", "score")
    )


@query(
    "embedding_near_dup_pairs",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
      FROM embeddings WHERE vec_id < 120
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) / (a.n * b.n), 6) AS cosine
    FROM e a, e b
    WHERE a.vec_id < b.vec_id
      AND round(list_dot_product(a.v, b.v) / (a.n * b.n), 6) >= 0.30
    """,
    doc="Embedding-cosine near-duplicate pairs (exact all-pairs on a bounded "
    "window — constant cost across SFs). The scale path is the same "
    "operator with LSH sign-bucket blocking "
    "(operators.similarity.embedding_near_dup_pairs(n_planes=...)), "
    "recall-verified in pytest.",
)
def embedding_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        tbl(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 120)
        .select("vec_id", sim.as_double_vec(F.col("embedding")).alias("v"))
    )
    return sim.embedding_near_dup_pairs(e, "vec_id", "v", threshold=0.30)




def _sql_winnowing(k: int = 8, window: int = 4) -> str:
    gh = f"list_transform(range(1, length(text) - {k - 1} + 1), i -> {_sql_hash(f'substr(text, i, {k})', 'wn:')})"
    return f"""
    WITH gh AS (
      SELECT doc_id, {gh} AS g FROM documents WHERE length(text) >= {k}
    ), fp AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(g) - {window - 1} + 1),
               j -> list_min(list_slice(g, j, j + {window - 1}))))) AS fp
      FROM gh WHERE len(g) >= {window}
    )
    SELECT fp, COUNT(*) AS n_docs
    FROM fp GROUP BY fp HAVING COUNT(*) > 1
    """


def winnowing_shared_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprinting (Schleimer et al. 2003 rolling-
    hash selection): per-doc char-8-gram hashes -> min of each 4-window
    -> distinct fingerprints; shared fingerprints across docs flag
    substring-level containment/near-dup. Winnowing is per-document
    work, so the Arrow kernel computes it shuffle-free inside each
    partition (3x the relational window form, which moved 1M+ exploded
    gram rows through a doc-id sort just to reunite each doc); the only
    shuffle is the final cross-doc fingerprint groupBy. The oracle
    reproduces the identical md5 hash selection; the kernel is pinned
    value-equal to the pure-JVM relational form in pytest. Oracle-gated
    as the ``winnowing_shared`` branch of ``text_fingerprints_panel``."""
    d = tbl(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    fps = tx.winnowing_fingerprints_arrow(
        d, "doc_id", "text", k=8, window=4,
        # One parquet file would mean ONE Python worker hashes the whole
        # corpus; round-robin the raw rows to cluster width first (tiny
        # exchange, 32x kernel parallelism — see operator docstring).
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "text_fingerprints_panel",
    f"""
    WITH sh AS ({_sql_simhash(bits=16)}),
    wn AS ({_sql_winnowing(k=8, window=4)})
    SELECT 'simhash' AS op, doc_id AS key_id, simhash AS val FROM sh
    UNION ALL
    SELECT 'winnowing_shared' AS op, fp AS key_id, n_docs AS val FROM wn
    """,
    doc="Document-fingerprint panel, op-tagged: 16-bit SimHash per doc "
    "(bit-majority vote over token hashes, per-row fold, zero shuffle — "
    "``simhash`` branch) and winnowing shared fingerprints (Schleimer "
    "2003 rolling-hash selection via the shuffle-free Arrow kernel, one "
    "cross-doc groupBy — ``winnowing_shared`` branch). Merged from the "
    "round-2/3 ``simhash_fingerprints`` + ``winnowing_shared_fingerprints`` "
    "registrations to keep every oracle-backed query inside the driver's "
    "50-slot gate while freeing slots for the funnel/retention oracles — "
    "both fingerprint plans survive verbatim as the panel's branches.",
)
def text_fingerprints_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = simhash_fingerprints(spark, sf_dir).select(
        F.lit("simhash").alias("op"),
        F.col("doc_id").alias("key_id"),
        F.col("simhash").alias("val"),
    )
    wn = winnowing_shared_fingerprints(spark, sf_dir).select(
        F.lit("winnowing_shared").alias("op"),
        F.col("fp").alias("key_id"),
        F.col("n_docs").alias("val"),
    )
    return sh.unionAll(wn)


@query(
    "hypertable_rollup_events",
    """
    WITH b AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M') AS bucket_day,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS bucket_hour,
             value
      FROM events
    )
    SELECT event_type, bucket_day, bucket_hour,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS value_sum
    FROM b
    GROUP BY GROUPING SETS ((event_type, bucket_day), (event_type, bucket_day, bucket_hour))
    """,
    doc="Hypertable-style continuous-aggregate rollup (TimescaleDB's "
    "time_bucket cascade): hour- and day-granularity aggregates of the "
    "event stream in ONE pass via grouping sets — no second scan for the "
    "coarser tier. Buckets rendered as strings (UTC pinned) for "
    "cross-engine comparability.",
)
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm").alias("bucket_day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("bucket_hour"),
        "value",
    )
    return (
        b.groupingSets(
            [["event_type", "bucket_day"], ["event_type", "bucket_day", "bucket_hour"]],
            "event_type", "bucket_day", "bucket_hour",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


@query(
    "timeseries_gapfill_locf",
    """
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n_events,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS value_sum
      FROM events
      WHERE event_id % 97 = 0
      GROUP BY 1, 2
    ), span AS (
      SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM r GROUP BY 1
    ), spine AS (
      SELECT event_type, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM span
    )
    SELECT s.event_type,
           strftime(s.bucket, '%Y-%m-%d %H:%M') AS bucket_hour,
           COALESCE(r.n_events, 0) AS n_events,
           r.value_sum AS value_sum,
           (r.n_events IS NULL) AS is_gap,
           LAST_VALUE(r.value_sum IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_sum_locf
    FROM spine s LEFT JOIN r ON r.event_type = s.event_type AND r.bucket = s.bucket
    """,
    doc="TimescaleDB time_bucket_gapfill + locf semantics over the event "
    "stream (operators/timeseries.py): hourly rollup of a deterministically "
    "thinned series (event_id % 97 keeps the series gap-rich at every SF — "
    "at sf0.1 the raw hourly series has zero gaps), densified per "
    "event_type over its own [min, max] span via executor-side sequence()/"
    "explode (the spine never touches the driver and its size is groups x "
    "span buckets, independent of raw row count), left-joined with an "
    "explicit _present marker so a present-but-NULL-sum row is NOT a gap, "
    "counts coalesced to 0 on gaps, sums kept NULL, LOCF carry via "
    "last(ignorenulls) over the per-group bucket order.",
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries as ts

    ev = tbl(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    rollup = ev.groupBy(
        "event_type", ts.time_bucket("ts", "hour").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )
    dense = ts.gapfill_locf(
        rollup,
        group_cols=["event_type"],
        bucket_col="bucket",
        value_cols=["value_sum"],
        step=ts.GRAIN_STEPS["hour"],
        count_cols=["n_events"],
    )
    return dense.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("bucket_hour"),
        "n_events",
        "value_sum",
        "is_gap",
        "value_sum_locf",
    )


def _sql_fake_features() -> str:
    # mirror multimodal._fake_features on utf-8 text payloads:
    # f_i = round(sum(byte[i::8]) / n, 6) — ascii() == the utf-8 byte for
    # the documents table's ascii text
    cols = []
    for i in range(8):
        s = (
            f"list_sum(list_transform(range({i + 1}, length(text) + 1, 8), "
            f"p -> ascii(substr(text, p, 1))))::DOUBLE / length(text)"
        )
        cols.append(f"{s} AS f{i}")
    return ",\n           ".join(cols)


@query(
    "multimodal_feature_roundtrip",
    f"""
    SELECT doc_id,
           {_sql_fake_features()}
    FROM documents WHERE doc_id < 50 AND length(text) > 0
    """,
    doc="The Arrow mapInPandas path under the exact oracle gate: document "
    "text re-encoded as a binary payload, run through the multimodal "
    "feature extractor (byte-histogram moments in Python), values matched "
    "bit-for-bit against DuckDB's arithmetic twin — proof the Python/Arrow "
    "roundtrip computes exactly what the operator claims.",
)
def multimodal_feature_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import _fake_features, extract_media_features, media_meta_expr

    d = (
        tbl(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 50) & (F.length("text") > 0))
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        .withColumn("media_meta", media_meta_expr(F.col("payload"), "image"))
    )
    feats = extract_media_features(d, decoders={"image": _fake_features})
    return feats.select(
        F.col("media_id").alias("doc_id"),
        *[F.col("features").getItem(i).cast("double").alias(f"f{i}") for i in range(8)],
    )


# ---------------------------------------------------------------------------
# Corpus composition (round 3): deterministic mixing/budgeting, sequence
# packing, benchmark decontamination — operators/{sampling,packing,decontam}
# ---------------------------------------------------------------------------


@query(
    "corpus_mix_budget",
    f"""
    WITH d AS (
      SELECT doc_id, source, len({TOKS}) AS tok,
             CAST(substr(source, 4) AS INTEGER) AS src_idx,
             ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM documents
    ), s AS (
      SELECT * FROM d WHERE u < 0.2 + 0.15 * (src_idx % 5)
    ), r AS (
      SELECT *, SUM(tok) OVER (PARTITION BY source ORDER BY tok DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    )
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(COUNT(*) FILTER (cum - tok < 300) AS BIGINT) AS n_selected,
           CAST(COALESCE(SUM(tok) FILTER (cum - tok < 300), 0) AS BIGINT) AS tok_selected
    FROM r GROUP BY source
    """,
    doc="Corpus mixing + token budgeting (operators/sampling.py), the "
    "training-data composition step: per-source deterministic hash "
    "sampling (portable md5 unit draws — the decision survives "
    "repartitioning and engine swap; rates 0.2-0.8 derived per source), "
    "then largest-doc-first selection up to a 300-token budget per source "
    "via one windowed running sum. Sampling is shuffle-free; budgeting "
    "shuffles once on the stratum key. Oracle reproduces the identical "
    "hash doubles and integer running sums.",
)
def corpus_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling as smp

    d = (
        tbl(spark, sf_dir, "documents")
        .withColumn("tok", tx.token_count(F.col("text")))
        .withColumn("src_idx", F.substring("source", 4, 10).cast("int"))
    )
    rate = F.lit(0.2) + F.lit(0.15) * (F.col("src_idx") % 5)
    sampled = smp.stratified_sample(d, "doc_id", rate, salt="mix:")
    # An unreachable budget keeps every sampled row while still attaching
    # the operator's running sum; the 300-token cut becomes a flag so the
    # report covers selected AND rejected rows in one aggregation.
    ranked = smp.select_to_token_budget(
        sampled, "tok", 1 << 62, order_by=[F.desc("tok"), F.col("doc_id")]
    )
    sel = F.col("_cum_tokens") - F.col("tok") < 300
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(sel.cast("int")).cast("bigint").alias("n_selected"),
        F.coalesce(F.sum(F.when(sel, F.col("tok"))), F.lit(0)).cast("bigint").alias("tok_selected"),
    )


@query(
    "sequence_packing_offsets",
    f"""
    WITH d AS (
      SELECT doc_id, source, len({TOKS}) AS tok FROM documents
      WHERE len({TOKS}) > 0
    ), r AS (
      SELECT *, SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT source, doc_id, CAST(tok AS BIGINT) AS tok,
           CAST(cum - tok AS BIGINT) AS start_offset,
           CAST((cum - tok) // 256 AS BIGINT) AS bin_start,
           CAST((cum - 1) // 256 AS BIGINT) AS bin_end,
           CAST((cum - 1) // 256 - (cum - tok) // 256 + 1 AS INTEGER) AS n_bins_spanned
    FROM r
    """,
    doc="Concat-split sequence packing (operators/packing.py): each "
    "source's token stream laid end-to-end and cut every 256 tokens; "
    "per-document placement (start offset, first/last context window, "
    "straddle span). Pure window arithmetic — one shuffle on the stream "
    "key, integer-exact, no UDF — the 100 TB packing shape. The no-split "
    "next-fit variant (applyInPandas) is pytest-pinned against a "
    "pure-python reference.",
)
def sequence_packing_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_concat_split

    d = tbl(spark, sf_dir, "documents").withColumn("tok", tx.token_count(F.col("text")))
    placed = pack_concat_split(d, "tok", 256, order_by=[F.col("doc_id")])
    return placed.select(
        "source",
        "doc_id",
        F.col("tok").cast("bigint").alias("tok"),
        F.col("start_offset").cast("bigint").alias("start_offset"),
        "bin_start",
        "bin_end",
        "n_bins_spanned",
    )


def _sql_folded_shingles(n: int) -> str:
    """DuckDB twin of ``dedup.folded_shingle_hashes`` — generated by the
    same Horner fold so the nesting cannot drift from the operator."""
    from ..operators.dedup import MINHASH_MOD, SHINGLE_C1

    acc = "th[i]"
    for j in range(1, n):
        acc = f"(({acc}) * {SHINGLE_C1} + th[i+{j}]) % {MINHASH_MOD}"
    return f"list_transform(range(1, len(th) - {n - 2}), i -> {acc})"


@query(
    "decontam_ngram_overlap",
    f"""
    WITH tokh AS (
      SELECT doc_id,
             list_transform({TOKS}, tok -> {_sql_hash('tok', 'mh:')}) AS th
      FROM documents WHERE len({TOKS}) >= 5
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct({_sql_folded_shingles(5)})) AS shingle
      FROM tokh
    ), bench AS (
      SELECT DISTINCT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 19 = 0
    ), train AS (
      SELECT doc_id, shingle FROM sh WHERE doc_id % 19 != 0
    )
    SELECT t.doc_id,
           COUNT(DISTINCT t.shingle) AS n_shared_shingles,
           COUNT(DISTINCT b.bench_id) AS n_bench_docs
    FROM train t JOIN bench b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    """,
    doc="Benchmark decontamination (operators/decontam.py, GPT-3-appendix-C "
    "style): training docs sharing any word-5-gram with the held-out "
    "benchmark slice (doc_id % 19 = 0 stands in for an eval set), with "
    "shared-shingle and benchmark-doc evidence counts. The bench shingle "
    "set broadcasts, so the training corpus is never shuffled for the "
    "join — the 100 TB decontamination shape. Horner-fold shingle hashes "
    "(exact int64) shared with the MinHash family; flags the corpus' "
    "template near-dups (4-5 docs at sf0.01), not common phrases.",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.decontam import ngram_contamination

    d = tbl(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 19 == 0)
    train = d.filter(F.col("doc_id") % 19 != 0)
    return ngram_contamination(train, bench, "doc_id", "text", n=5)


@query(
    "weighted_sample_orders",
    f"""
    WITH h AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             {_sql_hash("CAST(o_orderkey AS VARCHAR)", "ws:")} AS hv
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
        AND o_totalprice > 0
    ), e AS (
      -- hv = 0 would make ln() raise in DuckDB (Out of Range); the engine
      -- maps a zero draw to +inf (sorts last) — mirror that exactly.
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CASE WHEN hv = 0 THEN CAST('infinity' AS DOUBLE)
                  ELSE -ln(hv / 4294967296.0) / o_totalprice END AS race
      FROM h
    )
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority ORDER BY race, o_orderkey
           ) AS INTEGER) AS sample_rank
    FROM e QUALIFY sample_rank <= 20
    """,
    doc="Deterministic weighted sampling without replacement (Efraimidis & "
    "Spirakis 2006 A-ES, operators/sampling.py:weighted_sample): top-20 "
    "orders per priority stratum with inclusion probability proportional "
    "to o_totalprice. Each row's exponential race time -ln(u)/w derives "
    "from the same portable md5 hash_unit draw as the other samplers, so "
    "the selection survives repartitioning and engine swap (the oracle "
    "recomputes identical doubles); one window shuffle on the stratum "
    "key, key tie-break. The distributed-safe form of weighted reservoir "
    "sampling — no sequential reservoir, no RNG state.",
)
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample

    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return weighted_sample(
        o, "o_orderkey", "o_totalprice", 20, stratum="o_orderpriority"
    )


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC reconciliation (operators/diff.py:table_diff —
    the complement of sources.writers.merge_upsert): two deterministic
    snapshots derived from orders (old drops keys %7=0, new drops %5=0
    and bumps o_totalprice for %3=0) diffed into added/removed/changed
    rows with the exact differing columns. ONE full-outer sort-merge
    join keyed on the diff key, null-safe JVM comparisons, unchanged
    rows dropped before the caller — output scales with churn, not
    corpus. Oracle-gated as the ``snapshot_diff`` branch of
    ``dedup_panel`` (plans/core.py) since round 5 — the standalone
    registration was merged to free an oracle slot for
    triangle_count_friend_graph."""
    from ..operators.diff import table_diff

    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 7 != 0)
    new = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


@query(
    "item_cooccurrence_pairs",
    """
    WITH d AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ), p AS (
      SELECT a.item AS item_a, c.item AS item_b, COUNT(*) AS n_pairs
      FROM d a JOIN d c ON a.basket = c.basket AND a.item < c.item
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), i AS (
      SELECT item, COUNT(*) AS n_item FROM d GROUP BY 1
    ), t AS (
      SELECT COUNT(DISTINCT basket) AS n_baskets FROM d
    )
    SELECT p.item_a, p.item_b, p.n_pairs,
           round(p.n_pairs / t.n_baskets, 6) AS support,
           round((CAST(p.n_pairs AS DOUBLE) * t.n_baskets)
                 / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
    FROM p
    CROSS JOIN t
    JOIN i ia ON ia.item = p.item_a
    JOIN i ib ON ib.item = p.item_b
    """,
    doc="Market-basket co-occurrence over lineitem (parts bought together "
    "within an order) with support and lift (operators/basket.py). NO "
    "self-join on the basket key: one groupBy collapses each order to a "
    "sorted distinct part array (collect_set dedups map-side), ordered "
    "pairs expand executor-locally via the shared bucket_pairs HOF kernel "
    "(max_basket loud-degradation guard), then a uniform-key pair count; "
    "the basket-count denominator is a broadcast 1-row aggregate. The "
    "oracle expresses the same statistics with the naive self-join form — "
    "two independent constructions agreeing on counts, support, and lift.",
)
def item_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.basket import item_cooccurrence

    li = tbl(spark, sf_dir, "lineitem")
    return item_cooccurrence(
        li, "l_orderkey", "l_partkey", min_pairs=2, max_basket=64
    )


@query(
    "event_lifecycle_panel",
    """
    WITH e AS (
      SELECT user_id, event_type, ts FROM events WHERE user_id IS NOT NULL
    ), t0 AS (
      SELECT user_id, MIN(ts) AS t FROM e WHERE event_type = 'signup'
      GROUP BY user_id
    ), t1 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM e JOIN t0 ON e.user_id = t0.user_id
      WHERE e.event_type = 'view' AND e.ts > t0.t
        AND e.ts <= t0.t + INTERVAL 7 DAY
      GROUP BY e.user_id
    ), t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t0 ON e.user_id = t0.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t1.t
        AND e.ts <= t0.t + INTERVAL 7 DAY
      GROUP BY e.user_id
    ), n AS (
      SELECT (SELECT COUNT(*) FROM t0) AS n0,
             (SELECT COUNT(*) FROM t1) AS n1,
             (SELECT COUNT(*) FROM t2) AS n2
    ), funnel AS (
      SELECT 1 AS step, 'signup' AS step_name, n0 AS n,
             CASE WHEN n0 > 0 THEN round(n0 / n0, 6) END AS pct FROM n
      UNION ALL
      SELECT 2, 'view', n1, CASE WHEN n0 > 0 THEN round(n1 / n0, 6) END FROM n
      UNION ALL
      SELECT 3, 'purchase', n2, CASE WHEN n0 > 0 THEN round(n2 / n0, 6) END FROM n
    ), f AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM e GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST((CAST(date_trunc('week', e.ts) AS DATE) - f.cohort_week) // 7
                  AS INTEGER) AS week_offset
      FROM e JOIN f ON e.user_id = f.user_id
    ), cnt AS (
      SELECT cohort_week, week_offset, COUNT(*) AS n_active
      FROM act WHERE week_offset <= 26 GROUP BY 1, 2
    ), sz AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM f GROUP BY 1
    )
    SELECT 'funnel' AS op, step, step_name,
           CAST(NULL AS DATE) AS cohort_week, CAST(NULL AS INTEGER) AS week_offset,
           n, CAST(NULL AS BIGINT) AS denom, pct
    FROM funnel
    UNION ALL
    SELECT 'retention' AS op, CAST(NULL AS INTEGER) AS step,
           CAST(NULL AS VARCHAR) AS step_name, c.cohort_week, c.week_offset,
           c.n_active AS n, s.cohort_size AS denom,
           round(c.n_active / s.cohort_size, 6) AS pct
    FROM cnt c JOIN sz s ON c.cohort_week = s.cohort_week
    """,
    doc="Event-lifecycle panel, op-tagged (merged round 5 from the round-4 "
    "standalone funnel_conversion_events + retention_cohorts_events to "
    "free an oracle slot for yelp_unified_panel; both plans survive "
    "verbatim as branches). funnel: ordered signup->view->purchase "
    "within 7 days — k chained min-when window expressions over ONE "
    "partitionBy(user_id) window, a per-user collapse, then a 1-row "
    "aggregate exploded to k step rows; strictly-after semantics pinned "
    "against a python model in tests/test_funnel.py. retention: weekly "
    "cohorts — per-user first-activity week, user-keyed join back, "
    "collapse to (cohort, offset, user) grain BEFORE the wide count, "
    "broadcast cohort sizes; diagonal invariant pinned. Week offsets are "
    "whole 7-day periods between week-truncated dates.",
)
def event_lifecycle_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    fun = funnel_conversion_events(spark, sf_dir).select(
        F.lit("funnel").alias("op"),
        "step",
        "step_name",
        F.lit(None).cast("date").alias("cohort_week"),
        F.lit(None).cast("int").alias("week_offset"),
        F.col("n_users").alias("n"),
        F.lit(None).cast("bigint").alias("denom"),
        F.col("pct_of_first").alias("pct"),
    )
    ret = retention_cohorts_events(spark, sf_dir).select(
        F.lit("retention").alias("op"),
        F.lit(None).cast("int").alias("step"),
        F.lit(None).cast("string").alias("step_name"),
        "cohort_week",
        "week_offset",
        F.col("n_active").alias("n"),
        F.col("cohort_size").alias("denom"),
        F.col("retention_pct").alias("pct"),
    )
    return fun.unionAll(ret)


def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel branch builder (oracle-gated inside event_lifecycle_panel)."""
    from ..operators.funnel import funnel_conversion

    return funnel_conversion(
        tbl(spark, sf_dir, "events"),
        ["signup", "view", "purchase"],
        within="7 days",
    )


def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention branch builder (oracle-gated inside event_lifecycle_panel)."""
    from ..operators.funnel import retention_matrix

    return retention_matrix(tbl(spark, sf_dir, "events"), max_offset=26)


from .yelp_fixture import yelp_oracle_sql as _yelp_oracle_sql  # noqa: E402


@query(
    "yelp_unified_panel",
    _yelp_oracle_sql(),
    doc="End-to-end Yelp-semantics oracle (VERDICT r4 item 7): the full "
    "reference pipeline — business_etl (from_json raw parse, try_cast "
    "attribute flags with null-on-'None', hours overnight wrap + "
    "close==open edge, trim->split->explode->trim category grain, "
    "Business_ETL.py:61-150), review_etl (engagement sum, lexicon "
    "sentiment + +-0.05 labels, Review_ETL.py:60-85), user_etl (elite "
    "count, friends explode_outer, User_ETL.py:70-95), and the unified "
    "star join with prefix renames and its row-multiplying grain "
    "(join/unified_data_analytics.py:23-47) — over deterministic "
    "Yelp-shaped literal rows (plans/yelp_fixture.py), aggregated to an "
    "op-tagged panel: per-(state, category) business stats (hour sums "
    "are exact binary quarters by fixture design, decimal-summed) and "
    "per-state unified stats (row counts at the multiplied grain, "
    "engagement, positive-label and elite-row counts, business-stars "
    "sum). The DuckDB twin re-derives EVERYTHING from the same VALUES "
    "rows — both engines parse, flatten, wrap, explode, score, join, "
    "and aggregate independently.",
)
def yelp_unified_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.business import business_etl
    from ..operators.review import review_etl
    from ..operators.unified import unified_analytics
    from ..operators.user import user_etl
    from ..schemas import BUSINESS_RAW_SCHEMA, REVIEW_RAW_SCHEMA, USER_RAW_SCHEMA
    from .yelp_fixture import fixture_json_lines

    bl, rl, ul = fixture_json_lines()

    def parse(lines: list[str], schema) -> DataFrame:
        raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
        return raw.select(F.from_json("value", schema).alias("r")).select("r.*")

    # NOTE on cost: with ~30 fixture rows this query is ~100% planning +
    # one-time codegen of the ETL expression trees (14 try_cast flags, 7
    # hours parsers, the sentiment when-chain) — measured: checkpointing
    # the parsed frames to deduplicate the trees saves only ~10% while
    # hiding the genuine ETL plan from EXPLAIN, so the plan stays lazy.
    biz = business_etl(parse(bl, BUSINESS_RAW_SCHEMA))
    rev = review_etl(parse(rl, REVIEW_RAW_SCHEMA))
    usr = user_etl(parse(ul, USER_RAW_SCHEMA))

    nulls = {
        "engagement_sum": F.lit(None).cast("bigint"),
        "n_positive": F.lit(None).cast("bigint"),
        "n_elite": F.lit(None).cast("bigint"),
        "bstars_sum": F.lit(None).cast("double"),
    }
    business_branch = (
        biz.groupBy("state", "category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("weekly_open_hours").cast("decimal(18,6)"))
            .cast("double")
            .alias("hours_sum"),
            F.sum("days_open").cast("bigint").alias("days_open_sum"),
            F.sum(F.when(F.col("accepts_credit_cards"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_credit"),
        )
        .select(
            F.lit("business").alias("op"), "state", "category", "n",
            "hours_sum", "days_open_sum", "n_credit",
            *[v.alias(k) for k, v in nulls.items()],
        )
    )
    uni = unified_analytics(rev, usr, biz)
    unified_branch = (
        uni.groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("engagement_score").cast("bigint").alias("engagement_sum"),
            F.sum(F.when(F.col("sentiment_label") == "positive", 1).otherwise(0))
            .cast("bigint")
            .alias("n_positive"),
            F.sum(F.when(F.col("elite_years_count") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_elite"),
            F.sum(F.col("business_stars").cast("decimal(18,6)"))
            .cast("double")
            .alias("bstars_sum"),
        )
        .select(
            F.lit("unified").alias("op"), "state",
            F.lit(None).cast("string").alias("category"), "n",
            F.lit(None).cast("double").alias("hours_sum"),
            F.lit(None).cast("bigint").alias("days_open_sum"),
            F.lit(None).cast("bigint").alias("n_credit"),
            "engagement_sum", "n_positive", "n_elite", "bstars_sum",
        )
    )
    return business_branch.unionAll(unified_branch)


def _friend_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward edges of the deterministic sparse friendship graph shared
    with friends_of_friends_recommendations (plans/core.py): each customer
    links to the next two in its nation's (acctbal, custkey) order, so
    degree is bounded (<= 4 after closure) at any corpus scale."""
    from pyspark.sql import Window

    c = tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    leads = c.select(
        F.col("c_custkey").alias("src"),
        F.lead("c_custkey", 1).over(w).alias("d1"),
        F.lead("c_custkey", 2).over(w).alias("d2"),
    )
    return leads.select("src", F.explode(F.array("d1", "d2")).alias("dst")).filter(
        F.col("dst").isNotNull()
    )


@query(
    "triangle_count_friend_graph",
    """
    WITH fwd AS (
      SELECT src, unnest([d1, d2]) AS dst FROM (
        SELECT c_custkey AS src,
               lead(c_custkey, 1) OVER w AS d1,
               lead(c_custkey, 2) OVER w AS d2
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      )
    ), und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM fwd WHERE dst IS NOT NULL AND src <> dst
    ), tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ), pv AS (
      SELECT id, COUNT(*) AS n_triangles FROM (
        SELECT x AS id FROM tris
        UNION ALL SELECT y FROM tris
        UNION ALL SELECT z FROM tris
      ) GROUP BY id
    ), dist AS (
      SELECT n_triangles, COUNT(*) AS n_vertices FROM pv GROUP BY n_triangles
    )
    SELECT 'global' AS scope,
           CAST(SUM(n_triangles * n_vertices) AS BIGINT) // 3 AS n_triangles,
           CAST(NULL AS BIGINT) AS n_vertices
    FROM dist
    UNION ALL
    SELECT 'per_vertex_dist' AS scope, n_triangles, n_vertices FROM dist
    """,
    doc="Triangle count over the friendship graph via degree-ordered "
    "orientation (Suri & Vassilvitskii 2011): every edge oriented from its "
    "lower-(degree,id) endpoint, so wedge fan-out is O(sqrt(m)) per vertex "
    "even on power-law graphs; wedge self-join + closing-edge equi-join, "
    "no cartesian (plan-pinned). Returns the per-vertex triangle-count "
    "distribution plus the global count (= sum/3 — each triangle touches "
    "3 vertices). Oracle-gated since round 5 (it is a pure join DAG, "
    "unlike the iterative CC/PageRank trackers): the DuckDB twin "
    "enumerates each triangle exactly once as an ordered a<b<c edge "
    "triple — an independent construction agreeing with the oriented-"
    "wedge plan. Python brute-force pin in tests/test_graph.py. "
    "Reference graph analogy: degree/motif reconciliation, "
    "test_cases/neo4j_test.cypher:40-44.",
)
def triangle_count_friend_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    tv = triangle_count(_friend_edges(spark, sf_dir), per_vertex=True)
    # one small localCheckpoint: the distribution is a handful of rows and
    # feeds both output branches — without it the wedge DAG runs twice
    dist = (
        tv.groupBy("n_triangles")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .localCheckpoint()
    )
    g = dist.agg(
        F.expr("CAST(sum(n_triangles * n_vertices) AS BIGINT) div 3").alias("n_triangles")
    ).select(
        F.lit("global").alias("scope"),
        "n_triangles",
        F.lit(None).cast("bigint").alias("n_vertices"),
    )
    return g.unionAll(
        dist.select(F.lit("per_vertex_dist").alias("scope"), "n_triangles", "n_vertices")
    )


def _sql_gopher_panel() -> str:
    """DuckDB twin of gopher_repetition_panel: an independent n-gram
    construction (unnest + groupBy per n, gram char mass via
    length(replace(gram, ' ', ''))) pivoted per doc, the Rae et al. 2021
    thresholds applied as CAST(thr AS DOUBLE) * total_word_chars — a bare
    ``0.2`` literal would be DECIMAL in DuckDB and drift from Spark's
    double arithmetic. Counters are exact integers throughout, so the
    only float op is the single threshold multiply, identical IEEE on
    both engines. Promoted from tests/test_gopher.py's per-n twin in r7."""
    from ..operators.text import GOPHER_DUP_NGRAM_THRESHOLDS, GOPHER_TOP_NGRAM_THRESHOLDS

    top_ns = sorted(GOPHER_TOP_NGRAM_THRESHOLDS)
    dup_ns = sorted(GOPHER_DUP_NGRAM_THRESHOLDS)
    n_list = ", ".join(str(n) for n in top_ns + dup_ns)
    pivots = ",\n             ".join(
        [
            f"coalesce(max(CASE WHEN n = {n} THEN top_mass END), 0) AS top{n}"
            for n in top_ns
        ]
        + [
            f"coalesce(max(CASE WHEN n = {n} THEN dup_mass END), 0) AS dup{n}"
            for n in dup_ns
        ]
    )
    flag = "\n            AND ".join(
        [
            f"top{n} <= CAST({GOPHER_TOP_NGRAM_THRESHOLDS[n]!r} AS DOUBLE) * twc"
            for n in top_ns
        ]
        + [
            f"dup{n} <= CAST({GOPHER_DUP_NGRAM_THRESHOLDS[n]!r} AS DOUBLE) * twc"
            for n in dup_ns
        ]
    )
    return f"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws,
             length(replace(coalesce(text, ''), ' ', '')) AS twc
      FROM documents
    ),
    g AS (
      SELECT doc_id, n,
             unnest(list_transform(range(1, greatest(len(ws) - n + 1, 0) + 1),
                                   i -> array_to_string(ws[i:i+n-1], ' '))) AS gram
      FROM w CROSS JOIN (SELECT unnest([{n_list}]) AS n) ns
    ),
    c AS (
      SELECT doc_id, n, gram, count(*) AS cnt,
             length(replace(gram, ' ', '')) AS chars
      FROM g GROUP BY doc_id, n, gram
    ),
    per_n AS (
      SELECT doc_id, n, max(cnt * chars) AS top_mass,
             sum(CASE WHEN cnt > 1 THEN cnt * chars ELSE 0 END) AS dup_mass
      FROM c GROUP BY doc_id, n
    ),
    per_doc AS (
      SELECT w.doc_id, w.source, w.twc,
             {pivots}
      FROM w LEFT JOIN per_n ON w.doc_id = per_n.doc_id
      GROUP BY w.doc_id, w.source, w.twc
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN {flag} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(twc) AS BIGINT) AS sum_word_chars,
           CAST(SUM(top2) AS BIGINT) AS sum_top2_chars,
           CAST(SUM(dup5) AS BIGINT) AS sum_dup5_chars,
           CAST(SUM(dup10) AS BIGINT) AS sum_dup10_chars
    FROM per_doc GROUP BY source
    """


@query(
    "gopher_repetition_panel",
    _sql_gopher_panel(),
    doc="Gopher repetition-filter panel (text.gopher_repetition_metrics, "
    "Rae et al. 2021 A1.1): per-document most-common-n-gram and "
    "duplicated-n-gram character mass as exact integers, aggregated to "
    "corpus pass rates per source plus the full quality gate "
    "(gopher_repetition_flags). Repetition is per-document computation, "
    "so the kernel is one zero-shuffle Arrow pass (the winnowing "
    "precedent) — at 100 TB the corpus streams once and only the "
    "per-source aggregate shuffles. Oracle: the independent DuckDB "
    "n-gram construction formerly pinned only in tests/test_gopher.py, "
    "promoted to the driver gate in r7 (slot freed by the "
    "lang_id_confusion -> doc_stats_panel merge); the per-doc-level twin "
    "stays in the test for fine-grained diagnostics.",
)
def gopher_repetition_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import gopher_repetition_flags, gopher_repetition_metrics

    d = tbl(spark, sf_dir, "documents")
    m = gopher_repetition_metrics(d).join(d.select("doc_id", "source"), "doc_id")
    return (
        m.withColumn("ok", gopher_repetition_flags())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("ok").cast("long")).alias("n_pass"),
            F.sum("total_word_chars").alias("sum_word_chars"),
            F.sum("top_2gram_chars").alias("sum_top2_chars"),
            F.sum("dup_5gram_chars").alias("sum_dup5_chars"),
            F.sum("dup_10gram_chars").alias("sum_dup10_chars"),
        )
        .orderBy("source")
    )


@query(
    "exact_substring_decontam",
    """
    WITH bp AS (
      SELECT doc_id + 100000 AS bench_id, substring(text, 1, 40) AS pat
      FROM documents
      WHERE doc_id % 25 = 0 AND length(substring(text, 1, 40)) >= 20
    ),
    hits AS (
      -- strpos pre-filter first (a tight scalar scan), THEN enumerate
      -- positions only on actual (doc, pattern) hits — the lambda
      -- enumeration over ALL pairs is intractable at the sf1 parity
      -- sweep (50k docs x 2k patterns x ~300 positions)
      SELECT b.bench_id, d.doc_id,
             len(list_filter(range(1, length(d.text) - length(b.pat) + 2),
                             i -> substring(d.text, i, length(b.pat)) = b.pat))
               AS n_occ,
             strpos(d.text, b.pat) AS first_pos
      FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents) d
      JOIN bp b ON strpos(d.text, b.pat) > 0
    )
    SELECT bench_id, COUNT(*) AS n_docs_hit,
           CAST(SUM(n_occ) AS BIGINT) AS n_occurrences,
           CAST(MIN(first_pos) AS BIGINT) AS min_first_pos
    FROM hits WHERE n_occ > 0
    GROUP BY bench_id
    """,
    doc="Exact verbatim-substring decontamination (decontam."
    "exact_substring_hits, the Lee et al. 2022 check): benchmark strings "
    "(here: 40-char prefixes of every 25th document, harvested "
    "deterministically) compile into ONE Aho-Corasick automaton — built "
    "per worker from the closure-shipped pattern list and "
    "fingerprint-cached (r7) — and the corpus streams through a single "
    "Arrow pass: "
    "O(chars + hits) per doc regardless of pattern count, zero shuffle, "
    "vs O(patterns x chars) for per-pattern contains. Output: hit-count "
    "rollup per benchmark string. Complements the n-gram collision check "
    "(decontam_ngram_overlap): n-grams tolerate tokenization drift, the "
    "automaton catches sub-n-gram verbatim strings. Oracle: an "
    "independent DuckDB position-enumeration (overlapping occurrences "
    "counted via every start index, first_pos via strpos) — promoted "
    "from tests/test_exact_substring.py to the driver gate in r7 (slot "
    "freed by the minhash_lsh -> jaccard_pairs_panel merge). The "
    "cross-join is oracle-side only (bounded: 20 patterns x 500 docs at "
    "oracle SF); the Spark plan stays the single automaton scan.",
)
def exact_substring_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.decontam import exact_substring_hits

    d = tbl(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring("text", 1, 40).alias("text"),
    )
    hits = exact_substring_hits(d, bench, min_len=20)
    return (
        hits.groupBy("bench_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs_hit"),
            F.sum("n_occurrences").alias("n_occurrences"),
            F.min("first_pos").alias("min_first_pos"),
        )
        .orderBy("bench_id")
    )


# ---------------------------------------------------------------------------
# Rows-only sketch queries — REGISTERED LAST by design: the driver's
# CORRECTNESS gate records the first 50 registry entries, so every
# oracle-backed query must precede these. Their correctness is pytest-pinned
# (determinism, recall floors, JVM-equivalence) instead of SQL-oracled.
# ---------------------------------------------------------------------------


@query(
    "lsh_ann_topk",
    None,  # rotation matrices in SQL would be absurd; recall pytest-pinned
    doc="LSH-bucketed approximate nearest neighbors, cross-polytope family "
    "(Andoni et al. 2015): 24 tables of rotate->argmax buckets, query-side "
    "4-probe multiprobe, exact rescoring of candidates. Upgraded from "
    "round-1 hyperplane sign-LSH (0.68 recall at 37% coverage on this "
    "isotropic corpus — the sign-bit worst case) to measured recall "
    ">=0.96 at ~47% candidate coverage across sf0.001/0.01/0.1. Rows-only "
    "driver check; pytest pins recall >= 0.9 and coverage < 0.5 vs the "
    "ann_cosine_topk ground truth.",
)
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "v")
    c = e.filter(F.col("vec_id") >= 5).select(F.col("vec_id").alias("c_id"), "v")
    return sim.cross_polytope_ann_topk(
        q, c, dim=64, query_id="q_id", corpus_id="c_id", vec_col="v", k=10,
        n_tables=24, n_probes=4,
    )


@query(
    "ann_cosine_topk_arrow",
    None,  # numpy pairwise-summed dot differs in final ulps from a fold;
    # exactness vs the JVM implementation is pytest-pinned instead
    doc="Arrow-vectorized exact cosine top-k: mapInPandas + one BLAS matmul "
    "per Arrow batch against the closure-captured query matrix, partial "
    "top-k per batch. The sanctioned Pandas-UDF case (dense linear "
    "algebra): measured 2.9x at 200 queries, 7.4x at 500 vs the "
    "interpreted HOF fold; below ~100 queries the JVM fold wins "
    "(Python-worker fixed cost) — see operators/similarity.py.",
)
def ann_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "v")
    c = e.filter(F.col("vec_id") >= 5).select(F.col("vec_id").alias("c_id"), "v")
    return sim.arrow_cosine_topk(q, c, "q_id", "c_id", "v", k=10)


@query(
    "ivf_ann_topk",
    None,  # k-means quantizer is engine-specific; recall pytest-pinned
    doc="IVF approximate nearest neighbors: deterministic sample-trained "
    "Lloyd's coarse quantizer (materialized centroid table), corpus "
    "assigned to inverted lists distributed, queries probe their 8 "
    "nearest of 32 lists (~27% coverage, measured recall ~0.74 on this "
    "isotropic corpus). Registered as the CLUSTERED-data scale path: "
    "with no cluster structure IVF's frontier stays under 0.9 recall at "
    "<50% coverage (frontier table in operators/ivf.py); the "
    "cross-polytope lsh_ann_topk is the isotropic-data path (>=0.96).",
)
def ivf_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import ivf_ann_topk, ivf_index, train_ivf_centroids

    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "v")
    c = e.filter(F.col("vec_id") >= 5).select(F.col("vec_id").alias("c_id"), "v")
    cent = train_ivf_centroids(c, "c_id", "v", n_lists=32, iters=5)
    idx = ivf_index(c, cent, "c_id", "v")
    return ivf_ann_topk(q, idx, cent, "q_id", "c_id", "v", k=10, nprobe=8)


# ---------------------------------------------------------------------------
# Fast-hash (xxhash64) production variants — BENCH-tracked rows-only queries
# (BASELINE.md "Fast-hash variant" table). md5 twins above stay the oracle
# path; these pin the per-round numbers of the hash family production uses.
# Registered LAST (after every oracle-backed query) like the other
# rows-only entries.
# ---------------------------------------------------------------------------


@query(
    "minhash_lsh_pairs_xxhash64",
    None,  # hash family is engine-specific; md5 twin is the oracle path
    doc="jaccard_pairs_panel's minhash_lsh family with hash_impl=xxhash64 "
    "(Spark-native "
    "JVM xxHash64 folded to [0, 2^32)): the production hash path, ~-27% "
    "vs md5 at sf0.1 (BASELINE.md fast-hash table). Same banding plan; "
    "blocking power equivalent (uniform 32-bit family).",
)
def minhash_lsh_pairs_xxhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return dd.minhash_lsh_candidates(
        d, "doc_id", "text", k=8, rows_per_band=2, shingle_n=3, hash_impl="xxhash64"
    )


@query(
    "simhash_fingerprints_xxhash64",
    None,
    doc="simhash_fingerprints with hash_impl=xxhash64: production hash "
    "path, ~-26% vs md5 at sf0.1 (BASELINE.md fast-hash table).",
)
def simhash_fingerprints_xxhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return dd.with_simhash(d, "text", "simhash", bits=16, hash_impl="xxhash64").select(
        "doc_id", "simhash"
    )


@query(
    "winnowing_fingerprints_xxhash64",
    None,
    doc="Arrow winnowing kernel with hash_impl=xxhash64 — the production "
    "fast-hash path on the production (shuffle-free) plan shape, same "
    "cross-doc groupBy tail as winnowing_shared_fingerprints. The kernel "
    "reproduces F.xxhash64 bit-exactly via numpy-vectorized XXH64 "
    "(functions/xxhash.py) so the fast-hash family no longer pays the "
    "relational substring+explode form (was 5.8s at sf0.1; the relational "
    "winnowing_fingerprints_long(hash_impl='xxhash64') remains the tested "
    "pure-JVM fallback and the equivalence test's second witness).",
)
def winnowing_fingerprints_xxhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    fps = tx.winnowing_fingerprints_arrow(
        d, "doc_id", "text", k=8, window=4, hash_impl="xxhash64",
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "pq_ann_topk",
    None,  # quantizer is engine-specific; recall/determinism pytest-pinned
    doc="Product-quantization ANN (Jegou et al. 2011, the FAISS PQ family): "
    "per-subspace codebooks (byte-capped deterministic training), corpus "
    "stored as m=16 6-bit codes (16x compression at dim 64 float32 — the "
    "path that makes a 100 TB corpus scan as a few TB of codes), ADC "
    "lookup-table scan (zero shuffle, codes stream once), exact rerank of "
    "the top-100 shortlist via an id equi-join fetching only shortlist "
    "vectors. Vectors unit-normalized so ADC's L2 order equals cosine "
    "order; output schema matches ann_cosine_topk for direct recall "
    "comparison. Measured frontier on this isotropic corpus: m=16/k=64/"
    "R=100 recall 1.00 at 5% coverage (sf0.1); m=8/k=32 needs 20% "
    "coverage for 0.96 — subspace count is the recall lever, exactly the "
    "PQ paper's result. codes=None fuses encode+ADC into ONE Arrow pass "
    "(the ad-hoc-search shape benched here: no persisted codes table, so "
    "crossing the Python boundary twice was pure overhead; fused==two-"
    "stage pinned in tests/test_pq.py).",
)
def pq_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_ann_topk, train_pq_codebooks

    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v0")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v0"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    e = e.select(
        "vec_id", F.transform(F.col("v0"), lambda x: x / norm).alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "v")
    c = e.filter(F.col("vec_id") >= 5).select(F.col("vec_id").alias("c_id"), "v")
    books = train_pq_codebooks(c, "c_id", "v", m=16, n_codes=64, iters=5)
    return pq_ann_topk(q, None, c, books, "q_id", "c_id", "v", k=10, rerank=100)


@query(
    "pagerank_friend_graph",
    None,  # iterative fixpoint — not SQL-expressible; python-recompute
    # pinned to 1e-6 in tests/test_components.py
    doc="Damped PageRank (Page et al. 1999) over the symmetric friendship "
    "graph — the iterative-analytics bench tracker (VERDICT r3 item 3). "
    "Per round: ONE equi-join (edges x ranks) + ONE groupBy(dst), both "
    "shuffles keyed on vertex id; dangling mass is a 1-row broadcast "
    "scalar, never a rank-vector collect; lineage cut per round via "
    "localCheckpoint; convergence tested every 4th round (batched driver "
    "actions). Plan pins in tests/test_plans.py: no cartesian beyond the "
    "1-row scalar, no Python eval.",
)
def pagerank_friend_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    fwd = _friend_edges(spark, sf_dir)
    # forward edges all run low->high (acctbal, custkey) rank, so the
    # reversed closure is provably disjoint: UNION ALL, no distinct
    sym = fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(sym, max_iter=8, tol=1e-6)
    return ranks.select("id", F.round("rank", 9).alias("rank"))


@query(
    "connected_components_friend_graph",
    None,  # iterative fixpoint — union-find oracle pinned in pytest
    doc="Connected components over the friendship graph, aggregated to "
    "component sizes — the second iterative bench tracker. Uses the "
    "alternating large-star/small-star contraction (Kiveris et al. 2014): "
    "the nation chains have diameter ~n_customers/50, so hash-min label "
    "propagation (O(diameter) rounds — hundreds at sf0.1) is the wrong "
    "algorithm here; star contraction converges in O(log^2 n) round-pairs "
    "(~5 at sf0.1), each a groupBy+join on the same key. precontract=True "
    "prepends a per-partition union-find Arrow pass (two-phase CC): each "
    "partition's edges collapse to depth-1 star forests with ZERO shuffle, "
    "so the global rounds start from an already-flattened edge set — at "
    "cluster scale this is the difference between shuffling the raw edge "
    "multiset and shuffling ~one edge per vertex. Star==hashmin==python-"
    "union-find equality (incl. precontract, across partition layouts) "
    "pinned in tests/test_components.py. One component per represented "
    "nation.",
)
def connected_components_friend_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    fwd = _friend_edges(spark, sf_dir)
    comps = connected_components(
        fwd, src="src", dst="dst", max_iter=40, algorithm="star", precontract=True
    )
    return comps.groupBy(F.col("comp").alias("component")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@query(
    "bfs_distances_binary_tree",
    None,  # frontier iteration — python-BFS equality pinned in tests/test_bfs.py
    doc="Multi-source BFS bench tracker (operators/bfs.py): distances from "
    "each nation's root over a deterministic per-nation binary tree "
    "(rank r parents ranks 2r and 2r+1 in the nation's (acctbal, custkey) "
    "order — built by EXPLODING each parent's two target ranks and "
    "equi-joining on (nation, rank): no non-equi join, no per-nation "
    "cartesian). Depth grows as log2(nation size) — ~10 levels at sf0.1 — "
    "so the tracker measures per-level frontier-join cost, the quantity "
    "that matters at cluster scale. Output: vertices per distance level "
    "(one row per level). Registered rows-only AFTER the 50 oracle slots "
    "(VERDICT r4 item 5: pytest-only analytics gain bench visibility).",
)
def bfs_distances_binary_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.bfs import bfs_distances

    c = tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nat"),
        F.row_number().over(w).alias("r"),
    )
    targets = ranked.select(
        F.col("id").alias("src"),
        "nat",
        F.explode(F.array(F.col("r") * 2, F.col("r") * 2 + 1)).alias("cr"),
    )
    child = ranked.select(F.col("id").alias("dst"), "nat", F.col("r").alias("cr"))
    edges = targets.join(child, ["nat", "cr"]).select("src", "dst")
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = ranked.filter(F.col("r") == 1).select("id")
    # sym carries both directions of every edge, so the undirected
    # two-frontier dedup applies (O(frontier) per level, not O(visited))
    dists = bfs_distances(sym, sources, max_depth=40, undirected=True)
    return dists.groupBy("dist").agg(F.count(F.lit(1)).alias("n_vertices"))


@query(
    "k_core_cooccurrence_graph",
    None,  # iterative peel — python-model pinned in tests/test_kcore.py
    doc="k-core decomposition bench tracker (operators/graph.py:k_core) "
    "over the REAL item co-occurrence graph (parts bought together, "
    "support >= 2 — the basket.py collapse feeds the graph op). "
    "Iterative peeling is one degree groupBy + two semi-joins per round "
    "on a shrinking checkpointed edge set; once the cascade shrinks "
    "under the local-finish threshold the remaining rounds collapse to "
    "ONE exact Arrow peel (the iterative-tail pattern — at sf0.1 the "
    "3.6k-edge graph takes that path immediately, at 100 TB the early "
    "rounds stay distributed). Cross-path equality pinned in "
    "tests/test_kcore.py. Rows-only after slot 50.",
)
def k_core_cooccurrence_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.basket import item_cooccurrence
    from ..operators.graph import k_core

    li = tbl(spark, sf_dir, "lineitem")
    pairs = item_cooccurrence(li, "l_orderkey", "l_partkey", min_pairs=2).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    core = k_core(pairs, k=2)
    return core.agg(F.count(F.lit(1)).alias("n_core_vertices"))


@query(
    "link_prediction_friend_graph",
    None,  # python-model + triangle identity pinned in tests/test_linkpred.py
    doc="Link-prediction feature tracker (graph.link_prediction_features): "
    "common-neighbors / Adamic-Adar / Jaccard for non-adjacent 2-hop "
    "pairs of the friendship graph — the center-as-basket collapse with "
    "executor-local pair expansion (shared bucket_pairs kernel), no "
    "neighbor-list self-join. Output: candidate count + score moments "
    "per common-neighbor count (bounded rows at any scale). Rows-only "
    "after slot 50.",
)
def link_prediction_friend_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import link_prediction_features

    fwd = _friend_edges(spark, sf_dir)
    feats = link_prediction_features(fwd, min_common=1)
    return feats.groupBy("common_neighbors").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("adamic_adar"), 6).alias("sum_adamic_adar"),
        F.round(F.sum("jaccard"), 6).alias("sum_jaccard"),
    )


@query(
    "ewma_customer_spend",
    None,  # genuinely sequential — O(n^2) direct-formula model pinned in
    # tests/test_timeseries.py
    doc="Wall-time-decayed EWMA bench tracker (timeseries.ewma_by_key, "
    "halflife 90 days) over each customer's order history — genuinely "
    "sequential (each output depends on the full decayed prefix; "
    "two-accumulator stable recursion), implemented as ONE repartition "
    "on the key + a partition-local sort + a single mapInPandas STREAM "
    "with O(1) carry state across batch and group boundaries — NOT "
    "applyInPandas: grouped-map builds one pandas frame per key, and "
    "with many small keys that per-group overhead dominated 35x "
    "(28s -> 0.8s at sf0.1); the stream also removes any per-key "
    "history-in-memory constraint. Output: final EWMA per customer "
    "bucketed to spend deciles (bounded rows, deterministic ewma "
    "tiebreak). Rows-only after slot 50.",
)
def ewma_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import ewma_by_key

    o = tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.col("o_totalprice").alias("v"),
    )
    ew = ewma_by_key(o, "o_custkey", "ts", "v", halflife_seconds=90 * 86400.0)
    from pyspark.sql import Window

    latest = (
        ew.withColumn(
            "rn",
            F.row_number().over(
                # ewma as the final tiebreaker: two orders with identical
                # (ts, v) carry DIFFERENT ewma outputs (the prefix differs),
                # so without it the pick — and the bucket counts — would be
                # partitioning-dependent
                Window.partitionBy("o_custkey").orderBy(
                    F.desc("ts"), F.desc("v"), F.desc("ewma")
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return latest.groupBy(
        (F.floor(F.col("ewma") / 50000) * 50000).alias("ewma_bucket")
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "heavy_hitters_doc_tokens",
    None,  # MG summaries are layout-dependent state; the layout-FREE
    # containment/presence bounds are pinned in tests/test_sketches.py
    doc="Mergeable heavy-hitter rollup tracker (sketches."
    "grouped_frequent_sketches — Misra-Gries 1982 / Agarwal et al. 2013 "
    "'Mergeable Summaries'): per-source token sketches over documents "
    "(one streaming Arrow pass, worker memory O(groups x 2m), never "
    "O(rows)), merged to the global grain (summary rows only), exploded "
    "to (item, count_lower, count_upper). The heavy-hitter member of "
    "the rollup trio next to the HLL distinct and shared-edge quantile "
    "sketches: store per day/source in parquet, merge months later, no "
    "raw re-scan. 100 TB application: hot-key detection feeding "
    "skew.salted_join's salt count without a full fact-table groupBy. "
    "Rows-only after slot 50 (sketch contents depend on partition "
    "layout; only the bounds are layout-free).",
)
def heavy_hitters_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import (
        frequent_items_from_sketch,
        grouped_frequent_sketches,
        merge_frequent_sketches,
    )

    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    per_source = grouped_frequent_sketches(toks, ["source"], "tok", m=16)
    merged = merge_frequent_sketches(per_source, group_cols=None, m=16)
    return frequent_items_from_sketch(merged)


@query(
    "kmv_distinct_rollup_orders",
    None,  # xxhash64-based sketch — engine-specific; the merge-closure
    # property is pinned in tests/test_sketches.py as EXACT equality
    doc="KMV (k-minimum-values) distinct rollup tracker (sketches."
    "grouped_kmv_sketches, Bar-Yossef et al. 2002 / Beyer et al. 2007): "
    "distinct customers per order priority as mergeable k-min arrays — "
    "the set-operations member of the sketch family (HLL unions only; "
    "KMV arrays also answer INTERSECTION and Jaccard via "
    "kmv_set_estimates). Output: per-priority distinct estimates plus "
    "the GLOBAL row computed by merging the per-priority sketches — the "
    "closure property (k smallest of a union of k-min arrays == the "
    "sketch of the union, EXACTLY) makes the rollup loss-free, pinned "
    "as equality in pytest. One streaming bounded-heap pass + a "
    "summary-row merge; rows-only after slot 50 (no xxhash64 in "
    "DuckDB).",
)
def kmv_distinct_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import (
        grouped_kmv_sketches,
        kmv_distinct_estimate,
        merge_kmv_sketches,
    )

    o = tbl(spark, sf_dir, "orders")
    per_prio = grouped_kmv_sketches(o, ["o_orderpriority"], "o_custkey", k=256)
    per_prio = per_prio.localCheckpoint()  # feeds both branches, tiny (5 rows)
    est = per_prio.select(
        "o_orderpriority",
        F.round(kmv_distinct_estimate(F.col("kmin"), 256), 4).alias("distinct_est"),
        "n_rows",
    )
    merged = merge_kmv_sketches(per_prio, group_cols=None, k=256).select(
        F.lit("ALL").alias("o_orderpriority"),
        F.round(kmv_distinct_estimate(F.col("kmin"), 256), 4).alias("distinct_est"),
        "n_rows",
    )
    return est.unionAll(merged)


@query(
    "semantic_dedup_embeddings",
    None,  # greedy-sequential within clusters — not SQL-expressible;
    # greedy-prefix model equality + layout independence pinned in
    # tests/test_semdedup.py
    doc="SemDeDup semantic near-dup removal (operators/semdedup.py, Abbas "
    "et al. 2023): IVF-cluster the embeddings table (the SAME sample-"
    "trained coarse quantizer the ANN index uses), then a greedy "
    "within-cluster prefix scan drops every vector whose cosine to an "
    "already-kept one exceeds the threshold. One zero-shuffle Arrow "
    "assignment + ONE groupBy(cluster) shuffle; per-cluster cost is "
    "O(c*kept*dim) — n_clusters bounds c, the 100-TB memory knob. "
    "Threshold 0.45 is this corpus's semantic-redundancy regime (the "
    "synthetic embeddings are isotropic — max neighbor cosine ~0.60, no "
    "literal dups; SemDeDup's paper likewise tunes the threshold to a "
    "target kept fraction, not to near-1 cosine — production callers "
    "derive it with semdedup.calibrate_threshold(corpus, target) rather "
    "than hand-tuning; 0.45 here keeps the tracker deterministic). "
    "Output: per-cluster keep/drop rollup (semantic_dedup_stats). "
    "Rows-only after slot 50.",
)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.semdedup import semantic_dedup, semantic_dedup_stats

    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double_vec(F.col("embedding")).alias("v")
    )
    v = semantic_dedup(e, "vec_id", "v", threshold=0.45, n_clusters=8)
    return semantic_dedup_stats(v).orderBy("list_id")




@query(
    "quality_gate_panel",
    None,  # rows-only by slot (the first 50 registry slots are the
    # driver's oracle set); every component flag is independently
    # oracle/twin-gated — gopher_repetition_panel (oracle), the C4 line
    # rules (DuckDB twin in tests/test_c4.py), and gopher_quality_flags
    # (python-model pin in tests/test_quality_gate.py, which also pins
    # THIS panel against a from-scratch python recombination)
    doc="The full pre-training quality gate in ONE corpus scan — the "
    "production composition every LLM data pipeline runs (the "
    "C4/Gopher/FineWeb-style filter stack): Gopher repetition flags "
    "(Arrow counter kernel + JVM thresholds), the Gopher QUALITY "
    "filters (word count / mean word length / symbol / bullet / "
    "ellipsis / alpha-word / stopword gates — gopher_quality_flags, "
    "pure codegen'd JVM exprs, no UDF), and the C4 document rules "
    "(lorem-ipsum / curly-brace / policy-phrase / kept-line floor), "
    "rolled up to per-source pass rates plus the conjunction. One "
    "mapInPandas pass + one aggregate shuffle — at 100 TB the corpus "
    "streams once through every filter (min_words=20 and "
    "min_kept_lines=1 and min_stopword_hits=1 fit the synthetic "
    "corpus' ~50-word single-stopword docs; production callers pass the "
    "paper defaults). Per-filter pass-rate columns exist precisely so a "
    "gate that zeroes a corpus is VISIBLE: the synthetic docs are "
    "single-line word soup with no terminal punctuation, so the C4 "
    "sentence rules pass 0 of them (pinned) and n_pass_all is 0 through "
    "that conjunct — the panel reports it rather than hiding it.",
)
def quality_gate_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import (
        c4_doc_flags,
        gopher_quality_flags,
        gopher_repetition_flags,
        gopher_repetition_metrics,
    )

    d = tbl(spark, sf_dir, "documents")
    m = gopher_repetition_metrics(d)
    v = (
        d.select("doc_id", "source", "text")
        .join(m, "doc_id")
        .withColumn("rep_ok", gopher_repetition_flags())
        .withColumn(
            "qual_ok",
            gopher_quality_flags(F.col("text"), min_words=20, min_stopword_hits=1)[
                "passes_gopher_quality"
            ],
        )
        .withColumn(
            "c4_ok", c4_doc_flags(F.col("text"), min_kept_lines=1)["passes_c4"]
        )
    )
    return (
        v.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("rep_ok").cast("long")).alias("n_pass_repetition"),
            F.sum(F.col("qual_ok").cast("long")).alias("n_pass_quality"),
            F.sum(F.col("c4_ok").cast("long")).alias("n_pass_c4"),
            F.sum(
                (F.col("rep_ok") & F.col("qual_ok") & F.col("c4_ok")).cast("long")
            ).alias("n_pass_all"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Within-corpus duplicate-span detection (operators/selfdedup.py)
# ---------------------------------------------------------------------------


def _sql_duplicate_spans(k: int = 5, min_count: int = 2) -> str:
    """DuckDB twin of ``selfdedup.duplicate_spans`` (spans CTE chain, no
    final SELECT) — generated from the same Horner fold and the same
    interval-union window so neither can drift from the operator."""
    return f"""
    WITH tokh AS (
      SELECT doc_id,
             list_transform({TOKS}, tok -> {_sql_hash('tok', 'mh:')}) AS th
      FROM documents WHERE len({TOKS}) >= {k}
    ), grams AS (
      SELECT doc_id,
             unnest(range(1, len(th) - {k - 2})) - 1 AS pos,
             unnest({_sql_folded_shingles(k)}) AS gh
      FROM tokh
    ), occ AS (
      SELECT gh, count(*) AS occ FROM grams GROUP BY gh
      HAVING count(*) >= {min_count}
    ), marked AS (
      SELECT g.doc_id, g.pos, o.occ FROM grams g JOIN occ o USING (gh)
    ), flagged AS (
      SELECT doc_id, pos, occ,
             CASE WHEN max(pos + {k}) OVER w IS NULL
                    OR pos > max(pos + {k}) OVER w THEN 1 ELSE 0 END AS _new
      FROM marked
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sp AS (
      SELECT doc_id, pos, occ,
             sum(_new) OVER (PARTITION BY doc_id ORDER BY pos) AS _span
      FROM flagged
    ), spans AS (
      SELECT doc_id, min(pos) AS span_start, max(pos) + {k} AS span_end,
             max(pos) + {k} - min(pos) AS span_tokens,
             count(*) AS n_grams, max(occ) AS max_occurrences
      FROM sp GROUP BY doc_id, _span
    )"""


#: Exact DuckDB twin of the registered tracker below — pinned in
#: tests/test_selfdedup.py (full row/schema/value compare via the oracle
#: harness machinery). Lives here, not in the test, so a future slot
#: opening can promote it into the driver gate verbatim.
DUPLICATE_SPANS_STATS_ORACLE = (
    _sql_duplicate_spans(5, 2)
    + """
    SELECT d.doc_id,
           len(string_split(d.text, ' '))::BIGINT AS n_tokens,
           COALESCE(s.n_spans, 0)::BIGINT AS n_spans,
           COALESCE(s.dup_tokens, 0)::BIGINT AS dup_tokens
    FROM documents d
    LEFT JOIN (
      SELECT doc_id, count(*) AS n_spans, sum(span_tokens) AS dup_tokens
      FROM spans GROUP BY doc_id
    ) s USING (doc_id)
    """
)

#: Span-granular twin (same CTE chain, raw spans out).
DUPLICATE_SPANS_ORACLE = (
    _sql_duplicate_spans(5, 2)
    + """
    SELECT doc_id, span_start::BIGINT AS span_start,
           span_end::BIGINT AS span_end, span_tokens::BIGINT AS span_tokens,
           n_grams::BIGINT AS n_grams,
           max_occurrences::BIGINT AS max_occurrences
    FROM spans
    """
)


@query(
    "duplicate_spans_panel",
    None,  # rows-only by slot (the first 50 registry slots are the
    # driver's oracle set); the exact DuckDB twin exists —
    # DUPLICATE_SPANS_STATS_ORACLE above — and tests/test_selfdedup.py
    # pins both the stats panel and the raw span boundaries against it
    # at sf0.001, plus a planted-duplicate python model.
    doc="Within-corpus exact duplicate-span detection (operators/"
    "selfdedup.py, Lee et al. 2022 ExactSubstr): per-doc count of "
    "maximal duplicated token spans (word-5-grams occurring >= 2x in "
    "the corpus, overlapping covers interval-unioned) and the exact "
    "duplicated token mass. The distributed stand-in for the paper's "
    "single-machine suffix array: positional-gram posexplode -> one "
    "partial-agg'd gram-count shuffle -> AQE/bloom-pruned join-back -> "
    "windowed interval union over only the MATCHED grams. Integer "
    "counters only (float fractions left to the caller), same "
    "no-drift policy as the Gopher panel.",
)
def duplicate_spans_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selfdedup import duplicate_span_stats

    d = tbl(spark, sf_dir, "documents")
    return duplicate_span_stats(d, "doc_id", "text", k=5, min_count=2)


@query(
    "dsir_selection_panel",
    None,  # rows-only by slot; the hashed-feature layer has an exact
    # DuckDB twin and the weights/Gumbel-top-k a from-scratch python
    # model, both pinned in tests/test_dsir.py (weights rel 1e-9,
    # selection-set equality, layout invariance)
    doc="DSIR data selection (operators/dsir.py, Xie et al. 2023): score "
    "every doc's hashed unigram+bigram distribution against a target "
    "domain (the corpus' English slice stands in) vs the raw corpus, "
    "then deterministic Gumbel top-k without replacement. The "
    "log-ratio table is <= B rows and broadcasts; the corpus gram "
    "stream collapses map-side into one (doc, bucket) count row and "
    "shuffles once on the doc key; selection is a TakeOrdered. Panel: "
    "per-(source, lang) selected-doc counts — integers, deterministic "
    "(md5 feature hashes + md5 Gumbel draws survive repartitioning).",
)
def dsir_selection_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_select

    d = tbl(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    picked = dsir_select(d, target, k=100, buckets=4096)
    return (
        picked.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_selected"))
        .orderBy("source", "lang")
    )
