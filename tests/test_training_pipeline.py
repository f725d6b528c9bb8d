"""End-to-end training-data pipeline composition: the §2.9 operators are
not isolated demos — chunk -> quality-filter -> PII-scrub -> exact dedup
-> near-dup blocking -> entity clustering -> canonical selection -> token
budget runs as ONE lazy plan chain over the documents corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.operators import dedup as dd
from yelp_business_data_pipeline_spark.operators import text as tx
from yelp_business_data_pipeline_spark.operators.components import resolve_entities


def test_documents_to_training_corpus(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = d.count()

    # 1. chunk into context windows (stable chunk ids for downstream stages)
    chunks = tx.chunk_tokens(d, "doc_id", "text", chunk_size=64, overlap=8).withColumn(
        "chunk_id", F.col("doc_id") * 1000 + F.col("chunk_idx")
    )
    n_chunks = chunks.count()
    assert n_chunks >= n_docs  # chunking never loses documents

    # 2. quality filter (lexical diversity) + PII scrub
    toks = F.split("chunk_text", " ")
    clean = (
        chunks.filter(F.size(F.array_distinct(toks)) / F.size(toks) >= 0.3)
        .withColumn("chunk_text", tx.redact_pii(F.col("chunk_text")))
    )
    n_clean = clean.count()
    assert 0 < n_clean <= n_chunks

    # 3. exact dedup on content fingerprint (deterministic keep-lowest-id)
    hashed = clean.withColumn("content_hash", F.md5("chunk_text"))
    deduped = dd.exact_dedup(hashed, ["content_hash"], [F.asc("chunk_id")])
    n_deduped = deduped.count()
    assert n_deduped <= n_clean
    assert deduped.groupBy("content_hash").count().filter("count > 1").count() == 0

    # 4. near-dup blocking (MinHash-LSH) -> entity clustering -> canonical
    pairs = dd.minhash_lsh_candidates(deduped, "chunk_id", "chunk_text")
    resolved = resolve_entities(deduped, pairs, "chunk_id")
    canonical = resolved.filter("is_canonical")
    n_entities = canonical.count()
    assert 0 < n_entities <= n_deduped
    # every entity keeps exactly one canonical chunk
    assert resolved.select("entity_id").distinct().count() == n_entities

    # 5. token budget of the final corpus, both tokenizers
    budget = canonical.agg(
        F.sum(F.size(F.split("chunk_text", " "))).alias("ws_tokens"),
        F.sum(tx.bpe_ish_token_count(F.col("chunk_text"))).alias("bpe_tokens"),
    ).collect()[0]
    assert budget.ws_tokens > 0 and budget.bpe_tokens >= budget.ws_tokens


def test_leakage_safe_splits(spark):
    """Split is a function of the dup-cluster, not the row: every cluster
    lands whole in one split; proportions track the requested fractions;
    assignment is deterministic and repartition-invariant."""
    import pytest

    from yelp_business_data_pipeline_spark.operators.sampling import leakage_safe_splits
    from yelp_business_data_pipeline_spark.operators.text import fingerprint

    d = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .withColumn("cluster", fingerprint(F.col("text"), 2))
    )
    out = leakage_safe_splits(d, "cluster").cache()

    # (a) no cluster straddles splits
    straddlers = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0

    # (b) proportions within tolerance OF THE CLUSTER COUNT (the draw is
    # per cluster, so expectation is over clusters, not rows)
    by_split = {
        r.split: r.n
        for r in out.select("cluster", "split").distinct().groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    n_clusters = sum(by_split.values())
    assert by_split.get("train", 0) / n_clusters == pytest.approx(0.90, abs=0.05)
    assert (by_split.get("val", 0) + by_split.get("test", 0)) / n_clusters == pytest.approx(
        0.10, abs=0.05
    )

    # (c) deterministic + repartition-invariant
    again = leakage_safe_splits(d.repartition(13), "cluster")
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in again.collect()}
    assert a == b
    out.unpersist()

    # (d) bad fractions fail loudly
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_splits(d, "cluster", splits={"train": 0.8, "val": 0.1})


def test_leakage_safe_splits_null_cluster_raises(spark):
    import pytest

    from yelp_business_data_pipeline_spark.operators.sampling import leakage_safe_splits

    d = spark.createDataFrame([(1, "c1"), (2, None)], "doc_id long, cluster string")
    with pytest.raises(Exception, match="NULL cluster"):
        leakage_safe_splits(d, "cluster").collect()


def test_weighted_selection_and_diff_audit(spark):
    """Round-4 additions composed over the same corpus: weighted corpus
    selection (A-ES) is a deterministic subset, and table_diff audits
    exactly what canonical selection removed."""
    from yelp_business_data_pipeline_spark.operators.diff import table_diff
    from yelp_business_data_pipeline_spark.operators.sampling import weighted_sample

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashed = d.withColumn("content_hash", F.md5("text"))
    deduped = dd.exact_dedup(hashed, ["content_hash"], [F.asc("doc_id")])
    pairs = dd.minhash_lsh_candidates(deduped, "doc_id", "text")
    resolved = resolve_entities(deduped, pairs, "doc_id")
    canonical = resolved.filter("is_canonical")

    # weighted selection: inclusion ~ token count; deterministic subset
    weighted = canonical.withColumn("n_tokens", F.size(F.split("text", " ")))
    sel = weighted_sample(weighted, "doc_id", "n_tokens", 50)
    sel_ids = {r.doc_id for r in sel.select("doc_id").collect()}
    assert len(sel_ids) == min(50, canonical.count())
    again = {r.doc_id for r in weighted_sample(
        weighted.repartition(13), "doc_id", "n_tokens", 50).select("doc_id").collect()}
    assert sel_ids == again  # layout-independent selection

    # diff audit: canonical vs pre-selection corpus — every non-canonical
    # row classifies as removed, nothing is added or changed.
    audit = table_diff(
        deduped.select("doc_id", "content_hash"),
        canonical.select("doc_id", "content_hash"),
        ["doc_id"],
    )
    by_type = {r.change_type: r.n for r in
               audit.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_removed = by_type.pop("removed", 0)
    assert by_type == {}, f"unexpected diff classes: {by_type}"
    assert n_removed == deduped.count() - canonical.count()


def test_modern_pretraining_path_r7(spark):
    """The round-6/7 operators composed into the full modern pretraining
    path (FineWeb/Gopher-style), one lazy chain with invariants per
    stage: quality gate -> within-corpus duplicate-span removal ->
    benchmark decontamination -> DSIR target-domain selection ->
    sequence packing."""
    from yelp_business_data_pipeline_spark.operators.decontam import decontaminate
    from yelp_business_data_pipeline_spark.operators.dsir import dsir_select
    from yelp_business_data_pipeline_spark.operators.selfdedup import (
        remove_duplicate_spans,
    )
    from yelp_business_data_pipeline_spark.operators.packing import pack_concat_split

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = d.count()

    # 1. quality gate: Gopher repetition + quality + C4 (thresholds fit
    # the synthetic corpus' short single-line docs, as in
    # quality_gate_panel)
    m = tx.gopher_repetition_metrics(d)
    gated = (
        d.join(m, "doc_id")
        .filter(tx.gopher_repetition_flags())
        .filter(
            tx.gopher_quality_flags(
                F.col("text"), min_words=20, min_stopword_hits=1
            )["passes_gopher_quality"]
        )
        .select(*d.columns)
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n_docs

    # 2. cut within-corpus duplicated spans (ExactSubstr); token mass
    # shrinks or stays, rows survive
    cut = remove_duplicate_spans(gated, "doc_id", "text", k=5, min_count=2)
    assert cut.count() == n_gated
    before = gated.agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    after = cut.agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert after <= before

    # 3. decontaminate against a held-out benchmark slice
    bench = d.filter(F.col("doc_id") % 19 == 0)
    train = cut.filter(F.col("doc_id") % 19 != 0)
    decon = decontaminate(train, bench, "doc_id", "text", n=5)
    n_decon = decon.count()
    assert 0 < n_decon <= n_gated

    # 4. DSIR-select half the surviving docs toward the English slice
    k = max(1, n_decon // 2)
    target = d.filter(F.col("lang") == "en")
    picked = dsir_select(decon, target, k=k, buckets=1024)
    assert picked.count() == k
    assert "log_weight" in picked.columns

    # 5. pack into 128-token context windows per source stream
    packed = pack_concat_split(
        picked.withColumn("n_tokens", F.size(F.split("text", " "))),
        "n_tokens",
        capacity=128,
    )
    rows = packed.select("source", "start_offset", "n_tokens", "bin_start").collect()
    assert len(rows) == k
    # offsets are consistent within each stream: sorted by doc order the
    # cumulative sum reproduces start_offset
    by_stream: dict = {}
    for r in sorted(rows, key=lambda r: (r.source, r.start_offset)):
        acc = by_stream.get(r.source, 0)
        assert r.start_offset == acc
        assert r.bin_start == acc // 128
        by_stream[r.source] = acc + r.n_tokens


def test_modern_pretraining_path_r8_quality_stack(spark):
    """The round-8 continuation families composed into the pipeline: the
    three quality legs agree on a keep set (rule gate -> learned
    classifier -> LM perplexity tercile), then the TRAINED tokenizer
    prices the survivors and packing runs on REAL BPE token counts
    instead of whitespace counts — one lazy chain, invariants per
    stage."""
    from yelp_business_data_pipeline_spark.operators.bpe import (
        bpe_token_stats,
        train_bpe,
    )
    from yelp_business_data_pipeline_spark.operators.packing import pack_concat_split
    from yelp_business_data_pipeline_spark.operators.ppl import (
        fit_bigram_lm,
        perplexity_terciles,
        score_perplexity,
    )
    from yelp_business_data_pipeline_spark.operators.qualityclf import (
        pareto_keep,
        score_quality,
        train_quality_classifier,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = d.count()

    # 1. learned-quality scores (reference slice = en, the DSIR/panel
    # convention); keep by score OR the deterministic Pareto draw
    clf = train_quality_classifier(
        d, F.col("lang") == "en", buckets=1024, n_train=256, epochs=300
    )
    scored = score_quality(d, clf, carry=("source", "lang"))
    kept_ids = scored.filter(
        (F.col("quality_score") > 0.5) | pareto_keep("quality_score", "doc_id")
    ).select("doc_id")
    survivors = d.join(kept_ids, "doc_id", "left_semi")
    n_kept = survivors.count()
    assert 0 < n_kept < n_docs

    # 2. perplexity screen over the survivors: fit the LM on the FULL
    # corpus (the CCNet shape: the LM sees more than the filtered set),
    # drop the tail tercile
    ppl = score_perplexity(survivors, fit_bigram_lm(d), carry=("lang",)).filter(
        F.col("ppl").isNotNull()
    )
    fluent = (
        perplexity_terciles(ppl, by="lang")
        .filter(F.col("bucket_name") != "tail")
        .select("doc_id")
    )
    final = survivors.join(fluent, "doc_id", "left_semi")
    n_final = final.count()
    assert 0 < n_final < n_kept  # the tail tercile is non-empty

    # 3. price the final corpus with the TRAINED tokenizer and pack by
    # real BPE token counts
    tok = train_bpe(d, n_merges=40, n_train=256)
    priced = bpe_token_stats(final, tok, carry=("source",))
    stats = priced.agg(
        F.sum("n_bpe_tokens").alias("bpe"), F.sum("n_ws_tokens").alias("ws")
    ).collect()[0]
    assert stats.bpe > stats.ws > 0  # genuinely subword at 40 merges

    packed = pack_concat_split(
        priced.withColumnRenamed("n_bpe_tokens", "n_tokens"), "n_tokens",
        capacity=256,
    )
    rows = packed.select("source", "start_offset", "n_tokens", "bin_start").collect()
    assert len(rows) == n_final
    by_stream: dict = {}
    for r in sorted(rows, key=lambda r: (r.source, r.start_offset)):
        acc = by_stream.get(r.source, 0)
        assert r.start_offset == acc and r.bin_start == acc // 256
        by_stream[r.source] = acc + r.n_tokens


def test_pipeline_tail_mix_then_shard_export(spark, tmp_path):
    """The r9 tail: screened corpus -> temperature mixing (domain
    re-weighting under a token budget) -> deterministic shard export —
    one lazy chain, with the manifest audit closing the loop: what the
    trainer reads off disk reconciles exactly with what the mixer kept."""
    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.operators.sampling import (
        temperature_sample,
    )
    from yelp_business_data_pipeline_spark.operators.text import token_count
    from yelp_business_data_pipeline_spark.sources.writers import (
        shard_manifest,
        write_training_shards,
    )

    d = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text", "lang", F.col("source").alias("domain"))
        .withColumn("tok", token_count(F.col("text")))
    )
    mixed = temperature_sample(d, "doc_id", "domain", "tok", alpha=0.7, budget=15000)
    n_mixed = mixed.count()
    assert 0 < n_mixed < d.count()

    path = str(tmp_path / "export")
    manifest = write_training_shards(
        mixed, path, "doc_id", n_shards=8, token_col="tok"
    )
    # the written corpus IS the mixed corpus (id-for-id), and the
    # manifest reconciles with a re-derivation from the shard files
    back = spark.read.parquet(f"{path}/shards")
    assert sorted(r.doc_id for r in back.collect()) == sorted(
        r.doc_id for r in mixed.collect()
    )
    rederived = shard_manifest(back.drop("shard"), "doc_id", 8, token_col="tok")
    assert sorted(map(tuple, manifest.collect())) == sorted(
        map(tuple, rederived.collect())
    )
    tot = manifest.agg(F.sum("n_docs")).first()[0]
    assert tot == n_mixed


def test_leakage_split_audit_matches_duckdb_twin(spark, sf_dir):
    """Rotation-queue twin pin (r11): the registered audit panel must
    equal LEAKAGE_SPLIT_ORACLE row-for-row — md5 split draw, prefix
    fingerprint, and the cross-split leakage count all re-derived from
    scratch in DuckDB. Semantics pins: the cluster-keyed regime is
    leakage-free BY CONSTRUCTION (the live invariant the driver
    re-executes), the doc-keyed control on the same corpus leaks, and
    both regimes partition the same doc/token mass."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        LEAKAGE_SPLIT_ORACLE,
    )

    from .oracle_harness import duck_con

    srows = sorted(
        tuple(r) for r in QUERIES["leakage_split_audit"].spark(spark, sf_dir).collect()
    )
    drows = sorted(duck_con(sf_dir).execute(LEAKAGE_SPLIT_ORACLE).fetchall())
    assert srows == drows and len(srows) >= 4
    rows = [dict(zip(("regime", "split", "n_docs", "n_tokens", "leaked_fps"), t)) for t in srows]
    by_regime = {}
    for r in rows:
        by_regime.setdefault(r["regime"], []).append(r)
    assert set(by_regime) == {"by_cluster", "by_doc"}
    assert all(r["leaked_fps"] == 0 for r in by_regime["by_cluster"])
    assert all(r["leaked_fps"] > 0 for r in by_regime["by_doc"])
    for regime, rs in by_regime.items():
        assert {r["split"] for r in rs} <= {"train", "val", "test"}
    # both regimes partition the SAME corpus mass
    mass = {
        regime: (sum(r["n_docs"] for r in rs), sum(r["n_tokens"] for r in rs))
        for regime, rs in by_regime.items()
    }
    assert mass["by_cluster"] == mass["by_doc"]


def test_leakage_split_audit_gated():
    """Promoted into the 50-slot gate by the eighth r11 swap (demoting the
    3-round-stable text_fingerprints_panel)."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import LEAKAGE_SPLIT_ORACLE

    names = list(QUERIES)
    assert names.index("leakage_split_audit") < 50
    assert QUERIES["leakage_split_audit"].oracle == LEAKAGE_SPLIT_ORACLE


def test_alignment_tail_end_to_end(spark, tmp_path):
    """VERDICT r11 item 5 — the alignment-stage tail as ONE composition:
    rule screen -> fuzzy_dedup_clusters -> leakage_safe_splits(entity_id)
    -> preference_pairs -> materialize_epochs -> write_training_shards,
    pinning the two cross-operator contracts the per-op twins can't see:
    (a) no test-split content fingerprint appears in the TRAIN SHARDS ON
    DISK, and (b) the written manifest closes against a from-scratch
    audit of the shard files."""
    from yelp_business_data_pipeline_spark.operators.dedup import fuzzy_dedup_clusters
    from yelp_business_data_pipeline_spark.operators.preference import preference_pairs
    from yelp_business_data_pipeline_spark.operators.sampling import (
        leakage_safe_splits,
        materialize_epochs,
    )
    from yelp_business_data_pipeline_spark.operators.text import (
        c4_doc_flags,
        gopher_quality_flags,
        token_count,
    )
    from yelp_business_data_pipeline_spark.sources.writers import write_training_shards

    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "lang", "text")
    )

    # 1. rule screen (synthetic-corpus calibration per quality_gate_panel;
    # the C4 kept-lines leg is skipped — the synthetic single-line docs
    # have no sentence-terminated lines, so it would zero the corpus)
    g = gopher_quality_flags(F.col("text"), min_words=20, min_stopword_hits=1)
    c4 = c4_doc_flags(F.col("text"), min_kept_lines=1)
    screened = d.filter(g["passes_gopher_quality"] & ~c4["has_lorem_ipsum"])
    n_screened = screened.count()
    assert 0 < n_screened < d.count()  # the gate is live, not a no-op

    # 2. fuzzy dedup -> entity labels (near-dup cluster = leakage unit)
    clustered = fuzzy_dedup_clusters(screened, "doc_id", "text")
    assert clustered.count() == n_screened  # labeling loses no rows

    # 3. cluster-keyed splits: every member of a near-dup cluster lands
    # in the same split BY CONSTRUCTION
    split = leakage_safe_splits(clustered, "entity_id").cache()
    per_entity = split.groupBy("entity_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_entity.filter(F.col("n_splits") > 1).count() == 0

    train = split.filter(F.col("split") == "train")
    test_fps = {
        r.fp for r in split.filter(F.col("split") == "test")
        .select(F.md5("text").alias("fp")).distinct().collect()
    }
    assert test_fps  # the pin below must not pass vacuously

    # 4. preference pairs from the TRAIN split only (reward = lexical
    # diversity, the preference_pairs_panel score)
    toks = F.split(F.col("text"), " ")
    pairs = preference_pairs(
        train.withColumn(
            "score", F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ),
        ["lang"],
        "doc_id",
        "score",
        min_margin=0.05,
    ).collect()
    assert pairs  # live pairs on the train split
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    for p in pairs:  # pairs never reach across the split boundary
        assert p.chosen_id in train_ids and p.rejected_id in train_ids

    # 5. epoch materialization of the train canonicals (dedup applied:
    # only cluster representatives enter the training stream)
    canon = train.filter(F.col("is_canonical"))
    rates = spark.createDataFrame(
        [("en", 2.0), ("de", 1.0), ("fr", 0.5), ("es", 1.5), ("zh", 1.0)],
        "lang string, epochs double",
    )
    stream = materialize_epochs(canon, rates, "lang", "doc_id").withColumn(
        "example_id", F.concat_ws(":", F.col("doc_id"), F.col("epoch_copy"))
    ).withColumn("tok", token_count(F.col("text")))

    # 6. shard export + the two closing pins
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        stream.select("example_id", "doc_id", "lang", "text", "tok"),
        out, "example_id", n_shards=4, token_col="tok",
    )
    mrows = {r.shard: r for r in manifest.collect()}
    assert set(mrows) == {0, 1, 2, 3}

    disk = spark.read.parquet(f"{out}/shards")
    # (a) leakage: no test-split fingerprint among the train shards on disk
    disk_fps = {r.fp for r in disk.select(F.md5("text").alias("fp")).distinct().collect()}
    assert not (disk_fps & test_fps)
    # (b) manifest audit closes: per-shard counts + token mass re-derived
    # from the FILES equal the manifest written at export time
    audit = {
        r.shard: r
        for r in disk.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("n_tokens")
        ).collect()
    }
    for s, m in mrows.items():
        if m.n_docs == 0:
            assert s not in audit
        else:
            assert (audit[s].n_docs, audit[s].n_tokens) == (m.n_docs, m.n_tokens)
    # mass conservation end to end: every materialized example is on disk
    assert sum(m.n_docs for m in mrows.values()) == stream.count()
    split.unpersist()
