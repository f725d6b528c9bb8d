#!/usr/bin/env python
"""Same-container A/B for pretrain_screen_panel's bench cost (VERDICT r11
item 1: the panel moved 3.08 s -> 11.69 s between the r10 and r11 driver
benches — attribute the swing to shared_scan and/or the in-panel model
training, then fix the registered default).

The r10 driver bench (3.08 s) ran the panel rooted at the RAW parquet
scan; the r11 bench (11.69 s) ran it rooted at a persisted shared_corpus
projection (commit cd26535). So the A/B axes are root (persist vs raw)
x training (in-panel vs frozen):

  A  registered (r11 form)   persist root, classifier + LM trained in-panel
  B  r10 form                raw root (no persist anywhere), trained in-panel
  C  frozen models, persist  persist root, models trained ONCE outside timing
  D  frozen models, raw      raw root, models trained ONCE outside timing
  E  frozen + frozen cuts    raw root, models AND ppl_cuts precomputed

A - B isolates the persist term under training; C - D under frozen
models; A - C / B - D isolate the training term. E is the streaming /
crawl-batch regime. Run SOLO (nothing else on the container) — the
numbers go into BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from yelp_business_data_pipeline_spark.operators.ppl import fit_bigram_lm  # noqa: E402
from yelp_business_data_pipeline_spark.operators.qualityclf import (  # noqa: E402
    train_quality_classifier,
)
from yelp_business_data_pipeline_spark.operators.screen import (  # noqa: E402
    pretrain_screen,
    shared_corpus,
)
from yelp_business_data_pipeline_spark.plans.registry import tbl  # noqa: E402
from yelp_business_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("AB_RUNS", "3"))
PANEL_KW = dict(min_words=20, min_stopword_hits=1, min_kept_lines=1)


def agg_collect(v):
    return (
        v.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("rules_ok").cast("long")).alias("n_pass_rules"),
            F.sum(F.col("clf_ok").cast("long")).alias("n_pass_clf"),
            F.sum(F.col("ppl_ok").cast("long")).alias("n_pass_ppl"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .collect()
    )


def run_training_variant(spark, persist_root: bool):
    if persist_root:  # the registered r11 form
        d = shared_corpus(tbl(spark, SF_DIR, "documents"), carry=("lang",))
    else:  # the r10 form: every leg re-reads the raw scan
        d = tbl(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    model = train_quality_classifier(d, F.col("lang") == "en", buckets=4096, n_train=512)
    v = pretrain_screen(
        d, model, fit_bigram_lm(d), carry=("lang",), shared_scan=persist_root, **PANEL_KW
    )
    rows = agg_collect(v)
    if persist_root:
        d.unpersist()
    return rows


def main() -> None:
    spark = get_spark()
    docs = tbl(spark, SF_DIR, "documents")

    # frozen inputs, built once OUTSIDE every timed region
    d0 = shared_corpus(docs, carry=("lang",))
    frozen_model = train_quality_classifier(d0, F.col("lang") == "en", buckets=4096, n_train=512)
    frozen_lm = tuple(t.cache() for t in fit_bigram_lm(d0))
    for t in frozen_lm:
        t.count()
    v0 = pretrain_screen(d0, frozen_model, frozen_lm, carry=("lang",), shared_scan=True, **PANEL_KW)
    cuts = (
        v0.select("lang", "ppl")
        .groupBy("lang")
        .agg(
            F.percentile_approx("ppl", 1 / 3, 100_000).alias("ppl_cut_1"),
            F.percentile_approx("ppl", 2 / 3, 100_000).alias("ppl_cut_2"),
        )
        .cache()
    )
    cuts.count()
    d0.unpersist()

    def frozen(persist_root: bool, use_cuts: bool):
        if persist_root:
            d = shared_corpus(tbl(spark, SF_DIR, "documents"), carry=("lang",))
        else:
            d = tbl(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
        v = pretrain_screen(
            d,
            frozen_model,
            frozen_lm,
            carry=("lang",),
            shared_scan=persist_root,
            ppl_cuts=cuts if use_cuts else None,
            **PANEL_KW,
        )
        rows = agg_collect(v)
        if persist_root:
            d.unpersist()
        return rows

    variants = {
        "A_persist_root_training": lambda: run_training_variant(spark, True),
        "B_raw_root_training": lambda: run_training_variant(spark, False),
        "C_persist_root_frozen": lambda: frozen(True, False),
        "D_raw_root_frozen": lambda: frozen(False, False),
        "E_raw_root_frozen_cuts": lambda: frozen(False, True),
    }

    baseline_rows = None
    for name, fn in variants.items():
        times = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            rows = fn()
            times.append(time.perf_counter() - t0)
        key = sorted((r.lang, r.n_docs, r.n_pass_rules, r.n_pass_clf, r.n_keep) for r in rows)
        if baseline_rows is None:
            baseline_rows = key
        # A-D must agree exactly (E's frozen cuts may legitimately differ)
        agree = key == baseline_rows
        print(
            f"{name}: min {min(times):.2f}s  runs {[round(t, 2) for t in times]}  "
            f"rows-match-A {agree}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
