#!/usr/bin/env python
"""Shared-scan regime under REMOTE-SPEED reads (VERDICT r10 item 3).

The `pretrain_screen(shared_scan=True)` claim is "one corpus scan
instead of three"; on warm NVMe the three scans are nearly free, so the
r10 plan-pin (exactly one `Scan parquet` node) proved the SHAPE but not
the WIN. This probe makes corpus reads actually slow, the way an object
store is, WITHOUT slowing anything else:

- the corpus parquet lives on a dedicated loop-device filesystem whose
  READS are throttled to 50 MB/s via cgroup-v1
  `blkio.throttle.read_bps_device` (only device 7:0 is throttled —
  Spark local dirs, shuffle, jars on the root disk run at full speed);
- a background thread drops the PAGE CACHE every 2 s during timed runs,
  so every corpus scan pays the throttle instead of re-reading leg 1's
  pages from memory (Spark's OWN cache is JVM heap — anonymous memory —
  which drop_caches never touches: exactly the "remote input +
  executor-memory cache" regime the flag exists for);
- the corpus text is INCOMPRESSIBLE hex tokens (30 x md5 per doc,
  ~1 KB/doc): scan cost is real bytes while leg compute stays bounded,
  so the scan term is visible above the model-leg noise.

Rows:
- scan_throttled_s: one (id, text, lang) pass under dropper+throttle —
  the per-scan term;
- unfused_s: pretrain_screen default — THREE throttled scans;
- fused_s:   shared_corpus(MEMORY_AND_DISK) + shared_scan=True — ONE
  throttled scan, legs read the heap cache.

Run as root. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOUNT = os.environ.get("SHARED_SCAN_MOUNT", "/mnt/slowfs")
IMG = os.environ.get("SHARED_SCAN_IMG", "/tmp/loopfs.img")
LOOP = os.environ.get("SHARED_SCAN_LOOP", "/dev/loop0")
CORPUS = os.path.join(MOUNT, "shared_scan_corpus.parquet")
N_DOCS = int(os.environ.get("SHARED_SCAN_DOCS", "2000000"))
THROTTLE_BPS = int(os.environ.get("SHARED_SCAN_BPS", str(50 * 1024 * 1024)))
CG = "/sys/fs/cgroup/blkio/shared_scan_probe"
REPEATS = int(os.environ.get("SHARED_SCAN_REPEATS", "2"))


def _sh(cmd: list[str]) -> None:
    subprocess.run(cmd, check=True, capture_output=True)


def setup_slow_device() -> None:
    """Loop-device fs for the corpus + read throttle on it (7:0)."""
    if not os.path.ismount(MOUNT):
        if not os.path.exists(IMG):
            _sh(["dd", "if=/dev/zero", f"of={IMG}", "bs=1M", "count=1",
                 "seek=8191", "status=none"])
        try:
            _sh(["losetup", LOOP, IMG])
        except subprocess.CalledProcessError:
            pass  # already attached
        try:
            _sh(["mkfs.ext4", "-q", "-F", LOOP])
        except subprocess.CalledProcessError:
            pass  # already has a filesystem (reuse)
        os.makedirs(MOUNT, exist_ok=True)
        _sh(["mount", LOOP, MOUNT])
    st = os.stat(LOOP)
    dev = f"{os.major(st.st_rdev)}:{os.minor(st.st_rdev)}"
    os.makedirs(CG, exist_ok=True)
    with open(os.path.join(CG, "blkio.throttle.read_bps_device"), "w") as fh:
        fh.write(f"{dev} {THROTTLE_BPS}")
    with open(os.path.join(CG, "cgroup.procs"), "w") as fh:
        fh.write(str(os.getpid()))


class CacheDropper:
    """Drops the page cache every ``period`` seconds while active, so a
    throttled device cannot be re-read from memory. Page cache only
    (``echo 1``) — dentries/inodes stay, JVM anon memory is untouched."""

    def __init__(self, period: float = 2.0):
        self.period = period
        self._stop = threading.Event()
        self._t: threading.Thread | None = None

    def __enter__(self):
        def loop():
            while not self._stop.is_set():
                subprocess.run(["sync"], check=False)
                try:
                    with open("/proc/sys/vm/drop_caches", "w") as fh:
                        fh.write("1")
                except OSError:
                    pass
                self._stop.wait(self.period)

        self._stop.clear()
        self._t = threading.Thread(target=loop, daemon=True)
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def main() -> None:
    try:
        setup_slow_device()
    except (PermissionError, OSError, subprocess.CalledProcessError) as e:
        raise SystemExit(f"needs root for loop device + cgroup blkio: {e}")

    from pyspark.sql import functions as F

    from yelp_business_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench-shared-scan",
        extra_conf={"spark.driver.memory": "24g"},
    )

    if not os.path.isdir(CORPUS):
        (
            spark.range(0, N_DOCS)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.md5((F.col("id") * 131 + i).cast("string"))
                        for i in range(30)
                    ],
                ).alias("text"),
                F.when(F.col("id") % 5 == 0, "de").otherwise("en").alias("lang"),
            )
            .write.mode("overwrite")
            .parquet(CORPUS)
        )
    du = sum(
        os.path.getsize(os.path.join(CORPUS, f))
        for f in os.listdir(CORPUS)
        if f.endswith(".parquet")
    )

    from yelp_business_data_pipeline_spark.operators.ppl import (
        fit_bigram_lm,
        perplexity_thresholds,
        score_perplexity,
    )
    from yelp_business_data_pipeline_spark.operators.qualityclf import (
        train_quality_classifier,
    )
    from yelp_business_data_pipeline_spark.operators.screen import (
        pretrain_screen,
        shared_corpus,
    )

    # frozen models fit on the driver's sf0.1 documents (deploy-time
    # cost, excluded); persist so timed runs never re-read testdata
    ref = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").persist()
    ref.count()
    model = train_quality_classifier(
        ref, F.col("lang") == "en", buckets=4096, n_train=512
    )
    lm = fit_bigram_lm(ref)
    cuts = perplexity_thresholds(
        score_perplexity(ref, lm, carry=("lang",)).filter(F.col("ppl").isNotNull())
    ).persist()
    cuts.count()
    lm = tuple(t.persist() for t in lm)
    [t.count() for t in lm]
    kw = dict(
        carry=("lang",), by="lang", ppl_cuts=cuts,
        min_words=20, min_stopword_hits=1, min_kept_lines=0,
    )

    def timed(fn) -> float:
        spark.catalog.clearCache()
        # synchronous full drop BEFORE the timer: the periodic dropper
        # guards re-reads DURING the run, but the first scan must not
        # ride pages left warm by the previous run/corpus write
        subprocess.run(["sync"], check=False)
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3")
        with CacheDropper():
            t0 = time.perf_counter()
            fn()
            return round(time.perf_counter() - t0, 2)

    def scan_only() -> None:
        (
            spark.read.parquet(CORPUS)
            .select("doc_id", "text", "lang")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def unfused() -> None:
        d = spark.read.parquet(CORPUS)
        v = pretrain_screen(d, model, lm, **kw)
        v.groupBy("lang").agg(F.sum(F.col("keep").cast("long"))).collect()

    def fused() -> None:
        d = shared_corpus(
            spark.read.parquet(CORPUS), carry=("lang",),
            storage_level="MEMORY_AND_DISK",
        )
        try:
            v = pretrain_screen(d, model, lm, shared_scan=True, **kw)
            v.groupBy("lang").agg(F.sum(F.col("keep").cast("long"))).collect()
        finally:
            d.unpersist()

    out = {
        "metric": "shared_scan_throttled_ab",
        "corpus_bytes": du,
        "n_docs": N_DOCS,
        "throttle_bps": THROTTLE_BPS,
        "scan_throttled_s": timed(scan_only),
        "unfused_s": [],
        "fused_s": [],
    }
    for _ in range(REPEATS):
        out["unfused_s"].append(timed(unfused))
        out["fused_s"].append(timed(fused))
    out["unfused_median_s"] = round(statistics.median(out["unfused_s"]), 2)
    out["fused_median_s"] = round(statistics.median(out["fused_s"]), 2)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
