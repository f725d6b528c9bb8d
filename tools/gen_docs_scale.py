#!/usr/bin/env python
"""Document-corpus scaling probe data (r13, VERDICT r12 item 8).

`.scaledata/sf1` scales the FACT tables 10x (lineitem 6M rows) but the
documents table only reaches 50k rows in ONE parquet file — a single
scan split, so every document-family query runs its scan/kernel stage
at parallelism 1 regardless of core count, and an 8-vs-32-core probe
measures job floors, not parallel structure. This generator fixes the
measurement: a documents corpus at ``mult`` x the sf1 recipe (default
10x = 500k docs) written as ``n_files`` part files (default 32) under
``.scaledata/docs<mult>/documents.parquet/`` (a directory — Spark reads
it transparently), with every other sf1 table hard-linked alongside so
the full query registry still resolves.

Same word-salad recipe and multi-line discipline as
tools/gen_scaledata.py, chunked per part file so memory stays bounded;
deterministic (PCG64 child seed per part, no wall clock).

Usage: python tools/gen_docs_scale.py [mult] [n_files]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gen_scaledata import LANGS, SOURCES, VOCAB  # same distributions

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: gen_scaledata's 24-word vocabulary is fine for token statistics but
#: DEGENERATE for the LSH/screen families at 500k docs: the 3-shingle
#:  space is 24^3 ≈ 14k, so MinHash bands collide pathologically (6.9M
#: candidate pairs measured — quadratic verify work no real corpus
#: produces), and zero stopwords means the Gopher screen rejects every
#: document (alignment_tail measured its empty-input floor). The probe
#: vocabulary is therefore widened to 24 x 50 suffixed variants (~1.2k
#: words, shingle space ~10^9) with English stopwords mixed in at ~15%
#: so screens, lang-id and LSH all exercise their real code paths.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
PROBE_VOCAB = [f"{w}{i}" for w in VOCAB for i in range(50)] + STOPWORDS * 25


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    base = os.path.join(REPO, ".scaledata")
    sf1 = os.path.join(base, "sf1")
    if not os.path.isdir(sf1):
        raise SystemExit("run tools/gen_scaledata.py first (needs .scaledata/sf1)")
    out = os.path.join(base, f"docs{mult}")
    doc_dir = os.path.join(out, "documents.parquet")
    os.makedirs(doc_dir, exist_ok=True)

    n_total = 50_000 * mult
    words = np.array(PROBE_VOCAB)
    per_file = (n_total + n_files - 1) // n_files
    next_id = 0
    for f_idx in range(n_files):
        n_d = min(per_file, n_total - next_id)
        if n_d <= 0:
            break
        rng = np.random.Generator(np.random.PCG64([43, mult, f_idx]))
        lens = rng.integers(12, 40, n_d)
        picks = rng.integers(0, len(words), int(lens.sum()))
        texts, pos = [], 0
        for i, ln in enumerate(lens):
            toks = list(words[picks[pos : pos + ln]])
            pos += ln
            if (next_id + i) % 3 == 0:
                chunks = [toks[j : j + 7] for j in range(0, len(toks), 7)]
                texts.append(
                    "\n".join(
                        " ".join(c) + ("." if k % 3 < 2 else "")
                        for k, c in enumerate(chunks)
                    )
                )
            else:
                texts.append(" ".join(toks))
        pq.write_table(
            pa.table(
                {
                    "doc_id": np.arange(next_id, next_id + n_d, dtype=np.int64),
                    "text": texts,
                    "lang": np.array(LANGS)[rng.integers(0, 5, n_d)],
                    "source": np.array(SOURCES)[rng.integers(0, 20, n_d)],
                    "n_chars": np.array([len(t) for t in texts], np.int64),
                }
            ),
            os.path.join(doc_dir, f"part-{f_idx:05d}.parquet"),
        )
        next_id += n_d
    for name in os.listdir(sf1):
        if name == "documents.parquet":
            continue
        dst = os.path.join(out, name)
        if not os.path.exists(dst):
            os.link(os.path.join(sf1, name), dst)
    print(f"{out}: {next_id} docs in {n_files} files + sf1 tables linked")


if __name__ == "__main__":
    main()
