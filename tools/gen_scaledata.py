#!/usr/bin/env python
"""Deterministic scale-probe data generator (VERDICT r4 item 1).

/root/testdata tops out at sf0.1 and is read-only, so the sf1 scale
probe generates its OWN data — same schemas, same distribution shapes
(sequential keys, uniform dims, 64-dim float embeddings, word-salad
documents) — at BOTH sf0.1 and sf1 under .scaledata/ (gitignored).
Growth ratios are then measured within this generator's data, so the
probe isolates scaling behavior instead of confounding it with
generator drift vs the driver's testdata.

All ten tables are generated (events ts spans 2024 with the same
timestamp shape; part/supplier follow the testdata naming patterns),
so the FULL oracle pack can also be parity-checked at sf1 — the
round-5 `tools/check_oracles_sf1.py` run.

numpy PCG64 with a per-table child seed ([42, table_idx]) so each
table's stream is independent of the others — adding or reordering
tables can never perturb existing ones; no wall-clock anywhere —
byte-identical reruns.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
LANGS = ["en", "de", "fr", "es", "zh"]
SOURCES = [f"src{i}" for i in range(20)]  # testdata naming: srcN
VOCAB = (
    "spark line column order small sort fast value scan query agg table hash "
    "join part batch vector shuffle plan filter merge group window stream"
).split()

DAY_US = 86_400_000_000  # microseconds


def _ts_days(rng, n, start_day, span_days):
    days = start_day + rng.integers(0, span_days, n)
    return (days * DAY_US).astype("datetime64[us]")


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rngs = iter(np.random.default_rng([42, i]) for i in range(10))

    def _next_rng():
        return next(rngs)
    n_c = int(150_000 * sf)
    n_o = int(1_500_000 * sf)
    n_l = int(6_000_000 * sf)
    n_p = int(200_000 * sf)
    n_e = int(20_000 * sf)
    n_d = int(50_000 * sf)

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
        f"{out_dir}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        f"{out_dir}/nation.parquet",
    )

    rng = _next_rng()
    ck = np.arange(n_c, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": ck,
                "c_name": [f"Customer#{i:09d}" for i in range(n_c)],
                "c_nationkey": rng.integers(0, 25, n_c).astype(np.int32),
                "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_c), 2),
                "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_c)],
            }
        ),
        f"{out_dir}/customer.parquet",
    )

    rng = _next_rng()
    # ~epoch day 9131 = 1995-01-01, 7-year span (the testdata date shape)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(n_o, dtype=np.int64),
                "o_custkey": rng.integers(0, n_c, n_o).astype(np.int64),
                "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_o)],
                "o_totalprice": np.round(rng.uniform(1000.0, 450000.0, n_o), 2),
                "o_orderdate": _ts_days(rng, n_o, 9131, 2557),
                "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_o)],
            }
        ),
        f"{out_dir}/orders.parquet",
    )

    rng = _next_rng()
    pq.write_table(
        pa.table(
            {
                "l_orderkey": rng.integers(0, n_o, n_l).astype(np.int64),
                "l_partkey": rng.integers(0, n_p, n_l).astype(np.int64),
                "l_suppkey": rng.integers(0, max(1, int(10_000 * sf)), n_l).astype(np.int64),
                "l_linenumber": rng.integers(1, 8, n_l).astype(np.int32),
                "l_quantity": rng.integers(1, 51, n_l).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_l), 2),
                "l_discount": np.round(rng.uniform(0.0, 0.1, n_l), 2),
                "l_tax": np.round(rng.uniform(0.0, 0.08, n_l), 2),
                "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_l)],
                "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_l)],
                "l_shipdate": _ts_days(rng, n_l, 9131, 2557),
            }
        ),
        f"{out_dir}/lineitem.parquet",
    )

    rng = _next_rng()
    emb = rng.normal(0.0, 1.0, (n_e, 64)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(n_e, dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.ravel(), pa.float32()), 64
                ).cast(pa.list_(pa.float32())),
                "label": rng.integers(0, 10, n_e).astype(np.int32),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    rng = _next_rng()
    pq.write_table(
        pa.table(
            {
                "s_suppkey": np.arange(max(1, int(10_000 * sf)), dtype=np.int64),
                "s_name": [f"Supplier#{i:09d}" for i in range(max(1, int(10_000 * sf)))],
                "s_nationkey": rng.integers(0, 25, max(1, int(10_000 * sf))).astype(np.int32),
                "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, max(1, int(10_000 * sf))), 2),
            }
        ),
        f"{out_dir}/supplier.parquet",
    )

    rng = _next_rng()
    adjs = np.array(["large", "hot", "small", "cold", "smooth", "rough"])
    nouns = np.array(["ring", "bolt", "nut", "cog", "pin", "washer"])
    sizes = rng.integers(0, 6, (n_p, 2))
    pq.write_table(
        pa.table(
            {
                "p_partkey": np.arange(n_p, dtype=np.int64),
                "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in sizes],
                "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_p)],
                "p_type": np.array(["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"])[
                    rng.integers(0, 5, n_p)
                ],
                "p_size": rng.integers(1, 51, n_p).astype(np.int32),
                "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_p), 2),
            }
        ),
        f"{out_dir}/part.parquet",
    )

    rng = _next_rng()
    n_ev = int(1_000_000 * sf)
    # 2024 timestamps at microsecond grain over a 30-DAY span (the
    # testdata shape: sf0.1 events cover 2024-01-01..01-30), sorted
    ev_us = np.sort(rng.integers(0, 30 * DAY_US, n_ev)) + np.int64(19723) * DAY_US
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(n_ev, dtype=np.int64),
                "ts": ev_us.astype("datetime64[us]"),
                "user_id": rng.integers(0, max(1, int(n_ev / 66.7)), n_ev).astype(np.int64),
                "event_type": np.array(
                    ["view", "click", "signup", "purchase", "error"]
                )[rng.integers(0, 5, n_ev)],
                "value": np.round(rng.uniform(0.0, 500.0, n_ev), 2),
                "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
            }
        ),
        f"{out_dir}/events.parquet",
    )

    rng = _next_rng()
    words = np.array(VOCAB)
    lens = rng.integers(12, 40, n_d)
    picks = rng.integers(0, len(words), int(lens.sum()))
    texts, pos = [], 0
    for i, ln in enumerate(lens):
        toks = list(words[picks[pos : pos + ln]])
        pos += ln
        if i % 3 == 0:
            # multi-line docs (round 8, VERDICT r7 item 4): every third
            # doc becomes newline-separated "lines" of 7 words, two of
            # every three ending in terminal punctuation — the C4 line
            # filter gets real lines to keep/drop at the sf1 probe scale.
            # Deterministic by construction (index-derived, no RNG draw),
            # so the other seven tables' streams are untouched.
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
                "doc_id": np.arange(n_d, dtype=np.int64),
                "text": texts,
                "lang": np.array(LANGS)[rng.integers(0, 5, n_d)],
                "source": np.array(SOURCES)[rng.integers(0, 20, n_d)],
                "n_chars": np.array([len(t) for t in texts], np.int64),
            }
        ),
        f"{out_dir}/documents.parquet",
    )


if __name__ == "__main__":
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata")
    for sf in [float(a) for a in sys.argv[1:]] or [0.1, 1.0]:
        d = os.path.join(base, f"sf{sf:g}")
        print("generating", d, flush=True)
        generate(sf, d)
    print("done")
