#!/usr/bin/env python
"""Deterministic scale-probe data generator (VERDICT r4 item 1).

/root/testdata tops out at sf0.1 and is read-only, so the sf1 scale
probe generates its OWN data — same schemas, same distribution shapes
(sequential keys, uniform dims, 64-dim float embeddings, word-salad
documents) — at BOTH sf0.1 and sf1 under .scaledata/ (gitignored).
Growth ratios are then measured within this generator's data, so the
probe isolates scaling behavior instead of confounding it with
generator drift vs the driver's testdata.

Only the tables the probe queries read are generated (region nation
customer orders lineitem documents embeddings — no events/part/
supplier consumers in the probe list).

numpy PCG64 seed 42; no wall-clock anywhere — byte-identical reruns.
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
SOURCES = ["web", "wiki", "code", "forum"]
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
    rng = np.random.default_rng(42)
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

    words = np.array(VOCAB)
    lens = rng.integers(12, 40, n_d)
    picks = rng.integers(0, len(words), int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(words[picks[pos : pos + ln]]))
        pos += ln
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(n_d, dtype=np.int64),
                "text": texts,
                "lang": np.array(LANGS)[rng.integers(0, 5, n_d)],
                "source": np.array(SOURCES)[rng.integers(0, 4, n_d)],
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
