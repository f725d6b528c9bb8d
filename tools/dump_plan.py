#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named queries to files.

Usage: python tools/dump_plan.py --out plans/r13 --suffix _before [--sf DIR] q [q ...]

Writes ``<out>/<query><suffix>.txt`` per query. Builders that collect
internally (alignment_tail_panel & co.) run their jobs during
construction; the dumped plan is the plan of the RETURNED frame, same
convention as the committed r12 dumps.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_business_data_pipeline_spark.plans import QUERIES
from yelp_business_data_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    out_dir, suffix = "plans/r13", ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plan")
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{path}: {len(txt)} chars", file=sys.stderr)


if __name__ == "__main__":
    main()
