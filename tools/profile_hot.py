#!/usr/bin/env python
"""Ad-hoc profiler for the hot bench queries (round-6 perf work).

Usage: python tools/profile_hot.py [query ...]  (default: the hot set)
Prints median-of-3 per query, same harness shape as bench.py.
"""
from __future__ import annotations

import statistics
import sys
import time

from yelp_business_data_pipeline_spark.plans import QUERIES
from yelp_business_data_pipeline_spark.session import get_spark

HOT = [
    "bfs_distances_binary_tree",
    "k_core_cooccurrence_graph",
    "pq_ann_topk",
    "pagerank_friend_graph",
    "connected_components_friend_graph",
    "ivf_ann_topk",
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:] or HOT
    spark = get_spark(app_name="profile_hot")

    def run(name: str) -> None:
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run("topk_orders_per_segment")
    run("ann_cosine_topk_arrow")
    for name in names:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(name)
            samples.append(time.perf_counter() - t0)
        print(f"{statistics.median(samples):7.2f}s  {name}  {[round(s,2) for s in samples]}")


if __name__ == "__main__":
    main()
