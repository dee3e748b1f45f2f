#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {"q_name": sec, ...}, "sf": 0.1}

Each query is timed as a full action (count of the result), after a
shared warm-up that loads the session and JIT paths. Per-query wall
time includes plan + execution — what a user actually waits for.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from journal_batch_processer_spark.queries import REGISTRY  # noqa: E402
from journal_batch_processer_spark.session import get_spark  # noqa: E402

# Headline set: the reference's pipeline spine + each operator family's
# heaviest representative.
BENCH_QUERIES = [
    "pipeline_chain",    # format→split end-to-end (regex+sort+impute)
    "desc_extract",      # regex dispatch alone
    "year_impute",       # applyInPandas sequential per group
    "group_agg",         # TPC-H Q1 shape
    "window_rank",       # partitioned window
    "join_asof",         # union-window as-of join
    "enrich_fetch",      # update-stage enrichment join
    "dedup_ngram_prefix",  # PPJoin prefix-filtered exact Jaccard
    "dedup_minhash",     # LSH banding
    "sim_search",        # brute-force cosine top-k
    "text_quality",      # text scoring
    "window_tumble",     # time-window aggregation
    "text_pii_scrub",    # regex redaction battery
    "dedup_cluster",     # iterative connected components
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("jbp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Two timed runs per query, report the min: the host is a shared
    # microVM with episodic CPU-steal stalls, and min-over-repeats is
    # the standard estimator of true cost absent interference.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
