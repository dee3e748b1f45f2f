"""Measure stream_tumble / stream_session wall time and per-batch
listener metrics as a function of the stateful shuffle partition count
(spark.sql.shuffle.partitions at stream start = the state store
partition count for a NEW streaming query).

Motivation (guide §2.2/§2.5, VERDICT r13 #2): the r13 bench listener
metrics show addBatch dominating both streaming keys (1.6-1.7 s for a
100k-row micro-batch whose batch-mode twin runs in 0.3 s) and the
no-data timer batch costing 1.6 s — consistent with per-state-partition
fixed costs (store open/commit/iteration), not data volume. This
experiment interleaves partition counts round-robin (BASELINE.md
host-noise protocol) so a drifting host cannot masquerade as a trend.

    python tools/exp_stream_partitions.py [--rounds 3] [--parts 32,8,4,2,1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _StreamProgressCollector, _interval_frac, _proc_stat  # noqa: E402
from journal_batch_processer_spark.cache import release_all  # noqa: E402
from journal_batch_processer_spark.queries import REGISTRY  # noqa: E402
from journal_batch_processer_spark.session import get_spark  # noqa: E402

KEYS = ["stream_tumble", "stream_session"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--parts", default="32,8,4,2,1")
    args = ap.parse_args()
    parts = [int(x) for x in args.parts.split(",")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jbp-exp-stream")
    spark.sparkContext.setLogLevel("ERROR")
    streams = _StreamProgressCollector()
    spark.streams.addListener(streams.make_listener())
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm-up
    base = spark.conf.get("spark.sql.shuffle.partitions")

    results: dict[tuple[str, int], list[float]] = {}
    batch_ms: dict[tuple[str, int], list[list[dict]]] = {}
    for rnd in range(args.rounds):
        for p in parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            for key in KEYS:
                fn = REGISTRY[key].fn
                spark.sparkContext.setJobDescription(f"exp:{key}:p{p}:r{rnd}")
                s0 = _proc_stat()
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                wall = time.perf_counter() - t0
                frac = _interval_frac(s0, _proc_stat())
                release_all()
                results.setdefault((key, p), []).append(round(wall, 3))
                name = (
                    "jbp_stream_tumble_mem"
                    if key == "stream_tumble"
                    else "jbp_stream_session_mem"
                )
                batches = [
                    {
                        "batch": b["batch_id"],
                        "addBatch": b["duration_ms"].get("addBatch"),
                        "trigger": b["duration_ms"].get("triggerExecution"),
                    }
                    for b in streams.by_name.get(name, [])
                ]
                batch_ms.setdefault((key, p), []).append(batches)
                print(
                    f"# r{rnd} {key} p={p}: {wall:.3f}s rows={n} steal={frac} "
                    f"batches={batches}",
                    flush=True,
                )
    spark.conf.set("spark.sql.shuffle.partitions", base)
    for key in KEYS:
        for p in parts:
            w = results[(key, p)]
            print(f"{key} p={p}: min={min(w):.3f} walls={w}", flush=True)


if __name__ == "__main__":
    main()
