"""Physical-plan audit for the headline queries.

Prints ``explain("formatted")`` per query and flags scale smells:
- CartesianProduct / BroadcastNestedLoopJoin where an equi join was
  expected (range joins legitimately use BNLJ with a broadcast side)
- parquet scans without column pruning (ReadSchema listing everything)
- missing WholeStageCodegen spans
- SortMergeJoin where a broadcast was intended

    python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")

# quick 9-key spine for `--quick`; the no-arg default audits the
# WHOLE registry (the r10 lesson: a 9-key silent default read as a
# full audit)
QUICK = [
    "pipeline_chain",
    "group_agg",
    "enrich_fetch",
    "join_asof",
    "join_range",
    "window_rank",
    "dedup_ngram",
    "sim_search",
    "desc_extract",
]


def main() -> None:
    from journal_batch_processer_spark.queries import REGISTRY
    from journal_batch_processer_spark.session import get_spark

    spark = get_spark("explain-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    args = [a for a in sys.argv[1:] if a != "-v"]
    if args == ["--quick"]:
        names = QUICK
    else:
        names = args or sorted(REGISTRY)
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan and name not in (
            "join_range",
            "sim_search",  # broadcast(queries) × corpus is the intended plan
        ):
            flags.append("BNLJ")
        # NOTE: under AQE the pre-execution formatted plan shows no
        # WholeStageCodegen spans — don't flag it; check pushdown instead.
        if "PushedFilters: []" in plan and "Filter" in plan:
            flags.append("NO-PUSHDOWN")
        # Unbounded-following frames are evaluated by re-scanning to
        # the partition end per row — O(n^2) per partition (545fa8c:
        # year_impute_window never finished at 100x). Rewrite as a
        # reverse-ordered running frame instead.
        if "UNBOUNDED FOLLOWING" in plan.upper():
            flags.append("UNBOUNDED-FOLLOWING-FRAME")
        n_smj = plan.count("SortMergeJoin")
        n_bhj = plan.count("BroadcastHashJoin")
        n_shuffle = plan.count("Exchange (")
        n_scans = plan.count("Scan parquet")
        print(f"===== {name}: shuffles={n_shuffle} SMJ={n_smj} BHJ={n_bhj} "
              f"scans={n_scans} flags={','.join(flags) or 'none'}")
        if "-v" in sys.argv or flags:
            print(plan)


if __name__ == "__main__":
    main()
