"""Whole-registry smoke: every queries() entry executes at sf0.001.

The DuckDB oracle sweep (tools/check_oracle.py, driver CORRECTNESS)
is the value gate; this test is the fast structural gate — every
registered query must build a plan, execute, and return a stable
schema on the smallest fixture, so an import error, a schema typo, or
an operator broken by refactoring fails `pytest` directly without
needing the oracle harness.
"""

from __future__ import annotations

import os

SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")


def test_every_registry_query_runs(spark):
    from journal_batch_processer_spark.queries import REGISTRY

    failures = []
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, SF_SMOKE)
            n = df.count()
            assert n >= 0
            assert df.columns, f"{name}: empty schema"
        except Exception as exc:  # noqa: BLE001 - collect all failures
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
    assert not failures, "\n".join(failures)
