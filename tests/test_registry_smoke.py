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


def test_python_datasource_partitions_and_determinism(spark):
    """The custom DataSource must expose all 8 shards and produce the
    exact md5-derived rows (spot-checked against the shared row
    function)."""
    from journal_batch_processer_spark.sources.python_source import (
        N_SHARDS,
        ROWS_PER_SHARD,
        ShardedLogSource,
        row_for,
    )

    try:
        spark.dataSource.register(ShardedLogSource)
    except Exception:
        pass
    df = spark.read.format("jbp_shardlog").load()
    assert df.rdd.getNumPartitions() == N_SHARDS
    assert df.count() == N_SHARDS * ROWS_PER_SHARD
    got = {
        (r["shard"], r["seq"]): (r["level"], r["latency_us"])
        for r in df.filter("seq < 3").collect()
    }
    for shard in range(N_SHARDS):
        for seq in range(3):
            _, _, level, lat = row_for(shard, seq)
            assert got[(shard, seq)] == (level, lat)


def test_variant_extract_typed_values(spark):
    from tests.conftest import SF_DIR

    from journal_batch_processer_spark.queries.relational import (
        q_variant_extract,
    )

    rows = q_variant_extract(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["min_k"] is not None and r["min_k"] <= r["max_k"]


def test_python_datasink_two_phase_commit(spark, tmp_path):
    """Tasks write temp files; only the driver's commit() makes them
    visible (renamed part-* + _SUCCESS manifest with the row total)."""
    import json
    import os

    from journal_batch_processer_spark.sources.python_source import (
        ShardedLogSink,
    )

    try:
        spark.dataSource.register(ShardedLogSink)
    except Exception:
        pass
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.range(100).selectExpr(
        "id AS event_id", "CAST(id % 3 AS STRING) AS event_type", "id AS ts_us"
    )
    df.repartition(3).write.format("jbp_shardsink").option(
        "path", out
    ).mode("append").save()
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert not [f for f in files if f.startswith("_tmp_")]
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == 3
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["n_rows"] == 100
    n = sum(
        1
        for f in parts
        for _ in open(os.path.join(out, f))
    )
    assert n == 100


def test_sink_abort_handles_none_messages(tmp_path):
    """PySpark passes None commit messages for tasks that failed before
    reporting; abort() must skip them and still unlink the real temp
    files (no Spark needed — driver-side protocol unit test)."""
    import os

    from journal_batch_processer_spark.sources.python_source import (
        ShardedLogWriter,
        _LogSinkCommitMessage,
    )

    out = str(tmp_path)
    w = ShardedLogWriter({"path": out})
    tmp = os.path.join(out, "_tmp_0_1.jsonl")
    open(tmp, "w").write("{}\n")
    gone = os.path.join(out, "_tmp_9_9.jsonl")  # never created
    w.abort([None, _LogSinkCommitMessage(tmp, 1), _LogSinkCommitMessage(gone, 0)])
    assert not os.path.exists(tmp)


def test_sink_requires_path_option():
    import pytest as _pytest

    from journal_batch_processer_spark.sources.python_source import (
        ShardedLogWriter,
    )

    with _pytest.raises(ValueError, match="path"):
        ShardedLogWriter({})


def test_no_unformatted_placeholders_in_oracles():
    """Every oracle_sql() string must be final SQL — a `{name}`
    placeholder that was meant for str.format survives module load
    silently and only explodes in the driver's DuckDB parse (the r08
    regression: 12 dedup-family oracles shipped with a raw `{source}`
    after a half-applied template refactor)."""
    import re

    # repo root is on sys.path via tests/conftest.py
    import __spark_entry__ as entry

    pat = re.compile(r"\{[A-Za-z_][A-Za-z0-9_]*\}")
    hits = {k: pat.findall(v) for k, v in entry.oracle_sql().items() if pat.search(v)}
    assert not hits, f"unformatted placeholders in oracle SQL: {hits}"


def test_oracle_precompute_variants_match_selfcontained():
    """The check_oracle sweep accelerator runs `_CC` oracle variants
    against a materialized `_cc_fixpoint` temp table; the driver runs
    the self-contained strings. Both forms must return the identical
    multiset or local sweeps stop predicting driver verdicts."""
    import duckdb

    from journal_batch_processer_spark.queries.llmops import (
        ORACLE_PRECOMPUTE,
        SQL_DEDUP_CLUSTER,
        SQL_DEDUP_EDITDIST,
        SQL_DEDUP_NEAR,
        SQL_DEDUP_NGRAM_CAPPED,
        SQL_DEDUP_NGRAM_T50,
        SQL_SPLIT_LEAKAGE_SAFE,
    )

    selfcontained = {
        "dedup_cluster": SQL_DEDUP_CLUSTER,
        "dedup_editdist": SQL_DEDUP_EDITDIST,
        "dedup_near": SQL_DEDUP_NEAR,
        "dedup_ngram_prefix": SQL_DEDUP_NGRAM_T50,
        "dedup_ngram_capped": SQL_DEDUP_NGRAM_CAPPED,
        "split_leakage_safe": SQL_SPLIT_LEAKAGE_SAFE,
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for tbl, info in ORACLE_PRECOMPUTE.items():
        # execute exactly as tools/check_oracle.py:356 does — either
        # the ordered "stmts" list or the single-"sql" form
        for s in info.get("stmts") or [
            f"CREATE TEMP TABLE {tbl} AS {info['sql']}"
        ]:
            con.execute(s)
        for key, variant_sql in info["keys"].items():
            a = sorted(con.sql(selfcontained[key]).fetchall())
            b = sorted(con.sql(variant_sql).fetchall())
            assert a == b, f"{key}: variant diverges from self-contained"
            assert len(a) > 0


def test_cogroup_survives_projection(spark):
    """Regression for the PySpark 4.1.2 self-cogroup pruning bug: with
    both cogroup children derived from one scan, plan deduplication
    bound the Python function's right-side arguments to the left
    side's expression ids, so a downstream column-subset projection
    pruned the right child to its keys and the function saw a
    COLUMN-LESS right frame (spend silently 0.0 for every row, while
    collect() of the full output was correct). The fresh right-side
    aliases in q_cogroup_conversion block the rebinding; this pins
    projection-vs-collect agreement so a regression cannot hide
    behind the full-row oracle sweep."""
    from journal_batch_processer_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    sdf = REGISTRY["cogroup_conversion"].fn(spark, SF_DIR)
    full = sum(r.spend for r in sdf.collect())
    projected = sdf.selectExpr("sum(spend) AS s").collect()[0].s
    assert full > 0
    assert abs(full - projected) < 1e-6
