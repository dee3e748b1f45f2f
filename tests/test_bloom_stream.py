"""join_bloom (bloom-filter semi-join reduction) and stream_stats
(unwindowed keyed streaming aggregate)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _li(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def test_bloom_join_equals_plain_join(spark):
    """The bloom is reduction-only: false positives die in the exact
    join, false negatives are impossible — results must be identical
    to the plain equi join."""
    from journal_batch_processer_spark.operators.joins import (
        bloom_filtered_join,
    )

    li = _li(spark).select("l_orderkey", "l_linenumber", "l_quantity")
    urgent = (
        _orders(spark)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice")
    )
    got = {
        tuple(r)
        for r in bloom_filtered_join(
            li, urgent, "l_orderkey", "o_orderkey"
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
        .collect()
    }
    want = {
        tuple(r)
        for r in li.join(
            urgent, li.l_orderkey == urgent.o_orderkey
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
        .collect()
    }
    assert got == want
    assert len(want) > 0


def test_bloom_join_plan_broadcasts_bit_table(spark):
    """The two semi-joins against the position table must be broadcast
    (never a shuffle of the probe side before the exact join)."""
    from journal_batch_processer_spark.operators.joins import (
        bloom_filtered_join,
    )

    li = _li(spark).select("l_orderkey", "l_linenumber")
    urgent = _orders(spark).filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    plan = (
        bloom_filtered_join(li, urgent, "l_orderkey", "o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in plan


def test_bloom_join_tiny_bit_space_still_exact(spark):
    """n_bits=16 makes nearly every probe row a false positive — the
    exact join must still produce the exact result (degenerate bloom
    degrades to no reduction, never to wrong answers)."""
    from journal_batch_processer_spark.operators.joins import (
        bloom_filtered_join,
    )

    li = _li(spark).select("l_orderkey", "l_linenumber")
    urgent = _orders(spark).filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    got = bloom_filtered_join(
        li, urgent, "l_orderkey", "o_orderkey", n_bits=16
    ).count()
    want = li.join(urgent, li.l_orderkey == urgent.o_orderkey).count()
    assert got == want


def test_stream_stats_equals_batch_aggregate(spark):
    from journal_batch_processer_spark.queries.streaming_q import (
        q_stream_stats,
    )
    from journal_batch_processer_spark.session import load_events

    got = {
        r["user_id"]: (r["n_events"], r["min_value"], r["max_value"])
        for r in q_stream_stats(spark, SF_DIR).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["min_value"], r["max_value"])
        for r in load_events(spark, SF_DIR)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want
