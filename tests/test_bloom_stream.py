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


def test_interval_join_equals_theta_join(spark):
    """The day-bucket banding + overlap-start pinning must reproduce
    the naive theta join exactly — including multi-day intervals that
    share several buckets with a match (matched once, not per day)."""
    from journal_batch_processer_spark.operators.joins import (
        interval_overlap_join,
    )
    from journal_batch_processer_spark.queries.relational import (
        CAMPAIGNS,
        q_join_interval,
    )
    from journal_batch_processer_spark.session import load_events

    got = {
        (r["user_id"], r["day"], r["campaign_id"], r["overlap_us"])
        for r in q_join_interval(spark, SF_DIR).collect()
    }
    ev = load_events(spark, SF_DIR)
    ua = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("a_lo"), F.max("ts").alias("a_hi")
    )
    camps = spark.createDataFrame(
        list(CAMPAIGNS), "campaign_id string, lo_s string, hi_s string"
    ).select(
        "campaign_id",
        F.to_timestamp("lo_s").alias("c_lo"),
        F.to_timestamp("hi_s").alias("c_hi"),
    )
    naive = ua.join(
        camps,
        (F.col("a_lo") <= F.col("c_hi")) & (F.col("c_lo") <= F.col("a_hi")),
    ).select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "campaign_id",
        (
            F.unix_micros(F.least("a_hi", "c_hi"))
            - F.unix_micros(F.greatest("a_lo", "c_lo"))
        ).alias("overlap_us"),
    )
    want = {
        (r["user_id"], r["day"], r["campaign_id"], r["overlap_us"])
        for r in naive.collect()
    }
    assert got == want
    assert got


def test_interval_join_multiday_pair_matches_once(spark):
    """Two multi-day intervals overlapping across several shared days
    must produce exactly one joined row."""
    from journal_batch_processer_spark.operators.joins import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("L1", "2024-01-01 00:00:00", "2024-01-10 00:00:00")],
        "lid string, lo_s string, hi_s string",
    ).select(
        "lid",
        F.to_timestamp("lo_s").alias("l_lo"),
        F.to_timestamp("hi_s").alias("l_hi"),
    )
    right = spark.createDataFrame(
        [("R1", "2024-01-03 12:00:00", "2024-01-08 12:00:00")],
        "rid string, lo_s string, hi_s string",
    ).select(
        "rid",
        F.to_timestamp("lo_s").alias("r_lo"),
        F.to_timestamp("hi_s").alias("r_hi"),
    )
    out = interval_overlap_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi")
    assert out.count() == 1


def test_stream_enrich_equals_batch(spark):
    from journal_batch_processer_spark.queries.streaming_q import (
        q_stream_enrich,
    )
    from journal_batch_processer_spark.session import load_events

    got = {
        r["segment"]: (r["n_events"], round(r["sum_value"], 6))
        for r in q_stream_enrich(spark, SF_DIR).collect()
    }
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    dv = F.col("value").cast("decimal(18,6)")
    want = {
        r["segment"]: (r["n_events"], round(r["sum_value"], 6))
        for r in load_events(spark, SF_DIR)
        .join(cust, "user_id")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dv).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == want
    assert len(got) >= 3


def test_stream_session_native_equals_batch(spark):
    """Built-in streaming session_window fully drained == the batch
    session_window aggregate."""
    from journal_batch_processer_spark.queries.relational import (
        q_window_session_native,
    )
    from journal_batch_processer_spark.queries.streaming_q import (
        q_stream_session_native,
    )

    got = {tuple(r) for r in q_stream_session_native(spark, SF_DIR).collect()}
    want = {tuple(r) for r in q_window_session_native(spark, SF_DIR).collect()}
    assert got == want
    assert got
