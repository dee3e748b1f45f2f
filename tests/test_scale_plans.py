"""Plan-shape tests: pin the scale-critical physical plans.

These assert the PLAN, not just the result — a regression that
reintroduces a shuffle or downgrades a broadcast join fails here even
though results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from journal_batch_processer_spark.plans import plan_stats

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from journal_batch_processer_spark.operators.bucketing import (
        colocated_join,
        write_bucketed,
    )

    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS bucketdb.{t}")
        shutil.rmtree(f"/tmp/jbp-test-warehouse/bucketdb.db/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "bucketdb.orders_b", "o_orderkey", 4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bucketdb.lineitem_b",
        "o_orderkey",
        4,
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "bucketdb.lineitem_b", "bucketdb.orders_b",
                                on="o_orderkey")
        stats = plan_stats(joined)
        assert stats.shuffles == 0, stats.plan
        # (formatted output names the node in tree + details → ≥1)
        assert stats.sort_merge_joins >= 1, stats.plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_code_lookup_plans_no_join_no_shuffle(spark):
    from journal_batch_processer_spark.code_tables import code_lookup

    df = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_partkey", F.lit("Book").alias("mt")
    )
    out = code_lookup(df, "Material Type", "mt", "code")
    stats = plan_stats(out)
    assert stats.shuffles == 0, stats.plan  # literal map: pure projection


def test_salted_agg_matches_plain(spark):
    from journal_batch_processer_spark.operators.skew import salted_agg

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["n"], r["q"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["q"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": "count(1)", "q": "sum(cast(l_quantity as decimal(18,4)))"},
        ).collect()
    }
    assert plain == salted


def test_skew_queries_plan_shape(spark):
    """The skew-stress registry entries must carry their mitigation in
    the PLAN: the salted aggregate is two-level (4 HashAggregate
    nodes: partial+final per level) keyed by (k, salt) then k, and the
    hot-key join routes the hot slice through a BroadcastHashJoin with
    no cartesian/NLJ anywhere."""
    from journal_batch_processer_spark.plans.audit import plan_stats
    from journal_batch_processer_spark.queries.relational import (
        q_agg_salted_skewed,
        q_join_skew_hot,
    )

    agg = q_agg_salted_skewed(spark, SF)
    s = plan_stats(agg)
    assert s.plan.count("HashAggregate") >= 4, s.plan  # two levels
    assert "__salt" in s.plan and "__salt" not in agg.columns
    assert s.cartesian == 0 and s.nested_loop_joins == 0

    j = q_join_skew_hot(spark, SF)
    sj = plan_stats(j)
    assert sj.broadcast_hash_joins >= 1, sj.plan  # hot slice broadcast
    assert sj.cartesian == 0 and sj.nested_loop_joins == 0


def test_new_pipeline_queries_plan_shape(spark):
    """Scale contracts for the r02 pipeline queries: the composed
    corpus pass stays within its documented two-shuffle budget
    (dedup window + ingest-layout spread), decontaminate keeps its
    benchmark side broadcast, and nothing degenerates to a cartesian
    or nested-loop join."""
    from journal_batch_processer_spark.plans.audit import plan_stats
    from journal_batch_processer_spark.queries.llmops import (
        q_corpus_pipeline,
        q_decontaminate,
        q_dedup_incremental,
    )

    s = plan_stats(q_corpus_pipeline(spark, SF))
    assert s.shuffles <= 2, s.plan
    assert s.cartesian == 0 and s.nested_loop_joins == 0

    d = plan_stats(q_decontaminate(spark, SF))
    assert d.broadcast_hash_joins >= 1, d.plan  # benchmark side broadcast
    assert d.cartesian == 0 and d.nested_loop_joins == 0

    i = plan_stats(q_dedup_incremental(spark, SF))
    assert i.cartesian == 0 and i.nested_loop_joins == 0


def test_numpy_topk_matches_expression_ranking(spark):
    from journal_batch_processer_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_numpy,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 5)
    a = cosine_topk(embs, queries, k=4).collect()
    b = cosine_topk_numpy(embs, queries, k=4).collect()
    pa = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in a}
    pb = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in b}
    assert pa == pb


def test_lake_sink_partition_pruning(spark, tmp_path):
    """Partitioned lake layout: directory structure exists, read-back
    is lossless, and a partition-column filter prunes to one
    directory's files in the scan plan."""
    import os

    from journal_batch_processer_spark.sinks.lake import write_lake

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "lake")
    write_lake(docs, out, ["lang"], sort_cols=["doc_id"],
               max_records_per_file=10_000)

    langs = sorted(
        d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("lang=")
    )
    assert len(langs) >= 2

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    one = back.filter(F.col("lang") == langs[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan's PartitionFilters carry the lang
    # predicate (directory-level pruning, not a post-scan filter)
    stats = plan_stats(one)
    assert "PartitionFilters: [" in stats.plan and "lang" in stats.plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], stats.plan
    assert one.count() == docs.filter(F.col("lang") == langs[0]).count()


def test_round4_operators_plan_shape(spark):
    """Plan pins for the round-4 surface: no cartesian anywhere, the
    stream-static join side broadcasts, the blocked fuzzy join is an
    equi join, and the media decode is a shuffle-free scan→mapInPandas."""
    from journal_batch_processer_spark.queries.llmops import q_dedup_editdist
    from journal_batch_processer_spark.queries.media import q_media_image_decode
    from journal_batch_processer_spark.queries.relational import (
        q_agg_pivot,
        q_array_functions,
    )

    ed = plan_stats(q_dedup_editdist(spark, SF))
    assert ed.cartesian == 0 and ed.nested_loop_joins == 0, ed.plan

    # pivot with pinned values: Spark plans two aggregates (pre-agg on
    # (group, pivot) then PivotFirst on group) = 2 exchanges; pinning
    # the values avoids the extra distinct job, not an exchange
    pv = plan_stats(q_agg_pivot(spark, SF))
    assert pv.cartesian == 0, pv.plan
    assert pv.shuffles <= 2, pv.plan

    md = plan_stats(q_media_image_decode(spark, SF))
    assert md.shuffles == 0, md.plan

    af = plan_stats(q_array_functions(spark, SF))
    assert af.shuffles == 0, af.plan  # expression-only projection


def test_stream_join_static_side_broadcasts(spark):
    from pyspark.sql import functions as F

    from journal_batch_processer_spark.plans import plan_stats

    customers = F.broadcast(
        spark.read.parquet(f"{SF}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
    )
    events = spark.read.parquet(f"{SF}/events.parquet")
    joined = events.join(customers, F.col("user_id") == F.col("c_custkey"))
    stats = plan_stats(joined)
    assert stats.broadcast_hash_joins >= 1, stats.plan


def test_round5_operators_plan_shape(spark):
    """Plan pins for the round-5 surface: chunking/quantization are
    shuffle-free narrow maps, keyword extraction and packing stay at
    their minimal exchange counts, PageRank's 5 iterations plan no
    cartesian/nested-loop joins, and the PQ search broadcasts its
    query side everywhere (corpus side never shuffles for scoring)."""
    from journal_batch_processer_spark.queries.trainprep import (
        q_chunk_sliding,
        q_embed_quantize,
        q_graph_pagerank,
        q_seq_pack,
        q_tfidf_topk,
    )
    from journal_batch_processer_spark.queries.warehouse import q_upsert_merge

    # pure scan→explode→slice / transform maps: the only allowed
    # exchange is the documented single-file ingest spread (round
    # robin, a no-op at real scale) — never a key shuffle
    ch = plan_stats(q_chunk_sliding(spark, SF))
    assert ch.shuffles <= 1 and "hashpartitioning" not in ch.plan, ch.plan

    eq = plan_stats(q_embed_quantize(spark, SF))
    assert eq.shuffles <= 1 and "hashpartitioning" not in eq.plan, eq.plan

    # counts agg + dfreq agg + join back + per-doc window; the static
    # plan prints the counts subtree twice (both join inputs derive
    # from it) — ReuseExchange dedupes the identical exchanges at
    # runtime, so pin the static ceiling and the join staying
    # broadcast (the vocab side is the small one)
    tf = plan_stats(q_tfidf_topk(spark, SF))
    assert tf.cartesian == 0, tf.plan
    assert tf.shuffles <= 8, tf.plan
    assert tf.broadcast_hash_joins >= 1, tf.plan

    # one cumsum window + explode: a single per-source exchange
    # (AQE may add a read-side coalesce but no second hash exchange)
    sp = plan_stats(q_seq_pack(spark, SF))
    assert sp.cartesian == 0, sp.plan
    assert sp.shuffles <= 2, sp.plan

    pr = plan_stats(q_graph_pagerank(spark, SF))
    assert pr.cartesian == 0 and pr.nested_loop_joins == 0, pr.plan

    um = plan_stats(q_upsert_merge(spark, SF))
    assert um.cartesian == 0, um.plan
    # full outer join on the key: both sides hash to the key once
    assert um.shuffles <= 3, um.plan


def test_pq_search_broadcasts_queries(spark):
    """The PQ ADC scan must keep the corpus un-shuffled: queries (with
    their distance tables) broadcast, candidates flow map-side, and
    the only exchanges are the per-query top-k windows and the
    shortlist re-rank join back to the corpus."""
    from journal_batch_processer_spark.operators.similarity import (
        pq_topk,
        train_pq_codebooks,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = embs.filter(F.col("vec_id") < 10)
    books = train_pq_codebooks(f"{SF}/embeddings.parquet", m=16, ksub=16)
    st = plan_stats(pq_topk(embs, qs, books, dim=64, k=5, refine=20))
    assert st.cartesian == 0, st.plan
    assert st.broadcast_hash_joins + st.nested_loop_joins >= 1, st.plan


def test_late_round5_operators_plan_shape(spark):
    """Plan pins for the late round-5 surface: corpus_mix never
    shuffles the corpus (its one exchange is the tiny stratum-count
    aggregate broadcast back), SemDeDup stays at the checkpointed
    4-exchange shape (assignment materialized ONCE — the pre-fix plan
    recomputed it three times for 12 shuffles / 6 rescans), the
    interval join is bucket-equi with the tiny side broadcast (never a
    cartesian), and outlier_mad's median joins broadcast."""
    from journal_batch_processer_spark.queries.curation import (
        q_corpus_mix,
        q_dedup_semantic,
        q_sample_reservoir,
    )
    from journal_batch_processer_spark.queries.llmops import q_outlier_mad
    from journal_batch_processer_spark.queries.relational import (
        q_join_interval,
    )

    cm = plan_stats(q_corpus_mix(spark, SF))
    assert cm.cartesian == 0, cm.plan
    # corpus side: scan → broadcast-join → filter. Exchanges: the
    # stratum-count agg, the 3-row global-min window, and the
    # single-file ingest spread printed once per scan of the shared
    # _docs relation (round robin — a no-op at real scale); never a
    # key shuffle of corpus rows
    assert cm.broadcast_hash_joins >= 1, cm.plan
    assert cm.shuffles <= 5, cm.plan
    assert cm.plan.count("hashpartitioning(doc_id") == 0, cm.plan

    sr = plan_stats(q_sample_reservoir(spark, SF))
    # two rank windows (salt-cell, then group) — nothing else
    assert sr.shuffles <= 3 and sr.cartesian == 0, sr.plan

    ds = plan_stats(q_dedup_semantic(spark, SF))
    assert ds.cartesian == 0, ds.plan
    assert ds.shuffles <= 4, ds.plan  # checkpointed assignment

    ji = plan_stats(q_join_interval(spark, SF))
    assert ji.cartesian == 0, ji.plan
    assert ji.broadcast_hash_joins >= 1, ji.plan

    om = plan_stats(q_outlier_mad(spark, SF))
    assert om.cartesian == 0, om.plan
    assert om.broadcast_hash_joins >= 2, om.plan


def test_graph_kcore_plan_and_convergence(spark):
    """graph_kcore's 6 unrolled h-index rounds must stay
    nested-loop-free (the localCheckpoint'd edge relation, not a
    re-expanded scan, feeds every round), and on the fixture the
    final round must be a FIXPOINT of the H-operator (one more round
    changes nothing) with a non-degenerate coreness spread — the
    core-periphery generators exist precisely so the peel has work."""
    from journal_batch_processer_spark.queries import trainprep
    from journal_batch_processer_spark.queries.trainprep import q_graph_kcore

    df = q_graph_kcore(spark, SF)
    kc = plan_stats(df)
    assert kc.cartesian == 0 and kc.nested_loop_joins == 0, kc.plan
    rows6 = sorted((r.node_id, r.coreness) for r in df.collect())
    vals = {c for _, c in rows6}
    assert len(vals) >= 3, vals
    assert min(vals) == 0  # block-tail isolated nodes
    # fixpoint: a 7th H-operator round changes nothing at fixture scale
    old = trainprep.KCORE_ITERS
    trainprep.KCORE_ITERS = old + 1
    try:
        rows7 = sorted(
            (r.node_id, r.coreness)
            for r in q_graph_kcore(spark, SF).collect()
        )
    finally:
        trainprep.KCORE_ITERS = old
    assert rows6 == rows7


def test_no_unbounded_following_window_frames(spark):
    """No operator plan may contain an UNBOUNDED FOLLOWING window
    frame: Spark's UnboundedFollowingWindowFunctionFrame re-scans from
    the current row to the partition end for EVERY row — O(n^2) per
    partition. At the 100x corpus (150 groups x 100k rows) the
    year_impute_window forward-anchor pass never finished, while the
    equivalent reverse-ordered running frame takes 120 s (545fa8c).
    Pin the two rewritten operators here; tools/explain_audit.py
    flags the frame across the whole registry."""
    import __spark_entry__ as e

    qs = e.queries()
    for key in ("year_impute_window", "join_asof_nearest"):
        plan = qs[key](spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "UNBOUNDED FOLLOWING" not in plan.upper(), (key, plan)
