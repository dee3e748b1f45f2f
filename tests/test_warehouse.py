"""Semantic + plan-shape tests for queries/warehouse.py (the DuckDB
oracle sweep is the cross-engine value gate; these pin semantics
against pure-Python models and pin the partition-pruning plan)."""

from __future__ import annotations

import io
from collections import defaultdict

from contextlib import redirect_stdout

from tests.conftest import SF_DIR


def _plan_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_prune_plan_has_partition_filters(spark):
    from journal_batch_processer_spark.queries.warehouse import q_partitioned_prune

    df = q_partitioned_prune(spark, SF_DIR)
    plan = _plan_str(df)
    assert "PartitionFilters" in plan
    # the lang predicate must be a PARTITION filter (pruned at listing
    # time), not a post-scan data filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("lang" in ln for ln in pf), pf


def test_upsert_merge_matches_python_model(spark):
    from journal_batch_processer_spark.queries.warehouse import q_upsert_merge
    from journal_batch_processer_spark.session import load_events

    ev = {
        r.event_id: r.value
        for r in load_events(spark, SF_DIR).select("event_id", "value").collect()
    }
    expected = {}
    for eid, val in ev.items():
        if eid % 7 == 0:
            expected[eid] = (val * 2, "updated")
        else:
            expected[eid] = (val, "kept")
        if eid % 1000 == 0:
            expected[eid + 10_000_000] = (val, "inserted")
    got = {
        r.event_id: (r.value_final, r.src)
        for r in q_upsert_merge(spark, SF_DIR).collect()
    }
    assert got == expected


def test_scd2_dim_matches_python_model(spark):
    from journal_batch_processer_spark.queries.warehouse import q_scd2_dim
    from journal_batch_processer_spark.session import load_events

    rows = (
        load_events(spark, SF_DIR)
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))

    def us(ts):
        import calendar

        return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond

    expected = set()
    for user, evs in by_user.items():
        evs.sort()
        kept = []
        prev = None
        for ts, eid, ty in evs:
            if prev is None or ty != prev:
                kept.append((ts, ty))
            prev = ty
        for i, (ts, ty) in enumerate(kept):
            valid_to = us(kept[i + 1][0]) if i + 1 < len(kept) else None
            expected.add(
                (user, ty, us(ts), valid_to, i + 1, valid_to is None)
            )
    got = {
        (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us, r.version,
         r.is_current)
        for r in q_scd2_dim(spark, SF_DIR).collect()
    }
    assert got == expected


def test_orc_roundtrip_lossless(spark):
    from journal_batch_processer_spark.queries.warehouse import q_orc_roundtrip

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expected = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        agg = expected[r.lang]
        agg[0] += 1
        agg[1] += r.n_chars
        agg[2] += r.doc_id
    got = {
        r.lang: (r.n_docs, r.sum_chars, r.id_checksum)
        for r in q_orc_roundtrip(spark, SF_DIR).collect()
    }
    assert got == {k: tuple(v) for k, v in expected.items()}


def test_zorder_matches_python_model_and_plans_range_exchange(spark):
    from journal_batch_processer_spark.operators.layout import (
        cluster_by_zorder,
        zorder_python,
    )
    from journal_batch_processer_spark.plans import plan_stats
    from journal_batch_processer_spark.queries.warehouse import q_layout_zorder

    rows = q_layout_zorder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.zvalue == zorder_python(r.x, r.y, 8), (r.x, r.y)
        assert r.zbucket == r.zvalue // 4096

    # z-locality: both dimensions' spread within a bucket must be far
    # tighter than the global spread (the whole point of the layout)
    from collections import defaultdict

    spans = defaultdict(lambda: [256, -1, 256, -1])
    for r in rows:
        s = spans[r.zbucket]
        s[0] = min(s[0], r.x); s[1] = max(s[1], r.x)
        s[2] = min(s[2], r.y); s[3] = max(s[3], r.y)
    avg_x_span = sum(s[1] - s[0] for s in spans.values()) / len(spans)
    assert avg_x_span <= 128  # global span is 255

    df = spark.createDataFrame(
        [(i % 7, i % 11) for i in range(100)], "x long, y long"
    )
    st = plan_stats(cluster_by_zorder(df, "x", "y", n_partitions=4))
    assert "rangepartitioning" in st.plan.lower(), st.plan
    assert "Sort" in st.plan, st.plan


def test_schema_evolution_nullfills_old_generation(spark):
    from journal_batch_processer_spark.queries.warehouse import (
        q_schema_evolution,
    )
    from tests.conftest import SF_DIR

    rows = q_schema_evolution(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["doc_id"] % 2 == 0:  # generation-1 file: column absent
            assert r["quality_ppm"] is None
        else:
            assert r["quality_ppm"] == (r["n_chars"] % 1000) * 1000


def test_anonymize_k_suppresses_small_groups(spark):
    from journal_batch_processer_spark.queries.warehouse import (
        ANON_K,
        q_anonymize_k,
    )
    from tests.conftest import SF_DIR

    out = q_anonymize_k(spark, SF_DIR)
    rows = out.collect()
    assert rows
    # every surviving row's group is at least k
    assert all(r["group_n"] >= ANON_K for r in rows)
    # re-derive group sizes from the output: consistent and >= k
    sizes = {}
    for r in rows:
        sizes[(r["lang"], r["len_band"])] = sizes.get(
            (r["lang"], r["len_band"]), 0
        ) + 1
    for (lang, band), n in sizes.items():
        assert n >= ANON_K
    # suppression must actually bind on the fixture
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert out.count() < docs.count()
