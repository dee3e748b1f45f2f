"""outlier_mad (robust MAD outliers) and compact_plan (small-file
compaction planner)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_outlier_mad_matches_numpy_model(spark):
    """Medians are lower-order statistics — reproduce them with numpy
    and check every flagged row."""
    from journal_batch_processer_spark.queries.llmops import q_outlier_mad
    from journal_batch_processer_spark.session import load_events

    ev = (
        load_events(spark, SF_DIR)
        .select("event_id", "event_type", "value")
        .collect()
    )
    by_type: dict[str, list[tuple[int, float]]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            (r["event_id"], r["value"])
        )
    expected = set()
    for t, rows in by_type.items():
        vals = np.array([v for _, v in sorted(rows, key=lambda x: (x[1], x[0]))])
        n = len(vals)
        med = vals[(n + 1) // 2 - 1]
        devs = np.sort(np.abs(np.array([v for _, v in rows]) - med))
        mad = devs[(n + 1) // 2 - 1]
        for eid, v in rows:
            if abs(v - med) > 3 * mad:
                expected.add((eid, t))
    got = {
        (r["event_id"], r["event_type"])
        for r in q_outlier_mad(spark, SF_DIR).collect()
    }
    assert got == expected
    assert got  # the fixture has heavy-tail values; flags must exist


def test_compact_plan_bins_respect_target(spark):
    from journal_batch_processer_spark.queries.warehouse import (
        COMPACT_TARGET_BYTES,
        q_compact_plan,
    )

    rows = sorted(
        q_compact_plan(spark, SF_DIR).collect(), key=lambda r: r["fname"]
    )
    assert len(rows) > 0
    # bin ids are nondecreasing in name order, starting at 0
    bins = [r["bin_id"] for r in rows]
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # a bin only exceeds the target via the single file that crosses
    # the boundary (whole files are never split)
    per_bin: dict[int, int] = {}
    for r in rows:
        per_bin[r["bin_id"]] = per_bin.get(r["bin_id"], 0) + r["n_bytes"]
    for b, total in per_bin.items():
        largest = max(
            r["n_bytes"] for r in rows if r["bin_id"] == b
        )
        assert total < COMPACT_TARGET_BYTES + largest
