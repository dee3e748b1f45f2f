"""Supervised curation operators (quality_classifier / dsir_select):
mechanical invariants the oracle's value-hash can't localize —
decision-rule consistency, rank contiguity, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_quality_classifier_decision_rule(spark):
    from journal_batch_processer_spark.operators.classifier import (
        quality_classifier,
    )

    docs = _docs(spark).withColumn(
        "__pos", F.col("source").isin("src1", "src2", "src3")
    )
    rows = quality_classifier(docs, "doc_id", "text").collect()
    assert len(rows) == docs.count()  # every doc scored, scored once
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        if r.n_tokens == 0:
            assert r.pred_pos is None and r.mean_contrast_ppm is None
        else:
            # the decision rule IS the sign of the exact integer sum
            assert r.pred_pos == (r.sum_contrast_ppm >= 0)
            assert (
                abs(r.mean_contrast_ppm * r.n_tokens - r.sum_contrast_ppm)
                < 1e-6 * max(1, abs(r.sum_contrast_ppm))
            )


def test_quality_classifier_token_count_matches_text(spark):
    from journal_batch_processer_spark.operators.classifier import (
        quality_classifier,
    )

    docs = _docs(spark).withColumn("__pos", F.col("doc_id") % 2 == 0)
    got = {
        r.doc_id: r.n_tokens
        for r in quality_classifier(docs, "doc_id", "text").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = len([t for t in r.text.split(" ") if t])
        assert got[r.doc_id] == want


def test_dsir_select_rank_contract(spark):
    from journal_batch_processer_spark.operators.classifier import dsir_select

    docs = _docs(spark).withColumn(
        "__target", F.col("source").isin("src1", "src2", "src3")
    )
    rows = sorted(dsir_select(docs, "doc_id", "text", k=20).collect(),
                  key=lambda r: r.rank)
    assert 0 < len(rows) <= 20
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # ranks follow (weight DESC, doc_id ASC) exactly
    key = [(-r.weight_ppm, r.doc_id) for r in rows]
    assert key == sorted(key)
    # deterministic across plans (pin + TakeOrdered leave no order luck)
    again = sorted(dsir_select(docs, "doc_id", "text", k=20).collect(),
                   key=lambda r: r.rank)
    assert [(r.doc_id, r.weight_ppm, r.rank) for r in rows] == [
        (r.doc_id, r.weight_ppm, r.rank) for r in again
    ]


def test_dsir_target_docs_rank_high(spark):
    """Importance weights must prefer the target distribution: docs
    that ARE the target score strictly higher on average than the
    rest (their own buckets are boosted by construction — this fails
    if target/raw are swapped or smoothing drowns the signal)."""
    from journal_batch_processer_spark.operators.classifier import dsir_select

    docs = _docs(spark).withColumn(
        "__target", F.col("source").isin("src1", "src2", "src3")
    )
    n = docs.count()
    sel = dsir_select(docs, "doc_id", "text", k=n)
    joined = sel.join(docs.select("doc_id", "source"), "doc_id").collect()
    tgt = [r.weight_ppm / max(r.n_feats, 1) for r in joined
           if r.source in ("src1", "src2", "src3")]
    rest = [r.weight_ppm / max(r.n_feats, 1) for r in joined
            if r.source not in ("src1", "src2", "src3")]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
