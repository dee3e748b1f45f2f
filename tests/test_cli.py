"""CLI surface smoke test: the reference's command-line workflow."""

from __future__ import annotations

import glob
import os

from journal_batch_processer_spark.cli import main


def test_cli_format_split(spark, fixture_csv, tmp_path):
    rc = main(
        [
            fixture_csv,
            "-f",
            "-s",
            "--out-dir",
            str(tmp_path),
            "--single-file",
            "--strict-reference-mode",
        ]
    )
    assert rc == 0
    f_dir = os.path.join(str(tmp_path), "f_item_records.csv")
    s_dir = os.path.join(str(tmp_path), "s_item_records.csv")
    assert os.path.isdir(f_dir) and os.path.isdir(s_dir)
    part = glob.glob(s_dir + "/part-*.csv")
    assert len(part) == 1  # --single-file
    lines = open(part[0]).read().splitlines()
    header = lines[0].split(",")
    assert header[-2:] == ["Pattern", "Notes"]
    assert len(lines) == 169  # header + 168 fixture rows


def test_cli_refuses_update_without_review(fixture_csv, tmp_path):
    rc = main([fixture_csv, "-f", "-u", "--items-remote", "x.parquet",
               "--out-dir", str(tmp_path)])
    assert rc == 1


def test_ivf_topk_recall(spark):
    """IVF with generous probes recovers most brute-force neighbors."""
    from pyspark.sql import functions as F

    from journal_batch_processer_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 5)
    exact = cosine_topk(embs, queries, k=3).collect()
    approx = ivf_topk(embs, queries, k=3, n_centroids=8, n_probe=4).collect()
    pe = {(r["query_id"], r["neighbor_id"]) for r in exact}
    pa = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert pe and pa
    assert len(pe & pa) >= len(pe) // 2


def test_cli_corpus_mode(spark, tmp_path):
    """Corpus pass end-to-end: gate → scrub → dedup → split → lake."""
    out = str(tmp_path / "lake")
    rc = main(["/root/testdata/sf0.001/documents.parquet", "--corpus",
               "--out-dir", out])
    assert rc == 0
    splits = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert splits == ["split=test", "split=train", "split=val"]
    back = spark.read.parquet(out)
    n_in = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert 0 < back.count() <= n_in
    # gate is effective (some docs dropped) and text was scrubbed-in-place
    cols = set(back.columns)
    assert {"doc_id", "text", "split", "n_email", "n_tokens"} <= cols
