"""End-to-end pretraining-corpus pass: the composition the individual
operators exist for.

    quality gate → PII scrub → exact-hash dedup → train/val/test split

One Catalyst plan up to the dedup shuffle; every stage is the same
operator the registry exposes individually (queries/llmops), so the
composition inherits their oracle-checked semantics.

Shuffle budget: exactly one — the md5-content window for dedup (the
gate, scrub, and split are all narrow). At 100 TB the dedup hash is
the natural repartition key for the downstream write, so the lake
sink's ``partitionBy("split")`` adds only the split-directory fan-out,
not another full shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from journal_batch_processer_spark.operators.sampling import hash_split
from journal_batch_processer_spark.operators.text_analysis import (
    pii_scrub,
    quality_gate,
)


def corpus_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Gate → scrub → dedup → split. Returns surviving rows with the
    scrubbed text, PII counts, and the split label; dropped rows are
    the complement (filterable upstream via ``keep``/``is_first``).

    Dedup keeps the minimum-id row per scrubbed-content hash
    (deterministic winner, same rule as operators.dedup.dedup_exact).
    """
    gated = quality_gate(docs, id_col, text_col, append=True).filter("keep")
    scrubbed = pii_scrub(gated.drop("keep"), id_col, text_col, append=True)

    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    deduped = (
        scrubbed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    return hash_split(deduped, id_col, train_frac, val_frac)


def write_corpus_lake(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Corpus pass + partitioned lake layout: one directory per split,
    files ordered by id for row-group pruning on id ranges."""
    from journal_batch_processer_spark.sinks.lake import write_lake

    out = corpus_pipeline(docs, id_col, text_col)
    write_lake(out, out_dir, ["split"], sort_cols=[id_col])
