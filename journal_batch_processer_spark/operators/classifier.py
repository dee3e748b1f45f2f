"""Supervised data-curation scorers: quality classifier + DSIR.

Two public curation methods a pretraining pipeline runs between
dedup and sampling, both reduced to exact integer arithmetic so the
DuckDB oracles replay them bit-for-bit (the `text_ngramlm` ppm
precedent — probabilities as ``(1_000_000 * c) div total`` floor
divisions, one final IEEE division at most):

- :func:`quality_classifier`: the GPT-3 / CCNet quality-filter shape —
  train a linear classifier on a curated-positive vs rest-negative
  label and score every document.  fastText's supervised model is a
  linear model over token counts; here the weights are class-
  conditional token probabilities (add-one smoothed, ppm-quantized)
  and the document score is the mean per-token class contrast.
- :func:`dsir_select`: Data Selection with Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169) — hashed n-gram bucket
  distributions for the target and raw corpora, per-document
  importance weight from per-bucket probability contrasts, top-k
  selection with a deterministic (weight DESC, doc_id) tie-break.

Reference analog: BatchUpdate.py has no corpus-curation surface (EXT
per SURVEY §2i); both operators follow the public papers.

Scale shape (both): one explode to the token/feature relation, two
key-partial groupBys to a model-sized table (vocab / fixed B
buckets), scalar totals as 1-row broadcasts (the BM25 precedent),
scoring as one equi-join of the feature relation against the
broadcast-size model.  Nothing collects to the driver; no Python in
any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from journal_batch_processer_spark.cache import pin

PPM = 1_000_000


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, tok) occurrence relation; empty texts contribute nothing."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")


def quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str = "__pos",
) -> DataFrame:
    """Train-and-score a linear quality classifier in one plan.

    ``df[label_col]`` is the boolean training label (curated = true).
    Model: for every corpus token, the add-one-smoothed class-
    conditional probabilities in ppm —

        p_c(tok) = (1_000_000 * (count_c(tok) + 1)) div (N_c + V)

    (N_c = token occurrences in class c, V = corpus vocabulary size) —
    and the token weight is the contrast ``p_pos - p_neg``.  A
    document's score is the sum of its tokens' weights (an exact
    bigint) and their mean (the only float op).  Sign of the sum is
    the predicted label, exactly the linearized two-class naive-Bayes
    / fastText decision shape.

    Scale: the model table is vocab-sized and partially aggregated;
    the (N_pos, N_neg, V) totals are a second aggregate OVER THE MODEL
    (not the corpus) carried as a 1-row broadcast; scoring re-joins
    the pinned token relation to the model on the token key.  Token
    skew on that join (stopwords) is AQE-split.
    """
    toks = pin(
        _doc_tokens(df, id_col, text_col).join(
            df.select(
                F.col(id_col).alias("doc"), F.col(label_col).alias("pos")
            ),
            "doc",
        )
    )
    model = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("c_neg"),
    )
    totals = model.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    weights = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            (
                F.expr(f"({PPM} * (c_pos + 1)) div (n_pos + v)")
                - F.expr(f"({PPM} * (c_neg + 1)) div (n_neg + v)")
            ).alias("w_ppm"),
        )
    )
    scored = (
        toks.join(weights, "tok")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_ppm").alias("sum_contrast_ppm"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"), F.col(label_col).alias("label"))
        .join(scored, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "label",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("sum_contrast_ppm", F.lit(0))
            .cast("long")
            .alias("sum_contrast_ppm"),
            F.when(
                F.col("n_tokens") > 0,
                F.col("sum_contrast_ppm").cast("double") / F.col("n_tokens"),
            ).alias("mean_contrast_ppm"),
            F.when(F.col("n_tokens") > 0, F.col("sum_contrast_ppm") >= 0)
            .alias("pred_pos"),
        )
    )


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str = "__target",
    n_buckets_hex: int = 3,
    k: int = 200,
) -> DataFrame:
    """DSIR-style importance selection (arXiv:2302.03169).

    Features are hashed bigrams: bucket = first ``n_buckets_hex`` hex
    chars of md5(w1 || ' ' || w2) — B = 16^n buckets (default 4096),
    the paper's hashed n-gram model with the same md5→bucket idiom as
    the count-min sketch (`heavy_hitters`).  Per bucket, add-one
    smoothed target and raw probabilities in ppm; a document's
    importance weight is the sum over its bigram occurrences of the
    per-bucket contrast ``p_target - p_raw`` (the ppm-linearized
    stand-in for the paper's log-ratio — order-preserving for the
    selection, exact in integers).  The top ``k`` documents by
    (weight DESC, doc_id) are returned with their rank — DSIR's
    deterministic top-k variant (the paper's Gumbel resampling adds
    noise; a seeded deterministic rank is the reproducible choice).

    Scale: bucket tables are FIXED size B (partial-agg, broadcastable);
    the raw distribution aggregates the full corpus ONCE; top-k is a
    distributed TakeOrdered (sort + limit k), never a global window
    over all documents — the rank window runs on the k survivors.
    """
    b = 16**n_buckets_hex
    # r13: bigram emission via the lead-window shape (bigram_rows) —
    # the transform-lambda array build ran interpreted, 9× slower
    from journal_batch_processer_spark.operators.text_analysis import (
        bigram_rows,
    )

    feats = pin(
        bigram_rows(df, id_col, text_col, extra_cols=(target_col,))
        .withColumnRenamed(target_col, "tgt")
        .select(
            "doc",
            "tgt",
            F.conv(F.substring(F.md5(F.col("bg")), 1, n_buckets_hex), 16, 10)
            .cast("long")
            .alias("bucket"),
        )
    )
    dist = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("c_t"),
        F.count(F.lit(1)).alias("c_r"),
    )
    totals = dist.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    weights = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.expr(f"({PPM} * (c_t + 1)) div (n_t + {b})")
            - F.expr(f"({PPM} * (c_r + 1)) div (n_r + {b})")
        ).alias("w_ppm"),
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w_ppm").alias("weight_ppm"),
        )
        .orderBy(F.col("weight_ppm").desc(), F.col("doc"))
        .limit(k)
    )
    w = Window.orderBy(F.col("weight_ppm").desc(), F.col("doc"))
    return scored.withColumn("rank", F.row_number().over(w)).select(
        F.col("doc").alias(id_col),
        F.col("n_feats").cast("long").alias("n_feats"),
        F.col("weight_ppm").cast("long").alias("weight_ppm"),
        "rank",
    )
