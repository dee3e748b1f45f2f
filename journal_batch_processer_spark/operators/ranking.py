"""BM25 retrieval scoring over a document corpus.

The retrieval half of a training-data pipeline: given a (small) set of
queries, score every document containing at least one query term with
Okapi BM25 — the function behind quality-targeted corpus selection,
decontamination probes ("which training docs score high against the
eval set?"), and seed-document expansion.

Scale shape (100 TB corpus, ~thousands of queries):
- the corpus is tokenized ONCE; per-doc lengths are a map-side-combined
  count aggregate;
- query terms are a broadcast semi-join — corpus rows not matching any
  query term never leave the scan stage;
- document frequency is computed over the (doc, term) pairs that
  SURVIVE that semi-join (df of a term nobody queried is never
  counted), then broadcast back;
- corpus-level scalars (N, avgdl) are a single-row aggregate joined in
  by broadcast — the one `crossJoin` is the adjudicated
  broadcast-scalar pattern used by the hour-spine query.

Engine portability (full DuckDB value oracle): every arithmetic step
is IEEE +,-,*,/ with identical operand order in both engines; the one
transcendental (idf's ln) is rounded to 6 dp BEFORE use, and the
per-term score sum is a FOLD over the term-sorted list (F.aggregate /
list_reduce), so addition order is pinned. See SQL_TEXT_BM25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Okapi defaults (Robertson et al.; the Lucene "+1" idf keeps every
# term's contribution positive even past the df > N/2 point)
K1 = 1.2
B = 0.75


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(query_id, doc_id, score) for every doc sharing ≥1 term with the
    query; score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)),
    idf(t) = round(ln((N - df + 0.5)/(df + 0.5) + 1), 6).

    ``queries``: (query_id, text) pairs — tokenized with the same
    lower+whitespace rule as the corpus. Terms absent from the corpus
    contribute nothing (standard behavior: no tf rows exist).
    """
    spark = docs.sparkSession
    qterms = (
        spark.createDataFrame(queries, ["query_id", "q_text"])
        .select("query_id", F.explode(F.split(F.lower("q_text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # corpus scalars: one row, broadcast onto every surviving pair
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )

    # broadcast semi-join: only query-term rows survive the scan stage
    tf = (
        toks.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))

    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "term")
        .select(
            "query_id",
            "doc_id",
            "term",
            (
                F.round(
                    F.log(
                        (F.col("n_docs") - F.col("df_") + F.lit(0.5))
                        / (F.col("df_") + F.lit(0.5))
                        + F.lit(1.0)
                    ),
                    6,
                )
                * (
                    F.col("tf")
                    * (k1c + F.lit(1.0))
                    / (
                        F.col("tf")
                        + k1c
                        * (F.lit(1.0) - bc + bc * (F.col("dl") / F.col("avgdl")))
                    )
                )
            ).alias("s"),
        )
    )
    # fold the per-term scores in TERM-SORTED order so the float sum is
    # bit-identical to the oracle's list_reduce over the same order
    return (
        per_term.groupBy("query_id", "doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("term", "s"))).alias("parts"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.aggregate(
                    "parts", F.lit(0.0), lambda acc, x: acc + x["s"]
                ),
                6,
            ).alias("score"),
        )
    )
