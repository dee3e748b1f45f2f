"""Round-12 regression tests.

The 100× sweep exposed q_dedup_editdist's r09 blocking as quadratic
(band-only join key: 500k docs / 68 bands = 4e9 same-band pairs); the
rewrite blocks by pigeonhole partition signatures (5×8-char chunks vs
±4-shifted windows). These tests pin the rewrite to the brute O(n²)
semantic spec — exact pair multiset, including dist values — and the
pigeonhole soundness property on adversarial synthetic edits.
"""

import duckdb
import pytest

from journal_batch_processer_spark.queries.llmops import (
    SQL_DEDUP_EDITDIST,
    q_dedup_editdist,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dedup_editdist_pigeonhole_matches_brute_oracle(spark, sf_dir):
    got = sorted(
        (r.doc_a, r.doc_b, r.dist)
        for r in q_dedup_editdist(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(con.sql(SQL_DEDUP_EDITDIST).fetchall())
    assert got == want


def test_dedup_editdist_pigeonhole_finds_shifted_edits(spark):
    """Adversarial pigeonhole cases: indels that displace every later
    chunk by up to ±4, edits clustered so exactly one chunk stays
    intact, and a just-over-threshold pair that must NOT appear."""
    base = "abcdefgh" * 5  # 40 chars, chunks all distinct? no — equal
    base = "".join(chr(ord("a") + (i * 7 + i // 8) % 26) for i in range(40))
    # NB the 40-char prefix truncation makes pure front indels cost
    # DOUBLE between same-length docs (k deletions pull k new tail
    # chars into the window = k inserts), so ±2-char shifts are the
    # deepest displacement reachable at dist ≤ 4 — they still
    # exercise the shifted-window (δ ≠ 0) join legs.
    rows = [
        (1, "en", base + " tail pad to make length comfortable"),
        # 2 front deletions: chunks 1-4 shift left 2 (δ=-2), and the
        # 2 pulled-in tail chars cost 2 trailing inserts → dist 4
        (2, "en", base[2:] + " tail pad to make length comfortableXX"),
        # 2 front insertions: chunks shift right 2 (δ=+2), last 2
        # prefix chars fall off → dist 4
        (3, "en", "QQ" + base + " tail pad to make length comforta"),
        # 4 substitutions spread over chunks 0-3; chunk 4 intact
        (4, "en", "Z" + base[1:9] + "Z" + base[10:17] + "Z" + base[18:25]
         + "Z" + base[26:] + " tail pad to make length comfortable"),
        # 5 substitutions, one per chunk: dist 5 > 4 — must be absent
        (5, "en", "Z" + base[1:9] + "Z" + base[10:17] + "Z" + base[18:25]
         + "Z" + base[26:33] + "Z" + base[34:]
         + " tail pad to make length comfortable"),
        # same text as 1 but different lang — must be absent
        (6, "fr", base + " tail pad to make length comfortable"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    import journal_batch_processer_spark.queries.llmops as llm

    orig = llm._docs
    llm._docs = lambda _spark, _sf: df
    try:
        pairs = {
            (r.doc_a, r.doc_b): r.dist
            for r in q_dedup_editdist(spark, "ignored").collect()
        }
    finally:
        llm._docs = orig

    assert (1, 2) in pairs and pairs[(1, 2)] == 4
    assert (1, 3) in pairs and pairs[(1, 3)] == 4
    assert (1, 4) in pairs and pairs[(1, 4)] == 4
    assert (1, 5) not in pairs
    assert all(6 not in p for p in pairs)


def test_bucket_cosine_pairs_matches_expression_join(spark):
    """bucket_cosine_pairs (per-bucket BLAS tiles) must emit exactly
    the pairs of the vector-carrying bucket join + unrolled dot_expr
    it replaced (the join shape moved ~100 GB of row payload at the
    ×100 corpus and never finished): same pair set, cosines equal to
    float-ulp tolerance."""
    from pyspark.sql import functions as F

    from journal_batch_processer_spark.operators.similarity import (
        bucket_cosine_pairs,
        dot_expr,
        hyperplane_sign_bits,
    )

    dim, planes, thr = 64, 8, 0.4
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in bucket_cosine_pairs(
            embs, dim, n_planes=planes, threshold=thr,
            # tiny tiles so the tiling seams are exercised at test scale
            row_block=16, col_block=32,
        ).collect()
    }

    e = embs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", F.sqrt(dot_expr("v", "v", dim)))
    e = e.withColumn("bucket", hyperplane_sign_bits(F.col("v"), dim, planes))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"), "bucket")
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"), "bucket")
    cos = dot_expr("va", "vb", dim) / (F.col("na") * F.col("nb"))
    want = {
        (r.vec_a, r.vec_b): r.cosine
        for r in a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= thr)
        .select("vec_a", "vec_b", "cosine")
        .collect()
    }
    # BLAS and left-to-right expression sums can land an ulp apart, so
    # a pair whose exact cosine sits within an ulp of thr may be kept
    # by one engine and dropped by the other (bucket_cosine_pairs'
    # docstring warns callers to round before value-comparing).
    # Membership must agree except for such threshold-boundary pairs.
    eps = 1e-9
    for k in set(got) ^ set(want):
        c = got.get(k, want.get(k))
        assert abs(c - thr) < eps, (
            "non-boundary pair differs between BLAS and expression "
            f"paths: {k} cosine={c}"
        )
    for k in set(got) & set(want):
        assert abs(got[k] - want[k]) < eps, (k, got[k], want[k])


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_prefix_ngram_oracles_match_naive_join(sf_dir):
    """The r12 prefix-filtered DuckDB oracles (the naive flat
    self-join is Σ C(df,2) = 1.39e10 rows at the ×100 corpus) must be
    row-identical to the naive formulation they replaced — prefix
    filtering is lossless under any global rarest-first order, and
    the verify leg recomputes exact Jaccard over the full sets."""
    from journal_batch_processer_spark.queries.llmops import (
        SQL_DEDUP_NGRAM_CAPPED,
        SQL_DEDUP_NGRAM_T50,
    )

    naive_t50 = """
WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS t FROM documents),
sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t)>=3 THEN
       list_transform(range(1,len(t)-1), i->array_to_string(t[i:i+2],' '))
       ELSE [] END) AS shingles FROM toks),
flat AS (SELECT doc_id AS doc, UNNEST(shingles) AS shingle FROM sh),
sizes AS (SELECT doc, COUNT(*) AS sz FROM flat GROUP BY doc),
inter AS (SELECT a.doc doc_a, b.doc doc_b, COUNT(*) inter FROM flat a
          JOIN flat b USING (shingle) WHERE a.doc < b.doc GROUP BY 1,2)
SELECT doc_a, doc_b, inter, sa.sz sz_a, sb.sz sz_b,
       ROUND(inter/(sa.sz+sb.sz-inter),6) jaccard
FROM inter JOIN sizes sa ON sa.doc=doc_a JOIN sizes sb ON sb.doc=doc_b
WHERE inter/(sa.sz+sb.sz-inter) >= 0.5
"""
    naive_capped = """
WITH toks AS (SELECT doc_id, string_split(lower(text),' ') AS t FROM documents),
sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t)>=3 THEN
       list_transform(range(1,len(t)-1), i->array_to_string(t[i:i+2],' '))
       ELSE [] END) AS shingles FROM toks),
flat AS (SELECT doc_id AS doc, UNNEST(shingles) AS shingle FROM sh),
dfreq AS (SELECT shingle, COUNT(*) df FROM flat GROUP BY 1),
ranked AS (SELECT doc, shingle, ROW_NUMBER() OVER (
           PARTITION BY doc ORDER BY d.df, shingle) rnk
           FROM flat JOIN dfreq d USING (shingle)),
capped AS (SELECT doc, shingle FROM ranked WHERE rnk <= 40),
sizes AS (SELECT doc, COUNT(*) sz FROM capped GROUP BY doc),
inter AS (SELECT a.doc doc_a, b.doc doc_b, COUNT(*) inter FROM capped a
          JOIN capped b USING (shingle) WHERE a.doc < b.doc GROUP BY 1,2)
SELECT doc_a, doc_b, inter, sa.sz sz_a, sb.sz sz_b,
       ROUND(inter/(sa.sz+sb.sz-inter),6) jaccard
FROM inter JOIN sizes sa ON sa.doc=doc_a JOIN sizes sb ON sb.doc=doc_b
WHERE inter/(sa.sz+sb.sz-inter) >= 0.5
"""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for naive, pref in ((naive_t50, SQL_DEDUP_NGRAM_T50),
                        (naive_capped, SQL_DEDUP_NGRAM_CAPPED)):
        n = con.sql(f"SELECT count(*) FROM ({pref})").fetchone()[0]
        assert n > 0
        d = con.sql(
            f"SELECT count(*) FROM ((({naive}) EXCEPT ({pref})) "
            f"UNION ALL (({pref}) EXCEPT ({naive})))"
        ).fetchone()[0]
        assert d == 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ngram_precompute_stmts_match_driver_sql(sf_dir):
    """The staged ORACLE_PRECOMPUTE build (sliced INSERTs — one
    bounded DISTINCT pipeline per statement, because DuckDB's
    out-of-core distinct materialized ~130 GB on the single-statement
    form at ×100) must yield row-identical results to the
    self-contained oracle strings the driver runs."""
    from journal_batch_processer_spark.queries.llmops import (
        SQL_DEDUP_NGRAM_CAPPED,
        SQL_DEDUP_NGRAM_CAPPED_PRE,
        SQL_DEDUP_NGRAM_T50,
        SQL_DEDUP_NGRAM_T50_PRE,
        _ngram_precompute_stmts,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for s in _ngram_precompute_stmts(n_slices=3):
        con.execute(s)
    for plain, staged in ((SQL_DEDUP_NGRAM_T50, SQL_DEDUP_NGRAM_T50_PRE),
                          (SQL_DEDUP_NGRAM_CAPPED, SQL_DEDUP_NGRAM_CAPPED_PRE)):
        n = con.sql(f"SELECT count(*) FROM ({staged})").fetchone()[0]
        assert n > 0
        d = con.sql(
            f"SELECT count(*) FROM ((({plain}) EXCEPT ({staged})) "
            f"UNION ALL (({staged}) EXCEPT ({plain})))"
        ).fetchone()[0]
        assert d == 0
