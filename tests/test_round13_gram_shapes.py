"""Equivalence pins for the r13 gram-generation reshapes.

Two operators replaced interpreted array-lambda gram builders
(`transform(sequence(...), i -> ...)` runs off whole-stage codegen)
with the posexplode + window-lead shape:

- ``winnow_fingerprints`` (text_winnowing / text_winnowing_pairs):
  k-token grams via ``lead(tok, i)`` over the token stream;
- ``langid_ngram`` (text_langid_ngram): character trigrams via
  ``lead(c, i)`` over ``split(lower(text), '')``.

These tests pin that the reshapes generate the *identical* gram
relation (same multiset per doc, same positions) as the original
expression forms, including unicode / short-string / repeated-gram
edge cases the sf fixtures may not cover densely.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from journal_batch_processer_spark.operators.dedup import (
    portable_hash64,
    tokens_col,
    winnow_fingerprints,
)

EDGE_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog the quick brown fox"),
    (2, "a b c"),  # shorter than k tokens -> no grams
    (3, ""),  # empty
    (4, "naïve café déjà-vu naïve café déjà-vu naïve café déjà-vu x y z"),
    (5, "one two three four five six seven eight nine ten"),
    (6, "dup dup dup dup dup dup dup dup dup dup"),  # all-equal grams
    (7, "Ünïcødé 文字 テスト mixed script tokens repeated 文字 テスト mixed"),
]


def _edge_df(spark):
    return spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")


def _winnow_reference(df, id_col, text_col, k, w):
    """The pre-r13 expression-shape implementation, verbatim."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
                ),
            ).otherwise(F.array())
        ).alias("idx", "gram"),
    )
    g = grams.select(
        "doc",
        "idx",
        portable_hash64(F.col("gram")).alias("fp"),
    ).withColumn(
        "key",
        F.format_string("%015x%06d", F.col("fp"), F.lit(999999) - F.col("idx")),
    )
    win = Window.partitionBy("doc").orderBy("idx").rowsBetween(0, w - 1)
    cnt = Window.partitionBy("doc")
    wm = (
        g.withColumn("wmin", F.min("key").over(win))
        .withColumn("__n", F.count("*").over(cnt))
        .filter(F.col("idx") <= F.col("__n") - w)
        .select(F.col("doc").alias("wdoc"), "wmin")
        .distinct()
    )
    return wm.join(
        g,
        (F.col("wdoc") == F.col("doc")) & (F.col("wmin") == F.col("key")),
    ).select("doc", F.col("idx").alias("pos"), "fp")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_winnow_lead_shape_matches_expression_on_fixture(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    got = _rows(winnow_fingerprints(docs, "doc_id", "text", k=4, w=5))
    want = _rows(_winnow_reference(docs, "doc_id", "text", k=4, w=5))
    assert got == want and len(got) > 0


def test_winnow_lead_shape_matches_expression_on_edge_docs(spark):
    docs = _edge_df(spark)
    got = _rows(winnow_fingerprints(docs, "doc_id", "text", k=4, w=5))
    want = _rows(_winnow_reference(docs, "doc_id", "text", k=4, w=5))
    assert got == want and len(got) > 0
    # vacuity guards: the edge set exercises no-gram and all-equal docs
    docs_with_fp = {r[0] for r in got}
    assert 2 not in docs_with_fp and 3 not in docs_with_fp
    assert 6 in docs_with_fp


def _trigrams_expression(df, id_col, text_col):
    """Pre-r13 interpreted-lambda trigram builder, verbatim."""
    t = F.lower(F.col(text_col))
    return df.filter(F.length(t) >= 3).select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.expr(
                f"transform(sequence(1, length(lower({text_col})) - 2), "
                f"i -> substring(lower({text_col}), i, 3))"
            )
        ).alias("g"),
    )


def _trigrams_lead(df, id_col, text_col):
    """The r13 posexplode + lead-window shape (mirrors langid_ngram)."""
    t = F.lower(F.col(text_col))
    chars = df.filter(F.length(t) >= 3).select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(t, "")).alias("pos", "c"),
    )
    w_ch = Window.partitionBy("doc").orderBy("pos")
    c2 = F.lead("c", 1).over(w_ch)
    c3 = F.lead("c", 2).over(w_ch)
    return (
        chars.select(
            "doc",
            F.when(c3.isNotNull(), F.concat("c", c2, c3)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )


def _gram_multiset(df):
    return sorted(
        tuple(r) for r in df.groupBy("doc", "g").count().collect()
    )


def test_langid_trigram_lead_shape_matches_expression(spark):
    docs = _edge_df(spark).union(
        spark.createDataFrame(
            [(8, "ab"), (9, "abc"), (10, "日本語のテキスト日本語")],
            "doc_id long, text string",
        )
    )
    got = _gram_multiset(_trigrams_lead(docs, "doc_id", "text"))
    want = _gram_multiset(_trigrams_expression(docs, "doc_id", "text"))
    assert got == want and len(got) > 0
    # 3-char doc produces exactly one gram; 2-char doc none
    by_doc = {}
    for doc, _, n in got:
        by_doc[doc] = by_doc.get(doc, 0) + n
    assert by_doc.get(9) == 1 and 8 not in by_doc


def test_langid_trigram_fixture_corpus(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    got = _gram_multiset(_trigrams_lead(docs, "doc_id", "text"))
    want = _gram_multiset(_trigrams_expression(docs, "doc_id", "text"))
    assert got == want and len(got) > 0


def _substring_spans_reference(df, id_col, text_col, k):
    """Pre-r13 expression-shape duplicated_substring_spans, verbatim."""
    from journal_batch_processer_spark.operators.dedup import tokens_col

    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    wins = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("o", "h"),
    )
    dup_h = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    dup = wins.join(dup_h, "h").select("doc", "o")
    w = Window.partitionBy("doc").orderBy("o")
    prev_end = F.max(F.col("o") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "brk", (F.col("o") > F.coalesce(prev_end, F.lit(-1))).cast("int")
    )
    isl = flagged.withColumn("island", F.sum("brk").over(w))
    return (
        isl.groupBy("doc", "island")
        .agg(
            F.min("o").alias("span_start"),
            (F.max("o") + k - F.min("o")).alias("span_len"),
            F.count(F.lit(1)).alias("n_dup_windows"),
        )
        .select(
            F.col("doc").alias(id_col),
            "span_start",
            "span_len",
            "n_dup_windows",
        )
    )


def test_substring_spans_lead_shape_matches_expression(spark):
    from journal_batch_processer_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    got = _rows(duplicated_substring_spans(docs, "doc_id", "text", k=15))
    want = _rows(_substring_spans_reference(docs, "doc_id", "text", k=15))
    assert got == want and len(got) > 0

    edge = _edge_df(spark)
    got_e = _rows(duplicated_substring_spans(edge, "doc_id", "text", k=4))
    want_e = _rows(_substring_spans_reference(edge, "doc_id", "text", k=4))
    assert got_e == want_e


def test_bigram_rows_matches_expression(spark):
    """bigram_rows (posexplode+lead) must emit the identical per-doc
    bigram multiset as the old transform/zip_with array builds."""
    from journal_batch_processer_spark.operators.text_analysis import (
        bigram_rows,
    )

    # ids offset so edge and fixture docs never collide: every
    # lead-window gram builder requires unique ids per row (see
    # bigram_rows docstring)
    docs = _edge_df(spark).selectExpr("doc_id + 1000000 AS doc_id", "text").union(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    want = sorted(
        tuple(r)
        for r in docs.select(
            F.col("doc_id").alias("doc"), F.explode(grams).alias("bg")
        )
        .groupBy("doc", "bg")
        .count()
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in bigram_rows(docs, "doc_id", "text")
        .groupBy("doc", "bg")
        .count()
        .collect()
    )
    assert got == want and len(got) > 0


def test_bigram_rows_extra_cols_passthrough(spark):
    from journal_batch_processer_spark.operators.text_analysis import (
        bigram_rows,
    )

    docs = spark.createDataFrame(
        [(1, "a b c", True), (2, "x y", False)],
        "doc_id long, text string, flag boolean",
    )
    rows = sorted(
        tuple(r)
        for r in bigram_rows(
            docs, "doc_id", "text", extra_cols=("flag",)
        ).collect()
    )
    assert rows == [(1, True, "a b"), (1, True, "b c"), (2, False, "x y")]


def _langid_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_langid_mapinpandas_matches_expression_spec(spark):
    """The r13 mapInPandas classifier is bit-identical to the
    expression-form spec the DuckDB oracle mirrors — on the fixture
    corpus (real profiles) and on edge docs (unicode, 3-char boundary,
    tie-heavy repeated grams) with synthetic profiles."""
    from journal_batch_processer_spark.operators.text_analysis import (
        langid_ngram,
        langid_ngram_expr,
        train_langid_profiles,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    profiles = train_langid_profiles(path)
    docs = spark.read.parquet(path).select("doc_id", "text")
    got = _langid_rows(langid_ngram(docs, "doc_id", "text", profiles))
    want = _langid_rows(langid_ngram_expr(docs, "doc_id", "text", profiles))
    assert got == want and len(got) > 0

    edge = _edge_df(spark).union(
        spark.createDataFrame(
            [(8, "ab"), (9, "abc"), (10, "日本語のテキスト日本語"),
             (11, "AAA BBB aaa bbb")],  # lower() + tie-break exercise
            "doc_id long, text string",
        )
    )
    # synthetic profiles: overlapping grams so ranks differ per lang,
    # tie-equal distances so the alphabetical tie-break is exercised
    prof = {
        "aa": ["the", "he ", " qu", "abc", "日本語"[0:3]],
        "bb": ["abc", "the", "aaa", " bb", "ïcø"],
        "cc": ["zzz", "yyy", "xxx"],  # matches nothing -> all-penalty
    }
    got_e = _langid_rows(langid_ngram(edge, "doc_id", "text", prof))
    want_e = _langid_rows(langid_ngram_expr(edge, "doc_id", "text", prof))
    assert got_e == want_e and len(got_e) > 0
    by_doc = dict((r[0], (r[1], r[2])) for r in got_e)
    assert 8 not in by_doc and 3 not in by_doc  # <3 chars filtered
    assert 9 in by_doc  # 3-char boundary doc classified


def _shingle_window_reference(df, id_col, text_col, n):
    """The pre-r13 shingle_table shape (posexplode + window lead +
    distinct), verbatim."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (
        toks.select(
            "doc",
            F.when(
                parts[-1].isNotNull(), F.concat_ws(" ", *parts)
            ).alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )


def test_shingle_table_zipwith_matches_window_shape(spark):
    """The r13 zero-exchange shingle_table (zip_with over shifted
    slices + array_distinct + explode) emits exactly the distinct
    (doc, shingle) row set of the old window shape — pinned on the
    edge docs (short/empty/all-equal/unicode) and a slice of the
    fixture corpus, for n=2..4."""
    from journal_batch_processer_spark.operators.dedup import shingle_table

    corpus = _edge_df(spark).union(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .limit(80)
        .select((F.col("doc_id") + 100).alias("doc_id"), "text")
    )
    for n in (2, 3, 4):
        got = sorted(map(tuple, shingle_table(corpus, "doc_id", "text", n).collect()))
        want = sorted(
            map(
                tuple,
                _shingle_window_reference(corpus, "doc_id", "text", n).collect(),
            )
        )
        assert got == want
        assert len(got) > 0
