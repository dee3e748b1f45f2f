"""Round-8 additions: dedup generator auto-selection (VERDICT r07 #5)
— routing is pure and unit-tested; both routes must stay
output-identical for identical semantics (threshold + caps), including
the df cap newly supported on the prefix path."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _pairs_key(rows):
    return sorted(
        (r.doc_a, r.doc_b, r.inter, r.sz_a, r.sz_b, round(r.jaccard, 9))
        for r in rows
    )


def test_generator_routing_pure():
    from journal_batch_processer_spark.operators.dedup import (
        PREFIX_CROSSOVER_THRESHOLD,
        select_jaccard_generator,
    )

    assert select_jaccard_generator(0.05) == "naive"
    assert select_jaccard_generator(0.2) == "naive"  # measured loser for prefix
    assert select_jaccard_generator(0.5) == "prefix"  # measured winner
    assert select_jaccard_generator(PREFIX_CROSSOVER_THRESHOLD) == "prefix"
    # the mega-doc cap exists only on the prefix path → forced routing
    assert select_jaccard_generator(0.05, max_shingles_per_doc=40) == "prefix"


def test_auto_output_identical_across_crossover(spark):
    from journal_batch_processer_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_auto,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # below crossover: auto routes naive; prefix must agree anyway
    # (equality is the invariant that MAKES routing safe)
    for t in (0.2, 0.5):
        naive = _pairs_key(
            ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=t, max_shingle_df=20
            ).collect()
        )
        prefix = _pairs_key(
            ngram_jaccard_pairs_prefix(
                docs, "doc_id", "text", threshold=t, max_shingle_df=20
            ).collect()
        )
        auto = _pairs_key(
            ngram_jaccard_pairs_auto(
                docs, "doc_id", "text", threshold=t, max_shingle_df=20
            ).collect()
        )
        assert naive == prefix, f"t={t}: paths diverge"
        assert auto == naive, f"t={t}: auto diverges"
        assert naive, f"t={t}: fixture produced no pairs (vacuous test)"
