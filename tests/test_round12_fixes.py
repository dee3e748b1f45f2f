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
