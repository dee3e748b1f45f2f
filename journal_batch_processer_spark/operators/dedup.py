"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-conscious:

- exact key/content dedup: hash-groupBy with min-id winner (never
  ``dropDuplicates`` when determinism matters — it keeps an arbitrary
  row). At 100 TB: pre-hash the content (``sha2``/``md5``) so the
  shuffle key is 16 bytes, not a 100 KB document, and repartition by
  that hash.
- n-gram Jaccard: explode distinct shingles → self-join on shingle →
  per-pair intersection counts. The join is the classic candidate
  generator; frequent-shingle skew is the hazard at scale, so a
  document-frequency cap filters stop-shingles before the join.
- MinHash + LSH banding: fixed-seed affine permutations over xxhash64
  shingle hashes; band-hash buckets become join keys so candidate
  generation is linear, never all-pairs.
- SimHash: per-token hash bit votes aggregated into a 32-bit
  fingerprint; near-dups differ in ≤ k bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 31-bit Mersenne prime keeps a*h+b < 2^47 — no ANSI long overflow
_MERSENNE = (1 << 31) - 1


def dedup_exact(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """One row per key group: the minimum id wins (deterministic),
    with the duplicate count kept for auditing."""
    return df.groupBy(*keys).agg(
        F.min(id_col).alias(f"first_{id_col}"),
        F.count(F.lit(1)).alias("n_dupes"),
    )


def content_hash(col: F.Column) -> F.Column:
    """16-byte shuffle key for content dedup at scale."""
    return F.md5(col)


def tokens_col(text: F.Column) -> F.Column:
    return F.split(F.lower(text), " ")


def shingles_col(text: F.Column, n: int = 3) -> F.Column:
    """Distinct n-gram shingles (space-joined token windows).

    Guarded for short texts: Spark's ``sequence(1, 0)`` DESCENDS
    instead of being empty, so gate on token count first.
    """
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.1,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle self-join.

    ``max_shingle_df`` drops shingles appearing in more than N docs
    before the join — the skew guard that keeps the candidate join
    linear-ish at scale.
    """
    # shingles are already distinct per doc (array_distinct) — no extra
    # dedup shuffle needed. Persist: the exploded table feeds both join
    # sides AND the size aggregate; without it Spark re-runs the
    # shingle transform per consumer (measured 17× slower). At cluster
    # scale this materialization is a written shingle table.
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
    ).persist()
    if max_shingle_df is not None:
        w_ok = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(
            F.broadcast(w_ok.filter(F.col("df_") <= max_shingle_df).select("shingle")),
            "shingle",
        )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")


def shingle_hashes_col(text: F.Column, n: int = 3) -> F.Column:
    """xxhash64 of each shingle, reduced mod 2^31-1."""
    return F.transform(
        shingles_col(text, n), lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
    )


def minhash_signature_from_hashes(hashes: F.Column, n_hashes: int = 32) -> F.Column:
    """MinHash signature from a PRE-MATERIALIZED shingle-hash array.

    Keep the hash array a real column (cached/stored), not an inline
    expression: Catalyst's projection collapse would otherwise inline
    the whole tokenize→shingle→hash pipeline into each of the
    ``n_hashes`` permutations (measured 30× slowdown).
    """
    sigs = []
    for j in range(n_hashes):
        a, b = 2 * j + 1, (0x9E3779B9 * (j + 1)) % _MERSENNE
        sigs.append(
            F.array_min(F.transform(hashes, lambda h: (h * a + b) % _MERSENNE))
        )
    return F.array(*sigs)


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidates.

    Shuffle profile: one explode to (doc, band, bucket), one groupBy-
    join on (band, bucket) — linear in corpus size + bucket collisions;
    never an all-pairs cross join.
    """
    rows_per_band = n_hashes // bands
    hashed = df.select(
        F.col(id_col).alias("doc"),
        shingle_hashes_col(F.col(text_col), n).alias("hs"),
    ).persist()  # materialization point: break projection collapse
    sig = hashed.select(
        "doc", minhash_signature_from_hashes(F.col("hs"), n_hashes).alias("sig")
    ).persist()
    band_cols = [
        F.hash(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)).alias(
            f"b{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_cols[b].alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    left = banded.select(F.col("doc").alias("doc_a"), "band", "bucket")
    right = banded.select(F.col("doc").alias("doc_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_fingerprint(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """Per-document SimHash: explode tokens, vote each bit of the token
    hash, reassemble the fingerprint. One shuffle (groupBy doc)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    )
    h = F.abs(F.xxhash64("tok"))
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(((h / (1 << b)) % 2).cast("int") == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return votes.select("doc", fp.cast("long").alias("simhash"))
