"""Curation operators: data-dependent corpus mixing, per-group
reservoirs, k-means clustering, SemDeDup semantic dedup."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

EMB_PATH = os.path.join(SF_DIR, "embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(EMB_PATH)


@pytest.fixture(scope="module")
def centroids():
    from journal_batch_processer_spark.operators.similarity import (
        train_ivf_centroids,
    )

    return train_ivf_centroids(EMB_PATH, n_centroids=16)


# ---------------------------------------------------------------------------
# corpus_mix
# ---------------------------------------------------------------------------

SHARES = {"en": 400_000, "zh": 200_000, "de": 200_000, "fr": 200_000}


def test_corpus_mix_hits_target_proportions(docs):
    from journal_batch_processer_spark.operators.sampling import corpus_mix

    out = corpus_mix(docs.select("doc_id", "lang"), "doc_id", "lang", SHARES)
    rows = out.groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in rows}
    assert set(got) <= set(SHARES)  # out-of-scope strata dropped
    total = sum(got.values())
    for s, ppm in SHARES.items():
        # md5 thresholding is binomial around the target; 20% rel slack
        assert got[s] == pytest.approx(total * ppm / 1e6, rel=0.2)


def test_corpus_mix_keeps_scarcest_stratum_whole(docs):
    from journal_batch_processer_spark.operators.sampling import corpus_mix

    base = docs.select("doc_id", "lang")
    in_counts = {
        r["lang"]: r["count"]
        for r in base.filter(F.col("lang").isin(*SHARES))
        .groupBy("lang")
        .count()
        .collect()
    }
    binding = min(SHARES, key=lambda s: in_counts[s] / SHARES[s] * 1e6)
    out = corpus_mix(base, "doc_id", "lang", SHARES)
    got = {
        r["lang"]: (r["count"], r["ppm"])
        for r in out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("count"), F.max("keep_ppm").alias("ppm"))
        .collect()
    }
    assert got[binding][0] == in_counts[binding]  # kept in full
    assert got[binding][1] == 1_000_000
    for s in SHARES:
        if s != binding:
            assert got[s][1] < 1_000_000


def test_corpus_mix_membership_is_stable_hash(docs):
    """Kept set must be a pure function of doc_id — repartitioning the
    input must not change membership."""
    from journal_batch_processer_spark.operators.sampling import corpus_mix

    base = docs.select("doc_id", "lang")
    a = {r["doc_id"] for r in corpus_mix(base, "doc_id", "lang", SHARES).collect()}
    b = {
        r["doc_id"]
        for r in corpus_mix(
            base.repartition(13), "doc_id", "lang", SHARES
        ).collect()
    }
    assert a == b


def test_corpus_mix_rejects_bad_shares(docs):
    from journal_batch_processer_spark.operators.sampling import corpus_mix

    with pytest.raises(ValueError, match="sum to 1e6"):
        corpus_mix(docs, "doc_id", "lang", {"en": 1})
    with pytest.raises(ValueError, match="at least one"):
        corpus_mix(docs, "doc_id", "lang", {})


# ---------------------------------------------------------------------------
# sample_reservoir
# ---------------------------------------------------------------------------


def test_reservoir_matches_naive_single_window(docs):
    """The two-level (salt-cell then group) rewrite must be EXACTLY the
    single-window top-k."""
    from journal_batch_processer_spark.operators.sampling import (
        reservoir_per_group,
    )

    base = docs.select("doc_id", "lang")
    got = {
        (r["lang"], r["doc_id"], r["rn"])
        for r in reservoir_per_group(base, "lang", "doc_id", 10).collect()
    }
    h = F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    naive = {
        (r["lang"], r["doc_id"], r["rn"])
        for r in base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    assert got == naive


def test_reservoir_size_is_min_k_group(docs):
    from journal_batch_processer_spark.operators.sampling import (
        reservoir_per_group,
    )

    base = docs.select("doc_id", "lang")
    sizes = {
        r["lang"]: r["count"] for r in base.groupBy("lang").count().collect()
    }
    out = reservoir_per_group(base, "lang", "doc_id", 10)
    got = {
        r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()
    }
    for lang, n in sizes.items():
        assert got[lang] == min(10, n)


def test_reservoir_small_salt_count_still_exact(docs):
    """n_salt=1 degenerates to the naive form; n_salt>k still exact."""
    from journal_batch_processer_spark.operators.sampling import (
        reservoir_per_group,
    )

    base = docs.select("doc_id", "lang").filter(F.col("lang") == "en")
    ref = {
        r["doc_id"]
        for r in reservoir_per_group(base, "lang", "doc_id", 5, n_salt=1).collect()
    }
    for n_salt in (3, 32):
        got = {
            r["doc_id"]
            for r in reservoir_per_group(
                base, "lang", "doc_id", 5, n_salt=n_salt
            ).collect()
        }
        assert got == ref


# ---------------------------------------------------------------------------
# embed_kmeans / dedup_semantic
# ---------------------------------------------------------------------------


def _numpy_assignment(centroids):
    """Independent model: unit vectors, cosine argmax, ties → low cell."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{EMB_PATH}') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = np.array(centroids, dtype=np.float64)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = xn @ cn.T
    assign = sims.argmax(axis=1)
    return ids, xn, assign


def test_kmeans_assignment_matches_numpy_model(spark, embs, centroids):
    from journal_batch_processer_spark.operators.similarity import (
        assign_nearest_centroid,
    )

    a = assign_nearest_centroid(embs, centroids, 64)
    got = {r["vec_id"]: r["cell"] for r in a.collect()}
    ids, _, assign = _numpy_assignment(centroids)
    # float64 expression fold vs numpy dot can differ in the last ulp;
    # allow disagreement only where the numpy margin is degenerate
    mismatch = [i for i, v in zip(assign, ids) if got[v] != i]
    assert len(mismatch) <= 2


def test_kmeans_cells_are_balanced(spark, embs, centroids):
    from journal_batch_processer_spark.operators.similarity import (
        assign_nearest_centroid,
    )

    a = assign_nearest_centroid(embs, centroids, 64)
    sizes = [r["count"] for r in a.groupBy("cell").count().collect()]
    assert len(sizes) >= 12
    assert max(sizes) <= 4 * (sum(sizes) / len(sizes))


def test_semantic_dedup_verdicts_match_numpy_model(spark, embs, centroids):
    """Every kept/dropped verdict reproduced by an independent numpy
    SemDeDup (same cells, exact cosines, same closer-to-centroid
    rule)."""
    from journal_batch_processer_spark.operators.similarity import (
        semantic_dedup,
    )

    tau = 0.4
    out = semantic_dedup(embs, centroids, 64, tau)
    got = {r["vec_id"]: (r["cell"], r["kept"]) for r in out.collect()}
    assert len(got) == embs.count()

    ids, xn, assign = _numpy_assignment(centroids)
    cents = np.array(centroids, dtype=np.float64)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    csim = (xn * cn[assign]).sum(axis=1)
    disagreements = 0
    for i, vid in enumerate(ids):
        cell_mates = [
            j for j in range(len(ids)) if assign[j] == assign[i] and j != i
        ]
        dropped = any(
            float(xn[i] @ xn[j]) >= tau
            and (
                csim[j] > csim[i]
                or (csim[j] == csim[i] and ids[j] < ids[i])
            )
            for j in cell_mates
        )
        if got[vid][1] != (0 if dropped else 1):
            disagreements += 1
    # ulp-level cosine/argmax differences may flip a handful of
    # boundary verdicts; the oracle check is the exact gate
    assert disagreements <= 5


def test_semantic_dedup_keeps_at_least_one_per_cluster(spark, embs, centroids):
    from journal_batch_processer_spark.operators.similarity import (
        semantic_dedup,
    )

    out = semantic_dedup(embs, centroids, 64, 0.4)
    per_cell = (
        out.groupBy("cell").agg(F.sum("kept").alias("n_kept")).collect()
    )
    for r in per_cell:
        assert r["n_kept"] >= 1


def test_kmeans_distributed_matches_python_model(spark, embs):
    """The 3-round distributed integer Lloyd must equal a pure-Python
    integer Lloyd (same quantization, trunc-division means, md5 init,
    tie rules)."""
    import hashlib
    import math

    from journal_batch_processer_spark.operators.similarity import (
        KMI_SCALE,
        kmeans_integer_distributed,
    )

    k, iters, dim = 8, 3, 64
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_integer_distributed(embs, k=k, n_iters=iters).collect()
    }

    rows = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in embs.collect()
    )
    qv = {
        vid: [int(math.floor(x * KMI_SCALE + 0.5)) for x in v]
        for vid, v in rows
    }
    seed = sorted(
        qv, key=lambda vid: (hashlib.md5(f"kmi:{vid}".encode()).hexdigest(), vid)
    )[:k]
    cents = [qv[vid] for vid in sorted(seed)]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign():
        out = {}
        for vid, v in qv.items():
            best = min(range(k), key=lambda c: (d2(v, cents[c]), c))
            out[vid] = (best, d2(v, cents[best]))
        return out

    def trunc_div(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    for _ in range(iters):
        a = assign()
        sums = {}
        for vid, (c, _) in a.items():
            acc = sums.setdefault(c, [[0] * dim, 0])
            acc[1] += 1
            for d in range(dim):
                acc[0][d] += qv[vid][d]
        for c in range(k):
            if c in sums:
                tot, n = sums[c]
                cents[c] = [trunc_div(tot[d], n) for d in range(dim)]
    want = assign()
    assert got == want
