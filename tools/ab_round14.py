"""Interleaved A/B adjudication for the round-14 watch-list keys
(BASELINE.md host-noise protocol / OPTIMIZATION_r13 §15): run the
variants ALTERNATING inside one session, pair them per round, and
count per-round wins — sequential min-of-N blocks are confounded by
contention drifting between blocks on this box.

    python tools/ab_round14.py [--rounds 7] bigrams|kmeans

Variant B re-implements the pre-r13 shape verbatim (from git history /
the equivalence tests) via a monkeypatch; the registry query functions
are untouched, so variant A is exactly the shipped code path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _interval_frac, _proc_stat  # noqa: E402
from journal_batch_processer_spark.cache import release_all  # noqa: E402
from journal_batch_processer_spark.queries import REGISTRY  # noqa: E402
from journal_batch_processer_spark.session import get_spark  # noqa: E402


def _bigram_rows_transform_shape():
    """The pre-23be05b bigram build: transform(sequence(1, n-1),
    i -> element_at || ' ' || element_at) — verbatim the shape pinned
    in tests/test_round13_gram_shapes.py."""
    from pyspark.sql import functions as F

    def bigram_rows_old(df, id_col, text_col, extra_cols=()):
        t = F.split(F.col(text_col), " ")
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
        return df.select(
            F.col(id_col).alias("doc"),
            *extra_cols,
            F.explode(grams).alias("bg"),
        )

    return bigram_rows_old


def _kmeans_r12():
    """Pre-f2c4d6b kmeans_integer_distributed: no size gate, no count
    job — the expression assign + posexplode round shape verbatim."""
    from pyspark.sql import functions as F

    from journal_batch_processer_spark.operators.similarity import KMI_SCALE

    def kmeans_old(embs, k=8, n_iters=3, dim=64, id_col="vec_id",
                   vec_col="embedding", n_rows=None):
        del n_rows  # r12 shape had no gate; accept and ignore the hint
        q = embs.select(
            F.col(id_col).alias("vec_id"),
            F.expr(
                f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) "
                f"* {KMI_SCALE} + 0.5D) AS BIGINT))"
            ).alias("qv"),
        ).localCheckpoint()
        seed_rows = (
            q.withColumn(
                "__h", F.md5(F.concat(F.lit("kmi:"), F.col("vec_id").cast("string")))
            )
            .orderBy("__h", "vec_id")
            .limit(k)
            .orderBy("vec_id")
            .collect()
        )
        cents = [list(r["qv"]) for r in seed_rows]

        def assign(cent_rows):
            structs = []
            for i, c in enumerate(cent_rows):
                arr = "array(" + ",".join(f"{v}L" for v in c) + ")"
                structs.append(
                    "named_struct('dist', "
                    f"aggregate(zip_with(qv, {arr}, (a, b) -> (a - b) * (a - b)), "
                    "CAST(0 AS BIGINT), (acc, x) -> acc + x), "
                    f"'cluster', {i})"
                )
            best = f"array_min(array({', '.join(structs)}))"
            scored = q.select("vec_id", "qv", F.expr(best).alias("__best"))
            return scored.select(
                "vec_id",
                "qv",
                F.col("__best.cluster").alias("cluster"),
                F.col("__best.dist").alias("dist"),
            )

        for _ in range(n_iters):
            a = assign(cents)
            sums = (
                a.select("cluster", F.posexplode("qv").alias("d", "v"))
                .groupBy("cluster", "d")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            by_cluster = {}
            for r in sums:
                by_cluster.setdefault(r["cluster"], {})[r["d"]] = (r["s"], r["n"])

            def trunc_div(s, n):
                q_ = abs(s) // n
                return q_ if s >= 0 else -q_

            new_cents = []
            for i in range(k):
                if i in by_cluster:
                    dims = by_cluster[i]
                    new_cents.append(
                        [trunc_div(dims[d][0], dims[d][1]) for d in range(dim)]
                    )
                else:
                    new_cents.append(cents[i])
            cents = new_cents
        return assign(cents).select("vec_id", "cluster", "dist")

    return kmeans_old


EXPERIMENTS = {
    "bigrams": {
        "keys": ["text_ngramlm", "dsir_select", "quality_classifier", "text_bigrams"],
    },
    "kmeans": {
        "keys": ["kmeans_distributed"],
    },
}


def _apply_variant(exp: str, variant: str):
    """Install variant B's monkeypatch (or restore A). Returns undo fn."""
    if exp == "bigrams":
        import journal_batch_processer_spark.operators.text_analysis as ta

        orig = ta.bigram_rows
        if variant == "B":
            ta.bigram_rows = _bigram_rows_transform_shape()

        def undo():
            ta.bigram_rows = orig

        return undo
    if exp == "kmeans":
        import journal_batch_processer_spark.operators.similarity as sim

        orig = sim.kmeans_integer_distributed
        if variant == "B":
            sim.kmeans_integer_distributed = _kmeans_r12()

        def undo():
            sim.kmeans_integer_distributed = orig

        return undo
    raise ValueError(exp)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("exp", choices=sorted(EXPERIMENTS))
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys = EXPERIMENTS[args.exp]["keys"]
    spark = get_spark("jbp-ab14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm-up

    results: dict[str, dict[str, list[float]]] = {
        k: {"A": [], "B": []} for k in keys
    }
    for rnd in range(args.rounds):
        order = ["A", "B"] if rnd % 2 == 0 else ["B", "A"]
        for variant in order:
            undo = _apply_variant(args.exp, variant)
            try:
                for key in keys:
                    fn = REGISTRY[key].fn
                    spark.sparkContext.setJobDescription(
                        f"ab14:{args.exp}:{key}:{variant}:r{rnd}"
                    )
                    s0 = _proc_stat()
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    wall = time.perf_counter() - t0
                    frac = _interval_frac(s0, _proc_stat())
                    release_all()
                    results[key][variant].append(round(wall, 3))
                    print(
                        f"# r{rnd} {key} {variant}: {wall:.3f}s steal={frac}",
                        flush=True,
                    )
            finally:
                undo()
    for key in keys:
        a, b = results[key]["A"], results[key]["B"]
        wins_a = sum(1 for x, y in zip(a, b) if x < y)
        print(
            f"{key}: A(current) min={min(a):.3f} med={sorted(a)[len(a)//2]:.3f} "
            f"| B(old) min={min(b):.3f} med={sorted(b)[len(b)//2]:.3f} "
            f"| A wins {wins_a}/{len(a)} rounds | A={a} B={b}",
            flush=True,
        )


if __name__ == "__main__":
    main()
