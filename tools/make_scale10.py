"""Synthesize a 10×-sf0.1 dataset ("sf1-ish") for scale-robustness
sweeps (VERDICT r05 #6): no sf1 fixtures exist, so replicate the big
tables 10× with key offsets and a per-copy text perturbation, and link
the small dimensions unchanged.

Both the Spark query and the DuckDB oracle read the SAME parquet, so
any content works for correctness sweeps — the perturbed copies keep
near-dup density realistic (copy 0 is verbatim; copies 1..9 get a
copy-tag token appended, so exact-dup logic sees singletons while
shingle/minhash paths see dense near-dup clusters, 10× the corpus and
~100× the candidate-pair pressure of sf0.1).

    python tools/make_scale10.py [/tmp/jbp_sf10x] [factor=10]

A factor of 100 gives the "sf1-equivalent" corpus (~10M events /
500k docs / 1M vectors) used for the 100x heavy-tail sweep
(SWEEP_r10.md).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SMALL = ["region", "nation", "customer", "supplier", "part", "lineitem"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jbp_sf10x"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    copies = f"UNNEST(generate_series(0, {factor - 1})) AS c"

    jobs = {
        # copy 0 verbatim; other copies append a copy-tag token so the
        # corpus is near-dup-dense, not exact-dup-degenerate
        "documents": f"""
            SELECT doc_id + c * 1000000 AS doc_id,
                   CASE WHEN c = 0 THEN text
                        ELSE text || ' c' || c END AS text,
                   lang, source,
                   CASE WHEN c = 0 THEN n_chars
                        ELSE n_chars + 3 END AS n_chars
            FROM (SELECT *, {copies} FROM {src('documents')})
        """,
        "embeddings": f"""
            SELECT vec_id + c * 1000000 AS vec_id, embedding, label
            FROM (SELECT *, {copies} FROM {src('embeddings')})
        """,
        "orders": f"""
            SELECT o_orderkey + c * 100000000 AS o_orderkey,
                   o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM (SELECT *, {copies} FROM {src('orders')})
        """,
        "events": f"""
            SELECT event_id + c * 100000000 AS event_id,
                   ts + to_microseconds(c) AS ts,
                   user_id + c * 1000000 AS user_id,
                   event_type, value, props
            FROM (SELECT *, {copies} FROM {src('events')})
        """,
    }
    for t, q in jobs.items():
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in SMALL:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
