"""Local mimic of the driver's correctness gate.

Runs every (or the named) REGISTRY query at sf0.01 on Spark AND its
DuckDB oracle over the same parquet, comparing row count, sorted
column names, and the order-insensitive multiset of rows.

    python tools/check_oracle.py                 # all
    python tools/check_oracle.py desc_extract …  # subset
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
# Lazy oracle builders (trained IVF centroids / PQ codebooks / k-means
# literals) read SPARK_GRAFT_ORACLE_SF_DIR to train the SQL side's
# inlined literals. When sweeping a non-default directory, the two
# engines MUST train on the same corpus — default it to SF_DIR instead
# of silently training the oracle on sf0.01 (r06 10×-sweep footgun:
# every lazy-trained key "failed" with centroid-literal drift).
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v, strict: bool = False):
    """Canonicalize a cell for cross-engine compare.

    strict=True preserves type identity (bool != int, Decimal stays
    exact, tz kept) — the driver's hash is type-sensitive, so only a
    strict match predicts driver parity. strict=False is the legacy
    loose compare, used to LABEL which queries rely on normalization.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return v if strict else int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        if strict:
            return ("ts", v.isoformat(), v.tzinfo is not None)
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return ("date", v.isoformat()) if strict else v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm_val(x, strict) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_val(x, strict)) for k, x in v.items()))
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("dec", str(v)) if strict else float(v)
    return v


def _sort_key(t):
    return tuple((v is None, str(type(v)), str(v)) for v in t)


def rows_to_multiset(cols, rows, strict: bool = False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_val(r[i], strict) for i in order) for r in rows), key=_sort_key
    )


def main() -> int:
    import duckdb

    from journal_batch_processer_spark.cache import release_all
    from journal_batch_processer_spark.queries import REGISTRY
    from journal_batch_processer_spark.queries.registry import resolve_oracle
    from journal_batch_processer_spark.session import get_spark

    names = sys.argv[1:] or sorted(REGISTRY)
    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    # Sweep accelerator: expensive shared oracle fragments (the
    # connected-component fixpoint) are materialized ONCE per run and
    # dependent keys run their table-referencing variants — identical
    # verdicts (same fixpoint text), ~O(keys)× less recursive-CTE
    # work. The driver still gets the self-contained strings.
    from journal_batch_processer_spark.queries.llmops import ORACLE_PRECOMPUTE

    pre_built: set[str] = set()

    def oracle_for(name: str, spec) -> str | None:
        for tbl, info in ORACLE_PRECOMPUTE.items():
            if name in info["keys"]:
                if tbl not in pre_built:
                    t0 = time.perf_counter()
                    con.execute(f"CREATE TEMP TABLE {tbl} AS {info['sql']}")
                    print(f"      [{tbl} materialized in "
                          f"{time.perf_counter()-t0:.1f}s]")
                    pre_built.add(tbl)
                return info["keys"][name]
        return resolve_oracle(spec)

    n_pass = n_fail = n_skip = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            sdf = spec.fn(spark, SF_DIR)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        finally:
            # scoped caches (ADVICE r06): operators pin shared
            # relations; the checker is the action driver, so it
            # releases them once the key's output is materialized
            release_all()
        if spec.oracle is None:
            print(f"skip  {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.perf_counter()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            rel = con.sql(oracle_for(name, spec))
            o_cols = list(rel.columns)
            o_types = [str(t).upper() for t in rel.types]
            o_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue

        problems = []
        # The driver's pandas canonicalizer sort_values()-es every
        # column, so a complex-typed Spark output column (array/map/
        # struct — unhashable in pandas) ERRORS driver-side even though
        # this script's own multiset compare handles lists fine
        # (r05 lesson: embed_quantize). Flag it as a failure here.
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            problems.append(
                f"spark cols {complex_cols} are complex-typed (driver "
                f"canonicalizer errs on list cells); emit array_join/"
                f"to_json instead"
            )
        # The driver's value hash is Arrow-type-sensitive: a DuckDB
        # HUGEINT (int128 in Arrow) never hash-matches Spark's int64
        # even when every value is equal — Python-level fetchall()
        # can't see the difference, so check the relation types.
        for c, t in zip(o_cols, o_types):
            if "HUGEINT" in t or "INT128" in t:
                problems.append(
                    f"oracle col {c!r} is {t} (Arrow int128 — driver "
                    f"hash-mismatch); CAST(... AS BIGINT) in the SQL"
                )
        if len(s_rows) != len(o_rows):
            problems.append(f"rows {len(s_rows)} != {len(o_rows)}")
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
            problems.append(f"cols {sorted(s_cols)} != {sorted(o_cols)}")
        normalized_note = ""
        if not problems:
            srows = [list(r) for r in s_rows]
            ms = rows_to_multiset(s_cols, srows, strict=True)
            mo = rows_to_multiset(o_cols, o_rows, strict=True)
            if ms != mo:
                # Strict (type-identity) mismatch: the driver's hash is
                # type-sensitive, so fall back to the loose compare only
                # to distinguish "value bug" from "type reliance" — and
                # flag the latter loudly instead of a silent pass.
                ls = rows_to_multiset(s_cols, srows)
                lo = rows_to_multiset(o_cols, o_rows)
                if ls == lo:
                    for a, b in zip(ms, mo):
                        if a != b:
                            normalized_note = (
                                f"  [TYPE-NORMALIZED ONLY — driver may fail: "
                                f"spark={a!r} vs oracle={b!r}]"
                            )
                            break
                else:
                    for i, (a, b) in enumerate(zip(ls, lo)):
                        if a != b:
                            problems.append(
                                f"first diff @sorted[{i}]: spark={a!r} oracle={b!r}"
                            )
                            break
                    else:
                        problems.append("length equal but content diff at tail")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(
                f"ok    {name} ({len(s_rows)} rows, "
                f"{time.perf_counter()-t0:.1f}s){normalized_note}"
            )
            n_pass += 1

    print(f"\n{n_pass} ok, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
