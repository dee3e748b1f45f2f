"""Pins the --hash fast path of tools/check_oracle.py to the strict
multiset compare (VERDICT r10 item 2, double/float leg added r12).

The fast path reduces both engines to (count, sum(h1), sum(h2)) where
h1/h2 are 60-bit md5 slices over type-tagged canonical row renderings.
These tests prove, on a fixture covering every tagged type:

  1. identical multisets hash identically across Spark and DuckDB —
     i.e. the per-type canonical renderings really agree engine-to-
     engine (the one property the mismatch-fallback can NOT protect:
     a rendering that diverges identically on both sides would be
     fine; one that makes DIFFERENT data collide would not, and cell
     md5s + type tags exclude that by construction);
  2. a single perturbed value flips the signature (value sensitivity)
     — including a 1-ulp double perturbation (the 'f' rendering is
     the IEEE-754 bit pattern, so it is bit-exact by construction);
  3. duplicated rows are counted with multiplicity (SUM, not XOR);
  4. unsafe types (array / HUGEINT) are declared ineligible so those
     keys keep the strict path.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import (  # noqa: E402
    duck_hash_expr,
    register_duck_hash_fns,
    spark_hash_row_expr,
    spark_hash_signature,
)


def _spark_sig(sdf):
    sig = spark_hash_signature(sdf)
    assert sig is not None
    return sig


def _duck_sig(rel):
    expr = duck_hash_expr(list(rel.columns), [str(t) for t in rel.types])
    assert expr is not None
    r = rel.aggregate(expr).fetchall()[0]
    return (int(r[0]), int(r[1] or 0), int(r[2] or 0))


ROWS = [
    # (s string, i long, b bool, d date, t timestamp, n decimal,
    #  x bytes, f double)
    ("alpha", 1, True, datetime.date(2023, 1, 5),
     datetime.datetime(2023, 1, 5, 12, 34, 56),
     decimal.Decimal("5.00"), b"ab", 0.1),
    ("be|ta\x1fgamma", -7, False, datetime.date(1999, 12, 31),
     datetime.datetime(2023, 1, 5, 12, 34, 56, 120000),
     decimal.Decimal("-5.50"), b"\x00\xff", -0.0),
    (None, None, None, None, None, None, None, None),
    ("alpha", 1, True, datetime.date(2023, 1, 5),
     datetime.datetime(2023, 1, 5, 12, 34, 56),
     decimal.Decimal("5.00"), b"ab", 0.1),  # exact duplicate
]

_DDL = """
CREATE OR REPLACE TABLE t AS
SELECT * FROM (VALUES
  ('alpha', CAST(1 AS BIGINT), TRUE, DATE '2023-01-05',
   TIMESTAMP '2023-01-05 12:34:56', CAST(5.00 AS DECIMAL(12,2)),
   '\\x61\\x62'::BLOB, CAST(0.1 AS DOUBLE)),
  ('be|ta' || chr(31) || 'gamma', -7, FALSE, DATE '1999-12-31',
   TIMESTAMP '2023-01-05 12:34:56.120', CAST(-5.50 AS DECIMAL(12,2)),
   '\\x00\\xFF'::BLOB, CAST('-0.0' AS DOUBLE)),  -- string cast: the
   -- numeric literal -0.0 parses as DECIMAL and loses the sign bit
  (NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  ('alpha', 1, TRUE, DATE '2023-01-05',
   TIMESTAMP '2023-01-05 12:34:56', CAST(5.00 AS DECIMAL(12,2)),
   '\\x61\\x62'::BLOB, CAST(0.1 AS DOUBLE))
) v(s, i, b, d, t, n, x, f)
"""


@pytest.fixture(scope="module")
def sdf(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("d", T.DateType()),
        T.StructField("t", T.TimestampType()),
        T.StructField("n", T.DecimalType(12, 2)),
        T.StructField("x", T.BinaryType()),
        T.StructField("f", T.DoubleType()),
    ])
    return spark.createDataFrame(ROWS, schema)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    register_duck_hash_fns(c)
    c.execute(_DDL)
    return c


def test_identical_multisets_hash_equal_cross_engine(sdf, con):
    assert _spark_sig(sdf) == _duck_sig(con.sql("SELECT * FROM t"))


def test_row_order_irrelevant(sdf, con):
    assert _spark_sig(sdf) == _duck_sig(
        con.sql("SELECT * FROM t ORDER BY i DESC NULLS FIRST")
    )


def test_single_value_perturbation_detected(sdf, con):
    oracle = con.sql(
        "SELECT s, CASE WHEN i = -7 THEN CAST(-8 AS BIGINT) ELSE i END AS i,"
        " b, d, t, n, x, f FROM t"
    )
    s_sig, o_sig = _spark_sig(sdf), _duck_sig(oracle)
    assert s_sig[0] == o_sig[0]  # same cardinality
    assert s_sig != o_sig  # but the value flip shows


def test_double_one_ulp_perturbation_detected(sdf, con):
    ulp_up = math.nextafter(0.1, math.inf)
    oracle = con.sql(
        f"SELECT s, i, b, d, t, n, x, "
        f"CASE WHEN f = 0.1 THEN CAST({ulp_up!r} AS DOUBLE) ELSE f END AS f "
        f"FROM t"
    )
    s_sig, o_sig = _spark_sig(sdf), _duck_sig(oracle)
    assert s_sig[0] == o_sig[0]
    assert s_sig != o_sig


def test_double_specials_agree_cross_engine(spark, con):
    vals = [0.0, -0.0, float("inf"), float("-inf"), 5e-324,
            2.2250738585072014e-308, 1.7976931348623157e308, 1 / 3, None]
    s = spark.createDataFrame([(v,) for v in vals], "f double")
    o = con.sql(
        "SELECT unnest(["
        "CAST(0.0 AS DOUBLE), CAST('-0.0' AS DOUBLE), CAST('inf' AS DOUBLE),"
        " CAST('-inf' AS DOUBLE), CAST(5e-324 AS DOUBLE),"
        " CAST(2.2250738585072014e-308 AS DOUBLE),"
        " CAST(1.7976931348623157e308 AS DOUBLE),"
        " CAST(1.0 AS DOUBLE) / 3.0, NULL]) AS f"
    )
    assert _spark_sig(s) == _duck_sig(o)


def test_float32_widens_to_matching_double_bits(spark, con):
    # Spark FLOAT column vs DuckDB REAL: both widen to double (exact)
    # before bit rendering, so the same float32 values hash equal.
    s = spark.createDataFrame([(0.5,), (-2.25,), (None,)], "f float")
    o = con.sql(
        "SELECT unnest([CAST(0.5 AS REAL), CAST(-2.25 AS REAL), NULL]) AS f"
    )
    assert _spark_sig(s) == _duck_sig(o)


def test_multiplicity_counts(sdf, con):
    # drop ONE copy of the duplicated row and add a second copy of
    # another — same count, same distinct set, different multiset.
    oracle = con.sql(
        "SELECT * FROM (SELECT DISTINCT * FROM t) "
        "UNION ALL SELECT * FROM t WHERE i = -7"
    )
    s_sig, o_sig = _spark_sig(sdf), _duck_sig(oracle)
    assert s_sig[0] == o_sig[0]
    assert s_sig != o_sig


def test_type_tags_distinguish_string_from_int(spark, con):
    s = spark.createDataFrame([("5",)], "v string")
    o = con.sql("SELECT CAST(5 AS BIGINT) AS v")
    assert _spark_sig(s) != _duck_sig(o)


def test_unsafe_types_ineligible(spark):
    assert spark_hash_row_expr(
        spark.createDataFrame([([1, 2],)], "v array<int>").schema
    ) is None
    assert duck_hash_expr(["v"], ["INTEGER[]"]) is None
    assert duck_hash_expr(["v"], ["HUGEINT"]) is None


def test_null_distinct_from_literal_null_string(spark, con):
    s = spark.createDataFrame([(None,)], "v string")
    o = con.sql("SELECT 'NULL' AS v")
    assert _spark_sig(s) != _duck_sig(o)
