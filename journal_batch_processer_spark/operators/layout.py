"""Multi-dimensional data layout: Z-order (Morton) clustering.

A table queried by TWO dimensions (user AND time, lat AND lon) can't
be range-partitioned to serve both — sorting by one scatters the
other. Interleaving the dimensions' bits into a Z-value and
range-partitioning on THAT gives every dimension locality ~sqrt(N)
worse than a dedicated sort instead of none — the standard lakehouse
OPTIMIZE ZORDER BY layout, which turns a 100 TB two-predicate scan
into a small fraction of file reads via min/max pruning on both
columns at once.

The interleave is expressed as pure integer div/mod/multiply-add —
identical semantics in Spark SQL and DuckDB (bit-shift OPERATORS
differ between engines; `(x div 2^i) % 2 * 4^i` does not), so the
Z-values carry a full cross-engine value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_terms_sql(xname: str, yname: str, bits: int = 8) -> str:
    """The interleave as a portable SQL arithmetic expression —
    valid (and bit-identical) in BOTH Spark SQL and DuckDB when the
    engines' integer-division spelling is substituted for `{div}`:
    x occupies even bit positions, y odd."""
    terms = []
    for i in range(bits):
        terms.append(f"(({xname} {{div}} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({yname} {{div}} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_key(xname: str, yname: str, bits: int = 8) -> F.Column:
    """Z-value column for two non-negative integer columns (Spark
    side; `div` is Spark SQL's integral division)."""
    return F.expr(zorder_terms_sql(xname, yname, bits).format(div="div"))


def cluster_by_zorder(
    df: DataFrame,
    xname: str,
    yname: str,
    n_partitions: int,
    bits: int = 8,
    z_col: str = "zvalue",
) -> DataFrame:
    """Lay the frame out Z-ordered: range-partition on the Z-value and
    sort within partitions, so a parquet write of the result yields
    files whose per-column min/max ranges are tight in BOTH x and y —
    the layout that makes two-predicate scans prune. (The write itself
    is the caller's; this returns the clustered frame.)"""
    out = df.withColumn(z_col, zorder_key(xname, yname, bits))
    return out.repartitionByRange(n_partitions, F.col(z_col)).sortWithinPartitions(
        z_col
    )


def zorder_python(x: int, y: int, bits: int = 8) -> int:
    """Reference interleave for tests."""
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z
