"""Skew mitigation: key salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; explicit salting remains the tool when one reduce key
dominates an AGGREGATION (AQE can't split a single group) or when a
join's hot keys are known up front.

``salted_agg`` runs a two-level aggregate: first over (key, salt) —
spreading a hot key over N reducers — then over key. Works for any
algebraic aggregate (sum/count/min/max); averages must be carried as
(sum, count) pairs through the first level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "__salt") -> DataFrame:
    """Row-content salt: ``xxhash64`` over every column, mod n_salts.

    Content-derived (not ``monotonically_increasing_id``/``rand``) so
    the salt is (a) independent of partition layout — a repartition or
    a different scan split assigns the same salts — and (b) stable
    under task retries, where nondeterministic expressions can
    redistribute rows mid-recompute and corrupt a two-level aggregate.
    Degenerate case: byte-identical duplicate rows share a salt; a hot
    key whose rows are ALL identical stays on one reducer (such rows
    carry no grouping information to spread — pre-aggregate them).
    """
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level skew-safe aggregate.

    ``aggs``: output column -> 'sum(col)' / 'count(1)' / 'min(col)' /
    'max(col)' (algebraic only — they re-combine with the same op).
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = with_salt(df, n_salts)
    first = salted.groupBy(*key_cols, "__salt").agg(
        *[F.expr(expr).alias(out) for out, expr in aggs.items()]
    )
    second = first.groupBy(*key_cols).agg(
        *[
            combine[expr.split("(")[0].strip()](F.col(out)).alias(out)
            for out, expr in aggs.items()
        ]
    )
    return second


def salted_join_broadcast_hot(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: list,
) -> DataFrame:
    """Classic hot-key split: route hot keys through a broadcast join
    (replicating only those rows of the small side), the long tail
    through the normal shuffle join, then union."""
    hot_cond = F.col(on).isin(hot_keys)
    hot = big.filter(hot_cond).join(
        F.broadcast(small.filter(hot_cond)), on=on, how="inner"
    )
    cold = big.filter(~hot_cond).join(small.filter(~hot_cond), on=on, how="inner")
    return hot.unionByName(cold)
