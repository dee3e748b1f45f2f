"""Join family beyond the reference's single equi join.

The reference only ever joins row-to-row by barcode (BatchUpdate.py:
474-488); Spark gives semi/anti/range for free, and as-of needs the
union-merge trick to stay scalable.

``asof_join`` deliberately avoids the naive ``join + filter + max``
shape (a per-key cross product) — instead both sides are unioned,
tagged, and swept with one ``last(..., ignorenulls=True)`` window per
carried column: a single hash-partition shuffle by key, linear work,
no blow-up on skewed keys. This is the 100 TB-safe as-of plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, the most recent right row with
    ``right.ts <= left.ts`` in the same key group (backward as-of,
    inclusive). Right-side ties on ts resolve to the later row in the
    union sort (matching "latest wins").
    """
    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(c + suffix) for c in carry_cols],
    )
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(r_tag.schema[c].dataType))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    merged = l_tag.unionByName(r_tag.select(l_tag.columns))

    # right rows sort before left rows at equal ts → inclusive <=
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carry_cols:
        merged = merged.withColumn(
            c + suffix, F.last(F.col(c + suffix), ignorenulls=True).over(w)
        )
    return merged.filter(F.col("__side") == 1).drop("__side", "__ts")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry_col: str,
    suffix: str = "_nearest",
) -> DataFrame:
    """NEAREST-in-time as-of (the sensor-fusion match): for each left
    row, the right row minimizing |right.ts − left.ts| within the key
    group; ties resolve to the EARLIER right row, then to the smaller
    carried id — a total order, so the result is deterministic and
    value-oracle-able.

    Same union-window shape as :func:`asof_join` (one shuffle on the
    key, no join): the backward candidate is the latest right row at
    or before the left ts, the forward candidate the earliest at or
    after; the nearer of the two wins. Each pass carries (ts, id) so
    the tie-breaks are explicit rather than accidents of sort
    stability.
    """
    l_tag = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__ts", F.col(left_ts))
        .withColumn("__cand", F.lit(None).cast("struct<ts:timestamp,id:long>"))
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("ts"),
            F.col(carry_col).cast("long").alias("id"),
        ).alias("__cand"),
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    merged = l_tag.unionByName(r_tag.select(l_tag.columns))

    # backward: latest right at/behind; among equal-ts rights the
    # SMALLEST id must win, and last() takes the final row, so order
    # ids DESCENDING within the (ts, side) group
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__cand.id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: earliest right at/after. NOT first() over a
    # (0, unboundedFollowing) frame — Spark evaluates unbounded-
    # following frames by re-scanning to the partition end for every
    # row, O(n²) per key partition (the year_impute_window 100×
    # lesson). Instead run the SAME pass backward: sort every key
    # inverted (ts desc, side asc, id desc) and take last(ignorenulls)
    # over the running (unboundedPreceding, 0) frame, which Spark
    # computes incrementally in O(n). In the inverted order, rows
    # at/preceding the current one are exactly the forward-order rows
    # at/after it; among equal-ts rights, id desc makes the SMALLEST
    # id the nearest preceding row, so last() keeps the same winner
    # first() picked, and left rows still sort after equal-ts rights
    # (side asc inverted from side desc) so an equal-ts right stays
    # visible. Left rows carry NULL __cand, so the flipped NULL
    # placement under desc ordering is invisible to ignorenulls.
    w_fwd_rev = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").desc(), F.col("__side"), F.col("__cand.id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = merged.withColumn(
        "__prev", F.last("__cand", ignorenulls=True).over(w_back)
    ).withColumn("__next", F.last("__cand", ignorenulls=True).over(w_fwd_rev))
    # microsecond distances: cast-to-long would TRUNCATE to seconds
    # and mis-resolve sub-second ties
    d_prev = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__prev.ts"))
    d_next = F.unix_micros(F.col("__next.ts")) - F.unix_micros(F.col("__ts"))
    pick = (
        F.when(F.col("__prev").isNull(), F.col("__next.id"))
        .when(F.col("__next").isNull(), F.col("__prev.id"))
        # equal distance → the EARLIER (backward) candidate
        .when(d_prev <= d_next, F.col("__prev.id"))
        .otherwise(F.col("__next.id"))
    )
    return (
        merged.filter(F.col("__side") == 1)
        .withColumn(carry_col + suffix, pick)
        .drop("__side", "__ts", "__cand", "__prev", "__next")
    )


def range_join_buckets(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Inner range join fact.value ∈ [lo, hi). The bucket side is tiny
    → broadcast nested-loop, the plan Spark picks and the right one."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, "inner")


def bloom_filtered_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_bits: int = 16384,
    how: str = "inner",
) -> DataFrame:
    """Bloom-filter semi-join reduction before the shuffle join: the
    build side's keys are hashed (k=2) into a bit-position table that
    is broadcast against the probe side, so probe rows that cannot
    match are dropped BEFORE the exchange — at 100 TB the probe-side
    shuffle volume is what the join costs, and a ~1/5-selective build
    side cuts it ~5× for the price of two broadcast semi-joins against
    a ≤ n_bits-row position table.

    Spark's own runtime bloom (spark.sql.optimizer.runtime.bloomFilter,
    3.3+) does this opportunistically inside AQE; this is the explicit,
    plan-stable form an engine API exposes — the reduction happens
    whether or not AQE fires, and the bit table can be persisted and
    reused across queries (the nightly-ingest shape).

    Correctness does not depend on the bloom: false positives are
    eliminated by the exact join that follows, and false negatives are
    impossible (every build key sets its two positions). The result is
    bit-identical to ``probe.join(build, ...)`` — which is exactly what
    the oracle checks.

    INNER (or inner-like) joins only: the bloom pre-filter drops
    probe rows before the join, which is exactly wrong for outer/anti
    semantics (a left-outer would lose its null-extended rows; an
    anti would return only bloom false-positives).
    """
    if how != "inner":
        # 'cross' is deliberately NOT accepted: with an equi condition
        # Spark executes it as inner anyway, so allowing it would only
        # mislead (ADVICE r05).
        raise ValueError(
            f"bloom_filtered_join supports inner joins only, got {how!r}: "
            "the bloom pre-filter removes probe rows a left/outer/anti "
            "join must keep"
        )

    def pos(salt: str, c: F.Column) -> F.Column:
        return F.pmod(F.xxhash64(F.lit(salt), c), F.lit(n_bits))

    bits = (
        build.select(pos("b1", F.col(build_key)).alias("pos"))
        .unionAll(build.select(pos("b2", F.col(build_key)).alias("pos")))
        .distinct()
    )
    passed = probe.join(
        F.broadcast(bits.withColumnRenamed("pos", "__p1")),
        pos("b1", F.col(probe_key)) == F.col("__p1"),
        "leftsemi",
    ).join(
        F.broadcast(bits.withColumnRenamed("pos", "__p2")),
        pos("b2", F.col(probe_key)) == F.col("__p2"),
        "leftsemi",
    )
    return passed.join(
        build, passed[probe_key] == build[build_key], how
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    how: str = "inner",
) -> DataFrame:
    """Banded interval-overlap join: [l_lo,l_hi] × [r_lo,r_hi] pairs
    that overlap (inclusive bounds). A naive theta join is a cartesian
    product; instead both sides explode into the DAY buckets their
    interval covers and the join is bucket-equi — candidates are pairs
    sharing a calendar day, linear in data × interval length instead
    of |L|·|R|. A pair sharing several days would match once per day,
    so the match is pinned to the bucket containing the overlap START
    (`__b == date(greatest(l_lo, r_lo))`) — each overlapping pair
    joins exactly once, no distinct pass needed.

    At 100 TB this is the genomics/session-attribution join shape:
    bucket granularity trades explode factor against candidate
    selectivity, and both sides can be written bucket-partitioned so
    the equi join is co-located. Interval columns must be timestamps.

    INNER joins only: the post-join overlap/pin filter would discard
    a left/outer join's null-extended rows (null predicate → dropped),
    silently degrading it to inner.
    """
    if how != "inner":
        raise ValueError(
            f"interval_overlap_join supports inner joins only, got "
            f"{how!r}: the overlap filter drops null-extended rows"
        )
    l2 = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.to_date(F.col(l_lo)),
                F.to_date(F.col(l_hi)),
                F.expr("interval 1 day"),
            )
        ),
    )
    r2 = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.to_date(F.col(r_lo)),
                F.to_date(F.col(r_hi)),
                F.expr("interval 1 day"),
            )
        ),
    )
    joined = l2.join(r2.withColumnRenamed("__b", "__b2"), F.col("__b") == F.col("__b2"), how)
    return joined.filter(
        (F.col(l_lo) <= F.col(r_hi))
        & (F.col(r_lo) <= F.col(l_hi))
        & (
            F.col("__b")
            == F.to_date(F.greatest(F.col(l_lo), F.col(r_lo)))
        )
    ).drop("__b", "__b2")
