"""Relational operator family: aggregations, joins, windows, JSON.

Float determinism versus the oracle: every SUM over doubles goes
through DECIMAL(18,4/6) so the result is order-independent and
bit-identical in Spark and DuckDB; plain double arithmetic (products,
differences) is IEEE-deterministic and safe as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from journal_batch_processer_spark.operators.joins import asof_join, range_join_buckets


def _li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _events(spark, sf_dir):
    from journal_batch_processer_spark.session import load_events

    return load_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# aggregation family
# ---------------------------------------------------------------------------


def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the headline bench query."""
    li = _li(spark, sf_dir)
    dq = F.col("l_quantity").cast("decimal(18,4)")
    dp = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dq).cast("double").alias("sum_qty"),
            F.sum(dp).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            (F.sum(dq).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_GROUP_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    dq = F.col("l_quantity").cast("decimal(18,4)")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dq).cast("double").alias("sum_qty"),
    )


SQL_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    dp = F.col("o_totalprice").cast("decimal(18,4)")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dp).cast("double").alias("sum_price"),
    )


SQL_AGG_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    )


SQL_DISTINCT_COUNT = """
SELECT COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_prios
FROM orders
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ — the engine's scale path for distinct over
    100 TB. The sketch value itself is implementation-defined, so it
    can't be value-oracled directly; instead the query emits the exact
    count plus a ``within_bound`` flag asserting the HLL estimate is
    inside 3·rsd of exact — the oracle expects (exact, TRUE), making
    this a BOUNDED full-value check instead of rows-only. (The exact
    countDistinct here is the verification harness, not the scale
    path.)"""
    orders = _orders(spark, sf_dir)
    rsd = 0.01
    agg = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=rsd).alias("approx"),
        F.countDistinct("o_custkey").alias("n_custs_exact"),
    )
    bound = F.lit(3 * rsd) * F.col("n_custs_exact")
    return agg.select(
        "n_custs_exact",
        (F.abs(F.col("approx") - F.col("n_custs_exact")) <= bound).alias(
            "within_bound"
        ),
    )


SQL_APPROX_DISTINCT = """
SELECT COUNT(DISTINCT o_custkey) AS n_custs_exact, TRUE AS within_bound
FROM orders
"""


def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order totals by priority × status. The
    value set is pinned explicitly — at 100 TB an unpinned pivot first
    runs a distinct over the pivot column; pinning makes the plan a
    single groupBy with conditional aggregates (one shuffle)."""
    orders = _orders(spark, sf_dir)
    dv = F.col("o_totalprice").cast("decimal(18,4)")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dv).cast("double"))
        .withColumnsRenamed({"F": "total_f", "O": "total_o", "P": "total_p"})
    )


SQL_AGG_PIVOT = """
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FILTER (o_orderstatus = 'F') AS DOUBLE) AS total_f,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FILTER (o_orderstatus = 'O') AS DOUBLE) AS total_o,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FILTER (o_orderstatus = 'P') AS DOUBLE) AS total_p
FROM orders GROUP BY o_orderpriority
"""


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald–Khanna quantile sketch (`percentile_approx`) —
    the 100 TB path for order statistics — under a BOUNDED full-value
    oracle, same pattern as approx_distinct: the sketch guarantees the
    returned element's rank is within ±1/accuracy of the target, so
    the query emits the exact interpolated quantile plus a flag that
    the approx value lies between the exact quantiles at q ± 2/acc;
    the oracle expects (exact, TRUE)."""
    li = _li(spark, sf_dir)
    acc = 1000
    eps = 2.0 / acc
    qs = [0.5, 0.9, 0.99]
    col = "l_extendedprice"
    aggs = []
    for q in qs:
        tag = str(int(q * 100))
        aggs += [
            F.expr(f"percentile_approx({col}, {q}, {acc})").alias(f"a{tag}"),
            F.expr(f"percentile({col}, {q})").alias(f"p{tag}_exact"),
            F.expr(f"percentile({col}, {max(q - eps, 0.0)})").alias(f"lo{tag}"),
            F.expr(f"percentile({col}, {min(q + eps, 1.0)})").alias(f"hi{tag}"),
        ]
    agg = li.agg(*aggs)
    out = []
    for q in qs:
        tag = str(int(q * 100))
        out += [
            F.round(F.col(f"p{tag}_exact"), 4).alias(f"p{tag}_exact"),
            F.col(f"a{tag}")
            .between(F.col(f"lo{tag}"), F.col(f"hi{tag}"))
            .alias(f"p{tag}_within_bound"),
        ]
    return agg.select(*out)


SQL_APPROX_QUANTILE = """
SELECT ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50_exact,
       TRUE AS p50_within_bound,
       ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90_exact,
       TRUE AS p90_within_bound,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
       TRUE AS p99_within_bound
FROM lineitem
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (Cormode–Muthukrishnan):
    d=4 hash rows × w=256 buckets, hash_j(x) = first byte of
    md5(j:x) — so unlike HLL/GK (bounded-check oracles above), the
    sketch state is DETERMINISTIC and the estimates carry a FULL value
    oracle: DuckDB rebuilds the identical 1024-cell sketch. The query
    returns the top-20 users by estimated event count alongside the
    exact count — count-min's one-sided guarantee (est >= exact, off
    only by bucket collisions) is visible in the data.

    Scale shape: the sketch build is one partial-aggregated groupBy to
    a FIXED 1024 cells (mergeable across partitions/streams — why
    count-min is the memory-bounded path when the key space, unlike
    here, doesn't fit a hash agg); probes broadcast those cells. The
    top-k window runs on the post-aggregate user table, not events."""
    d_rows, width_hex, k = 4, 2, 20  # 2 hex chars = 256 buckets
    ev = _events(spark, sf_dir).select(
        F.col("user_id"), F.col("user_id").cast("string").alias("u")
    )

    def cell(j: int) -> F.Column:
        h = F.md5(F.concat_ws(":", F.lit(str(j)), F.col("u")))
        return F.conv(F.substring(h, 1, width_hex), 16, 10).cast("long")

    jb = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), cell(j).alias("b"))
                for j in range(d_rows)
            ]
        )
    ).alias("jb")
    sketch = (
        ev.select(jb)
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        ev.groupBy("user_id", "u")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .select("user_id", "exact_count", "u", jb)
        .select(
            "user_id",
            "exact_count",
            F.col("jb.j").alias("j"),
            F.col("jb.b").alias("b"),
        )
    )
    est = (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )
    w = Window.orderBy(F.col("est_count").desc(), F.col("user_id"))
    return (
        est.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_id", "est_count", "exact_count", "rank")
    )


SQL_HEAVY_HITTERS = """
WITH ev AS (SELECT user_id, CAST(user_id AS VARCHAR) AS u FROM events),
js AS (SELECT UNNEST(range(4)) AS j),
cells AS (
    SELECT j,
           ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || u), 1, 2))::BIGINT
               AS b,
           COUNT(*) AS c
    FROM ev, js GROUP BY 1, 2
),
users AS (SELECT user_id, u, COUNT(*) AS exact_count FROM ev GROUP BY 1, 2),
probes AS (
    SELECT users.user_id, users.exact_count, js.j,
           ('0x' || substr(md5(CAST(js.j AS VARCHAR) || ':' || users.u),
                           1, 2))::BIGINT AS b
    FROM users, js
),
est AS (
    SELECT p.user_id, p.exact_count, MIN(c.c) AS est_count
    FROM probes p JOIN cells c ON c.j = p.j AND c.b = p.b
    GROUP BY 1, 2
)
SELECT user_id, est_count, exact_count,
       CAST(ROW_NUMBER() OVER (ORDER BY est_count DESC, user_id) AS INT)
           AS rank
FROM est
QUALIFY rank <= 20
"""


def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): the inverse of agg_pivot — per-priority
    status totals melted back to (priority, status, total) rows.
    ``DataFrame.unpivot`` plans as a single generator projection (no
    shuffle beyond the feeding aggregate)."""
    wide = q_agg_pivot(spark, sf_dir)
    return wide.unpivot(
        ["o_orderpriority"],
        ["total_f", "total_o", "total_p"],
        "status",
        "total",
    ).filter(F.col("total").isNotNull())


SQL_AGG_UNPIVOT = """
WITH wide AS (
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                FILTER (o_orderstatus = 'F') AS DOUBLE) AS total_f,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                FILTER (o_orderstatus = 'O') AS DOUBLE) AS total_o,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                FILTER (o_orderstatus = 'P') AS DOUBLE) AS total_p
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, total FROM (
    SELECT o_orderpriority, 'total_f' AS status, total_f AS total FROM wide
    UNION ALL
    SELECT o_orderpriority, 'total_o', total_o FROM wide
    UNION ALL
    SELECT o_orderpriority, 'total_p', total_p FROM wide
) WHERE total IS NOT NULL
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set semantics: customers who placed BOTH a
    high-value (>400k) and an urgent order, minus those with any
    failed ('F') order. Set ops plan as aggregate-based joins —
    distinct semantics without an explicit dropDuplicates."""
    orders = _orders(spark, sf_dir)
    high = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    failed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        high.intersect(urgent)
        .exceptAll(failed.distinct())
        .select(F.col("o_custkey").alias("custkey"))
    )


SQL_SET_OPS = """
SELECT o_custkey AS custkey FROM (
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: per priority, the sorted
    distinct status set joined with ','. ``collect_list`` alone is
    partition-order-dependent — ``array_sort`` before the join is what
    makes the result reproducible (and oracle-checkable) on any
    cluster layout."""
    orders = _orders(spark, sf_dir)
    return orders.groupBy("o_orderpriority").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_set("o_orderstatus"))
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_STRING_AGG = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
           AS statuses,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column — the
    expression-only vector toolkit (no UDF): L2 norm via
    transform+aggregate, max element, dimensionality. Everything stays
    in whole-stage codegen; this is the building block the similarity
    operators compose."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(
            F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 6
        ).alias("max_val"),
        F.size("embedding").alias("dim"),
    )


SQL_ARRAY_FUNCTIONS = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       ROUND(list_max(list_transform(embedding,
             x -> CAST(x AS DOUBLE))), 6) AS max_val,
       CAST(len(embedding) AS INT) AS dim
FROM embeddings
"""


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window battery: ntile / percent_rank /
    cume_dist over order totals per priority — one window, one
    shuffle. The orderBy includes the key for deterministic tie-break
    (percent_rank/cume_dist are tie-sensitive; o_orderkey is unique so
    every rank is reproducible).

    pct_rank/cume are emitted RAW, not round()ed: both engines compute
    them as IEEE divisions of identical integers ((rank-1)/(n-1),
    n_le/n), which are bit-identical by the standard — while
    round-to-6-decimals→double is NOT portable (Spark rounds the
    shortest decimal repr via BigDecimal HALF_UP, DuckDB rounds the
    binary value; at 100× ~thousands of the 15M rows disagreed in the
    last ulp and the key fell off the hash fast path into a 15-minute
    strict compare that diverged the same way)."""
    orders = _orders(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


SQL_WINDOW_NTILE = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
"""


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-custkey order stats × customer dim — rows
    survive from BOTH unmatched sides (customers without orders keep
    NULL stats; the COALESCE key pattern is the standard reconciliation
    shape)."""
    orders = _orders(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    stats = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return stats.join(
        cust, stats["o_custkey"] == cust["c_custkey"], "full_outer"
    ).select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        "c_mktsegment",
    )


SQL_JOIN_FULL = """
WITH stats AS (
    SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT COALESCE(s.o_custkey, c.c_custkey) AS custkey,
       COALESCE(s.n_orders, 0) AS n_orders,
       c.c_mktsegment
FROM stats s FULL OUTER JOIN customer c ON s.o_custkey = c.c_custkey
"""


def q_time_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series from sparse events: every (hour, event_type)
    bucket across the full span, zero-filled where no events landed —
    the resample/gap-fill shape every monitoring pipeline needs.
    ``sequence()`` generates the hour spine (one row, exploded), cross
    join with the small distinct type dimension (broadcast — the spine
    × types product is tiny relative to the fact side), left join the
    hourly aggregate. No UDF; the fact aggregate is the only real
    shuffle."""
    events = _events(spark, sf_dir)
    hours = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = events.select("event_type").distinct()
    counts = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        hours.crossJoin(F.broadcast(types))
        .join(counts, ["hour", "event_type"], "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


SQL_TIME_GAP_FILL = """
WITH span AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM span
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour, t.event_type,
       COALESCE(c.n, 0) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN counts c ON c.hour = s.hour AND c.event_type = t.event_type
"""


# ---------------------------------------------------------------------------
# join family
# ---------------------------------------------------------------------------


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = _orders(spark, sf_dir).filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


SQL_JOIN_SEMI = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large order (non-empty anti-join result)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = _orders(spark, sf_dir).filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    buckets = region.select(
        F.col("r_regionkey").alias("bucket"),
        (F.col("r_regionkey") * 100.0).alias("lo"),
        (F.col("r_regionkey") * 100.0 + 100.0).alias("hi"),
    )
    joined = range_join_buckets(events, buckets, "value")
    return joined.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


SQL_JOIN_RANGE = """
SELECT r_regionkey AS bucket, COUNT(*) AS n
FROM events JOIN region
  ON value >= r_regionkey * 100.0 AND value < r_regionkey * 100.0 + 100.0
GROUP BY 1
"""


def q_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-write co-located join: both sides bucketed by orderkey
    → SortMergeJoin with NO Exchange (plan pinned by
    tests/test_scale_plans). The bucket files ARE the partitions; at
    100 TB this is the difference between re-shuffling two fact tables
    per join and never shuffling them again. External-path tables in
    the system tmpdir keep bucket files out of the working tree;
    results are engine-independent so the oracle is the plain join."""
    import hashlib
    import tempfile

    from journal_batch_processer_spark.operators.bucketing import (
        colocated_join,
        write_bucketed,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/jbp_buckets_{tag}"
    orders_t, li_t = f"jbp_orders_b_{tag}", f"jbp_lineitem_b_{tag}"
    if not spark.catalog.tableExists(orders_t):
        write_bucketed(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            orders_t, "o_orderkey", 8, path=f"{base}/orders",
        )
        write_bucketed(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .withColumnRenamed("l_orderkey", "o_orderkey"),
            li_t, "o_orderkey", 8, path=f"{base}/lineitem",
        )
    joined = colocated_join(spark, li_t, orders_t, on="o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_qty"),
    )


SQL_JOIN_COLOCATED = """
SELECT o_orderpriority, COUNT(*) AS n_li,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted aggregation (skew guard for hot reduce keys):
    l_returnflag has only 3 values, so EVERY key is hot — the salt
    spreads each over 16 reducers before the tiny second-level
    combine. Result is identical to the direct groupBy, which is the
    oracle (sums through DECIMAL for cross-engine equality)."""
    from journal_batch_processer_spark.operators.skew import salted_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(18,4)").alias("q")
    )
    out = salted_agg(
        li,
        ["l_returnflag"],
        {"n": "count(1)", "sum_qty": "sum(q)", "max_qty": "max(q)"},
    )
    return out.select(
        "l_returnflag",
        "n",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("max_qty").cast("double").alias("max_qty"),
    )


SQL_AGG_SALTED = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(MAX(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS max_qty
FROM lineitem GROUP BY 1
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the user's most recent prior purchase."""
    events = _events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        carry_cols=["event_id"],
    )
    return out.select(
        "event_id", "user_id", F.col("event_id_matched").alias("purchase_event_id")
    )


SQL_JOIN_ASOF = """
SELECT c.event_id, c.user_id, p.event_id AS purchase_event_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the user's NEAREST purchase in time —
    before OR after (the sensor-fusion alignment the backward as-of
    can't express); |Δt| ties resolve to the earlier purchase, then
    the smaller event id. One shuffle on the key via the union-window
    shape (operators/joins.py:asof_join_nearest); the oracle is an
    INDEPENDENT brute-force LATERAL nearest-row search."""
    from journal_batch_processer_spark.operators.joins import (
        asof_join_nearest,
    )

    events = _events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join_nearest(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        carry_col="event_id",
    )
    return out.select(
        "event_id", "user_id",
        F.col("event_id_nearest").alias("nearest_purchase_id"),
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    are cohorted by FIRST-activity week (anchored to 2024-01-01 so
    week ids are stable integers), and each (cohort, week-offset)
    cell counts the cohort's users still active that week, plus a
    parts-per-million retention rate in INTEGER arithmetic (n·1e6
    div cohort size — no float division to disagree on).

    Plan shape: one distinct over (user, week) — the corpus-sized
    shuffle — then user-keyed min + two small aggregates; the cohort
    size rejoins by broadcast. No self-join over events (the naive
    cohort query joins events to itself per offset — quadratic in
    activity; this is linear)."""
    ev = _events(spark, sf_dir)
    act = ev.select(
        "user_id",
        F.expr("datediff(to_date(ts), date'2024-01-01') div 7").alias("week"),
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = act.join(first, "user_id").withColumn(
        "week_offset", F.col("week") - F.col("cohort_week")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    ret = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .withColumn(
            "retention_ppm", F.expr("n_active * 1000000 div cohort_n")
        )
        .select(
            "cohort_week", "week_offset", "n_active", "cohort_n",
            "retention_ppm",
        )
    )


SQL_RETENTION_COHORTS = """
WITH act AS (
    SELECT DISTINCT user_id,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week
    FROM events
),
first AS (
    SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY 1
),
sizes AS (
    SELECT cohort_week, COUNT(*) AS cohort_n FROM first GROUP BY 1
),
ret AS (
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM act a JOIN first f USING (user_id)
    GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, r.n_active, s.cohort_n,
       r.n_active * 1000000 // s.cohort_n AS retention_ppm
FROM ret r JOIN sizes s USING (cohort_week)
"""


SQL_JOIN_ASOF_NEAREST = """
SELECT c.event_id, c.user_id, m.event_id AS nearest_purchase_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN LATERAL (
    SELECT p.event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    WHERE p.user_id = c.user_id
    ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)), p.ts, p.event_id
    LIMIT 1
) m ON TRUE
"""


# ---------------------------------------------------------------------------
# window family
# ---------------------------------------------------------------------------


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


SQL_WINDOW_RANK = """
SELECT o_custkey, o_orderkey, rn FROM (
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders) t
WHERE rn <= 3
"""


def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    nxt = F.lead("value").over(w)
    return events.select(
        "event_id",
        "user_id",
        prev.alias("prev_value"),
        nxt.alias("next_value"),
        (F.col("value") - F.coalesce(prev, F.lit(0.0))).alias("delta"),
    )


SQL_WINDOW_LEAD_LAG = """
SELECT event_id, user_id,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       value - COALESCE(LAG(value) OVER w, 0.0) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dv = F.col("value").cast("decimal(18,6)")
    return events.select(
        "event_id",
        "user_id",
        F.sum(dv).over(w).cast("double").alias("running_value"),
    )


SQL_WINDOW_RUNNING = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_value
FROM events
"""


def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap splits sessions."""
    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap math in MICROSECONDS on both engines: events.ts carries µs
    # precision, and a whole-second cast would classify a gap that
    # straddles exactly 1800s differently from the oracle.
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    boundary = F.when(gap > 1800 * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    marked = events.select("user_id", boundary.alias("b"))
    return marked.groupBy("user_id").agg(
        (F.sum("b") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_window_session_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session assignment (the labeling pass sessionization
    pipelines actually persist): 30-minute-gap boundaries numbered by
    a running sum per user. Same µs-precision gap rule as
    window_session; one window shuffle, two frames over the same
    partitioning (Catalyst reuses the sort)."""
    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    boundary = F.when(gap > 1800 * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "event_id",
        "user_id",
        (F.sum(boundary).over(run) + 1).cast("long").alias("session_id"),
    )


SQL_WINDOW_SESSION_IDS = """
WITH marked AS (
    SELECT event_id, user_id,
           CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                    > 1800 * 1000000
                THEN 1 ELSE 0 END AS b,
           ts
    FROM events)
SELECT event_id, user_id,
       CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS session_id
FROM marked
"""


def q_window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (the built-in the streaming path
    uses) under a full oracle: 30-minute-gap sessions per user with
    start / end / event count. session_window merges an event into the
    current session when ts < previous end, i.e. a gap of EXACTLY the
    30-minute duration starts a new session — the oracle's
    gaps-and-islands CTE uses >= for the boundary accordingly, and
    end = last event + gap by definition."""
    events = _events(spark, sf_dir)
    out = events.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format(F.col("w.start"), fmt).alias("session_start"),
        F.date_format(F.col("w.end"), fmt).alias("session_end"),
        "n_events",
    )


SQL_WINDOW_SESSION_NATIVE = """
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts))
                    >= 1800 * 1000000
                THEN 1 ELSE 0 END AS b
    FROM events),
grp AS (
    SELECT user_id, ts,
           SUM(b) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS g
    FROM marked)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f')
           AS session_end,
       COUNT(*) AS n_events
FROM grp GROUP BY user_id, g
"""


SQL_WINDOW_SESSION = """
WITH marked AS (
    SELECT user_id,
           CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                    > 1800 * 1000000
                THEN 1 ELSE 0 END AS b
    FROM events)
SELECT user_id, CAST(SUM(b) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM marked GROUP BY user_id
"""


def q_window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows — the batch analog of the structured-
    streaming job in streaming/jobs.py (same expression tree)."""
    events = _events(spark, sf_dir)
    dv = F.col("value").cast("decimal(18,6)")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dv).cast("double").alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SQL_WINDOW_TUMBLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_window_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 2-hour window, 1-hour slide — every
    event lands in exactly two windows. Spark assigns windows in the
    aggregation expression itself (no row explosion in user code; the
    WindowExec generates the per-window rows), one shuffle on
    (window, event_type)."""
    events = _events(spark, sf_dir)
    dv = F.col("value").cast("decimal(18,6)")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dv).cast("double").alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


# An event at t belongs to the 2h/1h-slide windows starting at
# trunc_hour(t) and trunc_hour(t) − 1h — the UNION ALL reproduces
# Spark's window assignment exactly.
SQL_WINDOW_SLIDE = """
WITH x AS (
  SELECT date_trunc('hour', ts) AS wstart, event_type, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS wstart, event_type, value
  FROM events
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM x
GROUP BY 1, 2
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (the engine exposes
    both DataFrame and spark.sql paths over registered views)."""
    orders = _orders(spark, sf_dir)
    orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_AGG_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per customer, count of own orders within ±30 days
    of each order's date (value-based frame, not row-based)."""
    orders = _orders(spark, sf_dir)
    # day ordinal (TIMESTAMP_NTZ has no direct long cast)
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, 30)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_near_orders"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (
           PARTITION BY o_custkey
           ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
           AS n_near_orders
FROM orders
"""


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar built-in families the reference never had (SURVEY
    §2f 'not implemented' row): date parts/diffs, math, string ops —
    all free in Spark, exercised in one projection."""
    orders = _orders(spark, sf_dir)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_2002"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("abs_diff"),
        F.pow(F.lit(2.0), (F.col("o_orderkey") % 10).cast("double")).alias("pow2"),
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
    )


SQL_SCALAR_FUNCTIONS = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS order_year,
       EXTRACT(month FROM o_orderdate) AS order_month,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       ROUND(ABS(o_totalprice - 100000.0), 2) AS abs_diff,
       POW(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS pow2,
       UPPER(SUBSTR(o_orderpriority, 1, 3)) AS prio3,
       LPAD(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded
FROM orders
"""


def _skewed_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hot-key stress shape: ~90% of lineitem rows
    funnel into ONE synthetic key, the rest spread over ~1000 cold
    keys — the distribution AQE's skew handling and explicit salting
    exist for. Derived from l_orderkey so the oracle reproduces it."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = F.when(F.col("l_orderkey") % 10 < 9, F.lit("HOT")).otherwise(
        F.concat(F.lit("cold_"), (F.col("l_orderkey") % 1000).cast("string"))
    )
    return li.select(
        k.alias("k"),
        F.col("l_quantity").cast("decimal(18,4)").alias("q"),
        F.col("l_orderkey"),
        F.col("l_suppkey"),
    )


def q_agg_salted_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew STRESS aggregation: one key carries ~90% of the rows, so a
    plain groupBy lands ~90% of the data on one reducer (AQE cannot
    split a single group). The two-level salted aggregate spreads the
    hot key over 16 reducers, then combines 16 partials per key —
    identical result to the direct groupBy, which is the oracle."""
    from journal_batch_processer_spark.operators.skew import salted_agg

    out = salted_agg(
        _skewed_lineitem(spark, sf_dir).select("k", "q"),
        ["k"],
        {"n": "count(1)", "sum_qty": "sum(q)", "max_qty": "max(q)"},
    )
    return out.select(
        "k",
        "n",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("max_qty").cast("double").alias("max_qty"),
    )


SQL_AGG_SALTED_SKEWED = """
WITH skewed AS (
    SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'HOT'
                ELSE 'cold_' || CAST(l_orderkey % 1000 AS VARCHAR) END AS k,
           CAST(l_quantity AS DECIMAL(18,4)) AS q
    FROM lineitem)
SELECT k, COUNT(*) AS n, CAST(SUM(q) AS DOUBLE) AS sum_qty,
       CAST(MAX(q) AS DOUBLE) AS max_qty
FROM skewed GROUP BY 1
"""


def q_join_skew_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join split: ~90% of fact rows share one supplier key,
    which would pile onto a single shuffle-join task. The hot key is
    routed through a broadcast join (replicating only its dimension
    rows), the long tail through the normal join, then unioned —
    operators/skew.py salted_join_broadcast_hot under a full oracle."""
    from journal_batch_processer_spark.operators.skew import (
        salted_join_broadcast_hot,
    )

    fact = _skewed_lineitem(spark, sf_dir).select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("s_suppkey"),
        "q",
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    joined = salted_join_broadcast_hot(fact, supp, on="s_suppkey", hot_keys=[1])
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("double").alias("sum_qty"),
    )


SQL_JOIN_SKEW_HOT = """
WITH f AS (
    SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE l_suppkey END AS s_suppkey,
           CAST(l_quantity AS DECIMAL(18,4)) AS q
    FROM lineitem)
SELECT s_nationkey, COUNT(*) AS n, CAST(SUM(q) AS DOUBLE) AS sum_qty
FROM f JOIN supplier USING (s_suppkey) GROUP BY 1
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n
FROM events GROUP BY 1
"""


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: JSON props parsed into a real map column, then
    map_keys / element_at / size — the semi-structured per-row bag
    every event pipeline carries. Everything is expression-level
    (from_json to map<string,string>, no schema inference pass)."""
    events = _events(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    return events.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys"),
        F.size(m).alias("n_keys"),
        F.element_at(m, "k").cast("int").alias("k_val"),
    )


SQL_MAP_FUNCTIONS = """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val
FROM events
"""


def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-reduced fact join: lineitem pre-filtered by a 2-hash bloom
    built from urgent orders' keys, then exactly joined. The bloom
    prunes probe rows BEFORE the join exchange (the shuffle-volume
    lever at 100 TB); the exact join removes its false positives, so
    the result — and the oracle — is the plain equi join."""
    from journal_batch_processer_spark.operators.joins import (
        bloom_filtered_join,
    )

    li = _li(spark, sf_dir).select("l_orderkey", "l_linenumber", "l_quantity")
    urgent = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice")
    )
    return bloom_filtered_join(li, urgent, "l_orderkey", "o_orderkey").select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_totalprice"
    )


SQL_JOIN_BLOOM = """
SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
"""


CAMPAIGNS = [
    ("c1", "2024-01-02 12:00:00", "2024-01-04 00:00:00"),
    ("c2", "2024-01-05 00:00:00", "2024-01-05 06:00:00"),
    ("c3", "2024-01-10 18:00:00", "2024-01-12 09:30:00"),
    ("c4", "2024-01-15 00:00:00", "2024-01-21 23:59:59"),
    ("c5", "2024-01-28 06:00:00", "2024-02-02 00:00:00"),
]


def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (attribution shape): per-user daily
    activity intervals [first,last event] × campaign windows that
    overlap them, with the exact overlap duration. Runs through the
    banded operator (day-bucket equi join, overlap-start pinning —
    never a cartesian theta join); the oracle is the direct theta join
    the banding must reproduce exactly."""
    from journal_batch_processer_spark.operators.joins import (
        interval_overlap_join,
    )

    ev = _events(spark, sf_dir)
    ua = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("a_lo"), F.max("ts").alias("a_hi"))
    camps = spark.createDataFrame(
        list(CAMPAIGNS),
        "campaign_id string, c_lo_s string, c_hi_s string",
    ).select(
        "campaign_id",
        F.to_timestamp("c_lo_s").alias("c_lo"),
        F.to_timestamp("c_hi_s").alias("c_hi"),
    )
    out = interval_overlap_join(ua, camps, "a_lo", "a_hi", "c_lo", "c_hi")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "campaign_id",
        (
            F.unix_micros(F.least(F.col("a_hi"), F.col("c_hi")))
            - F.unix_micros(F.greatest(F.col("a_lo"), F.col("c_lo")))
        ).alias("overlap_us"),
    )


def _campaigns_values_sql() -> str:
    return ", ".join(
        f"('{c}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
        for c, lo, hi in CAMPAIGNS
    )


SQL_JOIN_INTERVAL = f"""
WITH ua AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           MIN(ts) AS a_lo, MAX(ts) AS a_hi
    FROM events GROUP BY 1, 2
),
camps(campaign_id, c_lo, c_hi) AS (VALUES {_campaigns_values_sql()})
SELECT ua.user_id,
       strftime(ua.day, '%Y-%m-%d') AS day,
       camps.campaign_id,
       epoch_us(LEAST(ua.a_hi, camps.c_hi))
           - epoch_us(GREATEST(ua.a_lo, camps.c_lo)) AS overlap_us
FROM ua JOIN camps
  ON ua.a_lo <= camps.c_hi AND camps.c_lo <= ua.a_hi
"""


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type (the open semi-structured column format —
    binary-encoded JSON with typed path extraction, what Snowflake
    VARIANT / Delta variant shredding standardized): props parsed via
    parse_json into a VARIANT, typed variant_get extraction, typed
    aggregation downstream. At 100 TB VARIANT beats string-JSON scans
    because the binary encoding skips re-tokenizing every row and
    shredded columns prune like any other. Oracle: the same typed path
    extraction with DuckDB's JSON operators."""
    ev = _events(spark, sf_dir)
    v = F.parse_json("props")
    rows = ev.select(
        "event_id",
        "event_type",
        F.variant_get(v, "$.k", "int").alias("k_val"),
    )
    return rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k_val").alias("sum_k"),
        F.min("k_val").alias("min_k"),
        F.max("k_val").alias("max_k"),
        F.sum(F.col("k_val").isNull().cast("bigint")).alias("n_null"),
    )


SQL_VARIANT_EXTRACT = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null
FROM events GROUP BY 1
"""


def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL surface parity — the top-N-
    per-entity idiom analysts write): for each nation's top-2 customers
    by balance, via a LATERAL join the optimizer decorrelates into the
    same window plan a hand-written rank would produce. Both engines
    support the syntax; the oracle runs the identical query."""
    _orders(spark, sf_dir)  # touch to keep loader symmetry
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "v_customer"
    )
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "v_nation"
    )
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM v_nation n,
        LATERAL (
            SELECT c_custkey, c_acctbal
            FROM v_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
        """
    )


SQL_LATERAL_JOIN = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 2
) t
"""


QUERIES = {
    "group_agg": (q_group_agg, SQL_GROUP_AGG),
    "join_bloom": (q_join_bloom, SQL_JOIN_BLOOM),
    "variant_extract": (q_variant_extract, SQL_VARIANT_EXTRACT),
    "lateral_join": (q_lateral_join, SQL_LATERAL_JOIN),
    "join_interval": (q_join_interval, SQL_JOIN_INTERVAL),
    "agg_rollup": (q_agg_rollup, SQL_AGG_ROLLUP),
    "agg_cube": (q_agg_cube, SQL_AGG_CUBE),
    "agg_pivot": (q_agg_pivot, SQL_AGG_PIVOT),
    "approx_quantile": (q_approx_quantile, SQL_APPROX_QUANTILE),
    "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "agg_unpivot": (q_agg_unpivot, SQL_AGG_UNPIVOT),
    "set_ops": (q_set_ops, SQL_SET_OPS),
    "string_agg": (q_string_agg, SQL_STRING_AGG),
    "array_functions": (q_array_functions, SQL_ARRAY_FUNCTIONS),
    "time_gap_fill": (q_time_gap_fill, SQL_TIME_GAP_FILL),
    "window_ntile": (q_window_ntile, SQL_WINDOW_NTILE),
    "join_full": (q_join_full, SQL_JOIN_FULL),
    "map_functions": (q_map_functions, SQL_MAP_FUNCTIONS),
    "distinct_count": (q_distinct_count, SQL_DISTINCT_COUNT),
    "approx_distinct": (q_approx_distinct, SQL_APPROX_DISTINCT),
    "join_semi": (q_join_semi, SQL_JOIN_SEMI),
    "join_anti": (q_join_anti, SQL_JOIN_ANTI),
    "join_range": (q_join_range, SQL_JOIN_RANGE),
    "join_asof": (q_join_asof, SQL_JOIN_ASOF),
    "join_asof_nearest": (q_join_asof_nearest, SQL_JOIN_ASOF_NEAREST),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "join_colocated": (q_join_colocated, SQL_JOIN_COLOCATED),
    "agg_salted": (q_agg_salted, SQL_AGG_SALTED),
    "agg_salted_skewed": (q_agg_salted_skewed, SQL_AGG_SALTED_SKEWED),
    "join_skew_hot": (q_join_skew_hot, SQL_JOIN_SKEW_HOT),
    "window_rank": (q_window_rank, SQL_WINDOW_RANK),
    "window_lead_lag": (q_window_lead_lag, SQL_WINDOW_LEAD_LAG),
    "window_running": (q_window_running, SQL_WINDOW_RUNNING),
    "window_session": (q_window_session, SQL_WINDOW_SESSION),
    "window_session_ids": (q_window_session_ids, SQL_WINDOW_SESSION_IDS),
    "window_session_native": (q_window_session_native, SQL_WINDOW_SESSION_NATIVE),
    "window_tumble": (q_window_tumble, SQL_WINDOW_TUMBLE),
    "window_slide": (q_window_slide, SQL_WINDOW_SLIDE),
    "window_range_frame": (q_window_range_frame, SQL_WINDOW_RANGE_FRAME),
    "agg_grouping_sets": (q_agg_grouping_sets, SQL_AGG_GROUPING_SETS),
    "scalar_functions": (q_scalar_functions, SQL_SCALAR_FUNCTIONS),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
}
