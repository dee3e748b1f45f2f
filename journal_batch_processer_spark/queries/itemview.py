"""Synthetic Alma-style item view derived deterministically from the
TPC-H-ish ``orders`` table — the bridge between the reference's data
model and the driver's oracle-checkable tables.

Both sides are generated from the same integer arithmetic:
- the Spark side builds the view with DataFrame expressions and then
  runs the REAL engine operators on it;
- the DuckDB oracle reconstructs the *expected operator output*
  arithmetically (no regex!), giving a fully independent check of the
  regex/extraction/imputation logic.

Group structure: g = o_orderkey % N_GROUPS (an MMS ID per group),
k = row_number within group ordered by o_orderkey (the natural-sort
position). Description style s = (g + k) % 7 covers all three regex
patterns plus non-matching rows; months cycle through mixed spellings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_GROUPS = 150

# Mixed spellings, all matched by the description patterns' month token.
MONTHS = [
    "Jan", "february", "MAR", "Apr", "may", "JUNE",
    "Jul", "aug", "Sept", "Oct", "nov", "Dec",
]


def base_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → (g, k, vol, m, mon1, mon2, y4, style) deterministic ints."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    g = (F.col("o_orderkey") % N_GROUPS).cast("int")
    df = orders.select(F.col("o_orderkey"), g.alias("g"))
    k = F.row_number().over(Window.partitionBy("g").orderBy("o_orderkey"))
    df = df.withColumn("k", k)
    mon_arr = F.array(*[F.lit(m) for m in MONTHS])
    return (
        df.withColumn("vol", F.col("k"))
        .withColumn("m", (F.col("k") % 9 + 1).cast("int"))
        .withColumn(
            "mon1",
            F.element_at(mon_arr, ((F.col("g") * 3 + F.col("k")) % 12).cast("int") + 1),
        )
        .withColumn(
            "mon2",
            F.element_at(
                mon_arr, ((F.col("g") * 5 + F.col("k") + 7) % 12).cast("int") + 1
            ),
        )
        .withColumn("y4", (F.lit(1985) + F.col("g") % 15 + F.col("k") % 120).cast("int"))  # k % 120: years stay 4-digit at ANY corpus scale - unbounded k made 5-digit "years" at 100x, which the regex battery (correctly, per the reference) refuses to parse while the arithmetic oracle still expected extractions (SWEEP_r12 section 6)
        .withColumn("style", ((F.col("g") + F.col("k")) % 7).cast("int"))
    )


def description_expr() -> F.Column:
    """The free-text Description for each (style, vol, m, mon, y) tuple."""
    v = F.col("vol").cast("string")
    m = F.col("m").cast("string")
    m2 = (F.col("m") + 1).cast("string")
    y = F.col("y4").cast("string")
    y_next = (F.col("y4") + 1).cast("string")
    y2 = F.substring(F.col("y4").cast("string"), 3, 2)
    mon1, mon2 = F.col("mon1"), F.col("mon2")
    s = F.col("style")
    return (
        F.when(s == 0, F.concat(F.lit("v."), v, F.lit(" no."), m, F.lit(" ("), mon1, F.lit(" "), y, F.lit(")")))
        .when(s == 1, F.concat(F.lit("Vol "), v, F.lit(" ("), y, F.lit(" "), mon1, F.lit(")")))
        .when(s == 2, F.concat(F.lit("v."), v, F.lit(" ("), mon1, F.lit(" "), y, F.lit(" - "), mon2, F.lit(" "), y_next, F.lit(")")))
        .when(s == 3, F.concat(F.lit("ser. 2 v. "), v, F.lit(" no "), m, F.lit("-"), m2, F.lit(" ("), mon1, F.lit(" "), y, F.lit(")")))
        .when(s == 4, F.concat(F.lit("v"), v, F.lit(" pt."), m, F.lit(" ("), y, F.lit(")")))
        .when(s == 5, F.concat(F.lit("index "), y))
        .otherwise(F.concat(F.lit("v "), v, F.lit(" nos. "), m, F.lit("/"), m2, F.lit(" ("), mon1, F.lit(" "), y2, F.lit(")")))
    )


def item_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Alma-shaped item table over TPC-H orders."""
    base = base_columns(spark, sf_dir)
    return base.select(
        F.col("o_orderkey"),
        F.col("g"),
        F.col("k"),
        (F.lit(9000000000000) + F.col("g")).cast("string").alias("MMS ID"),
        F.col("o_orderkey").cast("string").alias("Barcode"),
        F.concat(F.lit("Journal "), F.col("g").cast("string")).alias("title"),
        description_expr().alias("Description"),
        F.lit("").alias("Enum A"),
        F.lit("").alias("Enum B"),
        F.lit("").alias("Chron I"),
        F.lit("").alias("Chron J"),
        F.lit("").alias("Notes"),
    )


# ---------------------------------------------------------------------------
# DuckDB side: one CTE producing the same base integers + description,
# reused by every item-view oracle. Expected operator outputs are then
# reconstructed arithmetically per style.
# ---------------------------------------------------------------------------

MONTHS_SQL = "['" + "','".join(MONTHS) + "']"

BASE_CTE = f"""
base AS (
    SELECT
        o_orderkey,
        CAST(o_orderkey % {N_GROUPS} AS INT) AS g,
        CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey % {N_GROUPS} ORDER BY o_orderkey) AS INT) AS k
    FROM orders
),
iv AS (
    SELECT
        o_orderkey, g, k,
        k AS vol,
        CAST(k % 9 + 1 AS INT) AS m,
        ({MONTHS_SQL})[CAST((g * 3 + k) % 12 AS INT) + 1] AS mon1,
        ({MONTHS_SQL})[CAST((g * 5 + k + 7) % 12 AS INT) + 1] AS mon2,
        CAST(1985 + g % 15 + k % 120 AS INT) AS y4,
        CAST((g + k) % 7 AS INT) AS style
    FROM base
)
"""

# Expected desc_extract output per style, reconstructed with no regex.
EXPECTED_EXTRACT_SQL = """
expected AS (
    SELECT o_orderkey, g, k,
        CASE style
            WHEN 0 THEN 'v.' || vol
            WHEN 1 THEN 'Vol ' || vol
            WHEN 2 THEN 'v.' || vol
            WHEN 3 THEN 'ser. 2 v. ' || vol
            WHEN 4 THEN 'v' || vol
            WHEN 5 THEN ''
            ELSE 'v ' || vol
        END AS enum_a,
        CASE style
            WHEN 0 THEN 'no.' || m
            WHEN 3 THEN 'no ' || m || '-' || (m + 1)
            WHEN 4 THEN 'pt.' || m
            WHEN 6 THEN 'nos. ' || m || '/' || (m + 1)
            ELSE ''
        END AS enum_b,
        CASE style
            WHEN 2 THEN y4 || '-' || (y4 + 1)
            WHEN 5 THEN ''
            WHEN 6 THEN substr(CAST(y4 AS VARCHAR), 3, 2)
            ELSE CAST(y4 AS VARCHAR)
        END AS chron_i,
        CASE style
            WHEN 0 THEN mon1 || ' '
            WHEN 1 THEN mon1
            WHEN 2 THEN mon1 || '-' || mon2
            WHEN 3 THEN mon1 || ' '
            WHEN 4 THEN ''
            WHEN 5 THEN ''
            ELSE mon1 || ' '
        END AS chron_j,
        CASE style
            WHEN 1 THEN 'YearBeforeMonth'
            WHEN 2 THEN 'SplitYears'
            WHEN 5 THEN 'N/A'
            ELSE 'StdMatch'
        END AS pattern
    FROM iv
)
"""
