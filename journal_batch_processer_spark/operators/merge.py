"""Field merge: CSV values merged into the fetched authoritative record.

Reference semantics (BatchUpdate.py:490-553), per item fetched from the
Alma API:

- ``Material Type`` / ``Item Policy``: ALWAYS overwritten; the stored
  value is the code-table code, with the human description kept as the
  ``desc`` attribute (:499-518).
- ``Enum A / Enum B / Chron I / Chron J``: overwritten ONLY when the
  CSV value is non-empty (:521-550); an absent element is created.

Spark-first: the remote record is a nested struct column (one row per
item in an ``items_remote`` table — FIXTURES.md A3); the merge is a
struct rebuild with ``when`` per field. No UDF, no XML in the hot
path — XML (de)serialization happens only at the REST boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from journal_batch_processer_spark.code_tables import code_map_expr

# CSV column -> remote struct field for the conditional (only-if-non-empty) fields.
CONDITIONAL_FIELDS = {
    "Enum A": "enumeration_a",
    "Enum B": "enumeration_b",
    "Chron I": "chronology_i",
    "Chron J": "chronology_j",
}
# CSV column -> (remote struct field, code table name) for coded always-set fields.
CODED_FIELDS = {
    "Material Type": ("physical_material_type", "Material Type"),
    "Item Policy": ("policy", "Item Policy"),
}


def _nonempty(col: Column) -> Column:
    return col.isNotNull() & (col != "")


def field_merge(df: DataFrame, item_col: str = "item") -> DataFrame:
    """Rebuild the nested item struct with merged field values.

    ``df`` carries the flat CSV columns plus ``item_col``, a struct with
    fields ``physical_material_type: struct<code,desc>``, ``policy:
    struct<code,desc>``, ``enumeration_a/b``, ``chronology_i/j`` (all
    nullable). Returns ``df`` with ``item_col`` replaced by the merged
    struct — pure ``withField`` projections.
    """
    merged = F.col(item_col)
    for csv_col, (field, table) in CODED_FIELDS.items():
        if csv_col not in df.columns:
            continue
        desc = F.coalesce(F.col(csv_col), F.lit(""))
        merged = merged.withField(
            field,
            F.struct(
                F.element_at(code_map_expr(table), desc).alias("code"),
                desc.alias("desc"),
            ),
        )
    for csv_col, field in CONDITIONAL_FIELDS.items():
        if csv_col not in df.columns:
            continue
        csv_val = F.col(csv_col)
        merged = merged.withField(
            field,
            F.when(_nonempty(csv_val), csv_val).otherwise(merged.getField(field)),
        )
    return df.withColumn(item_col, merged)


def merge_flat(
    df: DataFrame,
    csv_col: str,
    remote_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Flat-column variant of the conditional merge rule — used by the
    oracle-checked queries: ``csv if csv != '' else remote``."""
    csv_val = F.col(csv_col)
    out = F.when(_nonempty(csv_val), csv_val).otherwise(F.col(remote_col))
    return df.withColumn(out_col or csv_col, out)
