"""Row-quality flags: barcode checks and blank/constant fills.

All pure ``when``-expressions — the reference's per-row Python loops
(BatchUpdate.py:305-312, 216-264) collapse into single projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from journal_batch_processer_spark.code_tables import CODE_TABLES
from journal_batch_processer_spark.functions.notes import append_note_when
from journal_batch_processer_spark.schema_policy import Contract

MISSING_BARCODE_MSG = "Err: Missing barcode"
I_BARCODE_MSG = "Err: i-barcode"


def flag_missing_barcode(
    df: DataFrame, barcode_col: str = "Barcode", notes_col: str = "Notes"
) -> DataFrame:
    """Bare guard apostrophe or NULL → note (BatchUpdate.py:307-309)."""
    cond = (F.col(barcode_col) == "'") | F.col(barcode_col).isNull()
    return df.withColumn(
        notes_col, append_note_when(F.col(notes_col), cond, MISSING_BARCODE_MSG)
    )


def flag_i_barcode(
    df: DataFrame, barcode_col: str = "Barcode", notes_col: str = "Notes"
) -> DataFrame:
    """len>2 and 2nd char 'i' (first char after the guard quote) → note
    (BatchUpdate.py:310-312)."""
    bc = F.coalesce(F.col(barcode_col), F.lit(""))
    cond = (F.length(bc) > 2) & (F.substring(bc, 2, 1) == "i")
    return df.withColumn(
        notes_col, append_note_when(F.col(notes_col), cond, I_BARCODE_MSG)
    )


class CodeTableViolation(ValueError):
    pass


def _validated(colname: str, value: str, strict_reference_mode: bool) -> str:
    """The reference's interactive re-prompt (BatchUpdate.py:669-682)
    becomes a hard config error in a non-interactive engine."""
    if colname in CODE_TABLES and value not in CODE_TABLES[colname]:
        raise CodeTableViolation(
            f"value {value!r} not in code table for column {colname!r}; "
            f"options: {sorted(CODE_TABLES[colname])}"
        )
    return value


def fill_blank_defaults(
    df: DataFrame, contract: Contract, strict_reference_mode: bool = False
) -> DataFrame:
    """Optional-tier columns: overwrite *blank* cells with the default
    (BatchUpdate.py:216-239). Reference quirk: the write-back only runs
    for code-table columns (:231) — reproduced under
    ``strict_reference_mode``; by default every configured opt column
    with a default is filled."""
    contract = contract.expand_dependents()
    updates = {}
    for spec in contract.opt:
        if spec.name not in df.columns or spec.derived or spec.default is None:
            continue
        if strict_reference_mode and spec.name not in CODE_TABLES:
            continue
        value = _validated(spec.name, spec.default, strict_reference_mode)
        c = F.coalesce(F.col(spec.name), F.lit(""))
        updates[spec.name] = F.when(c == "", F.lit(value)).otherwise(c)
    return df.withColumns(updates) if updates else df


def overwrite_constants(
    df: DataFrame, contract: Contract, strict_reference_mode: bool = False
) -> DataFrame:
    """Add-tier columns: overwrite ALL cells with the default
    (BatchUpdate.py:244-264; same code-table scoping quirk :258)."""
    contract = contract.expand_dependents()
    updates = {}
    for spec in contract.add:
        if spec.derived or spec.default is None:
            continue
        if strict_reference_mode and spec.name not in CODE_TABLES:
            continue
        value = _validated(spec.name, spec.default, strict_reference_mode)
        updates[spec.name] = F.lit(value)
    return df.withColumns(updates) if updates else df
