"""Notes accumulation helper.

The reference appends error messages to a free-text ``Notes`` column
with a "; " separator unless the column is still empty — the tuple-
index idiom ``("; ","")[notes == '']`` (BatchUpdate.py:309,312,413,561).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def append_note(notes: Column, msg: Column | str) -> Column:
    """``notes + ("; " if notes else "") + msg`` as a codegen-friendly
    expression. NULL notes are treated as empty (blank is the engine's
    empty sentinel, never null — SURVEY.md §1)."""
    msg_col = F.lit(msg) if isinstance(msg, str) else msg
    base = F.coalesce(notes, F.lit(""))
    return F.concat(
        base,
        F.when(base == "", F.lit("")).otherwise(F.lit("; ")),
        msg_col,
    )


def append_note_when(notes: Column, cond: Column, msg: Column | str) -> Column:
    """Conditionally append: identity when ``cond`` is false."""
    return F.when(cond, append_note(notes, msg)).otherwise(F.coalesce(notes, F.lit("")))
