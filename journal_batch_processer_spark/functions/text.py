"""Chronology-token canonicalization (month/season normalization).

The reference canonicalizes ``Chron J`` month/season spellings via 16
*sequential* case-insensitive ``re.sub`` passes (BatchUpdate.py:319-325,
applied :417-418). Order matters (e.g. "March" must hit the Mar rule
before the May rule could see it), so we preserve the exact sequence as
chained ``regexp_replace`` calls — all JVM-side, whole-stage codegen.

Known reference bug: the November rule substitutes ``"`` instead of
``Nov`` (:322). The engine emits ``Nov`` by default;
``strict_reference_mode=True`` reproduces the bug bit-for-bit for
parity goldens.

Python's ``\\w``/lookahead translate 1:1 to Java regex; ``(?i)`` replaces
``re.I``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (replacement, pattern) in the reference's exact order (BatchUpdate.py:319-324).
MONTH_RULES: list[tuple[str, str]] = [
    ("Jan", r"ja\w*"),
    ("Feb", r"fe\w*"),
    ("Mar", r"ma*r\w*"),
    ("Apr", r"ap\w*"),
    ("May", r"ma*y"),
    ("Jun", r"j(?:une|un|n|e)"),
    ("Jul", r"j(?:uly|ul|l|y)"),
    ("Aug", r"au?g\w*"),
    ("Sep", r"se\w*"),
    ("Oct", r"oc\w*"),
    ("Nov", r"no?v\w*"),  # reference bug: replaces with '"' (:322)
    ("Dec", r"de\w*"),
    ("Spr", r"spr\w*"),
    ("Sum", r"su\w*"),
    ("Fal", r"fa\w*|au(?!thor|g)\w*"),
    ("Win", r"wi\w*"),
]


def month_normalize(col: Column, strict_reference_mode: bool = False) -> Column:
    """Chained sequential regexp_replace, case-insensitive, global."""
    out = F.coalesce(col, F.lit(""))
    for repl, pat in MONTH_RULES:
        if strict_reference_mode and repl == "Nov":
            repl = '"'
        out = F.regexp_replace(out, "(?i)" + pat, repl)
    return out
