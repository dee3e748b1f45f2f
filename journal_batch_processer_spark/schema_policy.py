"""Three-tier schema contract: mandatory / optional / add-with-default.

Re-expresses the reference's ``_checkColumns`` (BatchUpdate.py:584-667)
as a pure, analyzer-time policy over DataFrame schemas:

- **mand**: hard error when absent (reference: sys.exit(1), :626-629).
- **opt**: used when present, ignored when absent (:641-649).
- **add**: appended as empty-string columns when absent (:652-658).
- dependent expansion: a contract containing ``Description`` pulls in
  ``Enum A / Enum B / Chron I / Chron J`` (:604-622); the split stage
  always ensures ``Pattern``/``Notes`` (:202-212), update ensures
  ``Notes`` (:451-455).

Unlike the reference, the contract object is immutable — no process-
global mutation of the opt/add lists (:606-622). Flags: 'n' numeric-
guarded, 't' text, 'x' derived (never prompted / never filled).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPENDENT_OF_DESCRIPTION = ("Enum A", "Enum B", "Chron I", "Chron J")


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    flags: str = "t"
    default: str | None = None

    @property
    def numeric(self) -> bool:  # 'n' flag (BatchUpdate.py:633-634)
        return "n" in self.flags

    @property
    def derived(self) -> bool:  # 'x' flag (BatchUpdate.py:635-636)
        return "x" in self.flags


@dataclass(frozen=True)
class Contract:
    mand: tuple[ColumnSpec, ...] = ()
    opt: tuple[ColumnSpec, ...] = ()
    add: tuple[ColumnSpec, ...] = ()

    def expand_dependents(self) -> "Contract":
        """``Description`` in opt/add pulls the enum/chron columns into
        the same tier (BatchUpdate.py:604-622)."""
        new_opt, new_add = list(self.opt), list(self.add)
        for tier in (new_opt, new_add):
            names = {c.name for c in tier}
            if "Description" in names:
                for dep in DEPENDENT_OF_DESCRIPTION:
                    if dep not in names:
                        tier.append(ColumnSpec(dep, "tx"))
        return replace(self, opt=tuple(new_opt), add=tuple(new_add))

    @property
    def numeric_cols(self) -> set[str]:
        return {c.name for c in (*self.mand, *self.opt, *self.add) if c.numeric}

    @property
    def derived_cols(self) -> set[str]:
        return {c.name for c in (*self.mand, *self.opt, *self.add) if c.derived}


# The reference's default contract (BatchUpdate.py:26-28).
DEFAULT_CONTRACT = Contract(
    mand=(
        ColumnSpec("MMS ID", "n"),
        ColumnSpec("Barcode", "n"),
        ColumnSpec("title", "t"),
    ),
    opt=(),
    add=(
        ColumnSpec("Material Type", "t", "Bound Issue"),
        ColumnSpec("Item Policy", "t", "non-circulating"),
        ColumnSpec("Description", "tx"),
    ),
)


class MissingMandatoryColumns(ValueError):
    pass


def ensure_columns(df: DataFrame, contract: Contract) -> DataFrame:
    """Apply the contract: assert mand, index opt, append missing add.

    Pure plan-time work — appending a column is a ``lit("")`` projection,
    no data movement. Mirrors _checkColumns (BatchUpdate.py:584-667).
    """
    contract = contract.expand_dependents()
    have = set(df.columns)

    missing_mand = [c.name for c in contract.mand if c.name not in have]
    if missing_mand:
        raise MissingMandatoryColumns(
            f"data must contain mandatory column(s): {missing_mand}"
        )

    to_add = [c for c in contract.add if c.name not in have]
    if to_add:
        df = df.withColumns({c.name: F.lit("") for c in to_add})
    return df


def ensure_extra(df: DataFrame, *names: str) -> DataFrame:
    """Stage-level always-present columns: split adds Pattern+Notes
    (BatchUpdate.py:202-212), update adds Notes (:451-455)."""
    to_add = [n for n in names if n not in df.columns]
    if to_add:
        df = df.withColumns({n: F.lit("") for n in to_add})
    return df


def contract_order(df: DataFrame, contract: Contract) -> list[str]:
    """Column order the format stage projects to: mand → present-opt →
    add, i.e. the reference's ``ind`` insertion order (BatchUpdate.py:157)."""
    contract = contract.expand_dependents()
    have = set(df.columns)
    ordered: list[str] = [c.name for c in contract.mand]
    ordered += [c.name for c in contract.opt if c.name in have and c.name not in ordered]
    ordered += [c.name for c in contract.add if c.name not in ordered]
    return ordered
