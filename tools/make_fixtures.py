"""Generate the Alma-style item_records fixture CSV (FIXTURES.md A1).

Deterministic (seeded); covers every desc_extract regex path, every
year_impute branch, the barcode edge cases, and the month_normalize
spellings. Descriptions are unique within an MMS ID group so the
natural order is total (no tie-dependence between the reference's
stable sort and Spark's orderBy).

Run: python tools/make_fixtures.py  → tests/data/item_records.csv
"""

from __future__ import annotations

import os
import random

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "data", "item_records.csv")

MONTH_SPELLINGS = [
    "Jan", "january", "JAN", "Ja", "Feb", "febr", "Mar", "march", "Apr",
    "april", "May", "Jun", "june", "Je", "Jul", "july", "Aug", "Ag",
    "Sep", "sept", "Oct", "october", "Nov", "nv", "Dec", "dec",
    "Spring", "spr", "Summer", "summ", "Fall", "autumn", "Wint", "winter",
]


def year_seq_for_group(g: int, n: int, rng: random.Random) -> list[str]:
    """Chron I year strings exercising the imputation branches."""
    base = 1985 + (g * 7) % 25  # some groups straddle 2000
    years4 = [str(base + k) for k in range(n)]
    scheme = g % 5
    out = list(years4)
    if scheme == 0:  # odd rows 2-digit → both-anchor / only-prev branches
        for k in range(1, n, 2):
            out[k] = years4[k][2:]
    elif scheme == 1:  # first row 2-digit → only-next branch
        out[0] = years4[0][2:]
    elif scheme == 2:  # last row 2-digit → only-prev branch
        out[-1] = years4[-1][2:]
    elif scheme == 3:  # chained 2-digit run → propagation (exact-path only)
        for k in range(1, min(4, n)):
            out[k] = years4[k][2:]
    # scheme 4: all 4-digit (no imputation)
    return out


def make_rows() -> list[list[str]]:
    rng = random.Random(42)
    rows: list[list[str]] = []
    header = ["MMS ID", "Barcode", "title", "Description", "Status", "Process type"]
    n_groups = 25
    bc = 100000
    for g in range(n_groups):
        mms = str(9900000000000 + g * 13)
        n = rng.randint(4, 9)
        years = year_seq_for_group(g, n, rng)
        for k in range(n):
            bc += 1
            barcode = str(bc)
            if g == 3 and k == 0:
                barcode = ""  # missing barcode
            if g == 5 and k == 1:
                barcode = "i" + barcode  # i-barcode
            mon = MONTH_SPELLINGS[(g * 3 + k) % len(MONTH_SPELLINGS)]
            mon2 = MONTH_SPELLINGS[(g * 5 + k + 7) % len(MONTH_SPELLINGS)]
            vol = k + 1
            style = (g + k) % 7
            y = years[k]
            if style == 0:
                desc = f"v.{vol} no.{k + 1} ({mon} {y})"
            elif style == 1:
                desc = f"Vol {vol} ({y} {mon})" if len(y) == 4 else f"v {vol} ({mon} {y})"
            elif style == 2:
                y2 = str(int("19" + y) + 1)[-len(y):] if len(y) == 2 else str(int(y) + 1)
                desc = f"v.{vol} ({mon} {y} - {mon2} {y2})"
            elif style == 3:
                desc = f"ser. 2 v. {vol} no {k + 1}-{k + 2} ({mon} {y})"
            elif style == 4:
                desc = f"v{vol} pt.{k + 1} ({mon} {y})"
            elif style == 5:
                desc = f"v {vol} nos. {k + 1}/{k + 2} ({y})"
            else:
                desc = rng.choice(
                    [f"index {y}", "supplement", f"{y} only", f"misc issue {vol}"]
                )
            status = rng.choice(["Item in place", "Item not in place", ""])
            ptype = rng.choice(["Loan", "Missing", "Transit", ""])
            rows.append([mms, barcode, f"Journal of Testing {g}", desc, status, ptype])
    # one group with a single unanchorable 2-digit year → Err note
    rows.append(["9999999999999", str(bc + 1), "Lonely Serial", "v.1 (Oct 98)", "", ""])
    return [header] + rows


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    rows = make_rows()
    with open(OUT, "w", newline="") as fh:
        for row in rows:
            fh.write(",".join(row) + "\n")
    print(f"wrote {len(rows) - 1} rows to {OUT}")


if __name__ == "__main__":
    main()
