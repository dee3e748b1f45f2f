"""Produce golden outputs for the format/split stages by executing the
REFERENCE implementation on the fixture CSV (strict mode), plus a
fixed-mode variant (reference's Nov→'"' bug corrected).

The goldens are committed; tests never import the reference. Run only
when the fixture changes:

    python tools/make_fixtures.py && python tools/make_goldens.py
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "tests", "data")
REF = "/root/reference/BatchUpdate.py"


def main() -> None:
    fixture = os.path.abspath(os.path.join(DATA, "item_records.csv"))
    with tempfile.TemporaryDirectory() as tmp:
        shutil.copy(fixture, os.path.join(tmp, "item_records.csv"))
        os.chdir(tmp)
        sys.argv = ["BatchUpdate.py", "item_records.csv", "-f", "-s"]
        spec = importlib.util.spec_from_file_location("ref_batch", REF)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        f_name = ref.format("item_records.csv")
        s_name = ref.split(f_name)
        shutil.copy(f_name, os.path.join(DATA, "golden_f_strict.csv"))
        shutil.copy(s_name, os.path.join(DATA, "golden_s_strict.csv"))
        # fixed mode differs only in the Nov rule ('"' → 'Nov')
        with open(s_name) as fh:
            fixed = fh.read().replace('"', "Nov")
        with open(os.path.join(DATA, "golden_s_fixed.csv"), "w") as fh:
            fh.write(fixed)
    print("goldens written to tests/data/")


if __name__ == "__main__":
    main()
