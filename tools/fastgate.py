"""Fast post-commit gate: the Spark-free checks that have ended rounds red.

Rounds 11 and 12 both closed with pytest red for the same reason — a
final commit changed an oracle data structure (`ORACLE_PRECOMPUTE`
et al.) and the dependent pure-DuckDB test was not re-run before the
snapshot. This gate makes that lesson structural instead of
aspirational: it runs in ~10 s (no SparkSession), so it can hang off a
post-commit hook without slowing anything down.

What it checks:
  1. every package/tests .py file byte-compiles,
  2. the registry imports and all 240 keys resolve,
  3. the exact test class that bit r11/r12: oracle placeholder
     formatting + ORACLE_PRECOMPUTE variant/self-contained equivalence
     (both DuckDB-only, seconds).

Exit 0 on green. On failure: exit 1 AND write FASTGATE_FAIL.md at the
repo root so a red state is loud in `git status` even when the hook's
output scrolls away. A green run removes the marker.

Install the advisory hook (never blocks a commit — the round driver
also commits, and a blocking hook could eat an end-of-round snapshot):

    cp tools/hooks/post-commit .git/hooks/post-commit

run directly:  python tools/fastgate.py
"""

from __future__ import annotations

import compileall
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = os.path.join(REPO, "FASTGATE_FAIL.md")

# Spark-free, seconds-cheap, and exactly the breakage class that ended
# r11/r12 red (oracle data-structure shape vs dependent test).
GATE_TESTS = [
    "tests/test_registry_smoke.py::test_no_unformatted_placeholders_in_oracles",
    "tests/test_registry_smoke.py::test_oracle_precompute_variants_match_selfcontained",
]


def main() -> int:
    t0 = time.time()
    failures: list[str] = []

    ok = compileall.compile_dir(
        os.path.join(REPO, "journal_batch_processer_spark"),
        quiet=2, force=False,
    ) and compileall.compile_dir(os.path.join(REPO, "tests"), quiet=2)
    if not ok:
        failures.append("byte-compile failed (see output above)")

    probe = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from journal_batch_processer_spark.queries.registry import REGISTRY; "
         "assert len(REGISTRY) >= 240, len(REGISTRY)" % REPO],
        capture_output=True, text=True, cwd=REPO,
    )
    if probe.returncode != 0:
        failures.append("registry import/resolve failed:\n" + probe.stderr[-2000:])

    if not failures:  # tests import the registry too — skip if broken
        res = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", "-p", "no:cacheprovider",
             *GATE_TESTS],
            capture_output=True, text=True, cwd=REPO,
        )
        if res.returncode != 0:
            failures.append(
                "gate tests failed:\n" + (res.stdout + res.stderr)[-3000:]
            )

    wall = time.time() - t0
    if failures:
        with open(MARKER, "w") as f:
            f.write(
                "# FASTGATE FAIL\n\nA post-commit fast gate failed at "
                f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} "
                f"(HEAD {_head()}, {wall:.1f}s). Fix before the round "
                "snapshot — this is the r11/r12 red-round failure class.\n\n"
                + "\n\n".join(f"```\n{f}\n```" for f in failures)
            )
        print(f"FASTGATE: RED in {wall:.1f}s — wrote FASTGATE_FAIL.md",
              file=sys.stderr)
        return 1
    if os.path.exists(MARKER):
        os.remove(MARKER)
    print(f"FASTGATE: green in {wall:.1f}s")
    return 0


def _head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=REPO,
        ).stdout.strip()
    except OSError:
        return "?"


if __name__ == "__main__":
    sys.exit(main())
