"""tools/sweep_monitor.py resilience tests (no Spark).

The r13 100x sweep hit the failure mode these pin: an executor heap
OOM killed the child's SparkContext mid-sweep, and every later key in
that child emitted "FAIL <key>: spark error: An error occurred while
calling oNNNN.parquet." — 20 spurious FAIL rows for one real crash.
The monitor now recognizes the dead-session signature, records only
the first such key (as "error", for a by-hand re-run), kills the
child, and respawns a fresh JVM for the remaining keys.

Driven end-to-end with a stub checker script so the test needs
neither Spark nor DuckDB.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MONITOR = os.path.join(REPO, "tools", "sweep_monitor.py")

# Emits verdicts for the keys it is given, one per argv, scripted by
# a JSON behavior file: "ok" prints an ok line; "dead" prints the
# dead-session FAIL signature and then keeps "failing" every later
# key the way a stopped SparkContext does (matching the real cascade).
STUB = textwrap.dedent(
    """
    import json, sys
    behavior = json.load(open(sys.argv[1]))
    keys = [a for a in sys.argv[2:] if not a.startswith("--")]
    session_dead = False
    for k in keys:
        mode = behavior.get(k, "ok")
        if session_dead or mode == "dead":
            print(f"FAIL  {k}: spark error: An error occurred "
                  f"while calling o1234.parquet.", flush=True)
            session_dead = True
        else:
            print(f"ok    {k} (hash, 5 rows, 0.1s)", flush=True)
    """
)


def run_monitor(tmp_path, keys, behavior, timeout=30.0):
    stub = tmp_path / "stub_checker.py"
    stub.write_text(STUB)
    bfile = tmp_path / "behavior.json"
    bfile.write_text(json.dumps(behavior))
    # the monitor invokes `python <checker> --hash <keys...>`; wrap the
    # behavior file in via a shim so the stub keeps the real call shape
    shim = tmp_path / "checker.py"
    shim.write_text(
        f"import runpy, sys\n"
        f"sys.argv = [sys.argv[0], {str(bfile)!r}] + sys.argv[1:]\n"
        f"exec(open({str(stub)!r}).read())\n"
    )
    keyfile = tmp_path / "keys.txt"
    keyfile.write_text("\n".join(keys) + "\n")
    rows_json = tmp_path / "rows.json"
    log = tmp_path / "sweep.log"
    proc = subprocess.run(
        [
            sys.executable, MONITOR,
            "--keys", str(keyfile),
            "--rows-json", str(rows_json),
            "--log", str(log),
            "--timeout", str(timeout),
            "--checker", str(shim),
        ],
        capture_output=True, text=True, timeout=120,
    )
    rows = json.loads(rows_json.read_text()) if rows_json.exists() else {}
    return proc, rows


def test_all_ok_records_every_key(tmp_path):
    keys = ["k1", "k2", "k3"]
    proc, rows = run_monitor(tmp_path, keys, {})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert {k: v[0] for k, v in rows.items()} == {
        "k1": "ok", "k2": "ok", "k3": "ok"}


def test_dead_session_cascade_is_not_recorded_as_fails(tmp_path):
    """One dead-session key must yield ONE error row, not a FAIL for
    it plus every key after it; keys after the crash re-run in a
    fresh child and come back ok."""
    keys = ["k1", "boom", "k3", "k4"]
    proc, rows = run_monitor(tmp_path, keys, {"boom": "dead"})
    statuses = {k: v[0] for k, v in rows.items()}
    assert statuses == {
        "k1": "ok", "boom": "error", "k3": "ok", "k4": "ok"}, (
        proc.stdout + proc.stderr)
    assert "needs a by-hand re-run" in rows["boom"][1]
    # non-green summary -> nonzero exit so a wrapper script notices
    assert proc.returncode == 1


def test_genuine_fail_is_still_a_fail(tmp_path):
    """A FAIL without the dead-session signature is a real oracle
    mismatch and must be recorded as FAIL without killing the child."""
    stub = tmp_path / "stub_checker.py"
    stub.write_text(textwrap.dedent(
        """
        import sys
        keys = [a for a in sys.argv[1:] if not a.startswith("--")]
        for k in keys:
            if k == "bad":
                print(f"FAIL  {k}: hash mismatch (spark 5 rows, "
                      f"oracle 6 rows)", flush=True)
            else:
                print(f"ok    {k} (hash, 5 rows, 0.1s)", flush=True)
        """
    ))
    keyfile = tmp_path / "keys.txt"
    keyfile.write_text("k1\nbad\nk3\n")
    rows_json = tmp_path / "rows.json"
    proc = subprocess.run(
        [
            sys.executable, MONITOR,
            "--keys", str(keyfile),
            "--rows-json", str(rows_json),
            "--log", str(tmp_path / "sweep.log"),
            "--timeout", "30",
            "--checker", str(stub),
        ],
        capture_output=True, text=True, timeout=120,
    )
    rows = json.loads(rows_json.read_text())
    assert {k: v[0] for k, v in rows.items()} == {
        "k1": "ok", "bad": "FAIL", "k3": "ok"}, proc.stdout + proc.stderr
