"""Monitored multi-key 100x oracle sweep (SWEEP_r12.md process note).

Runs tools/check_oracle.py --hash over an ordered key list in ONE
child process (per-key fresh processes pay ~20 s Spark startup each;
concurrent sessions produce spurious worker crashes). The monitor
tails the child's log; if the in-flight key produces no verdict line
within --timeout seconds, the child is killed and a new child resumes
from the NEXT key, recording the killed key as "timeout". Per-key
(status, note) rows are merged into --rows-json incrementally so a
crash never loses completed verdicts.

    python tools/sweep_monitor.py --keys keys.txt \
        --rows-json SWEEP_r12_rows.json --log /tmp/sweep.log

For 100x-corpus sweeps, launch with the SWEEP_r12 heavy-tail config —
the checker's local[8]/8-partition/8 GB defaults are sized for sf0.01
and FAIL at 100x in ways that look like engine bugs but aren't:

    SPARK_GRAFT_SF_DIR_T2=/tmp/jbp_sf100x \
    SPARK_DRIVER_MEMORY=24g \
    SPARK_GRAFT_CHECK_MASTER='local[22]' \
    SPARK_GRAFT_CHECK_SHUFFLE=96 \
    SPARK_GRAFT_STATE_STORE=rocksdb \
    SPARK_GRAFT_STREAM_DRAIN_TIMEOUT=1800 \
    python tools/sweep_monitor.py --timeout 3600 ...

Measured failure modes without these (r13, first two attempts):
stream_session_native's 9.5M-row complete-mode drain OOMs an 8 GB
driver — once as a hard executor OOM that killed the SparkContext
(and cascaded 20 spurious FAILs, hence DEAD_SESSION_RE), once as a
silent heap-full wedge where task threads died, the scheduler kept
showing 4 active tasks, and AQE's withFinalPlanUpdate parked forever
(caught only by the per-key timeout). And --timeout must cover the
prefix-ngram keys' ~1770 s staged-oracle walls, not the default 900
— r13 measured the FIRST ngram key in a fresh child at >3600 s
(staged build alone 2131 s on the post-reboot host, then the ~25 min
Spark-side verify), so give the ngram/near trio --timeout 7200 or
run them by hand without the monitor and merge the rows.
The drain-timeout override matters for every availableNow streaming
key: stream_tumble's 10M-event drain FAILed loud at the 180 s default
on the first r13 tail attempt (the bound is fail-loud by design —
queries/streaming_q.py:82 — so an undersized bound reads as a FAIL
row, not a hang).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

VERDICT_RE = re.compile(r"^(ok|FAIL|skip) +(\S+?):? (.*)$")

# A FAIL whose note matches these is not an oracle verdict — the
# child's SparkContext died (e.g. an executor heap OOM in local mode
# kills the whole JVM) and every later key in that child would fail
# the same way. Seen live in the r13 sweep: stream_session_native
# OOMed and 20 subsequent keys recorded spurious
# "An error occurred while calling oNNNN.parquet." rows.
DEAD_SESSION_RE = re.compile(
    r"An error occurred while calling o\d+\.|stopped SparkContext"
)


def load_rows(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_rows(path: str, rows: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True, help="file with one key per line")
    ap.add_argument("--rows-json", required=True)
    ap.add_argument("--log", required=True)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--checker", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "check_oracle.py"))
    args = ap.parse_args()

    with open(args.keys) as f:
        keys = [k.strip() for k in f if k.strip() and not k.startswith("#")]
    rows = load_rows(args.rows_json)
    pending = [k for k in keys if k not in rows]
    logf = open(args.log, "a", buffering=1)

    while pending:
        cmd = [sys.executable, args.checker, "--hash", *pending]
        logf.write(f"\n=== monitor: launching {len(pending)} keys ===\n")
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            bufsize=1, cwd=os.path.dirname(os.path.dirname(args.checker)) or ".",
        )
        key_start = time.monotonic()
        done_in_run: list[str] = []
        killed = False
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        buf = ""
        while True:
            if proc.poll() is not None and not sel.select(0):
                break
            events = sel.select(timeout=5.0)
            for key_ev, _ in events:
                chunk = os.read(key_ev.fileobj.fileno(), 65536).decode(
                    errors="replace")
                if not chunk:
                    sel.unregister(key_ev.fileobj)
                    continue
                # Spark's console progress bar shares the line with
                # the verdict via bare \r — treat \r as a newline so
                # "…(7 + 1) / 8]   ok    key (hash, …)" still matches.
                buf += chunk.replace("\r", "\n")
                while "\n" in buf:
                    line, buf = buf.split("\n", 1)
                    line = line.strip()
                    logf.write(line + "\n")
                    m = VERDICT_RE.match(line)
                    if m:
                        status, name, note = m.groups()
                        wall = time.monotonic() - key_start
                        key_start = time.monotonic()
                        if (status == "FAIL"
                                and DEAD_SESSION_RE.search(note)):
                            # dead-session cascade: the verdict is
                            # about the JVM, not the oracle. Record
                            # only the first such key (as an error to
                            # retry by hand), kill the child, and let
                            # the respawn re-run everything after it
                            # in a fresh JVM.
                            print(f"[monitor] DEAD SESSION at {name} "
                                  f"— killing child, respawning",
                                  flush=True)
                            logf.write(
                                f"=== monitor: DEAD SESSION {name} ===\n")
                            if name in pending and name not in done_in_run:
                                rows[name] = [
                                    "error",
                                    "spark session died (see log); "
                                    "needs a by-hand re-run",
                                ]
                                save_rows(args.rows_json, rows)
                                done_in_run.append(name)
                            proc.kill()
                            proc.wait()
                            killed = True
                            break
                        if name in pending:
                            rows[name] = [
                                "ok" if status == "ok" else
                                ("skip" if status == "skip" else "FAIL"),
                                note.strip(),
                            ]
                            save_rows(args.rows_json, rows)
                            done_in_run.append(name)
                            print(f"[monitor] {status:4s} {name} "
                                  f"({wall:.0f}s) — {note.strip()[:90]}",
                                  flush=True)
                if killed:
                    break
            if killed:
                break
            if proc.poll() is None and time.monotonic() - key_start > args.timeout:
                in_flight = next(
                    (k for k in pending if k not in done_in_run), None)
                print(f"[monitor] TIMEOUT on {in_flight} after "
                      f"{args.timeout:.0f}s — killing child, resuming past it",
                      flush=True)
                logf.write(f"=== monitor: TIMEOUT {in_flight} ===\n")
                if in_flight:
                    rows[in_flight] = [
                        "timeout", f">{args.timeout:.0f}s, killed by monitor"]
                    save_rows(args.rows_json, rows)
                    done_in_run.append(in_flight)
                proc.kill()
                proc.wait()
                killed = True
                break
        if not killed:
            proc.wait()
        pending = [k for k in pending if k not in done_in_run]
        if not killed and pending:
            # child exited without verdicts for the rest (crash):
            # mark the first pending key as the poison and move on
            poison = pending[0]
            print(f"[monitor] child exited rc={proc.returncode} mid-sweep; "
                  f"marking {poison} as error and resuming", flush=True)
            rows[poison] = ["error", f"child exited rc={proc.returncode}"]
            save_rows(args.rows_json, rows)
            pending = pending[1:]

    counts: dict[str, int] = {}
    for k in keys:
        st = rows.get(k, ["missing"])[0]
        counts[st] = counts.get(st, 0) + 1
    print(f"[monitor] done: {counts}", flush=True)
    return 0 if set(counts) <= {"ok", "skip"} else 1


if __name__ == "__main__":
    sys.exit(main())
