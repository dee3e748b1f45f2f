"""Standalone worker for the randomized branch/maintenance race test
(tests/test_table_format.py::test_branch_and_maintenance_race_model).

Extends tests/race_worker.py's cross-process model protocol (VERDICT
r10 item 5 / r11 item 4) with the REF + MAINTENANCE surface: branch
create / branch appends / fast-forward / drop_branch racing ordinary
main-log writers, while a third process runs gc_orphans and vacuum
(count- and time-based) against the live table.

    python tests/branch_race_worker.py <root> <role> <seed> <log_path>

Roles:
  writer0 / writer1 — seeded random sequences of append / MOR upsert /
      predicate delete on disjoint key ranges, retried per each op's
      conflict contract; one JSON line per COMMITTED op.
  brancher — fork a branch at head, commit appends on the branch, then
      fast_forward main to it (drop_branch on conflict). Branch ops
      are logged as committed MAIN ops only for the branch manifests
      that actually PUBLISHED into main's log (samefile check before
      the drop), so a mid-link conflict's published prefix is modeled
      exactly.
  maint — no Spark: loops gc_orphans(grace) + vacuum(retain_last,
      older_than_us) against the racing writers; logs nothing (no
      logical-state changes) but must never crash and never reclaim a
      live file — any violation surfaces as a parent model mismatch
      or a worker traceback.

The parent replays the union of all logs in committed-version order
through a dict model and compares with the final table read.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(tag: str):
    from journal_batch_processer_spark.session import get_spark

    spark = get_spark(f"branch-race-{tag}", master="local[2]",
                      shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _retry(t, spark, fn, on_noop=None, max_tries: int = 40):
    from journal_batch_processer_spark.operators.table_format import (
        CommitConflictError,
    )

    for _ in range(max_tries):
        try:
            return fn()
        except CommitConflictError:
            continue
        except NotImplementedError:
            # pending deletes block file-rewriting ops: resolve, retry
            # (apply_deletes COMMITS a model-neutral version — it must
            # still be logged so the parent sees every main commit)
            try:
                v = t.apply_deletes(spark)
                if on_noop is not None:
                    on_noop(v)
            except (ValueError, CommitConflictError, NotImplementedError):
                pass
            continue
        except ValueError as e:
            if "not in snapshot" in str(e):
                continue  # positional addresses went stale; replan
            raise
    raise RuntimeError(f"op starved after {max_tries} tries")


def run_writer(root: str, wid: int, seed: int, log_path: str) -> int:
    from journal_batch_processer_spark.operators.table_format import (
        SnapshotTable,
    )

    rng = random.Random(seed * 1000 + wid)
    spark = _spark(f"w{wid}-{seed}")
    t = SnapshotTable(root)
    base = 1_000_000 * (wid + 1)
    nxt = [base]

    def df(pairs):
        return spark.createDataFrame(
            pairs, "k bigint, v bigint"
        ).repartition(2)

    with open(log_path, "w") as log:

        def record(version, op, payload):
            log.write(json.dumps({"v": version, "op": op, "p": payload}))
            log.write("\n")
            log.flush()

        inserted: list[int] = []
        for _ in range(5):
            op = rng.choice(["insert", "insert", "upsert", "delete"])
            if op == "insert" or not inserted:
                lo = nxt[0]
                nxt[0] += 40
                pairs = [(k, k * 10) for k in range(lo, lo + rng.randint(5, 25))]
                record(t.append(df(pairs)), "insert", pairs)
                inserted.extend(k for k, _ in pairs)
            elif op == "upsert":
                ks = rng.sample(inserted, min(8, len(inserted)))
                lo = nxt[0]
                nxt[0] += 40
                pairs = [(k, rng.randint(1, 9) * 1000 + k) for k in ks]
                pairs += [(lo + i, (lo + i) * 10) for i in range(3)]
                record(
                    _retry(
                        t,
                        spark,
                        lambda: t.merge_mor(df(pairs), "k"),
                        on_noop=lambda v: record(v, "noop", None),
                    ),
                    "upsert",
                    pairs,
                )
                inserted.extend(p[0] for p in pairs[-3:])
            else:
                ks = rng.sample(inserted, min(4, len(inserted)))
                pred = " or ".join(f"k = {k}" for k in ks)
                record(
                    _retry(
                        t,
                        spark,
                        lambda: t.delete_where(spark, pred),
                        on_noop=lambda v: record(v, "noop", None),
                    ),
                    "delete",
                    ks,
                )
                inserted = [k for k in inserted if k not in set(ks)]
            time.sleep(rng.uniform(0.0, 0.3))
    spark.stop()
    return 0


def run_brancher(root: str, seed: int, log_path: str) -> int:
    from journal_batch_processer_spark.operators.table_format import (
        CommitConflictError,
        SnapshotTable,
    )

    rng = random.Random(seed * 7919)
    spark = _spark(f"b-{seed}")
    t = SnapshotTable(root)

    def df(pairs):
        return spark.createDataFrame(
            pairs, "k bigint, v bigint"
        ).repartition(2)

    with open(log_path, "w") as log:
        for attempt in range(3):
            name = f"audit-{seed}-{attempt}"
            try:
                b = t.create_branch(name)
            except (FileNotFoundError, ValueError):
                time.sleep(0.2)
                continue
            branch_ops = []  # (branch_version, payload)
            base = 5_000_000 + 100_000 * attempt + seed * 10_000
            for i in range(2):
                pairs = [
                    (k, k * 10)
                    for k in range(base + i * 50, base + i * 50 + 10)
                ]
                branch_ops.append((b.append(df(pairs)), pairs))
                time.sleep(rng.uniform(0.0, 0.4))
            # model exactly what PUBLISHED into main: full success →
            # every branch commit; a mid-link conflict → the prefix
            # below the contested version (fast_forward's contract);
            # a pre-check conflict (main advanced past the fork) →
            # nothing. Derived from the exception, not FS probing —
            # a racing vacuum can expire a published manifest before
            # any probe would see it.
            import re as _re

            try:
                t.fast_forward(name)
                published_below = float("inf")
            except CommitConflictError as e:
                m = _re.search(r"version (\d+) committed on main", str(e))
                published_below = int(m.group(1)) if m else 0
            except LookupError as e:
                m = _re.search(r"published up to v(\d+)", str(e))
                published_below = int(m.group(1)) + 1 if m else 0
            for v, pairs in branch_ops:
                if v < published_below:
                    log.write(
                        json.dumps({"v": v, "op": "insert", "p": pairs})
                    )
                    log.write("\n")
                    log.flush()
            try:
                t.drop_branch(name)
            except LookupError:
                pass
            time.sleep(rng.uniform(0.1, 0.5))
    spark.stop()
    return 0


def run_maint(root: str, seed: int, log_path: str) -> int:
    from journal_batch_processer_spark.operators.table_format import (
        SnapshotTable,
    )

    rng = random.Random(seed * 104729)
    t = SnapshotTable(root)
    stats = {"gc_files": 0, "vacuum_files": 0, "vacuum_manifests": 0}
    deadline = time.time() + 45
    for i in range(40):
        if time.time() > deadline:
            break
        try:
            g = t.gc_orphans(older_than_s=4.0)
            stats["gc_files"] += g["files_removed"]
            if rng.random() < 0.5:
                r = t.vacuum(retain_last=8)
            else:
                r = t.vacuum(
                    retain_last=8,
                    older_than_us=int((time.time() - 2.0) * 1e6),
                )
            stats["vacuum_files"] += r["files_removed"]
            stats["vacuum_manifests"] += r["manifests_removed"]
        except FileNotFoundError:
            pass  # table has no commits yet
        time.sleep(rng.uniform(0.2, 0.6))
    with open(log_path, "w") as log:
        log.write(json.dumps({"op": "maint", "stats": stats}) + "\n")
    return 0


def main() -> int:
    root, role, seed, log_path = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4],
    )
    if role.startswith("writer"):
        return run_writer(root, int(role[-1]), seed, log_path)
    if role == "brancher":
        return run_brancher(root, seed, log_path)
    if role == "maint":
        return run_maint(root, seed, log_path)
    raise SystemExit(f"unknown role {role}")


if __name__ == "__main__":
    raise SystemExit(main())
