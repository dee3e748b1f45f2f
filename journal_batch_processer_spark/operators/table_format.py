"""Pure-Python snapshot table format: a manifest commit log over parquet.

The one warehouse capability the repo's separate pieces (upsert_merge,
schema_evolution, compact_plan) didn't yet offer as a UNIFIED table
abstraction: a directory of parquet data files plus an append-only
commit log of JSON manifests, giving

- **snapshot isolation** — readers resolve ONE manifest and see exactly
  the files that commit listed, never a half-written mix;
- **time travel** — ``read(version=N)`` / ``read(as_of_us=T)`` replay
  any committed state (the Delta/Iceberg ``VERSION AS OF`` shape);
- **optimistic concurrency** — a commit is an exclusive hard-link of a
  fully-written temp manifest to ``v{N}.json``; two writers racing for
  the same version: exactly one wins, the loser gets
  :class:`CommitConflictError` (appends auto-rebase and retry; MERGE /
  compaction must re-run against the new snapshot, like Delta's
  ConcurrentAppendException);
- **copy-on-write MERGE** — file-level min/max key stats prune the
  rewrite set: only data files whose key range can contain a batch key
  are rewritten, every other file is carried into the new manifest
  untouched (at 100 TB the nightly merge rewrites the few overlapping
  files, not the table);
- **schema evolution on read** — additive column evolution is
  metadata-only: each manifest records the table schema AND each file's
  column set, so the reader null-fills old files from the manifest
  alone, never touching parquet footers of unrelated files;
- **data skipping** — ``read_pruned`` drops files by their min/max
  stats before Spark ever lists them (the scan-side twin of the COW
  pruning);
- **compaction** — small files are binned (whole-file, running-byte-sum
  cut, the compact_plan shape) and rewritten target-sized under the
  SAME snapshot contract: content identical, file count lower.

Scale notes. Every decision here is metadata-over-data: manifests are
O(files) JSON (at 100 TB ~millions of entries — the next step is
Iceberg-style manifest LISTS, sharding the file list itself; the commit
protocol is unchanged). The exclusive-link commit is the local-FS stand-
in for an object store's conditional PUT (S3 If-None-Match) or a commit
lock service. Stats come from parquet FOOTERS at write time (pyarrow),
so planning never scans data. The reference materializes every stage
boundary as a flat prefixed CSV with no versioning or atomicity
(BatchUpdate.py:174, :422, :565 — `_writeTo('f_'/'s_'/'suc_', ...)`);
this module is that boundary done as a real table: columnar, versioned,
atomic, prunable.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATS_TYPES = (int, float, str)

# --- session-scoped relation memo (r14, guide §6) --------------------------
#
# Spark caches catalog-table file listings per session
# (spark.sql.hive.filesourcePartitionFileCacheSize) precisely so repeated
# scans of one table do not relist it, but ad-hoc path reads with an
# explicit schema get no such cache: every `spark.read.schema(ddl)
# .parquet(*paths)` pays ~60-100 ms of driver-side relation resolution.
# A manifest-driven snapshot read issues one such call PER colset group
# PER version — q_table_snapshot_read's six-version summary spent 1.16 s
# of its 2.0 s building DataFrames before any job ran. This memo is the
# FileStatusCache analog for manifest reads: METADATA ONLY (a lazy
# DataFrame plan — no rows, no results; every action still scans the
# parquet), keyed by application, schema, and the exact (path, mtime,
# size) set so any rewritten file misses. In-process and bounded; dies
# with the session.
_REL_CACHE: dict = {}
_REL_CACHE_MAX = 256


def _path_relation(spark: SparkSession, ddl: str, paths: list) -> DataFrame:
    try:
        fkey = tuple(
            (p, int(os.path.getmtime(p) * 1000), os.path.getsize(p))
            for p in sorted(paths)
        )
    except OSError:  # racing writer/cleaner: resolve uncached
        return spark.read.schema(ddl).parquet(*paths)
    key = (spark.sparkContext.applicationId, ddl, fkey)
    df = _REL_CACHE.get(key)
    if df is None:
        if len(_REL_CACHE) >= _REL_CACHE_MAX:
            _REL_CACHE.clear()  # tiny plans; wholesale reset is fine
        df = spark.read.schema(ddl).parquet(*paths)
        _REL_CACHE[key] = df
    return df


class CommitConflictError(RuntimeError):
    """Another writer committed this version first; rebase and retry."""


def _fsync_write(path: str, payload: str) -> None:
    with open(path, "w") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())


def _file_entry(root: str, rel_path: str) -> dict:
    """Manifest entry for one parquet file: rows/bytes/columns plus
    per-column min/max, all read from the parquet FOOTER (pyarrow) —
    stats collection is metadata-only, no data scan."""
    import pyarrow.parquet as pq

    abspath = os.path.join(root, rel_path)
    meta = pq.ParquetFile(abspath).metadata
    cols = [meta.schema.column(i).name for i in range(meta.num_columns)]
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(meta.num_row_groups):
        for ci in range(meta.num_columns):
            st = meta.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if not isinstance(lo, _STATS_TYPES) or not isinstance(hi, _STATS_TYPES):
                continue  # timestamps/binary: not JSON-portable, skip
            name = cols[ci]
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return {
        "path": rel_path,
        "rows": meta.num_rows,
        "bytes": os.path.getsize(abspath),
        "columns": cols,
        "stats": {c: [mins[c], maxs[c]] for c in mins if c in maxs},
    }


class SnapshotTable:
    """Handle on a snapshot-table directory (see module docstring)."""

    # Iceberg-style MANIFEST LISTS: a commit whose file list exceeds
    # this many entries shards the list into side JSON files and the
    # top manifest references them — the commit stays one atomic
    # hard-link, but no single JSON grows O(table files). At 100 TB
    # (millions of files) this is the difference between a manifest
    # and a manifest LIST; readers are oblivious (``manifest()``
    # resolves shards transparently). Tests lower it to exercise the
    # sharded path at fixture scale.
    shard_threshold = 1000

    def __init__(self, root: str, branch: str | None = None):
        self.root = root
        self.branch = branch
        base = os.path.join(root, "_manifest")
        self._manifest_dir = (
            base if branch is None else os.path.join(base, "branches", branch)
        )
        self._data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------------
    # manifest log
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        root: str,
        schema: list[tuple[str, str]],
        committed_at_us: int | None = None,
    ) -> "SnapshotTable":
        """Initialise an empty table: version 1, no files."""
        t = cls(root)
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        t._try_commit(
            {
                "format_version": 1,
                "version": 1,
                "parent": None,
                "operation": "create",
                "committed_at_us": t._now_us(committed_at_us),
                "schema": [{"name": n, "type": ty} for n, ty in schema],
                "files": [],
            }
        )
        return t

    @staticmethod
    def _now_us(override: int | None) -> int:
        return int(time.time() * 1e6) if override is None else int(override)

    def versions(self) -> list[int]:
        paths = glob.glob(os.path.join(self._manifest_dir, "v*.json"))
        return sorted(int(os.path.basename(p)[1:-5]) for p in paths)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        return vs[-1]

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        with open(os.path.join(self._manifest_dir, f"v{v:05d}.json")) as fh:
            man = json.load(fh)
        shards = man.get("file_shards")
        if shards is not None:  # manifest LIST: inline the shard chunks
            files: list[dict] = []
            for rel in shards:
                with open(os.path.join(self._manifest_dir, rel)) as fh:
                    files.extend(json.load(fh))
            man["files"] = files
        return man

    def version_as_of(self, ts_us: int) -> int:
        """Greatest committed version with committed_at_us <= ts_us."""
        best = None
        for v in self.versions():
            if self.manifest(v)["committed_at_us"] <= ts_us:
                best = v
        if best is None:
            raise LookupError(f"no snapshot at or before t={ts_us}us")
        return best

    def history(self) -> list[dict]:
        out = []
        for v in self.versions():
            m = self.manifest(v)
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "committed_at_us": m["committed_at_us"],
                    "n_files": len(m["files"]),
                    "n_rows": sum(f["rows"] for f in m["files"]),
                }
            )
        return out

    # ------------------------------------------------------------------
    # branches (the Iceberg branch / fast-forward shape)
    # ------------------------------------------------------------------
    def _raw_manifest_files(self, version: int) -> list[str]:
        """Relative names of a version's on-disk manifest artifacts
        (the v-file plus any shard chunks), WITHOUT inlining — what a
        branch fork or fast-forward hard-links."""
        rel = [f"v{version:05d}.json"]
        with open(os.path.join(self._manifest_dir, rel[0])) as fh:
            rel += json.load(fh).get("file_shards", [])
        return rel

    def branches(self) -> list[str]:
        d = os.path.join(self.root, "_manifest", "branches")
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    def create_branch(
        self, name: str, version: int | None = None
    ) -> "SnapshotTable":
        """Fork a BRANCH at ``version`` (default head): an independent
        commit log seeded by hard-linking the fork manifest — zero
        data copied, and every table operation works on the branch
        handle unchanged (same data tree, own log). Main and branch
        then evolve independently; an audited branch comes back via
        :meth:`fast_forward`. This is the Iceberg branch ref shape
        (WAP generalized from one staged batch to a whole line of
        commits); branch-referenced files are vacuum-protected until
        :meth:`drop_branch`. Concurrency: publication is one atomic
        rename, so racing writers/maintenance can fail this call loud
        but never observe a half-created branch. Forking a version
        OLDER than the vacuum retention while a vacuum is mid-pass is
        the one window file-level arbitration cannot close (the same
        expire-vs-ref caveat Iceberg handles with a central catalog)
        — fork from a retained version (the default: head)."""
        if self.branch is not None:
            raise ValueError("create_branch from the main handle only")
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9_\-]{1,64}", name):
            raise ValueError(f"bad branch name {name!r}")
        v = self.latest_version() if version is None else version
        rels = self._raw_manifest_files(v)  # raises if v was vacuumed
        bdir = os.path.join(self.root, "_manifest", "branches", name)
        if os.path.isdir(bdir):
            raise ValueError(f"branch {name!r} already exists")
        # Build in a temp dir and publish with one atomic rename: a
        # concurrent vacuum expiring the fork version mid-link fails
        # THIS call loud (FileNotFoundError) but can never leave a
        # half-linked branch dir that blocks retries and confuses
        # branches()/vacuum protection scans.
        tmp = os.path.join(
            self.root,
            "_manifest",
            f".branch-tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}",
        )
        os.makedirs(tmp)
        try:
            for rel in rels:
                dst = os.path.join(tmp, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.link(os.path.join(self._manifest_dir, rel), dst)
            os.makedirs(os.path.dirname(bdir), exist_ok=True)
            try:
                os.rename(tmp, bdir)
            except OSError:
                # lost a same-name creation race after the isdir check
                raise ValueError(f"branch {name!r} already exists") from None
        finally:
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
        return SnapshotTable(self.root, branch=name)

    @staticmethod
    def _all_refs(man: dict) -> list[dict]:
        return (
            man["files"]
            + man.get("cdc_files", [])
            + man.get("delete_files", [])
            + man.get("staged_files", [])
        )

    @classmethod
    def _live_refs(cls, handle: "SnapshotTable") -> set[str]:
        """Union of file paths referenced by every readable version of
        ``handle``. A manifest that vanishes between the versions()
        listing and its read (a concurrent vacuum expiring it, or a
        concurrent drop_branch removing the ref) is SKIPPED: the
        remover owned its refs' liveness decision, so treating them
        as absent matches the post-race state instead of crashing a
        maintenance pass halfway through."""
        refs: set[str] = set()
        for v in handle.versions():
            try:
                refs |= {f["path"] for f in cls._all_refs(handle.manifest(v))}
            except FileNotFoundError:
                continue
        return refs

    # -- tags: named immutable version pins (Iceberg tag refs) --------
    def _tags_dir(self) -> str:
        return os.path.join(self.root, "_manifest", "tags")

    def tags(self) -> dict[str, int]:
        d = self._tags_dir()
        out: dict[str, int] = {}
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as fh:
                        out[fn[:-5]] = json.load(fh)["version"]
        return out

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin a TAG — a named immutable reference to one snapshot
        (Iceberg tags: release/audit pins). Tagged versions survive
        vacuum (their manifests and every file they reference are
        live until :meth:`drop_tag`), so `read(version=tags()[name])`
        keeps working years after ordinary retention expired it.
        One file per tag, published by the same exclusive ``link(2)``
        as commits — two writers racing the same name: exactly one
        wins, no read-modify-write window."""
        import re as _re

        if self.branch is not None:
            raise ValueError("create_tag from the main handle only")
        if not _re.fullmatch(r"[A-Za-z0-9_\-]{1,64}", name):
            raise ValueError(f"bad tag name {name!r}")
        v = self.latest_version() if version is None else version
        self.manifest(v)  # raises if vacuumed / never committed
        d = self._tags_dir()
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}")
        _fsync_write(tmp, json.dumps({"version": v}))
        try:
            os.link(tmp, os.path.join(d, f"{name}.json"))
        except FileExistsError:
            raise ValueError(
                f"tag {name!r} already exists (tags are immutable)"
            ) from None
        finally:
            os.unlink(tmp)
        return v

    def drop_tag(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self._tags_dir(), f"{name}.json"))
        except FileNotFoundError:
            raise LookupError(f"no tag {name!r}") from None

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        tags = self.tags()
        if name not in tags:
            raise LookupError(f"no tag {name!r}")
        return self.read(spark, version=tags[name])

    def drop_branch(self, name: str) -> dict:
        """Delete a branch's commit log AND reclaim its exclusive data
        files — the ones no main snapshot and no other branch
        references (branch-only files live in no main manifest, so
        ordinary vacuum can never see them; the drop is their only
        reclamation point, exactly Iceberg's remove-ref + expire).
        Shared (forked / fast-forwarded) files survive as main's hard
        links. Returns {files_removed, bytes_reclaimed}."""
        if name not in self.branches():
            raise LookupError(f"no branch {name!r}")
        bt = SnapshotTable(self.root, branch=name)
        branch_refs = self._live_refs(bt)
        # Remove the REF first, then compute liveness, then reclaim:
        # a fast_forward racing this drop either finished before the
        # rmtree (its links are in main's log, so the recompute below
        # sees them live) or fails loud mid-link on the vanished
        # branch dir — in neither case can main end up referencing a
        # reclaimed file. (With the old reclaim-then-rmtree order, an
        # ff completing inside that window published manifests whose
        # data files this drop had already unlinked.)
        try:
            shutil.rmtree(
                os.path.join(self.root, "_manifest", "branches", name)
            )
        except FileNotFoundError:
            raise LookupError(f"no branch {name!r}") from None
        live = self._live_refs(self)
        for other in self.branches():
            ot = SnapshotTable(self.root, branch=other)
            live |= self._live_refs(ot)
        removed = reclaimed = 0
        own_root = os.path.realpath(self.root) + os.sep
        for p in sorted(branch_refs - live):
            ap = os.path.join(self.root, p)
            if not os.path.realpath(ap).startswith(own_root):
                continue  # shallow-clone guard: never touch another table
            try:
                reclaimed += os.path.getsize(ap)
                os.unlink(ap)
                removed += 1
            except FileNotFoundError:
                pass
        return {"files_removed": removed, "bytes_reclaimed": reclaimed}

    def fast_forward(self, name: str) -> int:
        """Move MAIN to ``name``'s head — allowed only while main is
        an ancestor of the branch head (no main commits since the
        fork), Iceberg's fast-forward publish. Each branch manifest
        hard-links into main's log in order, under the same link(2)
        arbitration as any commit: a main writer racing the
        fast-forward loses exactly one of the two, never both —
        whichever links the contested version first wins and the
        loser surfaces :class:`CommitConflictError`."""
        if self.branch is not None:
            raise ValueError("fast_forward from the main handle only")
        b = SnapshotTable(self.root, branch=name)
        bvs = b.versions()
        if not bvs:
            raise LookupError(f"no branch {name!r}")
        fork = bvs[0]
        head = self.latest_version()
        if head != fork:
            raise CommitConflictError(
                f"main advanced past the fork (v{fork} → v{head}); "
                "rebase the branch instead of fast-forwarding"
            )
        for v in bvs[1:]:
            try:
                rels = b._raw_manifest_files(v)
            except FileNotFoundError:
                # drop_branch won the race mid-publish: the prefix
                # already linked is a consistent main history; surface
                # the partial publish loud rather than silently "done"
                raise LookupError(
                    f"branch {name!r} dropped during fast-forward "
                    f"(published up to v{v - 1})"
                ) from None
            for rel in rels:
                dst = os.path.join(self._manifest_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(os.path.join(b._manifest_dir, rel), dst)
                except FileExistsError:
                    raise CommitConflictError(
                        f"version {v} committed on main during fast-forward"
                    ) from None
                except FileNotFoundError:
                    raise LookupError(
                        f"branch {name!r} dropped during fast-forward "
                        f"(published up to v{v - 1})"
                    ) from None
        return self.latest_version()

    def _try_commit(self, man: dict) -> int:
        """Atomically publish ``man`` as v{N}. The temp manifest is
        fully written + fsynced first, then hard-linked to its final
        name — `link(2)` fails with EEXIST if any other writer got
        there, which IS the conflict detection (no lock files, no
        read-check-write race)."""
        files = man.get("files")
        if files is not None and len(files) > self.shard_threshold:
            # shard the file list into side JSONs BEFORE the atomic
            # link — like staged data files, unreferenced shards from
            # a lost race are garbage, never a torn manifest
            token = uuid.uuid4().hex[:8]
            os.makedirs(os.path.join(self._manifest_dir, "shards"), exist_ok=True)
            rels = []
            for s in range(0, len(files), self.shard_threshold):
                rel = (
                    f"shards/v{man['version']:05d}-"
                    f"{s // self.shard_threshold:03d}-{token}.json"
                )
                _fsync_write(
                    os.path.join(self._manifest_dir, rel),
                    json.dumps(files[s : s + self.shard_threshold]),
                )
                rels.append(rel)
            man = {k: v for k, v in man.items() if k != "files"}
            man["file_shards"] = rels
        target = os.path.join(self._manifest_dir, f"v{man['version']:05d}.json")
        tmp = os.path.join(
            self._manifest_dir, f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        )
        _fsync_write(tmp, json.dumps(man, indent=1, sort_keys=True))
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflictError(
                f"version {man['version']} already committed under {self.root}"
            ) from None
        finally:
            os.unlink(tmp)
        return man["version"]

    @staticmethod
    def _carry_deletes(man_out: dict, man_parent: dict) -> dict:
        """Carry the parent snapshot's pending equality-delete files
        into a child commit whose operation doesn't resolve them."""
        if man_parent.get("delete_files"):
            man_out["delete_files"] = man_parent["delete_files"]
        return man_out

    @staticmethod
    def _carry_staged(man_out: dict, man_parent: dict) -> dict:
        """Carry the parent snapshot's WAP-staged files (see
        :meth:`append_wap`) into a child commit that neither publishes
        nor aborts them. Staged files are workflow state, not logical
        table state, so EVERY ordinary commit carries them — a pending
        audit survives interleaved appends, merges, and maintenance,
        exactly as Iceberg's staged snapshots survive main-branch
        commits (they live in metadata until cherry-picked/expired)."""
        if man_parent.get("staged_files"):
            man_out["staged_files"] = man_parent["staged_files"]
        return man_out

    def _guard_no_pending_deletes(self, man: dict, op: str) -> None:
        """File-rewriting operations plan against the PHYSICAL file
        contents; running one while equality-delete files are pending
        would resurrect deleted rows (the rewrite reads rows the MOR
        filter hides). Fail loud and name the fix — the same contract
        Iceberg enforces by rewrite-delete maintenance ordering."""
        if man.get("delete_files"):
            raise NotImplementedError(
                f"{op} over pending (equality or positional) deletes is "
                "not supported — run apply_deletes() first"
            )

    # ------------------------------------------------------------------
    # write paths
    # ------------------------------------------------------------------
    def _stage_files(
        self, df: DataFrame, version_hint: int, prefix: str = "data"
    ) -> list[dict]:
        """Write ``df`` to uniquely-named data files and return their
        manifest entries. Files become VISIBLE only when a manifest
        referencing them commits — an abandoned stage is garbage, never
        a torn table (the snapshot-isolation half of the contract).
        ``prefix="cdc"`` stages change-feed files, kept apart from the
        data tree so a plain directory listing of ``data/`` never
        mixes in change rows."""
        token = uuid.uuid4().hex[:8]
        staging = os.path.join(self.root, f"_staging-{token}")
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(os.path.join(self.root, prefix), exist_ok=True)
        entries = []
        parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
        for i, p in enumerate(parts):
            rel = f"{prefix}/v{version_hint:05d}-{i:04d}-{token}.parquet"
            os.rename(p, os.path.join(self.root, rel))
            e = _file_entry(self.root, rel)
            # the Iceberg sequence-number shape: equality-delete files
            # apply only to data files COMMITTED BEFORE them, decided
            # by comparing this field against the delete's applies_below
            e["added_version"] = version_hint
            entries.append(e)
        shutil.rmtree(staging, ignore_errors=True)
        return [e for e in entries if e["rows"] > 0]

    def _stage_files_bucketed(
        self, df: DataFrame, version_hint: int, field: str, n_buckets: int
    ) -> list[dict]:
        """Stage ``df`` HIDDEN-PARTITIONED by ``field % n_buckets``
        (the Iceberg bucket-transform shape): one file per bucket, and
        each manifest entry records its transform + bucket value, so a
        point lookup on ``field`` prunes to 1/n of the files by
        METADATA alone — something min/max stats cannot do for a hash/
        modulo layout, where every bucket file spans the whole value
        range. The bucket column itself never exists in the data (the
        transform is recomputed from the entry — hidden partitioning:
        readers filter on the SOURCE column only)."""
        token = uuid.uuid4().hex[:8]
        staging = os.path.join(self.root, f"_staging-{token}")
        (
            df.withColumn("_b", F.pmod(F.col(field), F.lit(n_buckets)))
            .repartition(n_buckets, "_b")
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(staging)
        )
        os.makedirs(self._data_dir, exist_ok=True)
        entries = []
        parts = sorted(glob.glob(os.path.join(staging, "_b=*", "*.parquet")))
        for i, p in enumerate(parts):
            b = int(os.path.basename(os.path.dirname(p)).split("=", 1)[1])
            rel = f"data/v{version_hint:05d}-b{b:03d}-{i:04d}-{token}.parquet"
            os.rename(p, os.path.join(self.root, rel))
            e = _file_entry(self.root, rel)
            e["added_version"] = version_hint
            e["partition"] = {"field": field, "mod": n_buckets, "value": b}
            entries.append(e)
        shutil.rmtree(staging, ignore_errors=True)
        return [e for e in entries if e["rows"] > 0]

    # bloom sizing: bits per distinct value and probe count. ~10 bits/
    # key + 7 probes ≈ 1% false-positive rate — a skipped file is
    # PROVEN absent; a false positive only costs a scan, never a row.
    BLOOM_BITS_PER_KEY = 10
    BLOOM_PROBES = 7

    @staticmethod
    def _bloom_hashes(value, m: int) -> list[int]:
        """Deterministic double hashing off one md5: bit positions for
        ``value`` in an m-bit bloom. Pure-stdlib, identical on writer
        and reader by construction."""
        import hashlib

        d = hashlib.md5(str(value).encode()).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        return [(h1 + i * h2) % m for i in range(SnapshotTable.BLOOM_PROBES)]

    def _attach_blooms(self, entries: list[dict], columns: list[str]) -> None:
        """WRITE-TIME bloom filters per staged file (the Delta/Parquet
        bloom-index shape): for each column, the file's distinct value
        set folds into an ndv-sized bitset stored base64 in the
        manifest entry. Point lookups on hash-scattered keys — where
        every file spans the whole [min,max] range and stats prune
        NOTHING — drop to the few files whose bloom admits the value.
        Cost is one local columnar read per staged file at write time
        (pyarrow, driver-side; the file was just written and is hot),
        ~1.25 bytes of metadata per distinct key."""
        import base64

        import pyarrow.parquet as pq

        for e in entries:
            blooms = {}
            table = pq.read_table(
                os.path.join(self.root, e["path"]),
                columns=[c for c in columns if c in e["columns"]],
            )
            for c in table.column_names:
                vals = set(table.column(c).to_pylist()) - {None}
                if not vals:
                    continue
                m = max(64, self.BLOOM_BITS_PER_KEY * len(vals))
                bits = bytearray((m + 7) // 8)
                for v in vals:
                    for pos in self._bloom_hashes(v, m):
                        bits[pos >> 3] |= 1 << (pos & 7)
                blooms[c] = {
                    "m": m,
                    "b64": base64.b64encode(bytes(bits)).decode(),
                }
            if blooms:
                e["blooms"] = blooms

    def bloom_files(
        self, field: str, value, version: int | None = None
    ) -> tuple[list[dict], list[dict]]:
        """Split a snapshot's files into (kept, skipped) for a point
        lookup using every pruning source the manifest offers: the
        hidden-partition transform, min/max stats, AND per-file bloom
        filters. Files carrying none are kept — pruning is an
        optimization, never a correctness gate."""
        import base64

        kept, skipped = self.eq_files(field, value, version=version) if (
            isinstance(value, int)
        ) else (list(self.manifest(self._resolve(version, None))["files"]), [])
        out_kept = []
        for f in kept:
            bl = (f.get("blooms") or {}).get(field)
            if bl is not None:
                bits = base64.b64decode(bl["b64"])
                if not all(
                    bits[p >> 3] & (1 << (p & 7))
                    for p in self._bloom_hashes(value, bl["m"])
                ):
                    skipped.append(f)
                    continue
            out_kept.append(f)
        return out_kept, skipped

    def read_bloom_point(
        self, spark: SparkSession, field: str, value, version: int | None = None
    ) -> DataFrame:
        """Bloom-accelerated point lookup: files proven not to contain
        ``value`` are dropped before Spark lists them; the row filter
        does the rest."""
        v = self._resolve(version, None)
        man = self.manifest(v)
        kept, _ = self.bloom_files(field, value, version=v)
        df = self._read_with_deletes(spark, man, kept)
        return df.filter(F.col(field) == F.lit(value))

    def append(
        self,
        df: DataFrame,
        committed_at_us: int | None = None,
        new_columns: list[tuple[str, str]] | None = None,
        bucket_by: tuple[str, int] | None = None,
        bloom_for: list[str] | None = None,
        _max_retries: int = 10,
    ) -> int:
        """Append ``df`` as a new snapshot. Additive schema evolution:
        ``new_columns`` extends the table schema (metadata-only — old
        files are never touched; the reader null-fills them). Appends
        never conflict LOGICALLY, so a lost commit race auto-rebases on
        the new latest and retries (data files are already staged and
        are commit-target agnostic).

        ``bucket_by=(field, n)`` lays the batch out hidden-partitioned
        (see :meth:`_stage_files_bucketed`). The spec is PER FILE, so
        it can evolve freely between appends — Iceberg partition-spec
        evolution: each file prunes under the spec it was written
        with, files without one (or rewritten by COW) just never
        bucket-prune.

        ``bloom_for=[col, ...]`` attaches write-time per-file bloom
        filters for point-lookup skipping (see :meth:`_attach_blooms`
        / :meth:`read_bloom_point`); like the partition spec it is per
        file and freely evolvable."""
        base_v = self.latest_version()
        man = self.manifest(base_v)
        schema = list(man["schema"])
        known = {c["name"] for c in schema}
        for n, ty in new_columns or []:
            if n not in known:
                schema.append({"name": n, "type": ty})
                known.add(n)
        bad = set(df.columns) - known
        if bad:
            raise ValueError(f"append columns not in table schema: {sorted(bad)}")
        if bucket_by is not None:
            new_files = self._stage_files_bucketed(
                df, base_v + 1, bucket_by[0], bucket_by[1]
            )
        else:
            new_files = self._stage_files(df, base_v + 1)
        if bloom_for:
            self._attach_blooms(new_files, bloom_for)
        for _ in range(_max_retries):
            try:
                return self._try_commit(
                    self._carry_staged(
                        self._carry_deletes(
                        {
                            "format_version": 1,
                            "version": man["version"] + 1,
                            "parent": man["version"],
                            "operation": "append",
                            "committed_at_us": self._now_us(committed_at_us),
                            "schema": schema,
                            "files": man["files"] + new_files,
                        },
                        man,
                        ),
                        man,
                    )
                )
            except CommitConflictError:
                man = self.manifest(self.latest_version())
                merged = list(man["schema"])
                have = {c["name"] for c in merged}
                merged += [c for c in schema if c["name"] not in have]
                schema = merged
        raise CommitConflictError(f"append lost {_max_retries} commit races")

    def merge(
        self,
        batch_df: DataFrame,
        key: str,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
        resolve: str | None = None,
        stream_batch_id: int | None = None,
    ) -> int:
        """Copy-on-write MERGE (upsert): matched keys take the batch
        row wholesale, unmatched batch rows insert, untouched base rows
        survive — but only files whose [min,max] key range can contain
        a batch key are rewritten; all others carry into the new
        manifest by reference.

        ``resolve``: optional LAST-WINS conflict column (the Delta
        ``WHEN MATCHED AND source.seq > target.seq`` shape): instead of
        batch-wholesale replacement, each key keeps the single row with
        the highest ``resolve`` value across base ∪ batch — which also
        dedups multi-row batches and makes the END STATE invariant to
        how a stream of upserts is split into batches (the property
        streaming MERGE needs; ``resolve`` must be unique per key or
        the winner is undefined). ``stream_batch_id`` records the
        micro-batch id in the manifest for the exactly-once streaming
        protocol (see :meth:`merge_stream_batch`).

        The pruning join is batch ⋈ broadcast(file-ranges): the range
        table is O(files) and tiny, the batch streams past it once
        (BroadcastNestedLoopJoin on purpose — the broadcast side is the
        file METADATA, never data). Rewrites are repartitionByRange on
        the key so the new files keep disjoint key ranges and stay
        prunable for the NEXT merge. Conflicts are not retried: a merge
        is only valid against the snapshot it planned on, so the caller
        re-runs (Delta's ConcurrentAppend semantics)."""
        spark = batch_df.sparkSession
        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        self._guard_no_pending_deletes(man, "merge")
        cols = [c["name"] for c in man["schema"]]
        if set(batch_df.columns) != set(cols):
            raise ValueError(
                f"merge batch schema {sorted(batch_df.columns)} != table {sorted(cols)}"
            )
        files = man["files"]
        forced: list[int] = []  # no usable key stats → conservatively rewrite
        ranges: list[tuple[int, object, object]] = []
        for i, f in enumerate(files):
            st = (f.get("stats") or {}).get(key)
            if st is None:
                forced.append(i)
            else:
                ranges.append((i, st[0], st[1]))
        touched: set[int] = set(forced)
        if ranges:
            rng = spark.createDataFrame(
                [(i, lo, hi) for i, lo, hi in ranges], "fid int, lo long, hi long"
            )
            hits = (
                batch_df.select(F.col(key).alias("_k"))
                .join(
                    F.broadcast(rng),
                    (F.col("_k") >= F.col("lo")) & (F.col("_k") <= F.col("hi")),
                )
                .select("fid")
                .distinct()
                .collect()
            )
            touched |= {r.fid for r in hits}
        rewrite_idx = sorted(touched)
        carried = [f for i, f in enumerate(files) if i not in touched]
        batch = batch_df.select(cols)

        def last_wins(df: DataFrame) -> DataFrame:
            from pyspark.sql import Window

            w = Window.partitionBy(key).orderBy(F.col(resolve).desc())
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )

        if rewrite_idx:
            base = self._read_file_group(
                spark, man, [files[i] for i in rewrite_idx]
            ).select(cols)
            if resolve is None:
                merged = base.join(
                    batch.select(key), key, "left_anti"
                ).unionByName(batch)
            else:
                merged = last_wins(base.unionByName(batch))
        else:
            merged = batch if resolve is None else last_wins(batch)
        merged = merged.repartitionByRange(max(1, len(rewrite_idx) or 1), key)
        new_files = self._stage_files(merged, base_v + 1)
        # CHANGE DATA FEED materialized at write time (the Delta CDF
        # design): row-level changes are a diff of the REWRITTEN file
        # group only — carried files cancel by construction, so the
        # cost is O(changed files), and readers never recompute it.
        # The staged new files are read BACK for the diff (exact file
        # contents, not a lineage recompute).
        if rewrite_idx:
            old_rows = base
            new_rows = self._read_file_group(spark, man, new_files)
            changes = (
                new_rows.exceptAll(old_rows)
                .withColumn("_change", F.lit("insert"))
                .unionByName(
                    old_rows.exceptAll(new_rows).withColumn(
                        "_change", F.lit("delete")
                    )
                )
            )
        else:
            changes = batch.withColumn("_change", F.lit("insert"))
        cdc_files = self._stage_files(changes, base_v + 1, prefix="cdc")
        man_out = {
            "format_version": 1,
            "version": base_v + 1,
            "parent": base_v,
            "operation": "merge",
            "committed_at_us": self._now_us(committed_at_us),
            "schema": man["schema"],
            "files": carried + new_files,
            "cdc_files": cdc_files,
        }
        if stream_batch_id is not None:
            man_out["stream_batch_id"] = stream_batch_id
        return self._try_commit(self._carry_staged(man_out, man))

    def merge_stream_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        key: str,
        resolve: str | None = None,
    ) -> int | None:
        """foreachBatch sink body for STREAMING MERGE (the Delta
        foreachBatch-upsert pattern): apply one micro-batch of upserts
        exactly once — the manifest-recorded batch id makes a replayed
        batch (Structured Streaming's at-least-once window) skip, the
        same protocol as :meth:`append_stream_batch`. With ``resolve``
        the merge is last-wins on that column, so the table's end
        state is independent of how the upsert stream was batched.
        Returns the committed version, or None when skipped/empty."""
        if batch_id <= self.last_stream_batch_id():
            return None
        if not batch_df.take(1):
            return None
        return self.merge(
            batch_df, key, resolve=resolve, stream_batch_id=batch_id
        )

    def merge_mor_stream_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        key: str,
        resolve: str | None = None,
    ) -> int | None:
        """foreachBatch sink body for STREAMING MERGE-ON-READ upserts:
        one positional-delete + append commit per micro-batch, the
        same manifest-recorded batch-id exactly-once protocol as
        :meth:`merge_stream_batch` — but O(batch) commit cost with no
        file rewrites, the continuous-ingest shape (Iceberg streaming
        MOR). Maintenance (:meth:`apply_deletes`) amortizes the stack
        on the caller's schedule. With ``resolve`` the upsert is
        last-wins on that column, making the end state batching-
        invariant — the same contract as :meth:`merge_stream_batch`."""
        if batch_id <= self.last_stream_batch_id():
            return None
        if not batch_df.take(1):
            return None
        return self.merge_mor(
            batch_df, key, resolve=resolve, stream_batch_id=batch_id
        )

    def merge_mor(
        self,
        batch_df: DataFrame,
        key: str,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
        resolve: str | None = None,
        stream_batch_id: int | None = None,
    ) -> int:
        """MERGE-ON-READ upsert (the Iceberg v2 MERGE shape at scale):
        same LOGICAL contract as :meth:`merge` — matched keys take the
        batch row wholesale, unmatched batch rows insert — but ZERO
        data files are rewritten. The commit stages (a) the matched
        visible rows' addresses as a POSITIONAL delete file and (b)
        the batch as new data files; readers resolve via the usual
        broadcast anti-join, :meth:`apply_deletes` folds later.

        This is the nightly-upsert shape at 100 TB: commit cost is
        O(batch + matched-row addresses) regardless of how many
        terabytes the touched files hold, where COW rewrites every
        file whose key range overlaps the batch. The trade is read
        amplification until maintenance — exactly Iceberg's MOR/COW
        split, and why both verbs exist here.

        Candidate files are stats-pruned exactly like COW MERGE (the
        batch probes a broadcast file-range table), so the address
        scan touches only files that can contain a batch key. Unlike
        COW, pending deletes do NOT block (nothing is rewritten —
        stacking is the read path's normal case). The write-time CDF
        contract is kept: matched old rows materialize as deletes,
        the full batch as inserts. Conflicts are not retried (the
        plan is only valid against its snapshot — caller re-runs),
        matching :meth:`merge`.

        ``resolve``: the same LAST-WINS conflict column as COW merge —
        per key, the single highest-``resolve`` row across matched
        visible rows ∪ batch survives. A surviving BASE row means no
        delete and no insert for that key (the conditional-update
        path); a surviving batch row positionally deletes the losing
        base rows. Buys the same batching-invariance streaming MERGE
        needs."""
        spark = batch_df.sparkSession
        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        cols = [c["name"] for c in man["schema"]]
        if set(batch_df.columns) != set(cols):
            raise ValueError(
                f"merge batch schema {sorted(batch_df.columns)} != table {sorted(cols)}"
            )
        files = man["files"]
        batch = batch_df.select(cols)
        keys_df = batch.select(key).distinct()
        forced: list[int] = []
        ranges: list[tuple[int, object, object]] = []
        for i, f in enumerate(files):
            st = (f.get("stats") or {}).get(key)
            if st is None:
                forced.append(i)
            else:
                ranges.append((i, st[0], st[1]))
        touched: set[int] = set(forced)
        if ranges:
            rng = spark.createDataFrame(
                [(i, lo, hi) for i, lo, hi in ranges], "fid int, lo long, hi long"
            )
            hits = (
                batch.select(F.col(key).alias("_k"))
                .join(
                    F.broadcast(rng),
                    (F.col("_k") >= F.col("lo")) & (F.col("_k") <= F.col("hi")),
                )
                .select("fid")
                .distinct()
                .collect()
            )
            touched |= {r.fid for r in hits}
        cand = [files[i] for i in sorted(touched)]
        matched = None
        if cand:
            matched = (
                self._read_with_deletes(spark, man, cand, keep_pos=True)
                .join(F.broadcast(keys_df), key, "semi")
                # feeds the address stage AND the CDF — one scan,
                # reused (at most batch-keys × candidate rows)
                .cache()
            )
        if resolve is None:
            to_insert = batch
            addr = matched.select("_file", "_pos") if matched is not None else None
            old_out = matched.drop("_file", "_pos") if matched is not None else None
        else:
            from pyspark.sql import Window

            u = batch.select(
                *cols,
                F.lit(None).cast("string").alias("_file"),
                F.lit(None).cast("long").alias("_pos"),
            )
            if matched is not None:
                u = matched.select(*cols, "_file", "_pos").unionByName(u)
            ranked = u.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(key).orderBy(F.col(resolve).desc())
                ),
            ).cache()
            # winner from the batch → insert; losing BASE rows → the
            # positional delete; a winning base row touches nothing
            to_insert = (
                ranked.filter((F.col("__rn") == 1) & F.col("_file").isNull())
                .select(cols)
            )
            losers = ranked.filter(
                (F.col("__rn") > 1) & F.col("_file").isNotNull()
            )
            addr = losers.select("_file", "_pos")
            old_out = losers.select(cols)
        del_files: list[dict] = []
        try:
            if addr is not None:
                _, del_files, _ = self._stage_pos_delete(addr, base_v, man)
            # CDF as the symmetric difference (exceptAll both ways),
            # exactly like COW merge's rewritten-group diff: an upsert
            # that rewrites a row to the identical value emits nothing
            if old_out is not None:
                changes = to_insert.exceptAll(old_out).withColumn(
                    "_change", F.lit("insert")
                ).unionByName(
                    old_out.exceptAll(to_insert).withColumn(
                        "_change", F.lit("delete")
                    )
                )
            else:
                changes = to_insert.withColumn("_change", F.lit("insert"))
            cdc_files = self._stage_files(changes, base_v + 1, prefix="cdc")
            new_files = self._stage_files(
                to_insert.repartitionByRange(max(1, len(cand) or 1), key),
                base_v + 1,
            )
        finally:
            if matched is not None:
                matched.unpersist()
            if resolve is not None:
                ranked.unpersist()
        man_out = {
            "format_version": 1,
            "version": base_v + 1,
            "parent": base_v,
            "operation": "merge_mor",
            "committed_at_us": self._now_us(committed_at_us),
            "schema": man["schema"],
            "files": man["files"] + new_files,
            "delete_files": (man.get("delete_files") or []) + del_files,
            "cdc_files": cdc_files,
        }
        if stream_batch_id is not None:
            man_out["stream_batch_id"] = stream_batch_id
        return self._try_commit(self._carry_staged(man_out, man))

    def compact(
        self,
        spark: SparkSession,
        target_bytes: int,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
    ) -> int:
        """Small-file compaction under the snapshot contract: same
        rows, fewer files. Files are binned per column-group (never mix
        schema generations in one output file) by the whole-file
        running-byte-sum cut (`start div target` — the compact_plan /
        seq_pack shape); bins with ≥2 files rewrite to one file each,
        singletons carry by reference. Content equality v(N)==v(N+1) is
        the operator's contract and is what the oracle checks."""
        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        self._guard_no_pending_deletes(man, "compact")
        groups: dict[tuple[str, ...], list[dict]] = {}
        for f in man["files"]:
            groups.setdefault(tuple(f["columns"]), []).append(f)
        carried: list[dict] = []
        new_files: list[dict] = []
        for _, fs in sorted(groups.items()):
            fs = sorted(fs, key=lambda f: f["path"])
            bins: dict[int, list[dict]] = {}
            start = 0
            for f in fs:
                bins.setdefault(start // target_bytes, []).append(f)
                start += f["bytes"]
            for _, binfs in sorted(bins.items()):
                if len(binfs) < 2:
                    carried.extend(binfs)
                    continue
                df = self._read_file_group(spark, man, binfs, null_fill=False)
                new_files.extend(
                    self._stage_files(df.coalesce(1), base_v + 1)
                )
        return self._try_commit(
            self._carry_staged({
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "compact",
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": carried + new_files,
            }, man)
        )

    def delete_range(
        self,
        spark: SparkSession,
        key: str,
        lo,
        hi,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
    ) -> int:
        """Copy-on-write range DELETE (rows with key ∈ [lo, hi] leave
        the table): the three-way file split every lakehouse DELETE
        plans —

        - files ENTIRELY inside the range are DROPPED from the new
          manifest: a metadata-only delete, zero IO (the file stays on
          disk for time travel until vacuum);
        - files that only OVERLAP the range are rewritten with the
          complement filter;
        - files outside carry by reference; files without key stats
          rewrite conservatively.

        At 100 TB a retention or GDPR delete on a range-clustered key
        touches only the boundary files. The split counts are recorded
        in the manifest (``delete`` entry) for audit."""
        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        self._guard_no_pending_deletes(man, "delete_range")
        dropped, rewrite, carried = [], [], []
        for f in man["files"]:
            st = (f.get("stats") or {}).get(key)
            if st is None:
                rewrite.append(f)
            elif lo <= st[0] and st[1] <= hi:
                dropped.append(f)
            elif st[1] < lo or st[0] > hi:
                carried.append(f)
            else:
                rewrite.append(f)
        new_files: list[dict] = []
        deleted_parts = []
        if dropped:  # metadata-only drop, but the CDF records its rows
            deleted_parts.append(self._read_file_group(spark, man, dropped))
        if rewrite:
            in_group = self._read_file_group(spark, man, rewrite)
            kept_rows = in_group.filter((F.col(key) < lo) | (F.col(key) > hi))
            deleted_parts.append(
                in_group.filter((F.col(key) >= lo) & (F.col(key) <= hi))
            )
            new_files = self._stage_files(
                kept_rows.repartitionByRange(max(1, len(rewrite)), key),
                base_v + 1,
            )
        cdc_files: list[dict] = []
        if deleted_parts:
            changes = deleted_parts[0]
            for p in deleted_parts[1:]:
                changes = changes.unionByName(p)
            cdc_files = self._stage_files(
                changes.withColumn("_change", F.lit("delete")),
                base_v + 1,
                prefix="cdc",
            )
        return self._try_commit(
            self._carry_staged({
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "delete",
                "cdc_files": cdc_files,
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": carried + new_files,
                "delete": {
                    "key": key,
                    "lo": lo,
                    "hi": hi,
                    "dropped_files": len(dropped),
                    "rewritten_files": len(rewrite),
                    "carried_files": len(carried),
                },
            }, man)
        )

    def delete_mor(
        self,
        keys_df: DataFrame,
        key: str,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
    ) -> int:
        """MERGE-ON-READ equality delete (the Iceberg v2 equality-
        delete-file / Delta deletion-vector shape): rows whose ``key``
        appears in ``keys_df`` leave the LOGICAL table, but no data
        file is rewritten — the commit stages only the (small) distinct
        key set as a delete file and every data file carries by
        reference. Readers apply the delete as a broadcast anti-join;
        :meth:`apply_deletes` later folds it into the files.

        Applicability is the Iceberg sequence-number rule: the delete
        file records ``applies_below`` (this commit's version) and
        affects only data files with ``added_version`` strictly below
        it — a row re-inserted by a LATER append is visible again.

        At 100 TB this is the difference between a GDPR key-delete
        that commits in seconds (O(keys) IO now, rewrite amortized
        into the next maintenance window) and one that rewrites every
        file whose range contains a key. The flip side — read-path
        anti-join cost and the rewrite-op guard — is why
        ``apply_deletes`` exists; large delete sets should go through
        :meth:`delete_range` / COW instead.

        The write-time CDF contract is kept: the rows leaving the
        logical state (current MOR-filtered snapshot ⋈ keys, computed
        over stats-candidate files only) are materialized as
        ``cdc_files``, so :meth:`read_changes` and the streaming CDF
        treat this like any delete."""
        spark = keys_df.sparkSession
        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        types = {c["name"]: c["type"] for c in man["schema"]}
        if key not in types:
            raise ValueError(f"delete key {key!r} not in table schema")
        keys = (
            keys_df.select(F.col(key).cast(types[key]).alias(key))
            .distinct()
            .coalesce(1)
        )
        del_files = self._stage_files(keys, base_v + 1, prefix="delete")
        for d in del_files:
            d["key"] = key
            d["applies_below"] = base_v + 1
        # stats-prune the CDF computation: only files whose [min,max]
        # can contain a deleted key contribute deleted rows
        klo = min((d["stats"][key][0] for d in del_files if key in d.get("stats", {})), default=None)
        khi = max((d["stats"][key][1] for d in del_files if key in d.get("stats", {})), default=None)
        cand = []
        for f in man["files"]:
            st = (f.get("stats") or {}).get(key)
            if (
                st is not None
                and klo is not None
                and (st[1] < klo or st[0] > khi)
            ):
                continue
            cand.append(f)
        cdc_files: list[dict] = []
        if del_files and cand:
            cur = self._read_with_deletes(spark, man, cand)
            changes = cur.join(F.broadcast(keys), key, "semi").withColumn(
                "_change", F.lit("delete")
            )
            cdc_files = self._stage_files(changes, base_v + 1, prefix="cdc")
        return self._try_commit(
            self._carry_staged({
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "delete_mor",
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": man["files"],
                "delete_files": (man.get("delete_files") or []) + del_files,
                "cdc_files": cdc_files,
            }, man)
        )

    def positions_where(
        self,
        spark: SparkSession,
        condition,
        version: int | None = None,
        files_added_version: int | None = None,
    ) -> DataFrame:
        """Row ADDRESSES — ``(_file, _pos)`` pairs — of the logical
        rows matching ``condition`` (a SQL string or Column) in a
        snapshot: what an engine's row-level MERGE/DELETE emits as a
        positional delete at scale. Addresses come from the parquet
        scan's ``_metadata.file_path``/``row_index`` (zero extra IO,
        zero shuffle) and rows already hidden by pending deletes are
        excluded, so feeding the result to :meth:`delete_mor_pos`
        deletes exactly the visible matches. ``files_added_version``
        restricts the scan to files a specific commit added — the
        "only the old copy" targeting that equality deletes cannot
        express."""
        v = self._resolve(version, None)
        man = self.manifest(v)
        files = man["files"]
        if files_added_version is not None:
            files = [
                f for f in files
                if f.get("added_version", 0) == files_added_version
            ]
        df = self._read_with_deletes(spark, man, files, keep_pos=True)
        if isinstance(condition, str):
            condition = F.expr(condition)
        return df.filter(condition).select("_file", "_pos")

    def _stage_pos_delete(
        self, pos_df: DataFrame, base_v: int, man: dict
    ) -> tuple[DataFrame, list[dict], list[str]]:
        """Stage a distinct ``(_file, _pos)`` address set as a
        positional delete file; returns (canonical address frame,
        manifest delete entries tagged kind/refs/applies_below,
        referenced paths). Validates every referenced path against the
        snapshot — a stale address set (its file rewritten since
        planning) fails loud so the caller replans, never silently
        targets rows that no longer exist."""
        pos = (
            pos_df.select(
                F.col("_file").cast("string").alias("_file"),
                F.col("_pos").cast("long").alias("_pos"),
            )
            .distinct()
            .coalesce(1)
        )
        # the referenced-file set is small by contract (≤ table file
        # count); it becomes manifest metadata, so collect is O(files)
        refs = sorted(r._file for r in pos.select("_file").distinct().collect())
        known = {f["path"] for f in man["files"]}
        unknown = [p for p in refs if p not in known]
        if unknown:
            raise ValueError(
                f"positional delete references paths not in snapshot "
                f"v{base_v}: {unknown[:3]}"
            )
        del_files = self._stage_files(pos, base_v + 1, prefix="delete")
        for d in del_files:
            d["kind"] = "pos"
            d["refs"] = refs
            d["applies_below"] = base_v + 1
        return pos, del_files, refs

    def delete_mor_pos(
        self,
        pos_df: DataFrame,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
    ) -> int:
        """MERGE-ON-READ positional delete (the Iceberg v2 position-
        delete-file shape, completing :meth:`delete_mor`'s equality
        half): ``pos_df`` is a set of ``(_file, _pos)`` row addresses
        (root-relative data file path, row ordinal — see
        :meth:`positions_where`); those exact physical rows leave the
        LOGICAL table, no data file is rewritten. The commit stages
        only the distinct address set as a delete file; readers apply
        it as a broadcast anti-join on ``(_file, _pos)`` attached from
        scan metadata; :meth:`apply_deletes` later folds it into the
        files.

        Applicability is by construction narrower than equality: a
        positional delete names specific files (recorded as ``refs``
        in its manifest entry), so files committed later — including
        re-inserts of the same key values — are untouched, and readers
        attach row addresses ONLY when scanning a referenced file.
        This is the delete kind engines emit from row-level MERGE at
        100 TB: O(deleted-rows) commit metadata now, rewrite amortized
        into the next maintenance window, and — unlike equality — it
        can drop ONE of two physically duplicate rows.

        The write-time CDF contract is kept: the visible rows leaving
        the logical state materialize as ``cdc_files``, so
        :meth:`read_changes` and the streaming CDF treat this like any
        delete."""
        spark = pos_df.sparkSession
        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        pos, del_files, refs = self._stage_pos_delete(pos_df, base_v, man)
        ref_files = [f for f in man["files"] if f["path"] in set(refs)]
        cdc_files: list[dict] = []
        if del_files and ref_files:
            cur = self._read_with_deletes(spark, man, ref_files, keep_pos=True)
            changes = (
                cur.join(F.broadcast(pos), ["_file", "_pos"], "semi")
                .drop("_file", "_pos")
                .withColumn("_change", F.lit("delete"))
            )
            cdc_files = self._stage_files(changes, base_v + 1, prefix="cdc")
        return self._try_commit(
            self._carry_staged({
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "delete_mor_pos",
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": man["files"],
                "delete_files": (man.get("delete_files") or []) + del_files,
                "cdc_files": cdc_files,
            }, man)
        )

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        committed_at_us: int | None = None,
    ) -> int:
        """Predicate MOR delete in one call: address the visible rows
        matching ``condition`` (:meth:`positions_where`) and commit
        them as a positional delete — the row-level DELETE an engine
        plans at scale (O(matching rows) commit, zero rewrites),
        without the caller touching addresses."""
        return self.delete_mor_pos(
            self.positions_where(spark, condition),
            committed_at_us=committed_at_us,
        )

    def apply_deletes(
        self,
        spark: SparkSession,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
    ) -> int:
        """Maintenance rewrite resolving pending deletes — equality
        AND positional — (Iceberg's rewrite-deletes / Delta's PURGE):
        data files that actually CONTAIN an applicable deleted key or
        are named by a positional delete are rewritten with the
        anti-joins applied; every other file carries; the delete
        files drop from the manifest (vacuum reclaims them once their
        last referencing manifest expires). Content is identical to
        the MOR read by contract — this is a dataChange=false commit,
        invisible to the change feed, exactly like compaction.

        The rewrite set is proven, not guessed: candidate files pass
        the stats overlap test AND an exact probe of the (small) delete
        key sets against a broadcast table of file ranges — the same
        metadata-only planning MERGE uses."""
        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        dvs = man.get("delete_files") or []
        if not dvs:
            raise ValueError("apply_deletes: no pending deletes")
        eq_dvs, pos_dvs = self._split_deletes(man)
        files = man["files"]
        hit: set[int] = set()
        # positional deletes name their files outright: every
        # referenced file is in the rewrite set, nothing else is
        path_idx = {f["path"]: i for i, f in enumerate(files)}
        for d in pos_dvs:
            hit.update(path_idx[p] for p in d["refs"] if p in path_idx)
        # exact hit detection per equality-delete file: which affected
        # files' [min,max] ranges contain at least one of its keys
        for d in eq_dvs:
            ranged: list[tuple[int, object, object]] = []
            for i, f in enumerate(files):
                if f.get("added_version", 0) >= d["applies_below"]:
                    continue  # committed after the delete: unaffected
                st = (f.get("stats") or {}).get(d["key"])
                if st is None:
                    hit.add(i)  # no stats: conservatively rewrite
                else:
                    ranged.append((i, st[0], st[1]))
            if not ranged:
                continue
            rng = spark.createDataFrame(
                [(i, lo, hi) for i, lo, hi in ranged], "fid int, lo long, hi long"
            )
            keys = spark.read.schema(self._ddl(man, {d["key"]})).parquet(
                os.path.join(self.root, d["path"])
            )
            rows = (
                keys.select(F.col(d["key"]).alias("_k"))
                .join(
                    F.broadcast(rng),
                    (F.col("_k") >= F.col("lo")) & (F.col("_k") <= F.col("hi")),
                )
                .select("fid")
                .distinct()
                .collect()
            )
            hit |= {r.fid for r in rows}
        rewrite = [f for i, f in enumerate(files) if i in hit]
        carried = [f for i, f in enumerate(files) if i not in hit]
        new_files: list[dict] = []
        if rewrite:
            resolved = self._read_with_deletes(spark, man, rewrite)
            new_files = self._stage_files(
                resolved.coalesce(max(1, len(rewrite))), base_v + 1
            )
        return self._try_commit(
            self._carry_staged({
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "rewrite_deletes",
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": carried + new_files,
                "rewrite_deletes": {
                    "delete_files_removed": len(dvs),
                    "rewritten_files": len(rewrite),
                    "carried_files": len(carried),
                },
            }, man)
        )

    def restore(
        self,
        version: int,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
    ) -> int:
        """RESTORE: make ``version``'s state the new head — as a NEW
        commit referencing that snapshot's files, so history is
        preserved and the restore itself is time-travelable /
        revertible (the Delta RESTORE semantics; never a rollback that
        rewrites the log). Fails loud if the target was vacuumed."""
        src = self.manifest(version)  # raises if vacuumed away
        base_v = self.latest_version() if expected_version is None else expected_version
        head = self.manifest(base_v)
        for f in src["files"] + (src.get("delete_files") or []):
            if not os.path.exists(os.path.join(self.root, f["path"])):
                raise FileNotFoundError(
                    f"restore target v{version} references vacuumed file {f['path']}"
                )
        return self._try_commit(
            # a restored snapshot's pending equality deletes are part
            # of its logical state: carry them (version-numbered fields
            # stay mutually consistent — both sides were copied)
            self._carry_staged(
            self._carry_deletes(
                {
                    "format_version": 1,
                    "version": base_v + 1,
                    "parent": base_v,
                    "operation": "restore",
                    "restored_from": version,
                    "committed_at_us": self._now_us(committed_at_us),
                    "schema": src["schema"],
                    "files": src["files"],
                },
                src,
            # WAP-staged batches are WORKFLOW state pending on the
            # head, not logical state of the restored snapshot —
            # carry them from the head so a pending audit survives
            # the restore (Iceberg: staged snapshots live in
            # metadata regardless of what the branch points at)
            ), head,
            )
        )

    def optimize_zorder(
        self,
        spark: SparkSession,
        x_sql: str,
        y_sql: str,
        n_files: int = 8,
        bits: int = 8,
        committed_at_us: int | None = None,
        expected_version: int | None = None,
    ) -> int:
        """OPTIMIZE ZORDER BY as a table-maintenance commit: rewrite
        the head snapshot laid out by the Morton interleave of two
        dimension expressions (operators/layout), so per-file min/max
        stats become tight in BOTH dimensions and two-predicate scans
        prune — the content is identical by contract (same snapshot
        semantics as compaction). The Z key is transient: computed,
        range-partitioned + sorted on, and dropped before the write —
        the layout lives in the file boundaries, not in a column."""
        from journal_batch_processer_spark.operators.layout import (
            zorder_terms_sql,
        )

        base_v = self.latest_version() if expected_version is None else expected_version
        man = self.manifest(base_v)
        self._guard_no_pending_deletes(man, "optimize_zorder")
        df = self._read_file_group(spark, man, man["files"])
        z = F.expr(
            zorder_terms_sql(f"({x_sql})", f"({y_sql})", bits).format(div="div")
        )
        clustered = (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        new_files = self._stage_files(clustered, base_v + 1)
        return self._try_commit(
            self._carry_staged({
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "cluster",
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": new_files,
                "cluster": {"x": x_sql, "y": y_sql, "bits": bits},
            }, man)
        )

    def clone(
        self,
        dest_root: str,
        version: int | None = None,
        as_of_us: int | None = None,
        committed_at_us: int | None = None,
    ) -> "SnapshotTable":
        """SHALLOW CLONE (the Delta ``CREATE TABLE ... CLONE`` shape):
        a NEW table whose v1 manifest references the source snapshot's
        data files BY PATH — zero bytes copied, metadata-only, O(files).
        The clone then lives its own life: every write path is already
        copy-on-write, so its merges/deletes stage replacement files
        under the CLONE's root and the source is never touched;
        conversely source commits after the clone point are invisible
        to the clone (it pinned one manifest). Shared files are
        protected from the clone's vacuum by the outside-root guard in
        :meth:`vacuum` — reclaiming them is the source's prerogative.
        At 100 TB this is how dev/staging copies of a production table
        are made instantly (clone = one manifest write)."""
        v = self._resolve(version, as_of_us)
        man = self.manifest(v)
        # the clone restarts version numbering at 1, which would break
        # the per-pair added_version < applies_below applicability test
        # copied entries rely on once the clone writes its own files —
        # resolve deletes first (Iceberg's rewrite-deletes ordering)
        self._guard_no_pending_deletes(man, "clone")
        t = SnapshotTable(dest_root)
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        files = []
        for f in man["files"]:
            e = dict(f)
            e["path"] = os.path.relpath(
                os.path.join(self.root, f["path"]), dest_root
            )
            files.append(e)
        t._try_commit(
            {
                "format_version": 1,
                "version": 1,
                "parent": None,
                "operation": "clone",
                "cloned_from": {
                    "root": os.path.abspath(self.root),
                    "version": v,
                },
                "committed_at_us": t._now_us(committed_at_us),
                "schema": man["schema"],
                "files": files,
            }
        )
        return t

    def vacuum(
        self, retain_last: int = 2, older_than_us: int | None = None
    ) -> dict:
        """Physically remove data files referenced ONLY by snapshots
        older than the ``retain_last`` newest, and the expired
        manifests themselves — the retention pass that reclaims what
        copy-on-write leaves behind. ``older_than_us`` adds the
        TIME-based retention every engine ships (VACUUM RETAIN N
        HOURS): snapshots committed at or after it are kept however
        many there are, so the two knobs compose as keep =
        newest-``retain_last`` ∪ young ∪ tagged. TAGGED versions
        (:meth:`create_tag`) never expire. Time travel into vacuumed
        versions fails loud (manifest gone); the retained snapshots
        are untouched. Returns {files_removed, manifests_removed,
        bytes_reclaimed}."""
        if retain_last < 1:
            raise ValueError("vacuum must retain at least the head snapshot")
        if self.branch is not None:
            raise ValueError(
                "vacuum from the main handle only — a branch handle "
                "cannot see every snapshot that references a file"
            )
        versions = self.versions()
        keep_v = set(versions[-retain_last:])
        if older_than_us is not None:
            for v in versions:
                # a manifest already expired by a CONCURRENT vacuum is
                # simply not young — skip, don't crash the pass
                try:
                    young = self.manifest(v)["committed_at_us"] >= older_than_us
                except FileNotFoundError:
                    continue
                if young:
                    keep_v.add(v)
        keep_v |= set(self.tags().values())  # tag refs never expire
        _all_refs = self._all_refs
        live = set()
        for v in keep_v:
            try:
                live |= {f["path"] for f in _all_refs(self.manifest(v))}
            except FileNotFoundError:
                continue  # expired under us by another maintenance pass
        # branch protection (the Iceberg ref-retention rule): every
        # snapshot reachable from ANY branch keeps its files until
        # drop_branch — a branch is a live ref, not history
        # (_live_refs tolerates a branch being dropped mid-scan)
        for name in self.branches():
            live |= self._live_refs(SnapshotTable(self.root, branch=name))
        removed = reclaimed = 0
        own_root = os.path.realpath(self.root) + os.sep
        for v in versions:
            if v in keep_v:
                continue
            try:
                expired_refs = _all_refs(self.manifest(v))
            except FileNotFoundError:
                continue  # another vacuum already expired it
            for f in expired_refs:
                p = f["path"]
                if p in live:
                    continue
                live.add(p)  # only count/remove once
                # shallow-clone guard: entries referencing ANOTHER
                # table's files (``../`` paths from clone()) are never
                # reclaimed here — that data belongs to the source
                if not os.path.realpath(
                    os.path.join(self.root, p)
                ).startswith(own_root):
                    continue
                try:
                    reclaimed += os.path.getsize(os.path.join(self.root, p))
                    os.unlink(os.path.join(self.root, p))
                    removed += 1
                except FileNotFoundError:
                    pass
        n_manifests = 0
        for v in versions:
            if v not in keep_v:
                try:
                    shards = self.manifest(v).get("file_shards", [])
                except FileNotFoundError:
                    continue  # concurrent vacuum won this version
                for rel in shards:
                    try:
                        os.unlink(os.path.join(self._manifest_dir, rel))
                    except FileNotFoundError:
                        pass
                try:
                    os.unlink(
                        os.path.join(self._manifest_dir, f"v{v:05d}.json")
                    )
                    n_manifests += 1
                except FileNotFoundError:
                    pass
        return {
            "files_removed": removed,
            "manifests_removed": n_manifests,
            "bytes_reclaimed": reclaimed,
        }

    def gc_orphans(self, older_than_s: float = 3600.0) -> dict:
        """Remove ORPHAN files — on-disk data/cdc/delete/wap files no
        manifest of ANY ref (main, every branch, every version)
        mentions (Iceberg's remove_orphan_files / Delta VACUUM's
        untracked-file sweep). Orphans come from crashed writers:
        files staged and renamed into place whose commit never landed
        (the commit protocol makes them invisible, not free). The
        ``older_than_s`` grace window protects writers mid-commit —
        a file younger than it is assumed in-flight and kept, the
        same race guard Iceberg documents. In-progress ``_staging-*``
        directories are never touched. Main handle only."""
        if self.branch is not None:
            raise ValueError("gc_orphans from the main handle only")
        # _live_refs tolerates manifests/branches vanishing mid-scan
        # (concurrent vacuum / drop_branch): the remover owned those
        # refs' liveness, and every file still referenced by a
        # RETAINED snapshot stays in `referenced` via that snapshot.
        referenced: set[str] = self._live_refs(self)
        for name in self.branches():
            referenced |= self._live_refs(SnapshotTable(self.root, branch=name))
        now = time.time()
        removed = reclaimed = 0
        for prefix in ("data", "cdc", "delete", "wap"):
            d = os.path.join(self.root, prefix)
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                rel = f"{prefix}/{fn}"
                if rel in referenced:
                    continue
                ap = os.path.join(d, fn)
                try:
                    if now - os.path.getmtime(ap) < older_than_s:
                        continue  # possibly a commit in flight
                    reclaimed += os.path.getsize(ap)
                    os.unlink(ap)
                    removed += 1
                except FileNotFoundError:
                    pass
        return {"files_removed": removed, "bytes_reclaimed": reclaimed}

    # ------------------------------------------------------------------
    # streaming ingest
    # ------------------------------------------------------------------
    def last_stream_batch_id(self) -> int:
        """Highest micro-batch id committed into this table (-1 if
        none) — the transaction-version scan that makes streaming
        ingest exactly-once across restarts."""
        best = -1
        for v in self.versions():
            b = self.manifest(v).get("stream_batch_id")
            if b is not None:
                best = max(best, b)
        return best

    def append_stream_batch(self, df: DataFrame, batch_id: int) -> int | None:
        """foreachBatch sink body: append one micro-batch EXACTLY ONCE.
        The manifest records the batch id; a replayed batch (crash
        between sink success and checkpoint commit — Structured
        Streaming's at-least-once window) sees its id already in the
        log and skips, upgrading the pipeline to exactly-once — the
        Delta `txn`/`foreachBatch` idempotent-sink pattern. Returns the
        committed version, or None when skipped/empty."""
        if batch_id <= self.last_stream_batch_id():
            return None
        base_v = self.latest_version()
        man = self.manifest(base_v)
        new_files = self._stage_files(df, base_v + 1)
        if not new_files:
            return None
        for _ in range(10):
            try:
                return self._try_commit(
                    self._carry_staged(
                        self._carry_deletes(
                        {
                            "format_version": 1,
                            "version": man["version"] + 1,
                            "parent": man["version"],
                            "operation": "stream_append",
                            "committed_at_us": self._now_us(None),
                            "schema": man["schema"],
                            "files": man["files"] + new_files,
                            "stream_batch_id": batch_id,
                        },
                        man,
                        ),
                        man,
                    )
                )
            except CommitConflictError:
                man = self.manifest(self.latest_version())
                if self.last_stream_batch_id() >= batch_id:
                    return None  # a concurrent replay won the race
        raise CommitConflictError("stream append lost 10 commit races")

    # ------------------------------------------------------------------
    # write-audit-publish (WAP)
    # ------------------------------------------------------------------
    def append_wap(
        self,
        df: DataFrame,
        wap_id: str,
        committed_at_us: int | None = None,
        _max_retries: int = 10,
    ) -> int:
        """Stage an append under ``wap_id`` WITHOUT publishing it —
        the write half of write-audit-publish (the Iceberg
        ``spark.wap.id`` staged-snapshot workflow, Delta's shadow-
        table pattern). The batch's files commit to the log as
        ``staged_files`` entries tagged with ``wap_id``; the snapshot's
        LOGICAL state (``files``) is unchanged, so every ordinary
        reader — head reads, time travel, CDF, streaming — is blind to
        the batch until :meth:`publish_wap`. Audits run against
        :meth:`read_wap` (the table as-if-published); a failed audit
        calls :meth:`abort_wap` and the data never becomes visible.

        Multiple batches may stage under one ``wap_id`` (they publish
        or abort together), and several wap_ids may be pending
        at once — publish picks its own. Staging never conflicts
        logically, so a lost commit race auto-rebases and retries,
        like :meth:`append`."""
        base_v = self.latest_version()
        man = self.manifest(base_v)
        known = {c["name"] for c in man["schema"]}
        bad = set(df.columns) - known
        if bad:
            raise ValueError(
                f"append_wap columns not in table schema: {sorted(bad)}"
            )
        new_files = self._stage_files(df, base_v + 1, prefix="wap")
        for f in new_files:
            f["wap_id"] = wap_id
        for _ in range(_max_retries):
            try:
                return self._try_commit(
                    self._carry_deletes(
                        {
                            "format_version": 1,
                            "version": man["version"] + 1,
                            "parent": man["version"],
                            "operation": "wap_append",
                            "wap_id": wap_id,
                            "committed_at_us": self._now_us(committed_at_us),
                            "schema": man["schema"],
                            "files": man["files"],
                            "staged_files": man.get("staged_files", [])
                            + new_files,
                        },
                        man,
                    )
                )
            except CommitConflictError:
                man = self.manifest(self.latest_version())
        raise CommitConflictError(f"append_wap lost {_max_retries} commit races")

    def pending_wap_ids(self, version: int | None = None) -> list[str]:
        """Distinct wap_ids with batches staged-but-unresolved at the
        given (default head) snapshot, in first-staged order."""
        out: list[str] = []
        for f in self.manifest(
            self.latest_version() if version is None else version
        ).get("staged_files", []):
            if f["wap_id"] not in out:
                out.append(f["wap_id"])
        return out

    def read_wap(
        self, spark: SparkSession, wap_id: str, version: int | None = None
    ) -> DataFrame:
        """AUDIT read: the table as-if ``wap_id`` were published —
        committed files plus that id's staged files (other pending
        ids stay invisible: each audit sees only its own batch).
        Pending equality deletes apply by the usual added_version
        rule; note publish re-stamps added_version (cherry-pick
        semantics), so a delete committed while the batch was staged
        hides staged rows HERE but not after publish — audit is a
        preview of content, not of sequence numbers."""
        man = self.manifest(self._resolve(version, None))
        mine = [
            {k: v for k, v in f.items() if k != "wap_id"}
            for f in man.get("staged_files", [])
            if f["wap_id"] == wap_id
        ]
        if not mine:
            raise LookupError(
                f"no batches staged under wap_id={wap_id!r} at this version"
            )
        return self._read_with_deletes(spark, man, man["files"] + mine)

    def publish_wap(
        self,
        wap_id: str,
        committed_at_us: int | None = None,
        _max_retries: int = 10,
    ) -> int:
        """PUBLISH the audited batch: move ``wap_id``'s staged files
        into the logical file list as a new commit (Iceberg's
        cherry-pick). Metadata-only — zero data IO, O(files) — and the
        entries' ``added_version`` is RE-STAMPED to the publish
        version: the rows logically enter the table NOW, so equality
        deletes that committed while the batch was staged do not
        apply to it (exactly the Iceberg sequence-number assignment on
        cherry-pick). The change feed emits the published rows as
        inserts at the publish version. Other pending wap_ids carry."""
        for _ in range(_max_retries):
            base_v = self.latest_version()
            man = self.manifest(base_v)
            staged = man.get("staged_files", [])
            mine = [f for f in staged if f["wap_id"] == wap_id]
            rest = [f for f in staged if f["wap_id"] != wap_id]
            if not mine:
                raise LookupError(
                    f"no batches staged under wap_id={wap_id!r} to publish"
                )
            published = []
            for f in mine:
                e = {k: v for k, v in f.items() if k != "wap_id"}
                e["added_version"] = base_v + 1
                published.append(e)
            man_out = {
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "wap_publish",
                "wap_id": wap_id,
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": man["files"] + published,
            }
            if rest:
                man_out["staged_files"] = rest
            try:
                return self._try_commit(self._carry_deletes(man_out, man))
            except CommitConflictError:
                continue
        raise CommitConflictError(f"publish_wap lost {_max_retries} commit races")

    def abort_wap(
        self,
        wap_id: str,
        committed_at_us: int | None = None,
        _max_retries: int = 10,
    ) -> int:
        """ABORT a staged batch that failed its audit: drop its
        entries from ``staged_files`` as a new commit. The physical
        files linger for the retention window (time travel into
        pre-abort versions can still audit-read them) and are
        reclaimed by :meth:`vacuum` once no retained manifest
        references them — the failed data never touches logical state
        or the change feed."""
        for _ in range(_max_retries):
            base_v = self.latest_version()
            man = self.manifest(base_v)
            staged = man.get("staged_files", [])
            mine = [f for f in staged if f["wap_id"] == wap_id]
            rest = [f for f in staged if f["wap_id"] != wap_id]
            if not mine:
                raise LookupError(
                    f"no batches staged under wap_id={wap_id!r} to abort"
                )
            man_out = {
                "format_version": 1,
                "version": base_v + 1,
                "parent": base_v,
                "operation": "wap_abort",
                "wap_id": wap_id,
                "aborted_files": len(mine),
                "committed_at_us": self._now_us(committed_at_us),
                "schema": man["schema"],
                "files": man["files"],
            }
            if rest:
                man_out["staged_files"] = rest
            try:
                return self._try_commit(self._carry_deletes(man_out, man))
            except CommitConflictError:
                continue
        raise CommitConflictError(f"abort_wap lost {_max_retries} commit races")

    # ------------------------------------------------------------------
    # read paths
    # ------------------------------------------------------------------
    def _resolve(self, version: int | None, as_of_us: int | None) -> int:
        if version is not None and as_of_us is not None:
            raise ValueError("pass version OR as_of_us, not both")
        if as_of_us is not None:
            return self.version_as_of(as_of_us)
        return self.latest_version() if version is None else version

    def _ddl(self, man: dict, names: set[str] | None = None) -> str:
        return ", ".join(
            f"`{c['name']}` {c['type']}"
            for c in man["schema"]
            if names is None or c["name"] in names
        )

    def _read_file_group(
        self,
        spark: SparkSession,
        man: dict,
        files: list[dict],
        null_fill: bool = True,
        with_pos: bool = False,
    ) -> DataFrame:
        """Read a list of manifest file entries as ONE DataFrame in the
        manifest's logical schema. Files are grouped by their recorded
        column set and each group gets an EXPLICIT schema — no footer
        merging (mergeSchema reads every footer; the manifest already
        knows), old groups null-filled from metadata alone.

        ``with_pos`` appends ``_file`` (root-relative path) and
        ``_pos`` (row ordinal within its file) from Spark's parquet
        ``_metadata.file_path`` / ``row_index`` — the scan-time row
        address positional delete files are keyed on. Pure scan
        metadata: no shuffle, no extra IO."""
        cols = [c["name"] for c in man["schema"]]
        types = {c["name"]: c["type"] for c in man["schema"]}
        by_cols: dict[tuple[str, ...], list[str]] = {}
        for f in files:
            by_cols.setdefault(tuple(f["columns"]), []).append(
                os.path.join(self.root, f["path"])
            )
        parts = []
        for colset, paths in sorted(by_cols.items()):
            present = set(colset)
            df = _path_relation(spark, self._ddl(man, present), paths)
            if with_pos:
                # relativize by the LAST TWO segments (prefix/name):
                # staged paths are always one level deep (data/ cdc/
                # delete/), and this stays correct however Spark
                # normalizes the absolute file URI
                seg = F.split(F.col("_metadata.file_path"), "/")
                df = df.select(
                    "*",
                    F.concat_ws(
                        "/", F.element_at(seg, -2), F.element_at(seg, -1)
                    ).alias("_file"),
                    F.col("_metadata.row_index").alias("_pos"),
                )
            if null_fill:
                for n in cols:
                    if n not in present:
                        df = df.withColumn(n, F.lit(None).cast(types[n]))
                df = df.select(cols + (["_file", "_pos"] if with_pos else []))
            parts.append(df)
        if not parts:
            ddl = self._ddl(man) + (
                ", `_file` string, `_pos` bigint" if with_pos else ""
            )
            return spark.createDataFrame([], ddl)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @staticmethod
    def _split_deletes(man: dict) -> tuple[list[dict], list[dict]]:
        """Partition a manifest's pending delete files into
        (equality, positional). Entries without a ``kind`` are
        equality deletes (the pre-pos manifest format)."""
        dvs = man.get("delete_files") or []
        eq = [d for d in dvs if d.get("kind", "eq") != "pos"]
        pos = [d for d in dvs if d.get("kind") == "pos"]
        return eq, pos

    def _read_with_deletes(
        self,
        spark: SparkSession,
        man: dict,
        files: list[dict],
        keep_pos: bool = False,
    ) -> DataFrame:
        """Read data files and apply the manifest's pending delete
        files — EQUALITY deletes (key sets) and POSITIONAL deletes
        ((file, row-ordinal) pairs, the Iceberg v2 position-delete-file
        shape). Files are grouped by the subset of deletes that apply
        to them: equality by the added_version < applies_below rule,
        positional by path membership in the delete's recorded refs —
        so each group gets exactly the anti-joins it needs; a file no
        delete touches reads bare. Both delete kinds are broadcast:
        they are small by the operator's contract (large deletes go
        through delete_range/COW), so the read plan stays shuffle-free
        — scan + broadcast anti-join per pending delete.

        ``keep_pos`` retains the ``_file``/``_pos`` address columns on
        the result (for callers that go on to FORM positional deletes,
        e.g. :meth:`positions_where`)."""
        eq_dvs, pos_dvs = self._split_deletes(man)
        if not eq_dvs and not pos_dvs and not keep_pos:
            return self._read_file_group(spark, man, files)
        pos_refs: set[str] = set()
        for d in pos_dvs:
            pos_refs.update(d["refs"])
        pos_keys = None
        if pos_dvs:
            pos_keys = _path_relation(
                spark,
                "`_file` string, `_pos` bigint",
                [os.path.join(self.root, d["path"]) for d in pos_dvs],
            )
        groups: dict[tuple[tuple[int, ...], bool], list[dict]] = {}
        for f in files:
            av = f.get("added_version", 0)
            appl = tuple(
                i for i, d in enumerate(eq_dvs) if av < d["applies_below"]
            )
            groups.setdefault((appl, f["path"] in pos_refs), []).append(f)
        parts = []
        for (appl, posref), fs in sorted(groups.items()):
            with_pos = keep_pos or posref
            df = self._read_file_group(spark, man, fs, with_pos=with_pos)
            if posref:
                df = df.join(
                    F.broadcast(pos_keys), ["_file", "_pos"], "left_anti"
                )
            if with_pos and not keep_pos:
                df = df.drop("_file", "_pos")
            for i in appl:
                d = eq_dvs[i]
                keys = _path_relation(
                    spark,
                    self._ddl(man, {d["key"]}),
                    [os.path.join(self.root, d["path"])],
                )
                df = df.join(F.broadcast(keys), d["key"], "left_anti")
            parts.append(df)
        if not parts:
            ddl = self._ddl(man) + (
                ", `_file` string, `_pos` bigint" if keep_pos else ""
            )
            return spark.createDataFrame([], ddl)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of_us: int | None = None,
    ) -> DataFrame:
        """Snapshot read: latest, ``VERSION AS OF`` or ``TIMESTAMP AS
        OF`` — exactly the files that manifest committed, minus the
        rows its pending equality-delete files hide."""
        man = self.manifest(self._resolve(version, as_of_us))
        return self._read_with_deletes(spark, man, man["files"])

    def read_changes(
        self, spark: SparkSession, from_version: int, to_version: int
    ) -> DataFrame:
        """CHANGE DATA FEED read over ``(from_version, to_version]``
        (the Delta ``table_changes`` shape) — from the LOG, never by
        snapshot diffing:

        - append / stream_append commits emit their ADDED files as
          inserts (no change files are written for appends — same as
          Delta CDF, which derives them from the add entries);
        - merge / delete commits emit their WRITE-TIME materialized
          ``cdc_files`` (insert/delete tagged rows, computed from the
          rewritten file group only when the commit happened);
        - compact / cluster rewrites carry no logical change — nothing
          is emitted (Delta's dataChange=false);
        - restore fails loud: its logical diff is not materialized
          (compute it with two snapshot reads if needed).

        Rows carry ``_change`` and ``_commit_version`` and are
        null-filled to ``to_version``'s schema, so a feed spanning a
        schema evolution is uniformly typed."""
        man_to = self.manifest(to_version)
        change_schema = dict(man_to)
        change_schema["schema"] = man_to["schema"] + [
            {"name": "_change", "type": "string"}
        ]
        cols = [c["name"] for c in man_to["schema"]]
        parts = []
        for v in range(from_version + 1, to_version + 1):
            man = self.manifest(v)
            op = man["operation"]
            if op in (
                "create",
                "compact",
                "cluster",
                "rewrite_deletes",
                "wap_append",
                "wap_abort",
            ):
                # dataChange=false / not-yet-logical: nothing to feed —
                # WAP-staged rows enter the change feed only when (and
                # if) their publish commit lands
                continue
            if op in ("append", "stream_append", "wap_publish"):
                parent = man["parent"]
                seen = {f["path"] for f in self.manifest(parent)["files"]}
                added = [f for f in man["files"] if f["path"] not in seen]
                df = self._read_file_group(spark, man_to, added).withColumn(
                    "_change", F.lit("insert")
                )
            elif op in ("merge", "merge_mor", "delete", "delete_mor", "delete_mor_pos"):
                cdc = man.get("cdc_files")
                if cdc is None:
                    raise ValueError(
                        f"commit v{v} ({op}) predates the change feed — "
                        "no materialized cdc_files in its manifest"
                    )
                df = self._read_file_group(spark, change_schema, cdc)
            else:
                raise NotImplementedError(
                    f"change feed over a {op!r} commit (v{v}) is not "
                    "materialized — diff two snapshot reads instead"
                )
            parts.append(
                df.select(*cols, "_change").withColumn(
                    "_commit_version", F.lit(v).cast("long")
                )
            )
        if not parts:
            ddl = self._ddl(change_schema) + ", `_commit_version` bigint"
            return spark.createDataFrame([], ddl)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def stats_summary(
        self, columns: list[str], version: int | None = None
    ) -> dict:
        """METADATA-ONLY aggregate answering (the Delta/Iceberg
        metadata-query optimization): COUNT(*) and per-column MIN/MAX
        straight from the manifest — zero data IO, O(files) driver
        math, at 100 TB the difference between instant and a full
        scan. Exactness contract: row count is exact (manifest rows
        come from parquet footers); MIN/MAX are exact for columns
        whose every file carries footer stats, and a column missing
        stats in ANY file that contains it reports None for safety
        (the caller falls back to a scan — stats are an optimization,
        never a correctness gate).

        Pending deletes: POSITIONAL deletes subtract EXACTLY from the
        row count metadata-side — addresses are physical (file, pos)
        pairs, so the count of distinct live-file addresses is the
        count of hidden rows, no scan of DATA files needed (the
        delete files themselves are read driver-side; they are small
        by the operator's contract). Per-column MIN/MAX go None under
        any pending delete (a hidden row may hold the extremum).
        EQUALITY deletes still fail loud: how many rows a key set
        hides is not knowable from metadata."""
        man = self.manifest(self._resolve(version, None))
        eq_dvs, pos_dvs = self._split_deletes(man)
        if eq_dvs:
            raise NotImplementedError(
                "stats_summary over pending equality deletes — the "
                "manifest counts rows the MOR filter hides; run "
                "apply_deletes() first or scan"
            )
        n_hidden = 0
        if pos_dvs:
            import pyarrow.parquet as pq

            live = {f["path"] for f in man["files"]}
            addrs: set[tuple[str, int]] = set()
            for d in pos_dvs:
                t = pq.read_table(os.path.join(self.root, d["path"]))
                for fp, p in zip(
                    t.column("_file").to_pylist(), t.column("_pos").to_pylist()
                ):
                    if fp in live:
                        addrs.add((fp, p))
            n_hidden = len(addrs)
        out: dict = {
            "n_rows": sum(f["rows"] for f in man["files"]) - n_hidden
        }
        if pos_dvs:
            # a hidden row may hold any extremum: min/max are unknowable
            for c in columns:
                out[f"min_{c}"] = None
                out[f"max_{c}"] = None
            return out
        for c in columns:
            lo = hi = None
            ok = True
            for f in man["files"]:
                if c not in f["columns"]:
                    continue  # pre-evolution file: column is all-null
                st = (f.get("stats") or {}).get(c)
                if st is None:
                    ok = False  # a file has the column but no stats
                    break
                lo = st[0] if lo is None else min(lo, st[0])
                hi = st[1] if hi is None else max(hi, st[1])
            out[f"min_{c}"] = lo if ok else None
            out[f"max_{c}"] = hi if ok else None
        return out

    def pruned_files(
        self, key: str, lo, hi, version: int | None = None
    ) -> tuple[list[dict], list[dict]]:
        """Split a snapshot's files into (kept, skipped) by min/max
        stats vs [lo, hi]. Files without stats for ``key`` are kept
        (stats are an optimization, never a correctness gate)."""
        man = self.manifest(self._resolve(version, None))
        kept, skipped = [], []
        for f in man["files"]:
            st = (f.get("stats") or {}).get(key)
            if st is not None and (st[1] < lo or st[0] > hi):
                skipped.append(f)
            else:
                kept.append(f)
        return kept, skipped

    def read_pruned(
        self,
        spark: SparkSession,
        key: str,
        lo,
        hi,
        version: int | None = None,
    ) -> DataFrame:
        """Data-skipping read: drop files whose [min,max] for ``key``
        cannot intersect [lo, hi] BEFORE Spark lists them, then apply
        the row-level filter (stats prune files, the filter prunes
        rows; parquet row-group pushdown still applies inside kept
        files). At 100 TB this is the difference between listing a
        table and listing a partition's worth of it."""
        v = self._resolve(version, None)
        man = self.manifest(v)
        kept, _ = self.pruned_files(key, lo, hi, version=v)
        df = self._read_with_deletes(spark, man, kept)
        return df.filter((F.col(key) >= lo) & (F.col(key) <= hi))

    def eq_files(
        self, field: str, value: int, version: int | None = None
    ) -> tuple[list[dict], list[dict]]:
        """Split a snapshot's files into (kept, skipped) for a point
        lookup ``field == value`` using BOTH pruning sources: the
        hidden-partition transform recorded per file (skip when
        ``value % mod != bucket`` — the pruning min/max can never give
        a modulo layout) and the min/max stats. Files carrying neither
        are kept — pruning is an optimization, never a correctness
        gate, which is exactly what lets the partition spec evolve
        per-append and COW rewrites drop the metadata."""
        man = self.manifest(self._resolve(version, None))
        kept, skipped = [], []
        for f in man["files"]:
            p = f.get("partition")
            if (
                p is not None
                and p["field"] == field
                and value % p["mod"] != p["value"]
            ):
                skipped.append(f)
                continue
            st = (f.get("stats") or {}).get(field)
            if st is not None and (st[1] < value or st[0] > value):
                skipped.append(f)
                continue
            kept.append(f)
        return kept, skipped

    def read_eq(
        self,
        spark: SparkSession,
        field: str,
        value: int,
        version: int | None = None,
    ) -> DataFrame:
        """Hidden-partitioned point lookup: the caller filters on the
        SOURCE column only (never a bucket column — it doesn't exist
        in the data); bucket-transform metadata and stats prune files
        before Spark lists them, the row filter does the rest."""
        v = self._resolve(version, None)
        man = self.manifest(v)
        kept, _ = self.eq_files(field, value, version=v)
        df = self._read_with_deletes(spark, man, kept)
        return df.filter(F.col(field) == value)


def table_fixture_root(tag: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"jbp_snaptable_{tag}")
