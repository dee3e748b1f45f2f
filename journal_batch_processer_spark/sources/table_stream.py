"""Streaming SOURCE over the snapshot table: every commit is a
micro-batch (the Delta-streaming-source shape, `spark.readStream
.format("delta")`).

Offsets are table VERSIONS — the commit log itself is the stream's
write-ahead log, so the source needs no side state: ``latestOffset``
is one directory listing, and ``partitions(start, end)`` plans one
Spark task per data file ADDED by each commit in ``(start, end]``
(file membership diffed against the parent manifest — pure metadata,
no data scan). Append-family commits (`create` / `append` /
`stream_append` / `wap_publish`) stream through; WAP stage/abort
commits carry no data; change commits (merge, delete,
compact, cluster, restore) REWRITE files, and re-emitting their
carried rows would double-count, so by default planning fails loud —
exactly Delta's "data update detected" contract — and with
``skipChangeCommits=true`` the commit is skipped whole (Delta's
option of the same name).

Executors read their one parquet file via pyarrow and hand Spark
Arrow RecordBatches (no per-row Python); files written before an
additive schema evolution are null-filled from the PARTITION metadata
(the manifest recorded each file's column set — no footer probing).
Each batch carries ``commit_version``, the version that added the
file, so downstream sees row provenance (the `_commit_version` column
Delta CDC exposes) and the oracle can assert per-commit attribution.

Scale: planning is O(files-per-commit) driver-side JSON; reads are
one-file tasks that parallelize to the cluster width. On an object
store the same code reads manifests and files by URI; nothing here
assumes a local FS beyond what parquet itself does.

Reference analog: the reference has no streaming at all (BatchUpdate
.py is batch CSV); this is EXT surface closing the lakehouse loop —
the repo can now both SINK a stream into the table exactly-once
(append_stream_batch) and SOURCE the table as a stream.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# commits whose files are pure additions; everything else rewrites
APPEND_OPS = frozenset({"create", "append", "stream_append", "wap_publish"})
# commits that change neither logical files nor the change feed:
# WAP staging/abort is workflow metadata — nothing to emit, never
# an error, in BOTH modes (staged rows stream only at publish)
NO_DATA_OPS = frozenset({"wap_append", "wap_abort"})

_ARROW_BY_DDL = {
    "bigint": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool_",
    "date": "date32",
}


def _arrow_type(ddl: str):
    import pyarrow as pa

    try:
        return getattr(pa, _ARROW_BY_DDL[ddl])()
    except KeyError:
        raise NotImplementedError(
            f"table-stream source: no arrow mapping for DDL type {ddl!r}"
        ) from None


@dataclasses.dataclass
class TableFilePartition(InputPartition):
    """One newly-added data file: everything read() needs, so
    executors never open a manifest."""

    abspath: str
    file_columns: tuple  # columns physically present in the file
    schema: tuple  # ((name, ddl_type), ...) — full table schema
    commit_version: int
    # CDF mode: constant string columns synthesized per partition
    # (("_change", "insert") for append-derived rows; empty when the
    # column is physically in the file or the mode is off)
    constants: tuple = ()


class TableStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        skip_change_commits: bool,
        schema: tuple,
        change_feed: bool = False,
        branch: str | None = None,
    ):
        self.root = root
        self.branch = branch
        self.skip_change_commits = skip_change_commits
        # the DECLARED stream schema (fixed at load time, commit_version
        # excluded) — files from any commit are projected/null-filled to
        # it, so a schema-evolving commit mid-stream can't shift the
        # batch shape under the running query
        self.schema = schema
        self.change_feed = change_feed

    def _table(self):
        from journal_batch_processer_spark.operators.table_format import (
            SnapshotTable,
        )

        return SnapshotTable(self.root, branch=self.branch)

    def initialOffset(self) -> dict:
        # main logs start at v1 → offset 0; a BRANCH log starts at its
        # fork version → offset fork-1 (the fork snapshot becomes the
        # stream's initial load, Delta startingVersion-style)
        return {"version": self._table().versions()[0] - 1}

    def latestOffset(self) -> dict:
        return {"version": self._table().latest_version()}

    def partitions(self, start: dict, end: dict):
        t = self._table()
        log_versions = set(t.versions())
        parts: list[TableFilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            man = t.manifest(v)
            op = man["operation"]
            if op in NO_DATA_OPS:
                continue
            if man["parent"] is not None and man["parent"] not in log_versions:
                # BRANCH FORK commit: its parent lives in main's log,
                # not this one — emit the whole fork snapshot as the
                # initial load (op checks don't apply to a baseline;
                # pending deletes would silently resurrect hidden
                # rows, so refuse those loudly)
                if man.get("delete_files"):
                    raise RuntimeError(
                        "table stream: branch forked at a snapshot "
                        "with pending delete files — apply_deletes "
                        "before forking a streamed branch"
                    )
                for f in man["files"]:
                    parts.append(
                        TableFilePartition(
                            abspath=f"{self.root}/{f['path']}",
                            file_columns=tuple(f["columns"]),
                            schema=self.schema,
                            commit_version=v,
                            constants=(
                                (("_change", "insert"),)
                                if self.change_feed
                                else ()
                            ),
                        )
                    )
                continue
            if self.change_feed:
                # CDF mode (Delta readChangeFeed): appends emit added
                # files tagged insert; merge/delete emit their
                # WRITE-TIME materialized change files; dataChange-
                # false rewrites (compact/cluster) emit nothing;
                # restore has no materialized diff — fail loud.
                if op in ("create", "compact", "cluster", "rewrite_deletes"):
                    continue
                if op in ("merge", "merge_mor", "delete", "delete_mor", "delete_mor_pos"):
                    cdc = man.get("cdc_files")
                    if cdc is None:
                        raise RuntimeError(
                            f"table stream CDF: commit v{v} ({op}) has "
                            "no materialized cdc_files"
                        )
                    for f in cdc:
                        parts.append(
                            TableFilePartition(
                                abspath=f"{self.root}/{f['path']}",
                                file_columns=tuple(f["columns"]),
                                schema=self.schema,
                                commit_version=v,
                            )
                        )
                    continue
                if op not in APPEND_OPS:
                    raise RuntimeError(
                        f"table stream CDF: {op!r} commit v{v} carries "
                        "no change feed — diff two snapshot reads"
                    )
            elif op not in APPEND_OPS:
                if self.skip_change_commits:
                    continue
                raise RuntimeError(
                    f"table stream: commit v{v} is a "
                    f"{man['operation']!r} (files rewritten, not "
                    "appended) — re-emitting it would double-count; "
                    "set skipChangeCommits=true to skip such commits"
                )
            parent = man["parent"]
            seen = (
                {f["path"] for f in t.manifest(parent)["files"]}
                if parent is not None
                else set()
            )
            for f in man["files"]:
                if f["path"] in seen:
                    continue
                parts.append(
                    TableFilePartition(
                        abspath=f"{self.root}/{f['path']}",
                        file_columns=tuple(f["columns"]),
                        schema=self.schema,
                        commit_version=v,
                        constants=(
                            (("_change", "insert"),) if self.change_feed else ()
                        ),
                    )
                )
        return parts

    def read(self, partition: TableFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        consts = dict(partition.constants)
        wanted = [
            name
            for name, _ in partition.schema
            if name in partition.file_columns and name not in consts
        ]
        tbl = pq.read_table(partition.abspath, columns=wanted)
        n = tbl.num_rows
        cols, names = [], []
        for name, ddl in partition.schema:
            if name in consts:  # partition-constant (CDF insert tag)
                col = pa.array([consts[name]] * n, type=_arrow_type(ddl))
            elif name in wanted:
                col = tbl.column(name).cast(_arrow_type(ddl))
            else:  # evolved-in column: null-fill from metadata alone
                col = pa.nulls(n, type=_arrow_type(ddl))
            cols.append(col)
            names.append(name)
        cols.append(pa.array([partition.commit_version] * n, type=pa.int64()))
        names.append("commit_version")
        yield from pa.table(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        pass  # the sink checkpoint owns progress; the log is immutable


class TableStreamSource(DataSource):
    """``spark.readStream.format("jbp_table_stream").option("path",
    root)`` — options: ``path`` (table root, required),
    ``skipChangeCommits`` ("true"/"false", default false),
    ``readChangeFeed`` ("true"/"false", default false — emit the
    CHANGE feed instead of table rows: appends as tagged inserts,
    merge/delete commits from their write-time cdc_files, with a
    ``_change`` column), ``branch`` (follow a BRANCH's commit log
    instead of main — the audit/ETL line as a live stream)."""

    @classmethod
    def name(cls) -> str:
        return "jbp_table_stream"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("jbp_table_stream requires .option('path', root)")
        return root

    def _flag(self, name: str) -> bool:
        return str(self.options.get(name, "false")).lower() == "true"

    def schema(self) -> str:
        from journal_batch_processer_spark.operators.table_format import (
            SnapshotTable,
        )

        man = SnapshotTable(
            self._root(), branch=self.options.get("branch")
        ).manifest()
        ddl = ", ".join(f"`{c['name']}` {c['type']}" for c in man["schema"])
        if self._flag("readChangeFeed"):
            ddl += ", `_change` string"
        return f"{ddl}, `commit_version` bigint"

    def streamReader(self, schema) -> TableStreamReader:
        declared = tuple(
            (f.name, f.dataType.simpleString())
            for f in schema.fields
            if f.name != "commit_version"
        )
        return TableStreamReader(
            self._root(),
            self._flag("skipChangeCommits"),
            declared,
            change_feed=self._flag("readChangeFeed"),
            branch=self.options.get("branch"),
        )
