"""Snapshot-pinned source tables: resumable builds read the SAME input the
original build saw, even while the table keeps committing.

The north rule requires "resumable from Iceberg-snapshot checkpoints".
Content fingerprints (operators/build.doc_side_lineage) prove WHAT was
indexed but give no isolation between the fingerprint pass and the build
pass on a live table; this module adds the missing pinning layer:

* **Iceberg tables** (`capture_iceberg_snapshot`): the current snapshot id
  comes from the table's `.snapshots` metadata relation and reads pin it
  with Spark's `snapshot-id` read option — Iceberg's own time travel.
  Requires the iceberg-spark runtime on the cluster (not present in this
  sandbox, so the path is exercised only for its error contract here).
* **Plain file tables** (`capture_file_snapshot`): a snapshot is the exact
  immutable file list (path, size) at capture time; the snapshot id is the
  order-independent 60-bit md5 of that list.  Re-opening the snapshot reads
  exactly those files — files APPENDED to the directory after capture are
  invisible (real isolation for append-style tables, the dominant mutation
  on data lakes); files REMOVED or REWRITTEN in place are detected as
  drift, which is precisely what Iceberg's snapshot GC would cause once a
  pinned snapshot expires.

The build embeds the snapshot in the generation directory
(``snapshot.json``) and stamps ``snapshot_id`` into every lineage row, so a
resume can re-open the pinned input without the caller remembering it
(:func:`pinned_snapshot`) and a resume against a DIFFERENT snapshot of the
same table fails loudly instead of silently mixing two table versions.

Reference analog: the generation/catalog model (`ElasticWriteConfig.scala:23`,
`EsOpsClientApi.scala:69-81`) — the reference pins nothing because ES bulk
ingest is one-shot; a resumable builder must pin.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyarrow import fs as pafs
from pyspark.sql import DataFrame, SparkSession

from .. import fs as FS

SNAPSHOT_FILE = "snapshot.json"


class SnapshotDriftError(RuntimeError):
    """The pinned snapshot can no longer be materialized (files vanished /
    rewritten, or a resume was attempted against a different snapshot)."""


@dataclass(frozen=True)
class TableSnapshot:
    """A pinned, re-openable view of a source table."""

    table: str                       # path or catalog table name
    snapshot_id: int
    kind: str                        # "files" | "iceberg"
    # (path, size, change_token) for "files"; the token is mtime_ns (local/
    # HDFS) or whatever FS.ls's FileInfo exposes — None when the store
    # provides none (then only size is checked, the pre-round-4 behavior)
    files: tuple = field(default_factory=tuple)

    def to_json(self) -> dict:
        return {"table": self.table, "snapshot_id": self.snapshot_id,
                "kind": self.kind,
                "files": [list(f) for f in self.files]}

    @staticmethod
    def from_json(d: dict) -> "TableSnapshot":
        files = []
        for f in d.get("files", []):
            # round-3 snapshots pinned (path, size) only — stay readable,
            # with token=None meaning "no rewrite check possible"
            p, sz = f[0], int(f[1])
            tok = int(f[2]) if len(f) > 2 and f[2] is not None else None
            files.append((p, sz, tok))
        return TableSnapshot(
            table=d["table"], snapshot_id=int(d["snapshot_id"]),
            kind=d["kind"], files=tuple(files))


def _change_token(info: pafs.FileInfo) -> int | None:
    return info.mtime_ns if info.mtime_ns is not None else None


def _list_parquet_files(path: str) -> list[tuple[str, int, int | None]]:
    out: list[tuple[str, int, int | None]] = []
    stack = [path]
    while stack:
        cur = stack.pop()
        for info in FS.ls(cur):
            full = FS.join(cur, info.base_name)
            if info.type == pafs.FileType.Directory:
                if not info.base_name.startswith(("_", ".")):
                    stack.append(full)
            elif info.base_name.endswith(".parquet"):
                out.append((full, int(info.size), _change_token(info)))
    return sorted(out)


def capture_file_snapshot(path: str) -> TableSnapshot:
    """Pin a parquet directory: snapshot = its exact (path, size, mtime_ns)
    file list, id = 60-bit md5 over the sorted (path, size) list
    (order-independent, portable; the change token is drift-check state,
    not identity — two captures of identical data on different stores must
    agree on the id)."""
    files = _list_parquet_files(path)
    h = hashlib.md5()
    for p, sz, _tok in files:
        h.update(f"{p}:{sz}\n".encode())
    sid = int(h.hexdigest()[:15], 16)
    return TableSnapshot(table=path, snapshot_id=sid, kind="files",
                         files=tuple(files))


def capture_iceberg_snapshot(spark: SparkSession, table: str) -> TableSnapshot:
    """Pin an Iceberg catalog table at its CURRENT snapshot.  Raises a clear
    error when no Iceberg runtime/catalog is configured (this sandbox)."""
    try:
        row = (spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1").collect())
    except Exception as e:  # AnalysisException / missing runtime
        raise SnapshotDriftError(
            f"cannot read Iceberg snapshot metadata for {table!r}: {e}; "
            "is the iceberg-spark runtime on the cluster and the catalog "
            "configured?") from e
    if not row:
        raise SnapshotDriftError(f"Iceberg table {table!r} has no snapshots")
    return TableSnapshot(table=table, snapshot_id=int(row[0][0]),
                         kind="iceberg")


def open_snapshot(spark: SparkSession, snap: TableSnapshot) -> DataFrame:
    """Materialize the pinned view.  For file snapshots, verifies the pinned
    files still exist with their captured sizes first (drift check) and
    reads EXACTLY them — appended files are invisible by construction."""
    if snap.kind == "iceberg":
        return (spark.read.format("iceberg")
                .option("snapshot-id", str(snap.snapshot_id))
                .load(snap.table))
    verify_file_snapshot(snap)
    return spark.read.parquet(*[f[0] for f in snap.files])


def verify_file_snapshot(snap: TableSnapshot) -> None:
    """Raise SnapshotDriftError when any pinned file vanished, changed size,
    or was rewritten in place (same size, different mtime/change token) —
    the file-table analog of an expired Iceberg snapshot.  Size alone
    misses exactly the dangerous case (a compaction rewriting row groups to
    the same byte length), which is why the token is part of the pin."""
    drifted = []
    for f in snap.files:
        p, sz = f[0], f[1]
        tok = f[2] if len(f) > 2 else None
        try:
            fs, inner = FS.resolve(p)
            info = fs.get_file_info(inner)
            if info.type == pafs.FileType.NotFound or info.size is None:
                drifted.append(f"{p}: missing")
                continue
            actual = int(info.size)
        except (FileNotFoundError, OSError, TypeError):
            # pyarrow returns a NotFound FileInfo with size=None rather
            # than raising — both shapes mean the pinned file is gone
            drifted.append(f"{p}: missing")
            continue
        if actual != sz:
            drifted.append(f"{p}: size {actual} != pinned {sz}")
            continue
        actual_tok = _change_token(info)
        if tok is not None and actual_tok is not None and actual_tok != tok:
            drifted.append(
                f"{p}: rewritten in place (change token {actual_tok} != "
                f"pinned {tok}, size unchanged)")
    if drifted:
        raise SnapshotDriftError(
            f"snapshot {snap.snapshot_id} of {snap.table!r} drifted: "
            + "; ".join(drifted[:5])
            + (f" (+{len(drifted) - 5} more)" if len(drifted) > 5 else ""))


def write_pinned_snapshot(generation_dir: str, snap: TableSnapshot) -> None:
    FS.write_json(FS.join(generation_dir, SNAPSHOT_FILE), snap.to_json(),
                  atomic=True)


def pinned_snapshot(generation_dir: str) -> TableSnapshot | None:
    """The snapshot a generation was built against, if it was pinned."""
    p = FS.join(generation_dir, SNAPSHOT_FILE)
    if not FS.exists(p):
        return None
    return TableSnapshot.from_json(FS.read_json(p))
