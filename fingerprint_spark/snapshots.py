"""Snapshot-pinned corpus tables — the "Iceberg table" of the north rule.

The input_hint frames the corpus as an Iceberg table; what that buys a
re-validation pass is ISOLATION: pin snapshot N and read a byte-stable
view of the corpus while a concurrent curate commits N+1. This module
is that contract, minimal and from scratch (Iceberg spec concepts —
immutable data files + an atomic metadata pointer — are public):

- a table directory holds immutable ``data/s<id>/part-*.parquet`` files
  (a commit only ever ADDS files; nothing is rewritten in place);
- each commit writes ``_snapshots/v<id>.json``: snapshot id, parent id,
  operation (append/overwrite), schema JSON, the exact data-file list,
  row count, wall timestamp — the manifest IS the table state;
- the commit point is an ATOMIC manifest publish: the manifest is
  written to a temp name and ``os.link``-ed (O_EXCL semantics) to its
  final name, so two racing writers cannot both claim snapshot id N —
  the loser re-reads the latest id and retries on N+1 (on HDFS/S3 the
  analog is ``FileSystem.create(path, overwrite=false)`` / a catalog
  conditional swap; same protocol, different primitive);
- ``read_snapshot(spark, table, snapshot_id)`` reads EXACTLY the files
  in that manifest with the manifest's own schema — byte-identical
  before/during/after any concurrent commit, because the files it
  names are immutable and the manifest never changes after publish.

Lineage: ``witness_read`` appends a witness-ledger receipt carrying the
snapshot id + manifest hash, so "which corpus state did this validation
run see" is answerable forever — the witness ledger
(src/witness/ledger.rs:7-69) generalized from run receipts to table
states, the same way checkpoint.py generalized it to buckets.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SNAP_RE = re.compile(r"^v(\d{9})\.json$")


def _require_local(table_path: str) -> None:
    """Snapshot metadata uses driver-local os primitives (os.link is
    the atomic-publish primitive); a URI-scheme path (s3a://, hdfs://)
    would land data remotely while os.walk scans a nonexistent local
    dir and publishes an EMPTY file list — silent data loss. Refuse
    loudly; remote tables need the Hadoop-FS analog
    (FileSystem.create(path, overwrite=false), see module docstring)."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", table_path):
        raise ValueError(
            f"snapshot tables are local-filesystem only (got "
            f"{table_path!r}); use the Hadoop FS commit protocol for "
            f"remote storage"
        )


def _snap_dir(table_path: str) -> str:
    return os.path.join(table_path, "_snapshots")


def _manifest_file(table_path: str, snapshot_id: int) -> str:
    return os.path.join(_snap_dir(table_path), f"v{snapshot_id:09d}.json")


def list_snapshots(table_path: str) -> list[int]:
    _require_local(table_path)
    d = _snap_dir(table_path)
    if not os.path.isdir(d):
        return []
    ids = []
    for name in os.listdir(d):
        m = _SNAP_RE.match(name)
        if m:
            ids.append(int(m.group(1)))
    return sorted(ids)


def current_snapshot_id(table_path: str) -> int | None:
    ids = list_snapshots(table_path)
    return ids[-1] if ids else None


def load_manifest(table_path: str, snapshot_id: int | None = None) -> dict:
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(table_path)
        if snapshot_id is None:
            raise FileNotFoundError(f"no snapshots in {table_path}")
    path = _manifest_file(table_path, snapshot_id)
    with open(path) as f:
        return json.load(f)


def _list_data_files(data_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(data_dir):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def commit_snapshot(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    max_retries: int = 50,
) -> dict:
    """Write df's rows as new immutable data files + publish the next
    snapshot manifest atomically. mode='append' carries the parent's
    file list forward; 'overwrite' starts fresh (the old files stay on
    disk — pinned readers of older snapshots keep working; reclaim is
    expire_snapshots' job). Returns the committed manifest."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    _require_local(table_path)
    os.makedirs(_snap_dir(table_path), exist_ok=True)
    # data files land under a directory unique to this ATTEMPT (pid +
    # monotonic ns): uniqueness must not depend on winning the commit
    attempt = f"{os.getpid()}-{time.monotonic_ns()}"
    data_dir = os.path.join(table_path, "data", f"c{attempt}")
    df.write.mode("error").parquet(data_dir)
    new_files = _list_data_files(data_dir)
    # count from the WRITTEN files (what is audited is what landed on
    # disk — same rule as sinks._fold_shards)
    spark = df.sparkSession
    n_new = spark.read.schema(df.schema).parquet(data_dir).count()

    for _ in range(max_retries):
        parent = current_snapshot_id(table_path)
        snapshot_id = (parent or 0) + 1
        if mode == "append" and parent is not None:
            base = load_manifest(table_path, parent)
            files = base["files"] + new_files
            n_rows = base["n_rows"] + n_new
            if base["schema"] != df.schema.json():
                raise ValueError(
                    "append schema mismatch vs parent snapshot "
                    f"{parent} of {table_path}"
                )
        else:
            files = new_files
            n_rows = n_new
        manifest = {
            "snapshot_id": snapshot_id,
            "parent_id": parent,
            "operation": mode,
            "schema": df.schema.json(),
            "files": files,
            "n_rows": n_rows,
            "committed_at": time.time(),
        }
        final = _manifest_file(table_path, snapshot_id)
        tmp = final + f".tmp-{attempt}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        try:
            # os.link = atomic create-if-absent: exactly one writer
            # publishes id N; a racer sees EEXIST and retries on N+1
            os.link(tmp, final)
            return manifest
        except FileExistsError:
            continue
        finally:
            os.unlink(tmp)
    raise RuntimeError(
        f"commit_snapshot: lost the publish race {max_retries} times "
        f"on {table_path}"
    )


def read_snapshot(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read EXACTLY the files of one snapshot, with the snapshot's own
    schema (a later commit can neither add, remove, nor retype columns
    of a pinned read). snapshot_id=None pins the CURRENT snapshot at
    call time — the returned frame never drifts afterwards."""
    manifest = load_manifest(table_path, snapshot_id)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if not manifest["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*manifest["files"])


def expire_snapshots(table_path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest keep_last manifests and delete data
    files no surviving snapshot references. Returns expired ids."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    ids = list_snapshots(table_path)
    expired = ids[:-keep_last]
    if not expired:
        return []
    keep_files = set()
    for sid in ids[-keep_last:]:
        keep_files.update(load_manifest(table_path, sid)["files"])
    drop_files = set()
    for sid in expired:
        drop_files.update(load_manifest(table_path, sid)["files"])
    for f in sorted(drop_files - keep_files):
        if os.path.exists(f):
            os.unlink(f)
    for sid in expired:
        os.unlink(_manifest_file(table_path, sid))
    return expired


def witness_read(
    table_path: str, manifest: dict, tool: str = "read_snapshot"
) -> dict:
    """Append a witness receipt pinning WHICH corpus state a run saw:
    snapshot id + a hash of the manifest's file list (src/witness/
    ledger.rs:7-69 generalized to table states)."""
    import hashlib

    from .witness import append_witness

    files_hash = hashlib.sha256(
        "\n".join(manifest["files"]).encode()
    ).hexdigest()[:16]
    return append_witness(
        tool=tool,
        inputs={"table": table_path, "files_hash": files_hash},
        params={
            "snapshot_id": manifest["snapshot_id"],
            "parent_id": manifest["parent_id"],
            "n_rows": manifest["n_rows"],
        },
        outcome="pinned",
    )
