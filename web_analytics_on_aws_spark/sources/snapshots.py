"""Minimal snapshot table format: atomic commits, time travel, vacuum —
plain-parquet + JSON manifests, no table-format jars.

The reference's iceberg variants delegate exactly these semantics to
AWS-managed Iceberg (S9/S12 in SURVEY §2.1: atomic micro-batch commits,
`optimize_rewrite_delete_file_threshold` maintenance). This module
re-creates the *mechanism* so the engine has real table semantics on any
filesystem:

- data files are immutable parquet parts under ``data/``; a **manifest**
  (``vN.json``) lists the exact file set of snapshot N;
- a commit writes new data files, then publishes the next manifest via
  write-temp + ``os.replace`` — atomic on POSIX, so readers always see a
  complete snapshot (never a half-written file list);
- reads resolve a manifest (latest or pinned version) to a file list and
  hand it to ``spark.read.parquet(*files)`` — time travel is just reading
  an old manifest;
- ``vacuum`` deletes data files referenced by no retained manifest (the
  GC side of Iceberg's expire_snapshots).

Scale notes: manifests hold file paths, not row data — a 100 TB table is a
few MB of manifest. Readers do no directory listing (the file list IS the
manifest), which is the same reason Iceberg beats hive layouts on object
stores. Concurrency: single-writer (the reference's Firehose is too);
multi-writer would need a manifest-pointer CAS, noted not implemented.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "manifests"
DATA_DIR = "data"


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, MANIFEST_DIR, f"v{version}.json")


def _versions(table: str) -> list[int]:
    mdir = os.path.join(table, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def current_version(table: str) -> int | None:
    vs = _versions(table)
    return vs[-1] if vs else None


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def _publish(table: str, version: int, files: list[str], op: str) -> None:
    os.makedirs(os.path.join(table, MANIFEST_DIR), exist_ok=True)
    body = {"version": version, "operation": op, "files": sorted(files)}
    tmp = _manifest_path(table, version) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(body, f)
    os.replace(tmp, _manifest_path(table, version))  # atomic publish


def _write_data_files(df: DataFrame, table: str) -> list[str]:
    """Write df as immutable parts under data/<commit-uuid>/ and return
    their paths. The directory is unique per commit, so a failed write can
    never corrupt published snapshots (its files are simply unreferenced)."""
    part_dir = os.path.join(table, DATA_DIR, uuid.uuid4().hex)
    df.write.mode("error").parquet(part_dir)
    return [
        os.path.join(part_dir, f)
        for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    ]


def commit_append(df: DataFrame, table: str) -> int:
    """Append df as a new snapshot; returns the new version number."""
    new_files = _write_data_files(df, table)
    cur = current_version(table)
    prev = _read_manifest(table, cur)["files"] if cur is not None else []
    version = (cur or 0) + 1
    _publish(table, version, prev + new_files, "append")
    return version


def commit_overwrite(df: DataFrame, table: str) -> int:
    """Replace the table contents atomically (readers of older versions are
    unaffected — their manifests still reference the old files)."""
    new_files = _write_data_files(df, table)
    version = (current_version(table) or 0) + 1
    _publish(table, version, new_files, "overwrite")
    return version


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: latest). Time travel = pin an
    older version."""
    cur = current_version(table)
    if cur is None:
        raise FileNotFoundError(f"no snapshots at {table}")
    v = cur if version is None else version
    files = _read_manifest(table, v)["files"]
    # mergeSchema: additive column evolution across commits (a later append
    # may carry new columns; older files surface them as NULL — the same
    # read-time union-of-schemas Iceberg/Delta do). Time travel to a
    # pre-evolution version still shows the narrow schema, because only
    # that version's files are listed.
    return spark.read.option("mergeSchema", "true").parquet(*files)


def history(table: str) -> list[dict]:
    return [
        {k: m[k] for k in ("version", "operation")} | {"n_files": len(m["files"])}
        for m in (_read_manifest(table, v) for v in _versions(table))
    ]


def vacuum(table: str, retain_last: int = 1) -> int:
    """Drop manifests older than the last ``retain_last`` and delete data
    files no retained snapshot references. Returns files deleted."""
    vs = _versions(table)
    keep_vs = vs[-retain_last:]
    live: set[str] = set()
    for v in keep_vs:
        live.update(_read_manifest(table, v)["files"])
    deleted = 0
    data_root = os.path.join(table, DATA_DIR)
    for root, _dirs, files in os.walk(data_root):
        for f in files:
            p = os.path.join(root, f)
            if f.endswith(".parquet") and p not in live:
                os.remove(p)
                deleted += 1
    for v in vs[:-retain_last] if retain_last else vs:
        os.remove(_manifest_path(table, v))
    return deleted
