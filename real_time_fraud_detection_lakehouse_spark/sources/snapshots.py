"""Versioned snapshot store: time travel + VACUUM for vanilla parquet.

Delta's transaction log gives three read-side features the reference
relies on (`docs/DEVELOPER_GUIDE.md` Delta notes): versioned reads
(``VERSION AS OF``), rollback, and ``VACUUM``. Plain parquet has no
log, so this module supplies the minimal analog: each write lands in
an immutable ``_v=N`` subdirectory and readers resolve the requested
version from the directory listing.

- ``snapshot_write``   — append a new immutable version (monotonic N).
- ``read_snapshot``    — latest version, or ``VERSION AS OF`` N.
- ``rollback``         — make an old version current again by writing
  it as a NEW version (history is never mutated — same contract as
  ``DeltaTable.restoreToVersion``).
- ``vacuum_snapshots`` — drop all but the newest ``keep`` versions;
  with version dirs, "which files are dead" is decidable, which is
  exactly why bare parquet can't have VACUUM but this layout can.

Scale notes: the version "log" is one directory listing (on object
storage: one LIST call per read — cache it or promote to a real
manifest file at high version counts). Writes are plain parquet
appends of a new directory — no read-modify-write, so concurrent
readers of older versions are never disturbed (MVCC-by-layout).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^_v=(\d+)$")


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _V_RE.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def snapshot_write(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next immutable snapshot version; returns N."""
    version = (_versions(path)[-1] + 1) if _versions(path) else 1
    df.write.mode("errorifexists").parquet(os.path.join(path, f"_v={version}"))
    return version


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Latest snapshot, or ``VERSION AS OF version`` when given."""
    versions = _versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(f"version {version} not in {versions} (vacuumed or never written)")
    return spark.read.parquet(os.path.join(path, f"_v={version}"))


def rollback(spark: SparkSession, path: str, to_version: int) -> int:
    """Restore ``to_version`` by re-writing it as a new version (the
    DeltaTable.restoreToVersion contract: history is append-only)."""
    return snapshot_write(read_snapshot(spark, path, to_version), path)


def vacuum_snapshots(path: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` versions; returns the
    versions removed. Readers pinned to a vacuumed version fail fast
    with a clear error (same failure mode as Delta VACUUM passing the
    retention window)."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    doomed = _versions(path)[:-keep]
    for v in doomed:
        shutil.rmtree(os.path.join(path, f"_v={v}"))
    return doomed
