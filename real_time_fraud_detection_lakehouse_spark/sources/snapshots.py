"""Versioned snapshot store: time travel + VACUUM for vanilla parquet,
with an atomic commit protocol.

Delta's transaction log gives three read-side features the reference
relies on (`docs/DEVELOPER_GUIDE.md` Delta notes): versioned reads
(``VERSION AS OF``), rollback, and ``VACUUM``. Plain parquet has no
log, so this module supplies the minimal analog: each write lands in
an immutable ``_v=N`` subdirectory and readers resolve the requested
version from the directory listing.

Commit protocol (readers can NEVER observe a torn version):

1. the writer stages the parquet into a ``.stage-<uuid>`` directory —
   dot-prefixed, so Spark's file index ignores it even if a reader
   lists the table mid-write;
2. the version number is CLAIMED by ``os.mkdir(_v=N)`` — a primitive
   with true no-replace semantics (EEXIST even when the target is an
   existing EMPTY directory, which POSIX ``rename`` would silently
   replace), so two writers racing for the same N cannot both win (the
   loser retries with N+1) and a torn or externally-emptied version
   dir is never re-claimed; the staged files are then moved inside
   (readers cannot see them yet — visibility is gated on step 3);
3. the version becomes VISIBLE only when the ``_COMMITTED`` marker
   file lands inside it — itself written via tempfile + atomic
   ``os.rename`` after an fsync of the directory.

Readers (``_versions``) return only marker-committed versions. A
crash between (2) and (3) leaves a torn ``_v=N`` directory that no
reader resolves and no later writer re-claims (the rename onto it
fails → next N); a crash before (2) leaves an orphaned stage
directory invisible to everyone. Both are garbage-collected by
``vacuum_snapshots``.

- ``snapshot_write``   — stage → claim → mark; returns N.
- ``read_snapshot``    — latest committed, or ``VERSION AS OF`` N.
- ``rollback``         — make an old version current again by writing
  it as a NEW version (history is never mutated — same contract as
  ``DeltaTable.restoreToVersion``).
- ``vacuum_snapshots`` — drop all but the newest ``keep`` committed
  versions, plus torn/stage debris; with version dirs, "which files
  are dead" is decidable, which is exactly why bare parquet can't
  have VACUUM but this layout can.

Scale notes: the version "log" is one directory listing (on object
storage: one LIST call per read — cache it or promote to a real
manifest file at high version counts; note rename is not atomic on
S3-style stores — there, step (2) becomes a conditional PUT of a
manifest entry, the same evolution Delta/Iceberg made). Writes are
plain parquet appends of a new directory — no read-modify-write, so
concurrent readers of older versions are never disturbed
(MVCC-by-layout).
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^_v=(\d+)$")
_STAGE_PREFIX = ".stage-"
COMMIT_MARKER = "_COMMITTED"


def _version_dirs(path: str) -> list[tuple[int, bool]]:
    """All ``_v=N`` directories as (version, committed) pairs."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _V_RE.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            committed = os.path.isfile(os.path.join(path, name, COMMIT_MARKER))
            out.append((int(m.group(1)), committed))
    return sorted(out)


def _versions(path: str) -> list[int]:
    """Committed (reader-visible) versions only."""
    return [v for v, committed in _version_dirs(path) if committed]


def _fsync_dir(path: str) -> None:
    """Best-effort directory fsync so the rename/marker are durable
    before the commit is acknowledged (no-op where unsupported)."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _write_marker(version_dir: str) -> None:
    """Atomically publish the commit marker (tempfile + rename)."""
    tmp = os.path.join(version_dir, f".{COMMIT_MARKER}.{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("1\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(version_dir, COMMIT_MARKER))
    _fsync_dir(version_dir)


def snapshot_write(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next immutable snapshot version; returns N.

    Stage → atomic-rename claim → marker commit (see module docstring);
    safe against a concurrent writer (one of the two gets N, the other
    N+1) and against a crash at any step (readers never see the torn
    result)."""
    os.makedirs(path, exist_ok=True)
    stage = os.path.join(path, f"{_STAGE_PREFIX}{uuid.uuid4().hex}")
    df.write.mode("errorifexists").parquet(stage)
    for _ in range(10_000):  # bounded: a claim race loses ≤ once per rival commit
        taken = [v for v, _ in _version_dirs(path)]
        version = (max(taken) + 1) if taken else 1
        version_dir = os.path.join(path, f"_v={version}")
        try:
            os.mkdir(version_dir)  # no-replace claim — EEXIST even on empty dirs
            break
        except FileExistsError:
            continue  # lost the claim race (or torn dir holds N) → re-list
        # any other OSError (EACCES, EROFS, ...) is a real failure: surface it
    else:
        raise RuntimeError(f"could not claim a snapshot version at {path}")
    # move the staged files inside the claimed dir; a crash mid-move
    # leaves a torn (marker-less) version no reader resolves
    for name in os.listdir(stage):
        os.rename(os.path.join(stage, name), os.path.join(version_dir, name))
    os.rmdir(stage)
    _fsync_dir(path)
    _write_marker(version_dir)
    return version


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Latest committed snapshot, or ``VERSION AS OF version``. Torn
    (unmarked) versions are never resolved."""
    versions = _versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(
            f"version {version} not in {versions} (vacuumed, torn, or never written)"
        )
    return spark.read.parquet(os.path.join(path, f"_v={version}"))


def rollback(spark: SparkSession, path: str, to_version: int) -> int:
    """Restore ``to_version`` by re-writing it as a new version (the
    DeltaTable.restoreToVersion contract: history is append-only)."""
    return snapshot_write(read_snapshot(spark, path, to_version), path)


def vacuum_snapshots(path: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` committed versions; also
    garbage-collects torn version dirs and orphaned stage dirs (dead
    by construction — but do not run vacuum concurrently with an
    in-flight writer, the same retention-window caveat as Delta
    VACUUM). Returns the committed versions removed."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    dirs = _version_dirs(path)
    committed = [v for v, ok in dirs if ok]
    doomed = committed[:-keep]
    torn = [v for v, ok in dirs if not ok]
    for v in doomed + torn:
        shutil.rmtree(os.path.join(path, f"_v={v}"), ignore_errors=True)
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith(_STAGE_PREFIX):
                shutil.rmtree(os.path.join(path, name), ignore_errors=True)
    return doomed
