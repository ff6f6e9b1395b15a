"""Table sinks: partitioned append, overwrite-fallback, MERGE-style
upsert, catalog registration, JDBC, webhook alerts.

Re-expresses the reference's sink surface on plain parquet (Delta is
not available in this environment; the call sites are annotated with
the Delta equivalent so swapping ``format("parquet")`` for
``format("delta")`` restores the reference's exact behavior):

- S7  partitioned streaming/batch append        (streaming_job.py:98-115)
- S8  append with schema-conflict overwrite     (silver_job.py:201-227)
- S9  plain append                              (gold_job.py:95-222)
- S10 catalog registration                      (register_tables_to_hive.py:44-89)
- S11 upsert on key                             (main.py:134-145; Delta MERGE)
- S12 webhook alert sink                        (realtime_prediction_job.py:115-209)
- S6  JDBC sink                                 (producer.py:137-186)

Scale notes: appends are append-only file commits (no read-side);
the parquet "merge" rewrites only because vanilla parquet has no
transaction log — on Delta this is a real MERGE INTO keyed join,
shuffling only on the merge key with dynamic file pruning.
"""

from __future__ import annotations

import datetime
import errno
import json
import os
import re
import urllib.request
import uuid
from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Spark writes NULL (and empty-string) partition values to this
#: directory (ExternalCatalogUtils.DEFAULT_PARTITION_NAME).
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

#: The exact character set Spark/Hive escape in partition path names
#: (ExternalCatalogUtils.charToEscape): ASCII control chars plus
#: " # % ' * / : = ? \ DEL { [ ] ^
_PATH_ESCAPE_CHARS = frozenset(
    [chr(c) for c in range(0x01, 0x20)]
    + list("\"#%'*/:=?\\{[]^")
    + [chr(0x7F)]
)


def _escape_path_name(s: str) -> str:
    """Mirror Spark's ``ExternalCatalogUtils.escapePathName``: each
    special character becomes ``%XX`` (uppercase hex)."""
    return "".join(f"%{ord(c):02X}" if c in _PATH_ESCAPE_CHARS else c for c in s)


def _unescape_path_name(s: str) -> str:
    """Inverse of :func:`_escape_path_name` (Spark's
    ``unescapePathName``): ``%XX`` → chr(0xXX); malformed escapes pass
    through literally, as Spark's does."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 3 <= len(s):
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


class _UnresolvablePartition(Exception):
    """A touched partition value cannot be safely mapped to a directory
    name (unsupported type, or the table listing is ambiguous) — the
    caller must fall back to a full-table merge rather than risk
    treating an existing partition as new."""


def _partition_value_str(v) -> str | None:
    """Stringify a partition value the way Spark's writer does when it
    builds the directory name. ``None`` means the Hive default (null)
    partition. Types whose Spark rendering we cannot reproduce
    byte-for-byte (float, timestamp, decimal, binary) raise — callers
    fall back to the full-table merge for those."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        # Spark routes the EMPTY string to the default partition too
        return v if v != "" else None
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return v.isoformat()
    raise _UnresolvablePartition(f"partition value type {type(v).__name__}")


def _partition_dirs(path: str, partition_col: str, values: list) -> list[str]:
    """Existing hive-style partition directories for ``values``.

    Spark URL-escapes special characters in directory names
    (``ExternalCatalogUtils.escapePathName``) and writes NULL/empty
    values to ``__HIVE_DEFAULT_PARTITION__`` — a naive ``col=str(v)``
    probe misses those, and a missed existing partition would make the
    upsert's dynamic overwrite silently DROP its unmatched rows. So the
    resolution is listing-driven: every on-disk ``col=`` directory is
    unescaped and matched against the Spark-faithful rendering of each
    value. Raises :class:`_UnresolvablePartition` when a value's
    rendering is not reproducible (caller falls back to the full-table
    merge). Local-FS listing — matches this emulation's
    single-filesystem scope."""
    prefix = f"{partition_col}="
    try:
        names = os.listdir(path)
    except OSError:
        return []
    on_disk = {}  # unescaped value string (None = default partition) -> dir
    for name in names:
        if not name.startswith(prefix):
            continue
        full = os.path.join(path, name)
        if not os.path.isdir(full):
            continue
        raw = name[len(prefix) :]
        key = None if raw == HIVE_DEFAULT_PARTITION else _unescape_path_name(raw)
        on_disk[key] = full
    dirs = []
    for v in values:
        key = _partition_value_str(v)  # may raise _UnresolvablePartition
        if key in on_disk:
            dirs.append(on_disk[key])
    return dirs


def append_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """S7/S9: partitioned append (Delta: .format('delta'))."""
    df.write.mode("append").partitionBy(*partition_cols).parquet(path)


def _schema_key(schema, partition_cols: list[str] | None) -> list[tuple[str, str]]:
    """Order-insensitive (name, type) fingerprint. Partition columns
    compare by name only: the directory-encoding round-trip legally
    changes their position and inferred type."""
    pset = set(partition_cols or [])
    return sorted(
        (f.name, "PARTITION" if f.name in pset else f.dataType.simpleString())
        for f in schema.fields
    )


def append_with_schema_fallback(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> str:
    """S8: append; on schema conflict, overwrite with the new schema
    (silver_job.py:201-227 semantics). Returns the mode used.

    Vanilla parquet append does NOT raise on a schema conflict — it
    silently commits files with the new schema and the divergence only
    surfaces at read time — so the conflict must be detected up front
    by comparing against the existing table's read schema. (On Delta
    the append itself raises AnalysisException and
    ``overwriteSchema=true`` handles it.)
    """
    try:
        existing = df.sparkSession.read.parquet(path).schema
    except AnalysisException:
        existing = None  # no table yet → plain append creates it
        # (narrowed: a transient IO failure must raise, not masquerade
        # as a fresh table and skip conflict detection)
    mode = "append"
    if existing is not None and _schema_key(existing, partition_cols) != _schema_key(
        df.schema, partition_cols
    ):
        mode = "overwrite"
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return mode


def upsert_by_key(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key: str,
    partition_col: str | None = None,
) -> None:
    """S11: MERGE-style upsert keyed on ``key`` — update matched rows,
    insert new ones (INSERT ... ON CONFLICT DO UPDATE semantics,
    main.py:134-145). On Delta:
    DeltaTable.merge().whenMatchedUpdateAll().whenNotMatchedInsertAll().

    With ``partition_col`` (the scale path): the table is partitioned
    on that column, the merge reads ONLY the partitions containing
    update rows (directory pruning from the ``isin`` filter), and
    dynamic partition overwrite rewrites only those partitions —
    untouched partition files are not read or rewritten. At 100 TB with
    daily partitions and updates touching the last day or two, a
    micro-batch rewrites ~1/N of the table instead of all of it.

    Without it: legacy full-table rewrite (kept for small unpartitioned
    tables; annotated scale-weak).

    CONTRACT (partition-scoped path): a key's ``partition_col`` value is
    immutable — matched keys are anti-joined only within the partitions
    the updates touch, so an update that MOVED a key to a different
    partition would leave the stale row alive in the old partition.
    This holds for the lakehouse tables by construction
    (``score_date`` is derived from the immutable ``trans_timestamp``;
    dim tables key on the partition value itself). For mutable
    partition columns, pass ``partition_col=None`` (full-table merge)
    or use Delta MERGE.

    CONCURRENCY (partition-scoped path): writers touching DISJOINT
    partitions compose — each writer lists, reads, and rewrites ONLY
    its own partition directories (the read below targets the touched
    subdirs explicitly, never the table root, so a concurrent writer's
    dynamic overwrite deleting files in another partition can't break
    this writer's scan). Disjointness is the caller's contract;
    same-partition concurrent writers need a real transaction log
    (Delta). Exercised in tests/test_sinks_incremental.py.

    Fault tolerance: the merged slice is materialized via eager
    localCheckpoint before the overwrite so the rewrite can't consume
    its own output, but checkpoint blocks live on executors — an
    executor loss mid-overwrite can lose both lineage and originals.
    Single-process local mode is safe; on a real cluster use the Delta
    MERGE (transaction-logged) instead of this emulation.
    """
    keys = updates.select(key).distinct()
    if partition_col is not None:
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        try:
            existing_dirs = _partition_dirs(path, partition_col, parts)
        except _UnresolvablePartition:
            # a touched value's directory rendering is not reproducible
            # — merging against the full table is the only safe read
            # (treating the partition as new could drop existing rows)
            _full_partitioned_merge(spark, updates, path, key, partition_col)
            return
        if not os.path.isdir(path) or not existing_dirs:
            # no table yet, or all touched partitions are new: the
            # update IS the partition content — dynamic overwrite
            # creates/replaces only those directories
            (
                updates.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(path)
            )
            return
        # narrow read: ONLY the touched partition dirs (basePath keeps
        # the partition column in the schema). At scale this prunes the
        # file LISTING itself, not just the post-listing scan — and it
        # is what makes disjoint-partition writers safe to run
        # concurrently.
        touched = spark.read.option("basePath", path).parquet(*existing_dirs)
        kept = touched.join(F.broadcast(keys), key, "left_anti")
        merged = kept.unionByName(updates.select(*kept.columns))
        staged = merged.localCheckpoint(eager=True)
        (
            staged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
        return
    try:
        existing = spark.read.parquet(path)
    except AnalysisException:  # only "no table yet" -> initial write
        updates.write.mode("overwrite").parquet(path)
        return
    kept = existing.join(F.broadcast(keys), key, "left_anti")
    merged = kept.unionByName(updates)
    # materialize BEFORE overwriting the files being read —
    # localCheckpoint(eager) cuts lineage to stored blocks, so the
    # rewrite can't consume its own output (cache() could still evict
    # and recompute from the overwritten files)
    staged = merged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").parquet(path)


def _full_partitioned_merge(
    spark: SparkSession, updates: DataFrame, path: str, key: str, partition_col: str
) -> None:
    """Fallback merge for partition values whose directory names cannot
    be resolved exactly: read the WHOLE table, anti-join on key, rewrite
    preserving the partition layout. Correct for any value type, at the
    cost of a full rewrite — the partition-scoped fast path handles the
    common (string/int/date/bool) cases."""
    try:
        existing = spark.read.parquet(path)
    except AnalysisException:
        existing = None
    if existing is None:
        (
            updates.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
        return
    keys = updates.select(key).distinct()
    kept = existing.join(F.broadcast(keys), key, "left_anti")
    merged = kept.unionByName(updates.select(*kept.columns))
    staged = merged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def register_table(
    spark: SparkSession, df: DataFrame, name: str, path: str | None = None
) -> None:
    """S10: make a table SQL-visible. With a path: external-location
    style registration (CREATE TABLE ... USING parquet LOCATION);
    without: a temp view (metadata-only, the single-engine analog of
    the reference's Hive Metastore registration)."""
    if path is not None:
        df.write.mode("overwrite").parquet(path)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{path}'")
    else:
        df.createOrReplaceTempView(name)


#: JDBC driver on Spark's own classpath (ships for the Hive
#: metastore) — lets the sink round-trip against an embedded DB with
#: no external service.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    """S6: JDBC sink (producer.py bulk-insert analog). Exercised
    end-to-end against embedded Derby (DERBY_DRIVER, already on
    Spark's classpath) in tests/test_sinks_incremental.py —
    overwrite, append, and read-back round-trip. Scale: Spark's JDBC
    writer inserts per-partition with batched statements; size
    ``numPartitions``/``batchsize`` to the target DB's ingest
    capacity (the usual JDBC-sink bottleneck is the DB, not Spark)."""
    df.write.mode(mode).options(**options).jdbc(url, table)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC read-back twin of :func:`write_jdbc`; at scale pass
    ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
    for a parallel range-partitioned read instead of one connection."""
    return spark.read.options(**options).jdbc(url, table)


def post_webhook(payload: dict, url: str, transport: Callable[[str, bytes], int] | None = None) -> int:
    """S12 transport: POST one JSON alert. ``transport`` is injectable
    so tests (and air-gapped runs) capture instead of POSTing."""
    body = json.dumps(payload).encode()
    if transport is not None:
        return transport(url, body)
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=5) as resp:  # noqa: S310
        return resp.status


def alert_sink(
    alerts: DataFrame,
    url: str,
    transport: Callable[[str, bytes], int] | None = None,
    max_alerts: int = 100,
) -> int:
    """S12: post one block-kit-style alert per fraud row
    (realtime_prediction_job.py:115-209 semantics, engine-side).
    Collects at most ``max_alerts`` rows (alerts are rare by
    construction — the stream filters to HIGH risk first). Returns the
    number posted."""
    rows = alerts.limit(max_alerts).collect()
    for row in rows:
        payload = {
            "text": (
                f"Fraud alert: {row['trans_num']} "
                f"amount=${row['amt']:.2f} risk={row['risk_level']}"
            ),
            "trans_num": row["trans_num"],
            "risk_level": row["risk_level"],
        }
        post_webhook(payload, url, transport)
    return len(rows)


def upsert_with_changelog(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key: str,
    changelog_path: str,
    partition_col: str | None = None,
) -> int:
    """MERGE upsert that also emits a Change Data Feed — the parquet
    analog of Delta's ``delta.enableChangeDataFeed`` on a MERGE
    (reference silver job's Delta surface, docs/DEVELOPER_GUIDE.md
    Delta notes). Returns the commit version written.

    Change rows carry the table schema plus ``_change_type``
    ('insert' | 'update_preimage' | 'update_postimage' — Delta's own
    vocabulary) and ``_commit_version`` (monotonic per upsert call).
    Downstream incremental consumers read ONLY the changelog
    (``read_changes``) instead of diffing snapshots — at 100 TB the
    difference between scanning a delta of a micro-batch and scanning
    two full table versions.

    Scale notes: change rows are computed with one broadcast-key join
    against the (partition-pruned, when ``partition_col`` is set)
    existing slice — the same read the upsert itself does; each commit
    is its own ``_commit_version=N`` directory so version range reads
    prune directories, and version discovery is one directory listing
    (not a changelog scan).

    Commit protocol (same as ``sources.snapshots``): the change rows
    are staged into a dot-prefixed directory (invisible to Spark's
    file index), then published with one atomic ``os.rename`` to
    ``_commit_version=N`` — the rename fails if N exists, so racing
    writers serialize and a reader can never observe a partially
    written commit. A crash before the rename leaves only invisible
    stage debris. The table upsert happens AFTER the changelog commit;
    a crash between the two means the changelog leads the table until
    the upsert is retried — consumers see at-least-once change
    delivery, never a torn commit (the same ordering Delta's log
    resolves with a single unified commit, which plain parquet cannot
    express).
    """
    if partition_col is not None:
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        try:
            dirs = _partition_dirs(path, partition_col, parts)
        except _UnresolvablePartition:
            dirs = None  # unreproducible dir name → full-table read
        if dirs is None:
            try:
                existing = spark.read.parquet(path)
            except AnalysisException:
                existing = None
        else:
            # narrow read (same contract as upsert_by_key): only the
            # touched partition dirs, so disjoint-partition writers
            # compose
            existing = (
                spark.read.option("basePath", path).parquet(*dirs) if dirs else None
            )
    else:
        try:
            existing = spark.read.parquet(path)
        except AnalysisException:
            existing = None

    cols = updates.columns
    if existing is None:
        changes = updates.withColumn("_change_type", F.lit("insert"))
    else:
        keys = existing.select(key).distinct()
        inserts = updates.join(F.broadcast(keys), key, "left_anti").withColumn(
            "_change_type", F.lit("insert")
        )
        upd_keys = updates.select(key).distinct()
        pre = (
            existing.join(F.broadcast(upd_keys), key, "left_semi")
            .select(*cols)
            .withColumn("_change_type", F.lit("update_preimage"))
        )
        post = updates.join(F.broadcast(keys), key, "left_semi").withColumn(
            "_change_type", F.lit("update_postimage")
        )
        changes = inserts.unionByName(pre).unionByName(post)
    version = _commit_changelog(changes, changelog_path)
    upsert_by_key(spark, updates, path, key, partition_col=partition_col)
    return version


_CHANGELOG_V_RE = re.compile(r"^_commit_version=(\d+)$")


def _commit_changelog(changes: DataFrame, changelog_path: str) -> int:
    """Stage change rows, then publish them as ``_commit_version=N``
    with one atomic rename (the commit point). Returns N. The layout
    is identical to a ``partitionBy("_commit_version")`` append, so
    readers get the version back as a partition column — but no
    reader can ever list a half-written commit."""
    os.makedirs(changelog_path, exist_ok=True)
    stage = os.path.join(changelog_path, f".stage-{uuid.uuid4().hex}")
    changes.write.mode("errorifexists").parquet(stage)
    for _ in range(10_000):  # bounded: a claim race loses ≤ once per rival commit
        taken = [
            int(m.group(1))
            for name in os.listdir(changelog_path)
            if (m := _CHANGELOG_V_RE.match(name))
        ]
        version = (max(taken) + 1) if taken else 1
        try:
            os.rename(stage, os.path.join(changelog_path, f"_commit_version={version}"))
            return version
        except OSError as exc:
            # only the claim-race errors mean "retry with next N";
            # anything else (EACCES, EROFS, EXDEV, ...) is a real
            # failure and must surface, not busy-loop
            if exc.errno not in (errno.EEXIST, errno.ENOTEMPTY):
                raise
            continue
    raise RuntimeError(f"could not claim a changelog version at {changelog_path}")


def read_changes(
    spark: SparkSession, changelog_path: str, starting_version: int = 1
) -> DataFrame:
    """CDF reader: change rows with ``_commit_version >=
    starting_version`` (Delta's ``readChangeFeed`` +
    ``startingVersion``). The version filter prunes changelog
    directories — an incremental consumer never scans history it has
    already applied."""
    return spark.read.parquet(changelog_path).filter(
        F.col("_commit_version") >= F.lit(starting_version)
    )
