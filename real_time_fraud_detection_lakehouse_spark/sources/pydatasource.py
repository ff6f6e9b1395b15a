"""Custom connector via Spark 4's Python Data Source API.

The reference ingests CDC from a broker connector
(`/root/reference/spark/app/streaming_job.py:65-75`); this engine's
file-based adaptation normally rides `spark.read.json`. This module
shows the ENGINE-NATIVE way to host a connector Spark lacks: a
`pyspark.sql.datasource.DataSource` that replays a directory of CDC
JSON-lines files with real partition planning — one input partition
per file, so a directory of N files scans with N-way parallelism and
each task touches exactly one file (the partition-per-log-segment
pattern every replay connector uses).

Composes with :func:`streaming.bronze.parse_cdc`: the source emits
the raw envelope strings; the shared transform stage is unchanged —
exactly the swap-the-source property the bronze docstring promises.

Scale notes: partition planning is metadata-only on the driver (a
directory listing); each read() streams its file line-by-line (no
whole-file buffering); at broker scale the same shape becomes
partition-per-topic-partition with offset ranges. Python-source rows
cross into the JVM via Arrow batches — fine for an ingest edge, and
the parse/flatten stays JVM-side after the handoff.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, index: int):
        self.path = path
        self.index = index


class CDCReplayReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("cdc_replay requires option 'path' (fixture dir)")

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.dir) if f.endswith(".json")
        )
        return [
            _FilePartition(os.path.join(self.dir, f), i)
            for i, f in enumerate(files)
        ]

    def read(self, partition: _FilePartition):
        with open(partition.path, "r") as fh:
            for line_no, line in enumerate(fh):
                line = line.rstrip("\n")
                if line:
                    yield (line, os.path.basename(partition.path), line_no)


class CDCReplaySource(DataSource):
    """``spark.read.format("cdc_replay").option("path", dir)`` —
    JSON-lines CDC envelope replay with partition-per-file planning."""

    @classmethod
    def name(cls) -> str:
        return "cdc_replay"

    def schema(self) -> str:
        return "value string, source_file string, line_no long"

    def reader(self, schema):
        return CDCReplayReader(self.options)

    def simpleStreamReader(self, schema):
        return CDCReplayStreamReader(self.options)


class CDCReplayStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same connector: the offset is the number
    of files fully consumed, each micro-batch replays exactly one file
    (a log segment), and ``readBetweenOffsets`` makes replay-on-restart
    deterministic — the three-method contract (initialOffset / read /
    readBetweenOffsets) that gives a custom source exactly-once
    semantics under Spark's offset-log + idempotent-sink protocol."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("cdc_replay requires option 'path' (fixture dir)")

    def _files(self):
        return sorted(f for f in os.listdir(self.dir) if f.endswith(".json"))

    def initialOffset(self):
        return {"files_done": 0}

    def _read_file(self, fname: str) -> list:
        # NB: returns a LIST — the simple-reader protocol prefetches
        # batches on the driver and pickles them into the offset cache,
        # and generators don't pickle
        rows = []
        with open(os.path.join(self.dir, fname), "r") as fh:
            for line_no, line in enumerate(fh):
                line = line.rstrip("\n")
                if line:
                    rows.append((line, fname, line_no))
        return rows

    def read(self, start):
        files = self._files()
        i = start["files_done"]
        if i >= len(files):
            return iter([]), start
        # iter(list) — the protocol wants an iterator AND pickles it
        # into the prefetch cache; list_iterators pickle, generators
        # don't
        return iter(self._read_file(files[i])), {"files_done": i + 1}

    def readBetweenOffsets(self, start, end):
        files = self._files()
        rows = []
        for i in range(start["files_done"], end["files_done"]):
            rows.extend(self._read_file(files[i]))
        return iter(rows)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(CDCReplaySource)


# --- write side: webhook-log sink with a driver-side commit manifest --------
try:  # DataSourceWriter/WriterCommitMessage live in the same module
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage
except ImportError:  # pragma: no cover - older pyspark
    DataSourceWriter = object  # type: ignore[assignment,misc]
    WriterCommitMessage = object  # type: ignore[assignment,misc]


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class WebhookLogWriter(DataSourceWriter):
    """Task side: each partition appends its rows as JSON lines to a
    private part file (task-attempt isolated — a retried task writes a
    NEW uuid file and only the committed attempt's path reaches the
    manifest). Driver side: ``commit`` writes `_MANIFEST.json` listing
    exactly the committed part files + row counts — readers that
    honor the manifest never see orphan files from failed attempts
    (the same two-phase contract as the snapshot store's rename
    protocol, expressed through the connector API)."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("webhook_log requires option 'path'")

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.dir, exist_ok=True)
        path = _os.path.join(self.dir, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(path, n)

    def commit(self, messages):
        import json as _json
        import os as _os

        manifest = {
            "parts": [
                {"path": _os.path.basename(m.path), "rows": m.rows}
                for m in messages
            ],
            "total_rows": sum(m.rows for m in messages),
        }
        tmp = _os.path.join(self.dir, "_MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        _os.replace(tmp, _os.path.join(self.dir, "_MANIFEST.json"))

    def abort(self, messages):  # pragma: no cover - exercised on task failure
        import os as _os

        for m in messages:
            try:
                _os.remove(m.path)
            except OSError:
                pass


class WebhookLogSink(DataSource):
    """``df.write.format("webhook_log").mode("append")
    .option("path", dir).save()`` —
    the reference's webhook alert delivery re-expressed as a custom
    Python data source WRITER (no HTTP endpoint in this env; the
    jsonl + manifest layout is the webhook provider's dead-letter/
    replay log shape)."""

    @classmethod
    def name(cls) -> str:
        return "webhook_log"

    def writer(self, schema, overwrite: bool):
        return WebhookLogWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(WebhookLogSink)
