"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the extension point for formats Spark has no native reader for
(proprietary log archives, binary telemetry, department-specific
layouts). The demo source reads the app-log line format
(``evt|event_id|user_id|event_type|props``, sources/logs.py) with
typed parsing and malformed-line dropping INSIDE the source, so
downstream plans start from a typed DataFrame.

Scale posture: ``partitions()`` returns one InputPartition per file,
so reads parallelize across executors exactly like a native file
source (each Python worker streams its own file); schema is fixed and
declared, so column pruning works above the source. A native reader
beats this per-byte (no Python), so the API is for coverage of
formats that lack one — the plumbing (planning driver-side, reading
executor-side, Arrow-batched return) is what this verifies.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Mirrors sources/logs.py APP_LOG_PATTERN's field layout.
_LINE_RE = re.compile(r"^evt\|(\d+)\|(\d+)\|(\w+)\|(.*)$")

APPLOG_SCHEMA = "event_id long, user_id long, event_type string, props string"


class AppLogDataSource(DataSource):
    """``spark.read.format("applog").option("path", dir)`` source."""

    @classmethod
    def name(cls) -> str:
        return "applog"

    def schema(self) -> str:
        return APPLOG_SCHEMA

    def reader(self, schema) -> "AppLogReader":
        return AppLogReader(self.options)


class AppLogReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("applog source requires option 'path'")
        self.path = path

    def partitions(self) -> list[InputPartition]:
        # One partition per data file: planning happens driver-side,
        # byte reading executor-side — the native-file-source split
        # discipline. Sorted for deterministic planning.
        files = sorted(
            f
            for f in glob.glob(os.path.join(self.path, "part-*"))
            if not f.endswith(".crc")
        )
        if not files:
            raise FileNotFoundError(f"no applog part files under {self.path}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                m = _LINE_RE.match(line.rstrip("\n"))
                if m:  # malformed lines are dropped inside the source
                    yield (int(m.group(1)), int(m.group(2)), m.group(3), m.group(4))


class AppLogStreamDataSource(DataSource):
    """Streaming twin: ``spark.readStream.format("applog_stream")``.

    Offsets are indices into the sorted file list (``{"idx": n}``), so
    progress is resumable from the checkpoint like any Spark source.
    ``latestOffset`` admits everything currently on disk; under
    ``Trigger.AvailableNow`` the query captures that offset once,
    drains to it, and stops — matching the file-source drain pattern
    the other streaming queries use. Incremental microbatch admission
    (advance a few files per batch) is the file source's
    ``maxFilesPerTrigger`` analog and belongs in ``latestOffset``;
    it is deliberately NOT done here because AvailableNow snapshots
    the first latestOffset it sees.
    """

    @classmethod
    def name(cls) -> str:
        return "applog_stream"

    def schema(self) -> str:
        return APPLOG_SCHEMA

    def streamReader(self, schema) -> "AppLogStreamReader":
        return AppLogStreamReader(self.options)


class AppLogStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("applog_stream source requires option 'path'")
        self.path = path

    def _files(self) -> list[str]:
        return sorted(
            f
            for f in glob.glob(os.path.join(self.path, "part-*"))
            if not f.endswith(".crc")
        )

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(self._files())}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = self._files()[start["idx"] : end["idx"]]
        # an empty microbatch still needs one (no-op) partition
        return [InputPartition(f) for f in files] or [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition.value is None:
            return
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                m = _LINE_RE.match(line.rstrip("\n"))
                if m:
                    yield (
                        int(m.group(1)),
                        int(m.group(2)),
                        m.group(3),
                        m.group(4),
                    )

    def commit(self, end: dict) -> None:
        pass  # progress persistence rides the streaming checkpoint
