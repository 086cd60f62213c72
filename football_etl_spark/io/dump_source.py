"""Custom Python DataSource for the reference's raw API debug dumps.

The reference's acquisition layer saves one verbatim debug capture
per day ("Status: …\\nHeaders: {…}\\nContent: {json…}" —
/root/reference/daily_match_scraper.py's response dumps, e.g.
sofascore_data/raw/api_response_2025-05-23.txt). This module exposes
that feed as a first-class Spark source via the Spark 4 Python
DataSource API (pyspark.sql.datasource):

    spark.dataSource.register(RawDumpDataSource)
    raw = (spark.read.format("raw_api_dumps")
                .option("path", "<dir with api_response_*.txt>")
                .load())
    # capture_date string, raw string — one row per daily capture

so the whole ingest chain is Spark-native end to end:
raw_api_dumps source → ingest.extract_dump_content →
ingest.explode_api_envelope → ingest.flatten_api_events.

Scale design: one InputPartition PER CAPTURE FILE — the natural
split unit of a one-dump-per-day feed — so a year of captures reads
365-way parallel; the file list is computed driver-side at plan time
(cheap directory listing), and each task opens only its own file.
The same reader shape extends to an HTTP fetch per partition in
production (the partition value would be a URL + date instead of a
local path); the engine contract — schema, partitioning, lazy read —
is identical and is what this module proves.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DATE_RE = re.compile(r"(\d{4}-\d{2}-\d{2})")


class _DumpPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RawDumpReader(DataSourceReader):
    def __init__(self, options: dict):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("raw_api_dumps requires .option('path', <dir>)")
        self._pattern = options.get("pattern", "api_response_")

    def partitions(self):
        files = sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if f.startswith(self._pattern) and f.endswith(".txt")
        )
        return [_DumpPartition(p) for p in files]

    def read(self, partition):
        m = _DATE_RE.search(os.path.basename(partition.path))
        capture_date = m.group(1) if m else None
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            yield (capture_date, fh.read())


class RawDumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "raw_api_dumps"

    def schema(self) -> str:
        return "capture_date string, raw string"

    def reader(self, schema) -> RawDumpReader:
        return RawDumpReader(self.options)
    # NOTE: no simpleStreamReader here on purpose — the streaming
    # source runner process cannot resolve by-reference-pickled
    # module classes (it does not see addPyFile), so the streaming
    # variant lives behind make_streaming_dump_source() below.


def make_streaming_dump_source():
    """Build a BY-VALUE-picklable streaming variant of the source.

    The batch path ships the package zip via addPyFile and pickles
    classes by reference — executors resolve the module. The Spark 4
    STREAMING source runner is a separate driver-side Python process
    that does NOT see addPyFile paths, so a module-level class raises
    ModuleNotFoundError there under the driver's foreign-cwd plain
    session. Defining the classes inside this factory makes
    cloudpickle serialize them by value (closure classes), with only
    pyspark/stdlib imports inside method bodies — the same
    self-containment rule the repo's pandas-UDF closures follow.

    Registered under a DISTINCT name ("raw_api_dumps_stream") so the
    by-reference batch source keeps its catalog slot."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _StreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self._dir = options.get("path")
            if not self._dir:
                raise ValueError("raw_api_dumps_stream requires .option('path', <dir>)")
            self._pattern = options.get("pattern", "api_response_")

        def _files(self):
            import os as _os

            return sorted(
                _os.path.join(self._dir, f)
                for f in _os.listdir(self._dir)
                if f.startswith(self._pattern) and f.endswith(".txt")
            )

        def _rows(self, paths):
            # MATERIALIZED list, not a generator: pyspark's simple-
            # stream wrapper caches each read's iterator and
            # copy.copy()s it when planning partitions — generators
            # are not copyable and crash planPartitions; list
            # iterators are. A micro-batch here is a handful of
            # daily dumps, so materializing is the contract-correct
            # prefetch, not a scale hazard.
            import os as _os
            import re as _re

            out = []
            for p in paths:
                m = _re.search(r"(\d{4}-\d{2}-\d{2})", _os.path.basename(p))
                date = m.group(1) if m else None
                with open(p, encoding="utf-8", errors="replace") as fh:
                    out.append((date, fh.read()))
            return out

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            files = self._files()
            lo = int(start.get("i", 0))
            return self._rows(files[lo:]), {"i": len(files)}

        def readBetweenOffsets(self, start, end):
            files = self._files()
            return self._rows(files[int(start.get("i", 0)) : int(end.get("i", 0))])

        def commit(self, end):
            pass

    class _StreamingDumpSource(DataSource):
        @classmethod
        def name(cls):
            return "raw_api_dumps_stream"

        def schema(self):
            return "capture_date string, raw string"

        def simpleStreamReader(self, schema):
            return _StreamReader(self.options)

    return _StreamingDumpSource
