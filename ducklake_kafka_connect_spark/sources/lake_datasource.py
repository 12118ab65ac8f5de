"""Lake tables as a native Spark data source (PySpark 4 Python
DataSource API): ``spark.read.format("ducklake")`` for snapshot reads
with manifest-stat FILTER PUSHDOWN, and
``spark.readStream.format("ducklake")`` for incremental consumption
where the offset log IS the manifest version chain.

The reference exposes its lake to consumers through the DuckDB
attachment (``connect/DucklakeConnectionFactory.java:36-95``); the
engine's ``LakeCatalog.sql`` is that parity surface. This module adds
the SPARK-native half: any Spark job — no engine imports, just the
registered short name — can read a lake table like a first-class
format, and a Structured Streaming query can follow a table's commits
exactly the way Delta's streaming source follows the Delta log:

- **offset = committed version.** ``initialOffset`` is the tip at
  stream start (or ``startingVersion``), ``latestOffset`` is the
  current tip (a LIST under the CAS backend — no pointer trust), and a
  micro-batch's partitions are precisely the data files ADDED by the
  versions in ``(start, end]``. One file = one ``InputPartition`` =
  one task; executors read the immutable parquet directly via pyarrow
  and yield Arrow RecordBatches (zero row-at-a-time Python).
- **append-only discipline, declared.** A commit that REMOVES files
  (MERGE rewrite, DELETE, OPTIMIZE) is not an append; following
  Delta's streaming-source contract the reader raises by default,
  ``skipChangeCommits=true`` skips those commits entirely, and
  ``ignoreChanges=true`` emits their added files (consumer accepts
  possible re-delivery of rewritten rows).
- **filter pushdown = manifest stat pruning.** The batch reader maps
  Spark's pushed ``Filter`` objects onto the same footer-stat/Bloom
  file pruning ``read(where=…)`` uses, so a selective equality opens
  the same file count through ``spark.read.format("ducklake")`` as
  through the engine API. All filters are reported unsupported-after-
  pruning, so Spark still applies them row-level (pruning is a
  superset guarantee, never a substitute).

Schema evolution: files older than a column null-fill it; files newer
than the stream's fixed schema simply project it away. Renamed columns
read through the manifest's logical→physical mapping per version.

Usage::

    from ducklake_kafka_connect_spark.sources.lake_datasource import (
        register_lake_datasource,
    )
    register_lake_datasource(spark)
    df = (spark.read.format("ducklake")
          .option("path", "/lake/root").option("table", "events").load())
    stream = (spark.readStream.format("ducklake")
              .option("path", "/lake/root").option("table", "events")
              .load())

Options: ``path`` (lake root), ``table``, ``backend`` (posix|cas,
default $DUCKLAKE_STORAGE_BACKEND), ``version``/``tag`` (batch
time travel), ``where`` (extra batch prune predicate),
``startingVersion`` (stream), ``skipChangeCommits``/``ignoreChanges``
(stream), ``batchRows`` (arrow batch size, default 65536).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


def register_lake_datasource(spark) -> None:
    """Register the ``ducklake`` format on a session (and enable Python
    data-source filter pushdown — the batch reader's stat pruning hooks
    in through ``pushFilters``, which Spark gates behind this conf)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DucklakeDataSource)


def _truthy(v) -> bool:
    return str(v).strip().lower() in ("1", "true", "yes")


def _open_table(options):
    """Metadata-only LakeTable from DataSource options (no SparkSession:
    the reader runs driver-side for planning and executor-side for I/O,
    both through the storage backend alone)."""
    from ..lake.table import LakeTable

    root = options.get("path")
    name = options.get("table")
    if not root or not name:
        raise ValueError(
            "ducklake source needs .option('path', <lake root>) and "
            ".option('table', <table name>)"
        )
    return LakeTable(None, root, name, backend=options.get("backend"))


def _read_surface(table, m) -> StructType:
    """The schema ``table.read()`` presents: physical (storage) types
    under logical names, derived partition columns hidden."""
    from ..lake.partitioning import derived_column_names
    from ..lake.table import to_physical_schema

    hidden = set(derived_column_names(m.partition_exprs))
    phys = to_physical_schema(m.schema)
    return StructType([f for f in phys.fields if f.name not in hidden])


@dataclass
class _FileSlice(InputPartition):
    """One immutable data file; the whole unit of streaming re-play and
    batch parallelism. Carries everything the executor-side read needs
    (no driver round-trips): absolute path, the logical→physical rename
    map in force for its version, and the arrow batch size."""

    path: str
    renames: "dict[str, str]"
    batch_rows: int


def _arrow_target(schema: StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema, timestamp_utc=True)


def _read_file_slices(
    parts: "Sequence[_FileSlice]", schema: StructType
) -> "Iterator":
    """Executor-side: parquet file → Arrow RecordBatches shaped exactly
    like the declared read surface (rename physical→logical, null-fill
    columns the file predates, project away columns it postdates, cast
    to the Spark-Arrow types)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = _arrow_target(schema)
    for part in parts:
        if not part.path:  # empty-plan sentinel (no files selected)
            continue
        tbl = pq.read_table(part.path)
        phys_names = set(tbl.column_names)
        cols = []
        for field, logical in zip(target, schema.fieldNames()):
            phys = part.renames.get(logical, logical)
            if phys in phys_names:
                col = tbl.column(phys)
                if col.type != field.type:
                    col = col.cast(field.type)
            else:
                col = pa.nulls(tbl.num_rows, type=field.type)
            cols.append(col)
        out = pa.table(cols, schema=target)
        for batch in out.to_batches(max_chunksize=part.batch_rows):
            yield batch


_FILTER_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _filter_to_conjunct(f) -> str | None:
    """Pushed Filter → the engine's predicate-string dialect (single
    top-level column, literal int/float/str). None = not mappable."""
    from ..lake.table import quote_ident

    op = _FILTER_OPS.get(type(f))
    if op is None:
        return None
    col = f.attribute
    if not isinstance(col, tuple) or len(col) != 1:
        return None
    v = f.value
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        lit = repr(v)
    elif isinstance(v, str):
        lit = "'" + v.replace("'", "''") + "'"
    else:
        return None
    return f"{quote_ident(col[0])} {op} {lit}"


class _BatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.options = options
        self.schema = schema
        self.table = _open_table(options)
        version = options.get("version")
        tag = options.get("tag")
        if tag is not None:
            version = self.table.resolve_tag(tag)
        self.manifest = self.table.manifest(
            int(version) if version is not None else None
        )
        self.batch_rows = int(options.get("batchrows", 65536))
        self._prune: list[str] = []
        w = options.get("where")
        if w:
            self._prune.append(f"({w})")

    def pushFilters(self, filters):
        """Manifest-stat pruning from Spark's pushed filters: every
        mappable conjunct narrows the file list; ALL filters are handed
        back so Spark still applies them row-level (stat pruning is
        conservative superset selection, not evaluation)."""
        for f in filters:
            c = _filter_to_conjunct(f)
            if c is not None:
                self._prune.append(c)
            yield f

    def partitions(self):
        m = self.manifest
        rel = m.all_files()
        if self._prune:
            rel, _ = self.table.prune_files(" AND ".join(self._prune), manifest=m)
        ren = dict(m.column_renames)
        parts = [
            _FileSlice(os.path.join(self.table.dir, p), ren, self.batch_rows)
            for p in rel
        ]
        # Spark requires at least one partition object; an empty-path
        # sentinel reads as zero rows
        return parts or [_FileSlice("", {}, self.batch_rows)]

    def read(self, partition: _FileSlice):
        return _read_file_slices([partition], self.schema)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        self.options = options
        self.schema = schema
        self.table = _open_table(options)
        self.batch_rows = int(options.get("batchrows", 65536))
        self.skip_change = _truthy(options.get("skipchangecommits", "false"))
        self.ignore_changes = _truthy(options.get("ignorechanges", "false"))
        self._starting = options.get("startingversion")

    def initialOffset(self) -> dict:
        if self._starting is not None:
            # offset = last PROCESSED version; startingVersion is the
            # first version the stream should emit
            return {"version": int(self._starting) - 1}
        return {"version": self.table.current_version()}

    def latestOffset(self) -> dict:
        return {"version": self.table.current_version()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []
        prev_files: set | None = None
        for v in range(max(lo, 0), hi + 1):
            m = self.table.manifest(v)
            files = set(m.all_files())
            if prev_files is not None and v > lo:
                removed = prev_files - files
                added = sorted(files - prev_files)
                if removed and not self.ignore_changes:
                    if self.skip_change:
                        prev_files = files
                        continue
                    raise ValueError(
                        f"ducklake stream on {self.table.name}: version {v} "
                        f"is not append-only ({len(removed)} file(s) removed "
                        f"by {m.props.get('last_op', 'a rewrite')}); set "
                        f"skipChangeCommits=true to skip such commits or "
                        f"ignoreChanges=true to accept re-delivery"
                    )
                ren = dict(m.column_renames)
                parts.extend(
                    _FileSlice(os.path.join(self.table.dir, p), ren, self.batch_rows)
                    for p in added
                )
            prev_files = files
        return parts or [_FileSlice("", {}, self.batch_rows)]

    def read(self, partition: _FileSlice):
        return _read_file_slices([partition], self.schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query's checkpoint; nothing to do


class DucklakeDataSource(DataSource):
    """``ducklake`` format: lake tables as a native Spark source."""

    @classmethod
    def name(cls) -> str:
        return "ducklake"

    def schema(self) -> StructType:
        t = _open_table(self.options)
        version = self.options.get("version")
        tag = self.options.get("tag")
        if tag is not None:
            version = t.resolve_tag(tag)
        m = t.manifest(int(version) if version is not None else None)
        return _read_surface(t, m)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options, schema)
