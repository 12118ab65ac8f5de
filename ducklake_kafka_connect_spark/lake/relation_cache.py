"""Per-session memo of schema'd parquet relations (driver-side only).

Every ``spark.read.schema(s).parquet(*files)`` costs ~30-40 ms of JVM
driver work (DataSource resolution + file status), and an empty
``createDataFrame([], schema)`` ~50 ms — the lake layer builds these
relations on every read/changes/merge over file lists that are
IMMUTABLE by construction (data files are uuid-named and never
rewritten in place; a logical rewrite commits NEW file names). Memoize
the UNRESOLVED DataFrame per (session, schema, path tuple): only the
logical plan is reused — every action still scans parquet, nothing is
persisted, ``clearCache`` is unaffected. This is the same contract a
catalog table gives (resolve the relation once, not per statement);
``plans/queries.py::_t`` applies the identical idea to the bench's
source tables, validated there by (mtime, size) because those paths
are externally owned — lake files need no validation beyond existence
(vacuum DELETES files; a hit re-checks cheaply so a vacuumed span
surfaces the same analysis-time error a fresh build would).

Bounded LRU so long-lived sessions over many snapshots cannot grow the
driver without bound.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAX_ENTRIES = 512

_CACHE: "WeakKeyDictionary[SparkSession, OrderedDict]" = WeakKeyDictionary()


def _session_cache(spark: SparkSession) -> OrderedDict:
    c = _CACHE.get(spark)
    if c is None:
        c = OrderedDict()
        _CACHE[spark] = c
    return c


def schema_relation(
    spark: SparkSession, schema: T.StructType, paths: "tuple[str, ...] | list[str]"
) -> DataFrame:
    """``spark.read.schema(schema).parquet(*paths)`` with a per-session
    logical-plan memo. ``paths`` must be absolute file paths from a lake
    manifest (immutable objects)."""
    paths = tuple(paths)
    if not paths:
        return empty_relation(spark, schema)
    cache = _session_cache(spark)
    key = ("rel", schema.json(), paths)
    hit = cache.get(key)
    if hit is not None:
        # vacuum deletes files: re-check existence so a stale span fails
        # at the same (analysis) point a fresh build would
        if all(os.path.exists(p) for p in paths):
            cache.move_to_end(key)
            return hit
        del cache[key]
    df = spark.read.schema(schema).parquet(*paths)
    cache[key] = df
    if len(cache) > _MAX_ENTRIES:
        cache.popitem(last=False)
    return df


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for driver-local rows
    that builds an Arrow-backed LocalRelation instead of parallelizing
    an RDD: collecting a 1-row status frame costs ~310 ms through the
    RDD path but ~35 ms through Arrow, and the lake SQL surface returns
    such frames from every DDL/DML statement. Result-identical: the
    logical schema is checked against the requested one and ANY
    mismatch (or any type Arrow cannot map — nested rows, raw
    timestamps, dict rows) falls back to the plain path."""
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        st = T._parse_datatype_string(schema) if isinstance(schema, str) else schema
        if not isinstance(st, T.StructType):
            raise ValueError("not a struct schema")
        rows = list(rows)
        if not all(isinstance(r, (tuple, list)) for r in rows):
            raise ValueError("rows must be tuples")
        try:
            arrow_schema = to_arrow_schema(st, timestamp_utc=True)
        except TypeError:
            arrow_schema = to_arrow_schema(st)
        cols = list(zip(*rows)) if rows else [[] for _ in st.fields]
        if len(cols) != len(st.fields):
            raise ValueError("row arity mismatch")
        tbl = pa.table(
            {
                f.name: pa.array(list(c), type=f.type)
                for f, c in zip(arrow_schema, cols)
            }
        )
        df = spark.createDataFrame(tbl)
        if df.schema != st:
            raise ValueError("arrow roundtrip changed the schema")
        return df
    except Exception:
        return spark.createDataFrame(rows, schema)


# Types whose collect()-value → pyarrow mapping is pinned by
# tests/test_arrow_checks.py (incl. a non-UTC driver TZ run). Anything
# else — nested rows, maps, intervals — falls back to toArrow.
_LOCAL_ARROW_SIMPLE = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.DoubleType,
    T.FloatType, T.StringType, T.BooleanType, T.BinaryType, T.DateType,
    T.DecimalType,
)


def local_plan_arrow(df: DataFrame):
    """Evaluate ``df`` to a pyarrow Table WITHOUT a Spark job when its
    optimized plan folded to a single LocalRelation, else return None.

    A micro-batch built from driver-local rows (the CDC trickle shape)
    plans as ``Project[literals] over LocalRelation`` and the optimizer
    collapses that to one LocalRelation node, whose ``executeCollect``
    is a driver-side array copy — measured ~10 ms vs ~85 ms + one
    scheduled job for ``toArrow()`` on the same 20-row frame. The rows
    are converted with the session's Arrow schema mapping; timestamps
    come back from collect() as driver-local naive datetimes and are
    re-anchored via astimezone(UTC), matching toArrow's UTC storage.
    Any unexpected type/shape returns None (caller falls back)."""
    try:
        import datetime as _dt

        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        op = df._jdf.queryExecution().optimizedPlan()
        if op.getClass().getSimpleName() != "LocalRelation":
            return None
        st = df.schema
        for f in st.fields:
            t = f.dataType
            if isinstance(t, T.ArrayType):
                t = t.elementType
            if not isinstance(
                t, _LOCAL_ARROW_SIMPLE + (T.TimestampType, T.TimestampNTZType)
            ) or (
                isinstance(f.dataType, T.ArrayType)
                and isinstance(t, (T.TimestampType, T.TimestampNTZType))
            ):
                return None
        try:
            asch = to_arrow_schema(st, timestamp_utc=True)
        except TypeError:
            asch = to_arrow_schema(st)
        rows = df.collect()  # LocalTableScan executeCollect: zero jobs
        cols = (
            list(zip(*[tuple(r) for r in rows]))
            if rows
            else [[] for _ in st.fields]
        )
        arrays = []
        for af, sf, c in zip(asch, st.fields, cols):
            vals = list(c)
            if isinstance(sf.dataType, T.TimestampType):
                vals = [
                    v.astimezone(_dt.timezone.utc)
                    if v is not None and v.tzinfo is None
                    else v
                    for v in vals
                ]
            arrays.append(pa.array(vals, type=af.type))
        return pa.Table.from_arrays(arrays, schema=asch)
    except Exception:
        return None


def empty_relation(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """``spark.createDataFrame([], schema)`` memoized per session — an
    empty LocalRelation is pure logical plan, safe to share."""
    cache = _session_cache(spark)
    key = ("empty", schema.json())
    hit = cache.get(key)
    if hit is not None:
        cache.move_to_end(key)
        return hit
    df = spark.createDataFrame([], schema)
    cache[key] = df
    if len(cache) > _MAX_ENTRIES:
        cache.popitem(last=False)
    return df
