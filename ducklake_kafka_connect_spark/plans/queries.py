"""The named query surface exposed to the driver oracle.

Each entry pairs a Spark DataFrame implementation with an equivalent
ANSI-SQL string DuckDB runs on the same parquet tables (views
``region nation customer supplier part orders lineitem events documents
embeddings``). Conventions that keep the value-hash comparison honest:

- every computed column aliased identically on both sides;
- ``events.ts`` is parquet timestamp[ns]: Spark side loads via
  ``load_parquet`` (ns→µs truncation), oracle side ``CAST(ts AS
  TIMESTAMP)`` (same truncation);
- integer SUMs cast to BIGINT in DuckDB (its SUM(int) returns HUGEINT,
  Spark returns long);
- floating-point similarity/ratio outputs rounded to 6 decimals on both
  sides;
- top-k queries carry a deterministic tie-break on a key column.

Queries tagged ``oracle=None`` are non-SQL-expressible (driver records a
rows-only check).
"""

from __future__ import annotations

import os
import tempfile
import uuid
import weakref
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.timestamps import parse_iso_timestamp
from ..lake import LakeCatalog, LakeWriter
from ..operators import dedup as dedup_ops
from ..operators.similarity import (
    NUM_CELLS,
    _lcg_hyperplanes,
    ann_lsh_topk,
    ann_lsh_topk_sql,
    cosine_topk,
    ivf_indexed_topk_sql,
    ivf_topk,
    ivf_topk_sql,
)
from ..operators.text import (
    EN_STOPWORDS,
    fingerprint_col,
    fingerprint_sql,
    lang_id_col,
    lang_id_sql,
    repetition_ratio_col,
    repetition_ratio_sql,
    stopword_ratio_col,
    token_count_col,
)
from ..schema.merge import unify_schemas
from ..sources.parquet_loader import load_parquet
from ..lake.relation_cache import local_rows_df


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, description: str):
    def deco(fn):
        QUERIES[name] = QueryDef(fn=fn, oracle=oracle, description=description)
        return fn

    return deco


# r14 (guide §5 driver work / §6 file listing): every `_t` call paid a
# fresh `spark.read.parquet` relation resolve (~30-100 ms of driver-side
# listing + footer schema inference) — ~1500 resolves per bench run for
# the same dozen immutable files. Memoize the UNRESOLVED plan per
# (session, path), validated by the file's (mtime_ns, size) so a
# rewritten fixture re-resolves. Only the logical plan is reused: every
# action still scans the parquet inputs (nothing is persisted and
# `clearCache` between queries is unaffected), which is exactly what a
# real catalog does — resolve the table once, not per statement.
_T_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        token = (st.st_mtime_ns, st.st_size)
    except OSError:
        token = None
    if token is not None:
        per = _T_MEMO.setdefault(spark, {})
        hit = per.get(path)
        if hit is not None and hit[0] == token:
            return hit[1]
    df = load_parquet(spark, path)
    if token is not None:
        per[path] = (token, df)
    return df


def epoch_us_col(df: DataFrame, col: str):
    """Microseconds since epoch for a timestamp column of EITHER type.

    Parquet written with isAdjustedToUTC=false loads as TIMESTAMP_NTZ
    (Spark's inferTimestampNTZ default), which ``unix_micros`` rejects.
    NTZ is pure wall-clock, so NTZ epoch-micros is wall-clock arithmetic
    against the NTZ epoch literal — timezone-independent, matching
    DuckDB's ``epoch_us(CAST(ts AS TIMESTAMP))`` on naive timestamps
    regardless of the Spark session timezone."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    return F.unix_micros(F.col(col))


# ---------------------------------------------------------------------------
# A. Query surface over ingested tables (SURVEY §2.G: free from Spark SQL,
#    declared so the oracle can verify ingested data is queryable)
# ---------------------------------------------------------------------------

Q1_CUTOFF = "2000-10-20 00:00:00"


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           ROUND(sum(l_extendedprice), 2)                         AS sum_base_price,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
           ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(avg(l_quantity), 6)                              AS avg_qty,
           ROUND(avg(l_extendedprice), 6)                         AS avg_price,
           ROUND(avg(l_discount), 6)                              AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: scan + filter + hash aggregate",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT o_orderkey, ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    "TPC-H Q3-style: selective dim filter + 3-way join + top-k by revenue",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name, ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
    "TPC-H Q5-style 6-way join with broadcast dims",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dims are tiny → broadcast; the only shuffle is lineitem⋈orders agg
    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "top_k_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    "Top-K per group via ranking window (common OLAP pattern)",
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "agg_distinct_orders",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_cust,
           count(*)                  AS n_orders,
           ROUND(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
    "Distinct aggregate (two-phase partial agg under the hood)",
)
def agg_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "rollup_lineitem_qty",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP grouping sets",
)
def rollup_lineitem_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, ROUND(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "Explicit GROUPING SETS (disjoint cells — neither ROLLUP nor CUBE)",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, ROUND(sum(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# B. Ingestion-semantics queries (the reference's derived query surface,
#    SURVEY §2.D)
# ---------------------------------------------------------------------------


@register(
    "upsert_latest_per_key",
    """
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    "Upsert-latest-per-key semantics: window dedup by PK, last write wins (D2)",
)
def upsert_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


def merge_upsert_build(spark: SparkSession, sf_dir: str):
    """Build phase: 80% of events loaded as the base table. Returns the
    (writer, upsert batch, catalog) the query phase merges with."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = (
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("value", F.col("value") + F.lit(1000.0))
        .withColumn("event_type", F.lit("updated"))
    )
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_merged"), pk=["event_id"])
    w.write(base)   # create + insert
    return w, batch, cat


def merge_upsert_query(w, batch, cat) -> DataFrame:
    """Query phase: the 50%-overlap MERGE itself + snapshot read-back."""
    w.write(batch)  # MERGE upsert
    return (
        cat.table("events_merged")
        .read()
        .select("event_id", "user_id", "event_type", "value")
    )



@register(
    "merge_upsert_events",
    """
    SELECT event_id, user_id,
           CASE WHEN event_id % 10 >= 5 THEN 'updated' ELSE event_type END AS event_type,
           CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END  AS value
    FROM events
    """,
    "Full engine MERGE: base load + overlapping upsert batch through LakeWriter (D2/D3/D6)",
)
def merge_upsert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the real write path: 80% of events as the base table, then a
    50%-overlap batch with mutated payload MERGEd on event_id; reads the
    table back. Final state must equal the oracle's CASE expression.
    bench.py times merge_upsert_build / merge_upsert_query separately so
    read-path regressions aren't hidden under table-build cost."""
    return merge_upsert_query(*merge_upsert_build(spark, sf_dir))


@register(
    "sql_merge_upsert",
    """
    SELECT event_id, user_id,
           CASE WHEN event_id % 10 >= 5 THEN 'updated' ELSE event_type END AS event_type,
           CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END  AS value
    FROM events
    """,
    "SQL MERGE INTO statement (lake/sql_merge.py): the reference's flagship "
    "statement shape (ingestor/DucklakeWriter.java:151-168) through the "
    "catalog SQL surface — partial SET exercises the general joined-"
    "projection path (unlisted columns keep target values), INSERT the "
    "name-mapped insert. Same oracle as merge_upsert_events: the two paths "
    "must agree.",
)
def sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = ev.filter(F.col("event_id") % 10 >= 5)
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    LakeWriter(cat.table("events_sm"), pk=["event_id"]).write(base)
    view = f"sql_merge_batch_{uuid.uuid4().hex[:8]}"
    batch.createOrReplaceTempView(view)
    # user_id is deliberately absent from SET: matched rows must keep the
    # target value (it equals the source's — the oracle can't tell — but
    # the PLAN is the general pre-join form, not the fast path)
    cat.sql(
        f"MERGE INTO events_sm AS t USING (SELECT * FROM {view}) AS s "
        f"ON t.event_id = s.event_id "
        f"WHEN MATCHED THEN UPDATE SET event_type = 'updated', "
        f"value = s.value + 1000.0 "
        f"WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type, value) "
        f"VALUES (s.event_id, s.user_id, 'updated', s.value + 1000.0)"
    )
    spark.catalog.dropTempView(view)
    return (
        cat.table("events_sm")
        .read()
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "sql_merge_delete_cdc",
    """
    SELECT event_id, user_id,
           CASE WHEN event_id % 10 < 5 THEN event_type
                WHEN event_id % 10 < 8 THEN 'changed'
                ELSE 'new' END AS event_type,
           CASE WHEN event_id % 10 BETWEEN 5 AND 7 THEN value + 1000.0
                ELSE value END AS value
    FROM events
    WHERE NOT (event_id % 10 >= 5 AND event_type = 'click')
    """,
    "CDC apply through SQL MERGE's full clause triad: WHEN MATCHED AND "
    "<cond> THEN DELETE (tombstone channel), WHEN MATCHED THEN UPDATE, "
    "WHEN NOT MATCHED AND <cond> THEN INSERT — first-match-wins ordering "
    "and conditional insert filtering, all in one statement "
    "(lake/sql_merge.py general path).",
)
def sql_merge_delete_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = ev.filter(F.col("event_id") % 10 >= 5)
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    LakeWriter(cat.table("events_cdc"), pk=["event_id"]).write(base)
    view = f"sql_cdc_batch_{uuid.uuid4().hex[:8]}"
    batch.createOrReplaceTempView(view)
    cat.sql(
        f"MERGE INTO events_cdc AS t USING (SELECT * FROM {view}) AS s "
        f"ON t.event_id = s.event_id "
        f"WHEN MATCHED AND s.event_type = 'click' THEN DELETE "
        f"WHEN MATCHED THEN UPDATE SET event_type = 'changed', "
        f"value = s.value + 1000.0 "
        f"WHEN NOT MATCHED AND s.event_type <> 'click' THEN "
        f"INSERT (event_id, user_id, event_type, value) "
        f"VALUES (s.event_id, s.user_id, 'new', s.value)"
    )
    spark.catalog.dropTempView(view)
    return (
        cat.table("events_cdc")
        .read()
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "mor_merge_upsert",
    """
    SELECT event_id, user_id,
           CASE WHEN event_id % 10 >= 5 THEN 'updated' ELSE event_type END AS event_type,
           CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END  AS value
    FROM events
    WHERE event_id % 7 <> 0
    """,
    "Merge-on-read write path (lake/mor.py): the same 50%-overlap upsert "
    "as merge_upsert_events plus a predicate DELETE, committed as delta + "
    "PK-tombstone files under write.merge.mode=merge-on-read — NO matched "
    "file is rewritten (asserted in-query) — then read back through the "
    "tombstone visibility anti-join. Must equal the copy-on-write result.",
)
def mor_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..lake.mor import MODE_MOR, mor_state

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = (
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("value", F.col("value") + F.lit(1000.0))
        .withColumn("event_type", F.lit("updated"))
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    t = cat.table("events_mor")
    w = LakeWriter(t, pk=["event_id"], merge_mode=MODE_MOR)
    w.write(base)
    files_before = set(t.manifest().all_files())
    w.write(batch)  # MOR merge: delta + tombstone, no rewrite
    w.delete_where("event_id % 7 = 0")  # MOR delete: tombstone only
    m = t.manifest()
    if not files_before <= set(m.all_files()):
        raise AssertionError("merge-on-read rewrote base files")
    if not mor_state(m)[1]:
        raise AssertionError("merge-on-read left no tombstone state")
    if m.props["last_op"] != "DELETE(MOR)":
        raise AssertionError(f"unexpected last_op {m.props['last_op']}")
    return t.read().select("event_id", "user_id", "event_type", "value")


@register(
    "mor_optimize_roundtrip",
    """
    SELECT event_id, user_id,
           CASE WHEN event_id % 10 >= 5 THEN 'updated' ELSE event_type END AS event_type,
           CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END  AS value
    FROM events
    WHERE event_id % 7 <> 0
    """,
    "OPTIMIZE as the merge-on-read materialize step: after MOR upsert + "
    "delete, compaction rewrites every file with visibility applied and "
    "retires the tombstones (asserted in-query: state cleared, history "
    "shows COMPACT); the materialized table must read identically.",
)
def mor_optimize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..lake.maintenance import compact
    from ..lake.mor import MODE_MOR, mor_state

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = (
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("value", F.col("value") + F.lit(1000.0))
        .withColumn("event_type", F.lit("updated"))
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    t = cat.table("events_morc")
    w = LakeWriter(t, pk=["event_id"], merge_mode=MODE_MOR)
    w.write(base)
    w.write(batch)
    w.delete_where("event_id % 7 = 0")
    compact(t)  # materialize: visibility-applied rewrite
    m = t.manifest()
    if mor_state(m) != ({}, {}):
        raise AssertionError("OPTIMIZE left merge-on-read state behind")
    if m.props["last_op"] != "COMPACT":
        raise AssertionError(f"unexpected last_op {m.props['last_op']}")
    return t.read().select("event_id", "user_id", "event_type", "value")


@register(
    "sql_merge_mirror_sync",
    """
    SELECT event_id, user_id, 'synced' AS event_type,
           value + 1000.0 AS value
    FROM events WHERE event_id % 10 >= 5
    """,
    "Snapshot mirror through SQL MERGE's WHEN NOT MATCHED BY SOURCE "
    "clause (Delta 2.3+/Spark 3.4 form): upsert every source row, DELETE "
    "every target row the source no longer carries — after the statement "
    "the table IS the mapped source (lake/sql_merge.py FULL OUTER path).",
)
def sql_merge_mirror_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = ev.filter(F.col("event_id") % 10 >= 5)
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    LakeWriter(cat.table("events_mirror"), pk=["event_id"]).write(base)
    view = f"sql_mirror_batch_{uuid.uuid4().hex[:8]}"
    batch.createOrReplaceTempView(view)
    cat.sql(
        f"MERGE INTO events_mirror AS t USING (SELECT * FROM {view}) AS s "
        f"ON t.event_id = s.event_id "
        f"WHEN MATCHED THEN UPDATE SET user_id = s.user_id, "
        f"event_type = 'synced', value = s.value + 1000.0 "
        f"WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type, value) "
        f"VALUES (s.event_id, s.user_id, 'synced', s.value + 1000.0) "
        f"WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    spark.catalog.dropTempView(view)
    return (
        cat.table("events_mirror")
        .read()
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "sql_insert_overwrite_replace",
    """
    WITH base AS (
      SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_id % 4 = 1
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents * 3) AS BIGINT) AS sum_cents3
    FROM base WHERE cents >= 1000
    GROUP BY event_type ORDER BY event_type
    """,
    "INSERT OVERWRITE as ONE atomic commit (LakeWriter.overwrite): the "
    "statement's SELECT reads the table's own current snapshot, and the "
    "new version's file set is exactly the result — a reader sees old "
    "content or new, never a truncate-then-insert gap; the pre-replace "
    "version stays time-travelable.",
)
def sql_insert_overwrite_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    LakeWriter(cat.table("events_ow")).append(ev.filter(F.col("event_id") % 4 == 1))
    cat.sql(
        "INSERT OVERWRITE events_ow "
        "SELECT event_id, event_type, cents * 3 AS cents "
        "FROM events_ow WHERE cents >= 1000"
    )
    return cat.sql(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(cents) AS BIGINT) AS sum_cents3 "
        "FROM events_ow GROUP BY event_type ORDER BY event_type"
    )


@register(
    "cdf_table_changes",
    """
    WITH upd AS (
      SELECT event_id FROM events
      WHERE event_id % 10 BETWEEN 5 AND 7 AND event_id % 4 = 1
    ),
    ins AS (
      SELECT event_id FROM events
      WHERE event_id % 10 >= 8 AND event_id % 4 = 1
    )
    SELECT 'insert' AS change_type, CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(event_id), 0) AS BIGINT) AS id_sum FROM ins
    UNION ALL
    SELECT 'update', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(event_id), 0) AS BIGINT) FROM upd
    ORDER BY change_type
    """,
    "Change-data feed through the SQL TVF `table_changes('t', from)` "
    "(Delta CDF parity): rewritten onto LakeTable.changes, whose "
    "file-level diff scans only files the two versions do NOT share — "
    "the per-type counts and id checksums must equal the arithmetic "
    "reconstruction of the merge's effect.",
)
def cdf_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    sl = ev.filter(F.col("event_id") % 4 == 1)
    base = sl.filter(F.col("event_id") % 10 < 8)
    batch = sl.filter(F.col("event_id") % 10 >= 5).withColumn(
        "value", F.col("value") + 1000.0
    )
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_cdf"), pk=["event_id"])
    w.write(base)
    v1 = cat.table("events_cdf").current_version()
    w.write(batch)  # updates %10 in 5..7, inserts %10 in 8..9
    return cat.sql(
        f"SELECT _change_type AS change_type, "
        f"CAST(count(*) AS BIGINT) AS n, "
        f"CAST(coalesce(sum(event_id), 0) AS BIGINT) AS id_sum "
        f"FROM table_changes('events_cdf', {v1}) "
        f"GROUP BY _change_type ORDER BY change_type"
    )


@register(
    "sql_merge_schema_evolution",
    """
    SELECT event_id, user_id,
           CASE WHEN event_id % 10 >= 5 THEN 'evolved' ELSE event_type END AS event_type,
           CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END AS value,
           CASE WHEN event_id % 10 >= 5 THEN CAST(event_id % 1000 AS BIGINT)
                ELSE NULL END AS score
    FROM events
    """,
    "Schema evolution THROUGH the SQL MERGE statement (the reference "
    "evolves the target on every write, DucklakeTableManager.java:"
    "236-322): the source batch carries a brand-new `score` column; "
    "`UPDATE SET * / INSERT *` ADD-COLUMNs it (pre-existing rows "
    "null-fill) while the writer merge commits the evolved schema in "
    "the same transaction as the data.",
)
def sql_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = ev.filter(F.col("event_id") % 10 >= 5).select(
        "event_id",
        "user_id",
        F.lit("evolved").alias("event_type"),
        (F.col("value") + 1000.0).alias("value"),
        (F.col("event_id") % 1000).cast("long").alias("score"),
    )
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    LakeWriter(cat.table("events_evo"), pk=["event_id"]).write(base)
    view = f"sql_evo_batch_{uuid.uuid4().hex[:8]}"
    batch.createOrReplaceTempView(view)
    cat.sql(
        f"MERGE INTO events_evo AS t USING (SELECT * FROM {view}) AS s "
        f"ON t.event_id = s.event_id "
        f"WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    spark.catalog.dropTempView(view)
    return (
        cat.table("events_evo")
        .read()
        .select("event_id", "user_id", "event_type", "value", "score")
    )


@register(
    "sql_time_travel_select",
    """
    WITH a AS (SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents
               FROM events WHERE event_id % 3 = 0),
         b AS (SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents
               FROM events WHERE event_id % 3 = 1),
         ab AS (SELECT * FROM a UNION ALL SELECT * FROM b)
    SELECT 'restored' AS snap, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents FROM a
    UNION ALL
    SELECT 'tag2', CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT) FROM ab
    UNION ALL
    SELECT 'v2', CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT) FROM ab
    ORDER BY snap
    """,
    "SQL-dialect time travel (VERDICT r11 'What's missing #5'): one "
    "statement reads THREE snapshots of one table — `VERSION AS OF n`, "
    "`FOR TAG t`, and the post-RESTORE current state (`RESTORE TABLE "
    "... TO VERSION AS OF` as a statement) — each resolved through the "
    "catalog's table-reference rewrite onto pinned manifest versions; "
    "the oracle reconstructs every snapshot's content arithmetically.",
)
def sql_time_travel_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("tt_ev"), pk=["event_id"])
    for r in (0, 1, 2):  # v1 = slice a, v2 = a+b, v3 = a+b+c
        w.write(ev.filter(F.col("event_id") % 3 == r))
    cat.table("tt_ev").tag("keep2", 2)
    cat.sql("RESTORE TABLE tt_ev TO VERSION AS OF 1")  # current = slice a
    agg = "CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents"
    return cat.sql(
        f"SELECT 'restored' AS snap, {agg} FROM tt_ev "
        f"UNION ALL SELECT 'tag2', {agg} FROM tt_ev FOR TAG keep2 "
        f"UNION ALL SELECT 'v2', {agg} FROM tt_ev VERSION AS OF 2 "
        f"ORDER BY snap"
    )


@register(
    "sql_ctas_roundtrip",
    """
    WITH base AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
             event_id % 4 AS bucket
      FROM events WHERE event_id % 2 = 0
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM base WHERE bucket = 2 GROUP BY event_type ORDER BY event_type
    """,
    "CTAS as a statement: CREATE TABLE ... PARTITIONED BY ... AS SELECT "
    "runs the query through the catalog's pruned-view path and lands it "
    "via the writer append (footer stats harvested), making the result "
    "a first-class lake table — read back with a partition-pruned "
    "filter through the same SQL surface.",
)
def sql_ctas_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    view = f"ctas_src_{uuid.uuid4().hex[:8]}"
    ev.createOrReplaceTempView(view)
    cat.sql(
        f"CREATE TABLE ctas_t PARTITIONED BY (bucket) AS "
        f"SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents, "
        f"event_id % 4 AS bucket FROM {view} WHERE event_id % 2 = 0"
    )
    spark.catalog.dropTempView(view)
    return cat.sql(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(cents) AS BIGINT) AS sum_cents "
        "FROM ctas_t WHERE bucket = 2 GROUP BY event_type ORDER BY event_type"
    )


@register(
    "asof_latest_purchase",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id, r.purchase_value AS purchase_value_right
    FROM clicks l
    ASOF LEFT JOIN purchases r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "As-of (point-in-time) join: each click stamped with the latest prior "
    "purchase per user. Spark side is the union-and-sweep plan "
    "(operators/asof.py — one shuffle, no range-join explosion); oracle is "
    "DuckDB's native ASOF JOIN.",
)
def asof_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")  # deterministic: one right row per (key, ts)
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        payload=["purchase_value"],
    ).select("event_id", "user_id", "purchase_value_right")


@register(
    "asof_forward_next_purchase",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id, r.purchase_value AS next_purchase_value
    FROM clicks l
    ASOF LEFT JOIN purchases r ON l.user_id = r.user_id AND l.ts < r.ts
    """,
    "Forward-strict as-of join (DuckDB's `l.ts < r.ts` operator): each "
    "click stamped with the user's NEXT purchase strictly after it — the "
    "look-ahead direction attribution pipelines need. Same one-shuffle "
    "union-and-sweep plan, ts axis flipped (operators/asof.py).",
)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")  # deterministic: one right row per (key, ts)
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        payload=["purchase_value"], direction="forward", strict=True,
    ).select(
        "event_id", "user_id",
        F.col("purchase_value_right").alias("next_purchase_value"),
    )


_ASOF_CAT_MEMO: dict = {}


def _asof_catalog(spark: SparkSession, sf_dir: str) -> LakeCatalog:
    """One clicks/purchases lake per (session, sf_dir) for the ASOF SQL
    surface query — the build is paid once across bench/driver runs."""
    key = (id(spark), sf_dir)
    cat = _ASOF_CAT_MEMO.get(key)
    if cat is not None:
        try:
            cat.spark.sparkContext.applicationId  # session still alive?
            if (
                cat.table_exists("clicks")
                and cat.table_exists("purchases")
                and cat.table_exists("ev_small")
            ):
                return cat
        except Exception:
            pass
        _ASOF_CAT_MEMO.pop(key, None)
    ev = _t(spark, sf_dir, "events")
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_asof_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    LakeWriter(cat.table("clicks"), pk=["event_id"]).append(
        ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
    )
    LakeWriter(cat.table("purchases"), pk=["user_id", "ts"]).append(
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    LakeWriter(cat.table("ev_small"), pk=["event_id"]).append(
        ev.select("event_id", "user_id", "event_type", "value")
    )
    _ASOF_CAT_MEMO[key] = cat
    return cat


@register(
    "sql_asof_join_attribution",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.user_id, count(*) AS n_attributed,
           ROUND(sum(p.purchase_value), 6) AS sum_purchase
    FROM clicks c
    ASOF JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
    GROUP BY c.user_id
    """,
    "DuckDB ASOF JOIN SQL surface through LakeCatalog.sql: the literal "
    "DuckDB statement a reference user runs today parses and executes — "
    "inner row semantics (unmatched clicks drop), WHERE-less GROUP BY "
    "over the rewritten view, alias-qualified references resolved "
    "(lake/table.py _rewrite_asof_join onto operators/asof.py).",
)
def sql_asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle's FROM/ON/GROUP BY text runs verbatim in both engines;
    only the CTE heads differ (the Spark side reads the pre-built lake
    tables the CTEs describe)."""
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src,
        "sql_asof_attr",
        (),
        lambda: _asof_catalog(spark, sf_dir).sql(
            """
            SELECT c.user_id, count(*) AS n_attributed,
                   ROUND(sum(p.purchase_value), 6) AS sum_purchase
            FROM clicks c
            ASOF JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
            GROUP BY c.user_id
            """
        ),
    )


@register(
    "sql_duckdb_function_suite",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    )
    SELECT strftime(ts, '%a') AS dow, count(*) AS n_clicks,
           CAST(sum(array_length(string_split(strftime(ts, '%Y-%m-%d'), '-')))
             AS BIGINT) AS date_parts,
           CAST(sum(CASE WHEN regexp_matches(strftime(ts, '%d/%m'), '^0')
               THEN 1 ELSE 0 END) AS BIGINT) AS first9_days
    FROM clicks GROUP BY dow
    """,
    "DuckDB scalar-function surface through LakeCatalog.sql: strftime "
    "%-formats translate to Java patterns, string_split's literal "
    "separator regex-escapes, array_length/regexp_matches rename onto "
    "Spark builtins — the SELECT text runs verbatim in both engines "
    "(lake/table.py _rewrite_duckdb_functions).",
)
def sql_duckdb_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src,
        "sql_fn_suite",
        (),
        lambda: _asof_catalog(spark, sf_dir).sql(
            """
            SELECT strftime(ts, '%a') AS dow, count(*) AS n_clicks,
                   CAST(sum(array_length(string_split(strftime(ts, '%Y-%m-%d'), '-')))
                     AS BIGINT) AS date_parts,
                   CAST(sum(CASE WHEN regexp_matches(strftime(ts, '%d/%m'), '^0')
                       THEN 1 ELSE 0 END) AS BIGINT) AS first9_days
            FROM clicks GROUP BY dow
            """
        ),
    )


_STD_PIVOT_BODY = """
SELECT um, COALESCE(c_n, 0) AS c_n, ROUND(c_sv, 6) AS c_sv,
       COALESCE(p_n, 0) AS p_n, ROUND(p_sv, 6) AS p_sv
FROM (SELECT CAST(user_id %% 5 AS BIGINT) AS um, event_type, value
      FROM %s WHERE event_type IN ('click', 'purchase'))
PIVOT (count(*) AS n, sum(value) AS sv
       FOR event_type IN ('click' AS c, 'purchase' AS p))
"""


@register(
    "sql_std_pivot_clause",
    _STD_PIVOT_BODY % "events",
    "SQL-standard PIVOT clause (identical text both engines): "
    "relation PIVOT (aggs FOR col IN (values AS aliases)) — Spark and "
    "DuckDB both parse it natively and emit the same <alias>_<agg> "
    "column names; COALESCE aligns Spark's NULL-for-absent count with "
    "DuckDB's 0.",
)
def sql_std_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src,
        "sql_std_pivot",
        (),
        lambda: _asof_catalog(spark, sf_dir).sql(_STD_PIVOT_BODY % "ev_small"),
    )


@register(
    "sql_std_unpivot_clause",
    """
    WITH base AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
      FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT user_id, metric, val
    FROM base UNPIVOT (val FOR metric IN (n_events, n_distinct))
    """,
    "SQL-standard UNPIVOT clause (wide→long reshape, identical text "
    "both engines): relation UNPIVOT (value FOR name IN (cols)) — "
    "zero-shuffle Expand on the Spark side.",
)
def sql_std_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src,
        "sql_std_unpivot",
        (),
        lambda: _asof_catalog(spark, sf_dir).sql(
            """
            WITH base AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                     CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
              FROM clicks GROUP BY user_id
            )
            SELECT user_id, metric, val
            FROM base UNPIVOT (val FOR metric IN (n_events, n_distinct))
            """
        ),
    )


@register(
    "sql_attach_cross_lake",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    user_totals AS (
      SELECT user_id, ROUND(sum(value), 6) AS total_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT c.user_id, count(*) AS n_clicks,
           max(s.total_purchase) AS total_purchase
    FROM clicks c JOIN user_totals s ON c.user_id = s.user_id
    GROUP BY c.user_id
    """,
    "ATTACH: a second lake's table joins into this catalog's SQL as "
    "`alias.table` (read-only snapshot) — the engine-side analogue of "
    "the reference attaching its ducklake catalog to a DuckDB "
    "connection (DucklakeConnectionFactory.java:36-95); writes through "
    "the attachment refuse (lake/table.py attach/_rewrite_attached_refs).",
)
def sql_attach_cross_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _t(spark, sf_dir, "events")

    def build():
        cat = _asof_catalog(spark, sf_dir)
        side_dir = os.path.join(
            tempfile.gettempdir(), f"ducklake_att_{uuid.uuid4().hex[:8]}"
        )
        side = LakeCatalog(spark, side_dir)
        LakeWriter(side.table("user_totals"), pk=["user_id"]).append(
            src.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.round(F.sum("value"), 6).alias("total_purchase"))
        )
        if "stats" not in cat._attached:
            cat.sql(f"ATTACH '{side_dir}' AS stats")
        return cat.sql(
            """
            SELECT c.user_id, count(*) AS n_clicks,
                   max(s.total_purchase) AS total_purchase
            FROM clicks c JOIN stats.user_totals s ON c.user_id = s.user_id
            GROUP BY c.user_id
            """
        )

    return dedup_ops._memo_plan(src, "sql_attach_cross_lake", (), build)


@register(
    "sql_macro_expansion",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    )
    SELECT CAST(strftime(ts, '%H') AS INT) AS hour, count(*) AS n_clicks
    FROM clicks GROUP BY hour
    """,
    "DuckDB CREATE MACRO through catalog SQL: a stored parameterized "
    "snippet (itself using the strftime dialect surface) expands "
    "textually into the statement before planning — zero runtime "
    "cost, and the oracle is the hand-expanded SELECT "
    "(lake/table.py _expand_macros).",
)
def sql_macro_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _t(spark, sf_dir, "events")

    def build():
        cat = _asof_catalog(spark, sf_dir)
        cat.sql(
            "CREATE OR REPLACE MACRO hour_bucket(ts0) AS "
            "CAST(strftime(ts0, '%H') AS INT)"
        )
        return cat.sql(
            "SELECT hour_bucket(ts) AS hour, count(*) AS n_clicks "
            "FROM clicks GROUP BY hour"
        )

    return dedup_ops._memo_plan(src, "sql_macro_expansion", (), build)


@register(
    "sql_distinct_on_latest",
    """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    )
    SELECT DISTINCT ON (user_id) user_id, event_id
    FROM clicks
    ORDER BY user_id, ts DESC, event_id
    """,
    "DuckDB/Postgres DISTINCT ON through LakeCatalog.sql (latest click "
    "per user, ties broken by event_id for a total order): rewritten "
    "onto a row_number() = 1 window filter — one shuffle on the key, "
    "identical to the hand-written idiom (lake/table.py "
    "_rewrite_distinct_on).",
)
def sql_distinct_on_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src,
        "sql_distinct_on",
        (),
        lambda: _asof_catalog(spark, sf_dir).sql(
            """
            SELECT DISTINCT ON (user_id) user_id, event_id
            FROM clicks
            ORDER BY user_id, ts DESC, event_id
            """
        ),
    )


@register(
    "sql_update_returning",
    """
    SELECT event_id, user_id, ROUND(value * 1.1, 6) AS value
    FROM events
    WHERE event_type = 'purchase' AND user_id % 10 = 3
    """,
    "DuckDB's RETURNING tail on UPDATE through LakeCatalog.sql: the "
    "statement returns the post-assignment rows instead of a status "
    "row (pinned to the statement's snapshot version). INSERT and "
    "DELETE carry the same tail (lake/table.py dml()).",
)
def sql_update_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a purchases lake table, then runs ``UPDATE ... RETURNING``
    — the returned frame must equal the oracle's projection of the
    updated rows. Memoized so repeat calls don't re-apply the bump."""
    src = _t(spark, sf_dir, "events")

    def build():
        ev = src.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "value"
        )
        lake_dir = os.path.join(
            tempfile.gettempdir(), f"ducklake_ret_{uuid.uuid4().hex[:8]}"
        )
        cat = LakeCatalog(spark, lake_dir)
        LakeWriter(cat.table("ev_ret"), pk=["event_id"]).append(ev)
        return cat.sql(
            "UPDATE ev_ret SET value = ROUND(value * 1.1, 6) "
            "WHERE user_id % 10 = 3 "
            "RETURNING event_id, user_id, value"
        )

    return dedup_ops._memo_plan(src, "sql_update_returning", (), build)


# ---------------------------------------------------------------------------
# Grouping analytics: ROLLUP / CUBE / GROUPING SETS / PIVOT — the OLAP
# subtotal surface DuckDB users reach for on dashboards. All four stay
# entirely JVM-side (Expand + partial agg; one shuffle each) and scale
# as plain aggregates: Expand multiplies rows by the number of grouping
# sets BEFORE the map-side combine, so the shuffle carries one partial
# row per (set, group), not per input row.
# ---------------------------------------------------------------------------


@register(
    "rollup_returnflag_hierarchy",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           count(*) AS n, ROUND(sum(l_quantity), 6) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP subtotal hierarchy with GROUPING() disambiguation (a NULL "
    "group key vs a subtotal row) — Spark's Expand operator emits the "
    "3 grouping sets before the partial aggregate; one shuffle total.",
)
def rollup_returnflag_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
    )


@register(
    "cube_order_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           count(*) AS n, ROUND(sum(o_totalprice), 6) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "CUBE over (status, priority): all 4 grouping sets in one pass — "
    "same Expand + single-shuffle plan as ROLLUP, just more sets.",
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
    )


@register(
    "grouping_sets_event_matrix",
    """
    SELECT event_type, CAST(user_id % 7 AS BIGINT) AS user_mod,
           count(*) AS n, ROUND(sum(value), 6) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 7), ())
    """,
    "Explicit GROUPING SETS (per-type totals, per-user-mod totals, and "
    "a grand total in one scan) via DataFrame.groupingSets — the "
    "arbitrary-sets form ROLLUP/CUBE cannot express.",
)
def grouping_sets_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_mod", (F.col("user_id") % 7).cast("bigint")
    )
    return ev.groupingSets(
        [[F.col("event_type")], [F.col("user_mod")], []],
        F.col("event_type"),
        F.col("user_mod"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@register(
    "pivot_event_type_wide",
    """
    SELECT CAST(user_id % 10 AS BIGINT) AS user_mod,
           count(*) FILTER (WHERE event_type = 'click') AS click_n,
           count(*) FILTER (WHERE event_type = 'view') AS view_n,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
           ROUND(sum(value) FILTER (WHERE event_type = 'purchase'), 6)
             AS purchase_value
    FROM events
    GROUP BY 1
    """,
    "PIVOT (long→wide reshape) with a static value list, compiled to "
    "conditional aggregates in ONE pass — one shuffle on the group key "
    "only. Spark's groupBy().pivot() would plan TWO exchanges (an "
    "intermediate (group, pivot-value) aggregate, then the reshape); "
    "with the values known up front the FILTER-aggregate form is the "
    "strictly better 100 TB plan and what DuckDB's PIVOT compiles to.",
)
def pivot_event_type_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_mod", (F.col("user_id") % 10).cast("bigint")
    )

    def n_of(t):
        return F.count(F.when(F.col("event_type") == t, F.lit(1)))

    return ev.groupBy("user_mod").agg(
        n_of("click").alias("click_n"),
        n_of("view").alias("view_n"),
        n_of("purchase").alias("purchase_n"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
        ).alias("purchase_value"),
    )


@register(
    "range_join_click_attribution",
    """
    WITH signups AS (
      SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS s
      FROM events WHERE event_type = 'signup'
    ),
    clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'click'
    )
    SELECT signup_id, count(*) AS n_clicks, ROUND(sum(value), 6) AS sum_value
    FROM clicks c
    JOIN signups s ON c.user_id = s.user_id
                  AND c.ts BETWEEN s.s AND s.s + INTERVAL 1 DAY
    GROUP BY signup_id
    """,
    "Range (interval-containment) join via bucketization "
    "(operators/ranges.py): clicks attributed to the 24h window after "
    "each signup. Equi-join on (key, bucket) + exact filter — no "
    "theta-join nested loop.",
)
def range_join_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranges import interval_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    return (
        interval_join(clicks, signups, key="user_id", bucket_seconds=6 * 3600)
        .groupBy("signup_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def zorder_build(spark: SparkSession, sf_dir: str):
    """Build phase: load events into a lake table and re-layout with
    Z-order compaction. Returns the catalog the query phase scans."""
    from ..lake.maintenance import compact

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_z_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_z"), pk=["event_id"])
    w.append(ev)
    compact(cat.table("events_z"), zorder_by=["user_id", "value"], target_files=8)
    return cat


def zorder_query(cat) -> DataFrame:
    """Query phase: the stat-pruned conjunctive range scan + aggregate."""
    return (
        cat.table("events_z")
        .read(where="user_id BETWEEN 100 AND 200 AND value >= 0.5")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )



@register(
    "zorder_pruned_scan",
    """
    SELECT count(*) AS n, ROUND(sum(value), 6) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE user_id BETWEEN 100 AND 200 AND value >= 0.5
    """,
    "Z-order compaction + multi-column footer-stat data skipping: the "
    "predicate scan opens only manifest files whose [min,max] admit a "
    "match on EITHER clustered column (lake/skipping.py)",
)
def zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes events into a lake table, re-layouts it with
    compact(zorder_by=["user_id", "value"]), then answers a conjunctive
    range predicate through read(where=...) — manifest-level data
    skipping feeding an ordinary aggregate. Result must equal the
    oracle's direct scan of the raw parquet. bench.py times
    zorder_build / zorder_query separately. The one-time build is
    memoized per source (repeat calls reuse the compacted table)."""
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src, "zorder_scan", (), lambda: zorder_query(_zorder_catalog(spark, sf_dir))
    )


@register(
    "sql_pruned_point_lookup",
    """
    SELECT user_id, count(*) AS n, ROUND(sum(value), 6) AS sum_value
    FROM events
    WHERE user_id IN (5, 12) AND value >= 0.25
    GROUP BY user_id
    """,
    "SQL entry point with manifest-level file skipping: the statement's "
    "top-level WHERE conjuncts are attributed per table and each view "
    "is registered over the stat/Bloom-pruned file list "
    "(lake/sql_prune.py), so a selective SQL lookup opens the same "
    "files as read(where=) — closes the SQL-path pruning gap "
    "(VERDICT r7 #1).",
)
def sql_pruned_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loads events into a Z-ordered lake table (shared memoized build
    with zorder_pruned_scan), then answers a selective aggregate through
    ``LakeCatalog.sql`` — the SQL text itself is the only pruning input.
    Reference parity: the reference hands SQL to DuckDB whose optimizer
    prunes via ducklake file stats (`DucklakeTableManager.java:161-164`);
    here lake/sql_prune.py + lake/skipping.py perform that role."""
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src,
        "sql_point_lookup",
        (),
        lambda: _zorder_catalog(spark, sf_dir).sql(
            """
            SELECT user_id, count(*) AS n, ROUND(sum(value), 6) AS sum_value
            FROM events_z
            WHERE user_id IN (5, 12) AND value >= 0.25
            GROUP BY user_id
            """
        ),
    )


@register(
    "sql_catalog_join_pruned",
    """
    WITH users AS (
      SELECT user_id, count(*) AS n_events,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, count(*) AS n, max(u.n_events) AS user_events,
           max(u.sum_cents) AS user_cents
    FROM events e JOIN users u ON e.user_id = u.user_id
    WHERE e.user_id BETWEEN 5 AND 12 AND e.value >= 0.5 AND u.n_events >= 2
    GROUP BY e.user_id
    """,
    "SQL entry point, join form: alias-qualified WHERE conjuncts are "
    "attributed per table and BOTH joined views register over pruned "
    "file lists (lake/sql_prune.py) — the `lake.main.` namespace the "
    "reference exposes to DuckDB also resolves.",
)
def sql_catalog_join_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A two-table join through ``LakeCatalog.sql`` using the
    reference's ``lake.main.<table>`` naming: per-alias WHERE conjunct
    attribution must prune each side's file list independently, and the
    namespace prefix must resolve to the catalog's tables
    (`DucklakeTableManager.java:161-164` parity)."""
    src = _t(spark, sf_dir, "events")

    def build():
        cat = _zorder_catalog(spark, sf_dir)
        if not cat.table_exists("users_z"):
            users = src.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                    "sum_cents"
                ),
            )
            LakeWriter(cat.table("users_z"), pk=["user_id"]).append(users)
        return cat.sql(
            """
            SELECT e.user_id, count(*) AS n, max(u.n_events) AS user_events,
                   max(u.sum_cents) AS user_cents
            FROM lake.main.events_z e JOIN lake.main.users_z u
              ON e.user_id = u.user_id
            WHERE e.user_id BETWEEN 5 AND 12 AND e.value >= 0.5
              AND u.n_events >= 2
            GROUP BY e.user_id
            """
        )

    return dedup_ops._memo_plan(src, "sql_join_pruned", (), build)


_ZORDER_CAT_MEMO: dict = {}


def _zorder_catalog(spark: SparkSession, sf_dir: str) -> LakeCatalog:
    """One Z-ordered events lake per (session, sf_dir): zorder_pruned_scan
    and sql_pruned_point_lookup share the build so bench/driver runs pay
    the layout once."""
    key = (id(spark), sf_dir)
    cat = _ZORDER_CAT_MEMO.get(key)
    if cat is not None:
        try:
            cat.spark.sparkContext.applicationId  # session still alive?
            if cat.table_exists("events_z"):
                return cat
        except Exception:
            pass
        _ZORDER_CAT_MEMO.pop(key, None)
    cat = zorder_build(spark, sf_dir)
    _ZORDER_CAT_MEMO[key] = cat
    return cat


@register(
    "partition_cells_events",
    """
    SELECT CAST(EXTRACT(year  FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS y,
           CAST(EXTRACT(month FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS m,
           CAST(EXTRACT(day   FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS d,
           count(*) AS n, ROUND(sum(value), 6) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    "Temporal partition expressions year()/month()/day() (B12) as grouping cells",
)
def partition_cells_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.year("ts").cast("int").alias("y"),
            F.month("ts").cast("int").alias("m"),
            F.dayofmonth("ts").cast("int").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


@register(
    "json_extract_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
    FROM events GROUP BY 1
    """,
    "Schemaless JSON payload extraction (A3/B9 query side)",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "nested_json_roundtrip",
    """
    SELECT event_type AS t,
           count(*) AS n,
           CAST(sum(user_id) AS BIGINT) AS sum_uid,
           ROUND(sum(value), 2) AS sum_v,
           CAST(sum(event_id % 7) AS BIGINT) AS sum_tag0,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    "Nested complex-type round-trip (B9): struct<struct, array, map> "
    "payload serialized to JSON text by the lake writer, read back, and "
    "re-extracted — aggregates must equal the oracle's direct scan, "
    "proving serialize/extract fidelity at every nesting level "
    "(SinkRecordToArrowConverterTest.java:58-219 parity).",
)
def nested_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _t(spark, sf_dir, "events")
    return dedup_ops._memo_plan(
        src,
        "nested_roundtrip",
        (),
        lambda: nested_roundtrip_query(nested_roundtrip_build(spark, sf_dir)),
    )


def nested_roundtrip_build(spark: SparkSession, sf_dir: str) -> LakeCatalog:
    """Build side of ``nested_json_roundtrip``: serialize the nested
    payload through the lake writer (the one-time table construction;
    split out in bench.py so read-path regressions stay visible)."""
    ev = _t(spark, sf_dir, "events")
    nested = ev.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("t"),
            F.struct(
                F.col("user_id").alias("uid"), F.col("value").alias("v")
            ).alias("who"),
            F.array(
                (F.col("event_id") % 7).cast("long"),
                (F.col("event_id") % 11).cast("long"),
            ).alias("tags"),
            F.create_map(
                F.lit("k"), F.get_json_object("props", "$.k").cast("long")
            ).alias("kv"),
        ).alias("payload"),
    )
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_n_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_nested"), pk=["event_id"])
    w.append(nested)  # complex payload → JSON text column (B9)
    return cat


NESTED_PAYLOAD_DDL = (
    "t STRING, who STRUCT<uid: BIGINT, v: DOUBLE>, "
    "tags ARRAY<BIGINT>, kv MAP<STRING, BIGINT>"
)


def nested_roundtrip_query(cat: LakeCatalog) -> DataFrame:
    """One ``from_json`` parse per row (schema known), then field selects —
    five ``get_json_object`` calls would re-parse the same payload five
    times per row, a real constant factor on wide payloads at corpus
    scale."""
    back = cat.table("events_nested").read()
    p = F.from_json("payload", NESTED_PAYLOAD_DDL)
    return (
        back.select(
            p.alias("p"),
        )
        .select(
            F.col("p.t").alias("t"),
            F.col("p.who.uid").alias("uid"),
            F.col("p.who.v").alias("v"),
            F.col("p.tags").getItem(0).alias("tag0"),
            F.col("p.kv").getItem("k").alias("k"),
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("uid").alias("sum_uid"),
            F.round(F.sum("v"), 2).alias("sum_v"),
            F.sum("tag0").alias("sum_tag0"),
            F.sum("k").alias("sum_k"),
        )
    )


@register(
    "timestamp_parse_roundtrip",
    r"""
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S'),
                                       '%Y-%m-%dT%H:%M:%S')
                          = date_trunc('second', CAST(ts AS TIMESTAMP))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_naive_roundtrip,
           CAST(sum(CASE WHEN strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') || '+0000',
                                       '%Y-%m-%dT%H:%M:%S%z')
                          = date_trunc('second', CAST(ts AS TIMESTAMP))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_compact_offset_roundtrip
    FROM events
    """,
    "ISO-8601 detection/parse matrix (B5-B7): naive-as-UTC and ±hhmm compact offsets",
)
def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    iso_naive = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    iso_compact = F.concat(iso_naive, F.lit("+0000"))
    sec = F.date_trunc("second", F.col("ts"))
    return ev.select(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(parse_iso_timestamp(iso_naive) == sec, 1).otherwise(0))
        .cast("long")
        .alias("n_naive_roundtrip"),
        F.sum(F.when(parse_iso_timestamp(iso_compact) == sec, 1).otherwise(0))
        .cast("long")
        .alias("n_compact_offset_roundtrip"),
    )


@register(
    "schema_promotion_union",
    """
    SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS total FROM (
      SELECT CAST(l_linenumber AS BIGINT) AS v FROM lineitem
      UNION ALL
      SELECT o_orderkey AS v FROM orders) t
    """,
    "Schema unification: INT32+INT64 batches promote to BIGINT (C4 ladder)",
)
def schema_promotion_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "lineitem").select(F.col("l_linenumber").alias("v"))
    b = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("v"))
    unified = unify_schemas([a.schema, b.schema])  # drives the real promotion ladder
    a2 = a.select(*[F.col(f.name).cast(f.dataType) for f in unified.fields])
    b2 = b.select(*[F.col(f.name).cast(f.dataType) for f in unified.fields])
    return a2.unionByName(b2).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("total")
    )


# ---------------------------------------------------------------------------
# C. LLM-pipeline operators (beyond-parity, BASELINE.json north star)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_stats",
    """
    SELECT count(*) AS total_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS distinct_texts,
           CAST(count(*) - count(DISTINCT text) AS BIGINT) AS dup_docs
    FROM documents
    """,
    "Exact dedup summary over the documents corpus",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct("text").cast("long").alias("distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).cast("long").alias("dup_docs"),
    )


@register(
    "dedup_keep_first",
    """
    SELECT CAST(min(doc_id) AS BIGINT) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
    "Exact dedup: canonical keeper per identical text (hash-groupBy at scale)",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # Group on a 256-bit content hash, not the full text — at 100 TB the
    # shuffle moves 32-byte keys instead of documents.
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.min("doc_id").cast("long").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keeper_id", "n_copies")
    )


@register(
    "text_token_stats",
    r"""
    SELECT lang,
           CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS total_tokens,
           count(*) AS n_docs,
           avg(n_chars) AS avg_chars
    FROM documents GROUP BY lang
    """,
    "Token counting per language (text-analysis operator)",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(token_count_col(F.col("text"))).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
    )


@register(
    "text_quality_scores",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER) AS n_words,
           ROUND(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                      w -> w IN ('the','a','of','to','and','in','is'))) AS DOUBLE)
                 / len(string_split_regex(trim(lower(text)), '\s+')), 6) AS stopword_ratio
    FROM documents
    """,
    "Per-document quality signals: word count + stopword ratio",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_words"),
        stopword_ratio_col(F.col("text"), EN_STOPWORDS).alias("stopword_ratio"),
    )


@register(
    "similarity_topk",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS embedding
               FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        (SELECT embedding FROM q)), 6) AS cos_sim
    FROM embeddings e
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
    "Brute-force cosine top-k over embedding column (ANN exact baseline)",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb, query, k=10, exclude_ids=[0])


@register(
    "percentile_order_values",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    "Exact interpolated percentiles per group (sort-based agg)",
)
def percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "cube_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "CUBE grouping sets (all 2^k aggregation cells)",
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "semi_join_priority_orders",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4-style EXISTS → left-semi join + aggregate",
)
def semi_join_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    late = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "anti_join_idle_customers",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    "NOT EXISTS → left-anti join: customers with no high-value orders, per segment",
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "outer_join_nation_activity",
    """
    SELECT n_name,
           CAST(count(c_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "Left-outer join preserving empty dims (null-safe counts)",
)
def outer_join_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").cast("long").alias("n_customers"),
            F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
        )
    )


# ---------------------------------------------------------------------------
# D. Fuzzy dedup / ANN / text-analysis / event-time (beyond-parity, phase 5)
#    LSH determinism contract: every hash is md5-derived so the Spark and
#    DuckDB pipelines bucket identically — comparisons are exact, not
#    statistical (operators/dedup.py).
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_lsh",
    dedup_ops.minhash_dedup_pairs_sql(),
    "MinHash(16)+LSH(4×4) near-dup pairs, exact-Jaccard verified (≥0.7)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_ops.minhash_dedup_pairs(_t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_hamming",
    f"""
    WITH pairs AS ({dedup_ops.simhash_near_pairs_sql()})
    SELECT hamming, count(*) AS n_pairs FROM pairs GROUP BY hamming
    """,
    "SimHash(32-bit) banded near-dup pairs, histogram by hamming distance ≤3",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_ops.simhash_near_pairs(_t(spark, sf_dir, "documents"))
    return pairs.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "dedup_ngram_jaccard",
    dedup_ops.ngram_jaccard_pairs_sql(),
    "Exact word-3-gram Jaccard pairs (≥0.5) within lang blocks — MinHash's exact baseline",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_ops.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


@register(
    "dedup_embedding_cosine",
    dedup_ops.embedding_neardup_pairs_sql(threshold=0.4),
    "Embedding near-dup pairs (cosine ≥0.4) within label blocks",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_ops.embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


#    SemDeDup (Abbas et al. 2023): cluster the embedding space, then
#    prune within-cluster semantic duplicates, keeping one representative
#    per near-dup ball. Deterministic variant: fixed seeded centroids
#    (training them is kmeans_embedding_clusters' job), keep-lowest-id.
SEM_THRESHOLD = 0.35  # ~15% prune rate on the synthetic corpus
SEM_CENTROIDS: list[list[float]] = []


def _sem_centroids() -> list[list[float]]:
    from ..operators.similarity import _unit

    if not SEM_CENTROIDS:
        SEM_CENTROIDS.extend(
            _unit(c) for c in _lcg_hyperplanes(dim=64, n=NUM_CELLS, seed=29)
        )
    return SEM_CENTROIDS


def _semdedup_oracle() -> str:
    from ..operators.similarity import ivf_assign_sql, srp_bucket_sql

    cell = ivf_assign_sql("CAST(embedding AS DOUBLE[])", _sem_centroids())
    sub = srp_bucket_sql("base.v", dedup_ops._guard_planes(64))
    return f"""
    WITH base AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
             {cell} AS cell
      FROM embeddings
    ),
    n AS (SELECT cell, COUNT(*) AS n_blk FROM base GROUP BY cell),
    v AS (
      SELECT base.cell, base.id, base.v,
             CASE WHEN n.n_blk > {dedup_ops.MAX_EMB_BLOCK} THEN {sub}
                  ELSE 0 END AS sub
      FROM base JOIN n USING (cell)
    ),
    pruned AS (
      SELECT DISTINCT b.id
      FROM v a JOIN v b ON a.cell = b.cell AND a.sub = b.sub
      WHERE a.id < b.id
        AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= {SEM_THRESHOLD}
    )
    SELECT base.cell, COUNT(*) AS n_members,
           CAST(SUM(CASE WHEN pruned.id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned,
           ROUND(SUM(CASE WHEN pruned.id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS prune_rate
    FROM base LEFT JOIN pruned ON base.id = pruned.id
    GROUP BY base.cell
    """


@register(
    "semdedup_prune",
    None,  # oracle attached below (needs centroid/plane literal builders)
    "SemDeDup semantic pruning: assign embeddings to coarse cells, drop "
    "within-cell cosine near-dups (keep-lowest-id) — per-cell members, "
    "pruned count, prune rate",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-prune semantic dedup (SemDeDup). Scale shape: the
    cell assignment is one map-side expression (broadcast centroid
    literals, no shuffle); the quadratic prune term is bounded by the
    (cell, SRP-sub-bucket) blocking that embedding_neardup_pairs
    already enforces above MAX_EMB_BLOCK rows — the same cap that
    holds dedup_embedding_cosine sub-linear at sf10. At 100 TB cells
    come from kmeans_embedding_clusters' centroids and the per-cell
    work distributes; the keep-lowest-id rule replaces the paper's
    keep-farthest-from-centroid for cross-engine determinism."""
    from ..operators.similarity import with_ivf_cell

    emb = _t(spark, sf_dir, "embeddings")
    cells = with_ivf_cell(
        emb.select("vec_id", "embedding"), "embedding", _sem_centroids(), out="cell"
    )
    pairs = dedup_ops.embedding_neardup_pairs(
        cells, threshold=SEM_THRESHOLD, block_col="cell"
    )
    pruned = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    flagged = cells.join(
        pruned.withColumn("__p", F.lit(1)), "vec_id", "left"
    )
    return (
        flagged.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce("__p", F.lit(0))).cast("long").alias("n_pruned"),
        )
        .withColumn(
            "prune_rate",
            F.round(F.col("n_pruned") / F.col("n_members").cast("double"), 6),
        )
    )


QUERIES["semdedup_prune"].oracle = _semdedup_oracle()


@register(
    "ann_lsh_topk",
    ann_lsh_topk_sql(dim=64),
    "ANN: signed-random-projection bucket prune + exact cosine top-k within bucket",
)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ann_lsh_topk(emb, query, k=10, exclude_ids=[0])


IVF_CENTROIDS = _lcg_hyperplanes(dim=64, n=NUM_CELLS, seed=11)


@register(
    "ann_ivf_topk",
    ivf_topk_sql(IVF_CENTROIDS),
    "ANN via IVF coarse quantizer: nearest-centroid cell probe + exact cosine top-k",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ivf_topk(emb, query, IVF_CENTROIDS, k=10, exclude_ids=[0])


def ivf_index_build(spark: SparkSession, sf_dir: str):
    """Build phase: cell-partitioned IVF lake index over embeddings.
    Returns (table, query vector) for the probe phase."""
    from ..operators.similarity import build_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_ivf_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    t = cat.table("emb_ivf")
    build_ivf_index(t, emb, IVF_CENTROIDS)
    return t, query


def ivf_index_query(t, query) -> DataFrame:
    """Query phase: nprobe-cell manifest-pruned exact top-k."""
    from ..operators.similarity import ivf_indexed_topk

    return ivf_indexed_topk(t, query, IVF_CENTROIDS, k=10, nprobe=2, exclude_ids=[0])



@register(
    "ann_ivf_indexed_topk",
    ivf_indexed_topk_sql(IVF_CENTROIDS, nprobe=2),
    "IVF ANN over a cell-partitioned lake index: the nprobe-cell probe is "
    "manifest partition pruning (build_ivf_index / ivf_indexed_topk) — at "
    "100 TB the scan opens nprobe/NUM_CELLS of the corpus regardless of size",
)
def ann_ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bench.py times ivf_index_build / ivf_index_query separately. The
    one-time index build is memoized per source — the point of an index
    is to be built once and probed many times."""
    src = _t(spark, sf_dir, "embeddings")
    return dedup_ops._memo_plan(
        src,
        "ivf_indexed",
        (),
        lambda: ivf_index_query(*ivf_index_build(spark, sf_dir)),
    )


@register(
    "lang_id_confusion",
    f"""
    SELECT lang, {lang_id_sql('text')} AS pred_lang, count(*) AS n
    FROM documents GROUP BY lang, pred_lang
    """,
    "Marker-token language-ID vs stored label (confusion cells)",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-parallel marker counting instead of the per-row CASE chain:
    tokens explode once, a broadcast (marker, lang) table joins hits
    (a token in two languages' sets — 'la' es/fr — counts for both,
    same as the per-set filters), and the per-doc argmax window picks
    the winner with the (hits DESC, lang ASC) tie-break; docs with no
    marker hits come back as 'und' via the left join. The inline
    `lang_id_col` CASE repeats its token-split per branch (~35 subtree
    copies/row); this shape evaluates the split once and scales as one
    token-keyed broadcast join + doc-keyed window."""
    from ..operators.text import LANG_MARKERS

    docs = _t(spark, sf_dir, "documents")
    markers = local_rows_df(spark, 
        [(m, lang) for lang, ms in LANG_MARKERS.items() for m in ms],
        "w string, mlang string",
    )
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    )
    hits = (
        tok.join(F.broadcast(markers), "w")
        .groupBy("doc_id", "lang", "mlang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    win = W.partitionBy("doc_id").orderBy(
        F.col("n_hits").desc(), F.col("mlang").asc()
    )
    best = (
        hits.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("mlang").alias("pred_lang"))
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "lang", F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang")
        )
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "doc_fingerprint_groups",
    f"""
    SELECT count(*) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_fingerprints,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_collisions
    FROM (SELECT {fingerprint_sql('text')} AS fp FROM documents)
    """,
    "Winnowing-style bottom-k fingerprint: collision summary over the corpus",
)
def doc_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    # single-file scan → spread the per-char hashing across all cores
    return docs.repartition(n_part).select(fingerprint_col(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_fingerprints"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).cast("long").alias("n_collisions"),
    )


@register(
    "windowed_event_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           count(*) AS n, ROUND(sum(value), 6) AS sum_value
    FROM events GROUP BY 1
    """,
    "Tumbling 1-hour event-time windows (E9 extension; streaming-ready agg)",
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "session_windows",
    """
    WITH marked AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '6 hours'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           CAST(count(DISTINCT session_no) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
    "Session windows (6h gap) per user — session_window() in Spark vs gaps-and-islands oracle",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.countDistinct("w.start").cast("long").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


@register(
    "multimodal_pipeline",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             octet_length(encode(text)) AS n,
             text
      FROM documents
    )
    SELECT kind, count(*) AS n_items, CAST(sum(n) AS BIGINT) AS total_bytes,
           CAST(sum(CASE kind
             WHEN 'image' THEN
               list_sum(list_transform(generate_series(1, len(text)),
                                       i -> ascii(substr(text, i, 1)))) % 1000003
             WHEN 'audio' THEN n
             ELSE CAST(floor((n * 4 - 1) / 1000) AS BIGINT) + 1
           END) AS BIGINT) AS kind_metric
    FROM m GROUP BY kind
    """,
    "Multimodal columns: binary payload + typed meta; mapInPandas decode stub, "
    "metadata-only frame sampling — per-kind summary (deterministic fake codec)",
)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        audio_stats_col,
        fake_decode_image,
        media_from_documents,
        sample_frames,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    sizes = media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").cast("long").alias("total_bytes"),
    )
    img = (
        fake_decode_image(media.filter(F.col("kind") == "image"))
        .agg(F.sum("byte_sum").cast("long").alias("kind_metric"))
        .select(F.lit("image").alias("kind"), "kind_metric")
    )
    aud = (
        media.filter(F.col("kind") == "audio")
        .select(audio_stats_col(F.col("meta")).alias("st"))
        .agg(F.sum("st.n_samples").cast("long").alias("kind_metric"))
        .select(F.lit("audio").alias("kind"), "kind_metric")
    )
    vid = (
        sample_frames(media, every_ms=1000)
        .agg(F.count(F.lit(1)).cast("long").alias("kind_metric"))
        .select(F.lit("video").alias("kind"), "kind_metric")
    )
    metrics = img.unionByName(aud).unionByName(vid)
    return sizes.join(F.broadcast(metrics), "kind").select(
        "kind", "n_items", "total_bytes", "kind_metric"
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
      AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 forecasting-revenue change: tight multi-conjunct filter + "
    "single agg — the canonical predicate-pushdown/column-prune showcase",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q17_small_qty_revenue",
    """
    WITH pq AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq USING (l_partkey)
    WHERE p_brand IN ('Brand#12', 'Brand#23') AND l_quantity < qty_thresh
    """,
    "TPC-H Q17 small-quantity revenue: correlated per-part average "
    "threshold, decorrelated into a pre-aggregation join",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the brand dimension broadcast-semi-joins lineitem
    FIRST, so the per-part average aggregates only the ~2/25 of rows
    whose part survives (every lineitem of a surviving part is in the
    subset, so the average is identical to the oracle's full-table CTE);
    the threshold join then co-partitions on l_partkey. avg(l_quantity)
    sums integer-valued doubles — exact in any order, so the strict
    comparison agrees with DuckDB bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    brands = part.filter(F.col("p_brand").isin("Brand#12", "Brand#23")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    li_b = li.join(F.broadcast(brands), "l_partkey")
    pq = li_b.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li_b.join(pq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "user_session_gaps",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    d AS (
      SELECT event_type,
             (us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id))
               // 1000000 AS gap_s
      FROM e
    )
    SELECT event_type, count(*) AS n_gaps,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s,
           CAST(sum(gap_s) AS BIGINT) AS total_gap_s
    FROM d WHERE gap_s IS NOT NULL GROUP BY event_type
    """,
    "Per-user inter-event gaps via lag() window (sessionization signal); "
    "deterministic (us, event_id) tie-break inside each user partition",
)
def user_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps in whole seconds: summing raw µs gaps would overflow the
    2^53 exact-double range under DuckDB's order-insensitive SUM, while
    second-granularity sums stay exact integers in both engines."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    return (
        ev.select(
            "event_type",
            "event_id",
            "user_id",
            epoch_us_col(ev, "ts").alias("us"),
        )
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn("gap_s", F.expr("(us - prev_us) div 1000000"))
        .filter(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.max("gap_s").alias("max_gap_s"),
            F.sum("gap_s").alias("total_gap_s"),
        )
    )


@register(
    "text_repetition_ratio",
    f"""
    SELECT lang, count(*) AS n_docs,
           ROUND(AVG(rep), 6) AS avg_rep,
           ROUND(MAX(rep), 6) AS max_rep
    FROM (SELECT lang, {repetition_ratio_sql('text')} AS rep FROM documents)
    WHERE rep IS NOT NULL GROUP BY lang
    """,
    "Repeated-bigram fraction per document, aggregated per language — "
    "the standard boilerplate/degenerate-text quality signal",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise scale plan (the minhash_signatures shape): repartition →
    posexplode words → lead() composes bigrams → ONE md5 per bigram →
    per-doc count/count_distinct → per-lang rollup. No per-doc arrays,
    no higher-order lambdas (array-form ``repetition_ratio_col`` is the
    per-row variant; its in-lambda token re-evaluation is quadratic in
    doc length). The window sort shares the explode's doc_id hash
    partitioning, so bigram composition adds no shuffle; docs under 2
    tokens emit no bigram rows, matching the oracle's NULL filter."""
    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tok = docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.posexplode(words).alias("pos", "w")
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.withColumn("w1", F.lead("w", 1).over(win))
        .filter(F.col("w1").isNotNull())
        .select(
            "doc_id",
            "lang",
            (
                dedup_ops.h60_col(F.concat_ws(" ", "w", "w1")) % dedup_ops.MERSENNE
            ).alias("h"),
        )
    )
    per_doc = grams.groupBy("doc_id", "lang").agg(
        F.round(
            F.lit(1.0)
            - F.countDistinct("h").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("rep")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("rep"), 6).alias("avg_rep"),
        F.round(F.max("rep"), 6).alias("max_rep"),
    )


CONTAM_BENCH_MOD = 97  # doc_id % MOD == 0 plays the held-out benchmark set
CONTAM_THRESHOLD = 0.1  # shingle-overlap fraction that flags contamination


@register(
    "contamination_overlap",
    f"""
    WITH w AS (
      SELECT doc_id, lang, {dedup_ops.WORDS_SQL.format(text='text')} AS w
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang, {dedup_ops.shingle_hash_set_sql('w')} AS sh FROM w
    ),
    ex AS (
      SELECT doc_id, lang, len(sh) AS n_sh, unnest(sh) AS h FROM s
    ),
    bench AS (
      SELECT DISTINCT h FROM ex WHERE doc_id % {CONTAM_BENCH_MOD} = 0
    ),
    hits AS (
      SELECT doc_id, lang, n_sh, count(*) AS n_hit
      FROM ex JOIN bench USING (h)
      WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
      GROUP BY doc_id, lang, n_sh
    )
    SELECT lang,
           count(*) AS n_contaminated,
           ROUND(MAX(CAST(n_hit AS DOUBLE) / n_sh), 6) AS max_frac,
           CAST(SUM(n_hit) AS BIGINT) AS total_hits
    FROM hits
    WHERE CAST(n_hit AS DOUBLE) / n_sh >= {CONTAM_THRESHOLD}
    GROUP BY lang
    """,
    "Benchmark-contamination check: corpus docs whose shingle sets "
    "overlap a held-out benchmark set above a threshold (the n-gram "
    "decontamination pass of a training-data pipeline)",
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the benchmark shingle set is tiny next to the corpus
    → collected into a broadcast hash join against the exploded corpus
    shingles. Shingle generation is row-wise (explode → lead() window →
    ONE md5 per shingle; exploding a computed HOF array re-runs the
    generator per OUTPUT row — measured 16-30 s vs <1 s at sf0.1), and
    the per-doc dedup is a ``collect_set`` whose groupBy REUSES the
    window's doc_id hash-partitioning — no global distinct shuffle of
    all shingle rows (r4 shape: distinct + two more (doc,lang) shuffles;
    measured 0.86 s → 0.71 s under the bench protocol, and at corpus
    scale the removed shuffle is O(total shingles)). The persisted
    per-doc sets are bounded by document length. The md5-derived hashes
    are bit-identical to the oracle's (h60), so overlap counts compare
    exactly."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_ops._memo_plan(
        docs, "contamination_overlap", (), lambda: _build_contamination(spark, docs)
    )


def _build_contamination(spark: SparkSession, docs: DataFrame) -> DataFrame:
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tok = docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.posexplode(words).alias("pos", "w")
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    sh_set = dedup_ops._persist(
        tok.withColumn("w1", F.lead("w", 1).over(win))
        .withColumn("w2", F.lead("w", 2).over(win))
        .filter(F.col("w2").isNotNull())
        .select(
            "doc_id",
            "lang",
            (
                dedup_ops.h60_col(F.concat_ws(" ", "w", "w1", "w2"))
                % dedup_ops.MERSENNE
            ).alias("h"),
        )
        .groupBy("doc_id", "lang")  # reuses the window's doc_id partitioning
        .agg(F.collect_set("h").alias("hs"))
        .withColumn("n_sh", F.size("hs"))
    )
    bench = (
        sh_set.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    hits = (
        sh_set.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
        .select("doc_id", "lang", "n_sh", F.explode("hs").alias("h"))
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id", "lang", "n_sh")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    frac = F.col("n_hit").cast("double") / F.col("n_sh")
    return (
        hits.filter(frac >= CONTAM_THRESHOLD)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            F.round(F.max(frac), 6).alias("max_frac"),
            F.sum("n_hit").alias("total_hits"),
        )
    )


@register(
    "ann_quantized_topk",
    None,  # oracle attached below (operator SQL builder)
    "Int8-quantized brute cosine top-k: corpus stored as int8+scale "
    "(4x smaller), scored asymmetric against the full-precision query",
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dequantize_int8_frame

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    dq = dequantize_int8_frame(
        emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    )
    return cosine_topk(dq, qvec, k=10)


@register(
    "ann_pq_topk",
    None,  # oracle attached below (operator SQL builder)
    "Product-quantized ANN top-k: 8 subspaces x 16 seeded integer "
    "codewords, asymmetric ADC scoring (8 table lookups per row) — "
    "the 4-bytes-per-vector storage path of an IVF-PQ index",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode is map-side and write-time in a real index, so it is
    memoized per source (the codes persist; every query re-reads them
    — same convention as ann_ivf_indexed_topk's build). Scoring reads
    32 small-int codes per vector and ranks via per-partition partial
    top-k. At 100 TB the PQ codes are 16x smaller than the float32
    embeddings — the scan is the win, the ADC math is noise.
    Exactness: integer floor-quantization + integer codebooks, so the
    DuckDB twin matches bit-for-bit (operators/similarity.py:pq_topk)."""
    from ..operators.similarity import pq_encode, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    enc = dedup_ops._memo_plan(
        emb,
        "pq_encoded",
        (),
        lambda: dedup_ops._persist(
            pq_encode(emb.select("vec_id", "embedding"))
        ),
    )
    return pq_topk(enc, qvec, k=10, exclude_ids=[0], pre_encoded=True)


@register(
    "ann_ivfpq_topk",
    None,  # oracle attached below (operator SQL builder)
    "Full IVF-PQ index query: nprobe-cell manifest pruning over a "
    "cell-partitioned lake index that stores only PQ codes (no raw "
    "vectors), ADC scoring on the survivors",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FAISS-layout composition of ann_ivf_indexed_topk (coarse
    pruning) and ann_pq_topk (code storage): query cost is independent
    of corpus bytes — files prune by cell, rows cost M small ints.
    Index build is memoized per source, same as ann_ivf_indexed_topk
    (an index is built once, probed many times)."""
    from ..operators.similarity import build_ivfpq_index, ivfpq_indexed_topk

    src = _t(spark, sf_dir, "embeddings")

    def _build():
        emb = src
        query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        lake_dir = os.path.join(
            tempfile.gettempdir(), f"ducklake_ivfpq_{uuid.uuid4().hex[:8]}"
        )
        cat = LakeCatalog(spark, lake_dir)
        t = cat.table("emb_ivfpq")
        build_ivfpq_index(t, emb, IVF_CENTROIDS)
        return ivfpq_indexed_topk(
            t, query, IVF_CENTROIDS, k=10, nprobe=2, exclude_ids=[0]
        )

    return dedup_ops._memo_plan(src, "ivfpq_indexed", (), _build)


def _attach_similarity_oracles() -> None:
    from ..operators.similarity import (
        ivfpq_indexed_topk_sql,
        pq_topk_sql,
        quantized_topk_sql,
    )

    QUERIES["ann_quantized_topk"].oracle = quantized_topk_sql()
    QUERIES["ann_pq_topk"].oracle = pq_topk_sql()
    QUERIES["ann_ivfpq_topk"].oracle = ivfpq_indexed_topk_sql(
        IVF_CENTROIDS, nprobe=2
    )


_attach_similarity_oracles()


@register(
    "text_normalize_hashsum",
    None,  # oracle attached below (needs operator SQL builders)
    "Canonical text normalization (lower, punctuation strip, whitespace "
    "collapse) proven byte-identical via per-lang hash sums",
)
def text_normalize_hashsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive equality proof: sum of bounded per-doc hashes
    of the NORMALIZED text per language — any engine divergence in the
    normalization (regex dialect, trim semantics) breaks the sum."""
    from ..operators.text import normalize_text_col

    docs = _t(spark, sf_dir, "documents")
    h = dedup_ops.h60_col(normalize_text_col(F.col("text"))) % dedup_ops.MERSENNE
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h).alias("norm_hashsum"),
    )


@register(
    "corpus_quality_filter",
    None,  # oracle attached below
    "Composite C4/Gopher-style quality gate (token bounds, mean word "
    "length, repetition cap) — per-lang keep/drop counts + kept tokens",
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise scale plan (the text_repetition_ratio shape): the
    repetition signal comes from posexplode → lead() → one md5 per
    bigram → per-doc distinct/count — NOT the array-lambda
    ``quality_keep_col`` form, whose in-lambda token re-evaluation is
    quadratic in doc length (measured 6.9 s vs 0.8 s at sf0.1). Token
    count and mean word length are linear single-pass array aggregates
    computed alongside; everything shares one doc_id hash partitioning,
    so the rep join adds no shuffle."""
    from ..operators.text import (
        QUALITY_MAX_REPETITION,
        QUALITY_MAX_TOKENS,
        QUALITY_MEAN_WORD_LEN,
        QUALITY_MIN_TOKENS,
    )

    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    mwl = F.when(F.size(words) == 0, F.lit(None).cast("double")).otherwise(
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / F.size(words)
    )
    base = docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.size(words).alias("n_tok"), mwl.alias("mwl")
    )
    tok = docs.repartition(n_part, "doc_id").select(
        "doc_id", F.posexplode(words).alias("pos", "w")
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.withColumn("w1", F.lead("w", 1).over(win))
        .filter(F.col("w1").isNotNull())
        .select(
            "doc_id",
            (
                dedup_ops.h60_col(F.concat_ws(" ", "w", "w1")) % dedup_ops.MERSENNE
            ).alias("h"),
        )
    )
    rep = grams.groupBy("doc_id").agg(
        F.round(
            F.lit(1.0) - F.countDistinct("h").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("rep")
    )
    lo, hi = QUALITY_MEAN_WORD_LEN
    j = base.join(rep, "doc_id", "left")
    keep = (
        (F.col("n_tok") >= QUALITY_MIN_TOKENS)
        & (F.col("n_tok") <= QUALITY_MAX_TOKENS)
        & (F.col("mwl") >= lo)
        & (F.col("mwl") <= hi)
        & (F.coalesce(F.col("rep"), F.lit(0.0)) <= QUALITY_MAX_REPETITION)
    )
    return j.groupBy("lang").agg(
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_keep"),
        F.sum(F.when(keep, 0).otherwise(1)).alias("n_drop"),
        F.sum(F.when(keep, F.col("n_tok")).otherwise(0)).cast("long").alias("kept_tokens"),
    )


def _attach_text_oracles() -> None:
    from ..operators.dedup import MERSENNE, WORDS_SQL, h60_sql
    from ..operators.text import normalize_text_sql, quality_keep_sql

    QUERIES["text_normalize_hashsum"].oracle = f"""
    SELECT lang, count(*) AS n,
           CAST(sum({h60_sql(normalize_text_sql('text'))} % {MERSENNE})
                AS BIGINT) AS norm_hashsum
    FROM documents GROUP BY lang
    """
    w = WORDS_SQL.format(text="text")
    QUERIES["corpus_quality_filter"].oracle = f"""
    SELECT lang,
           CAST(sum(CASE WHEN {quality_keep_sql('text')} THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN {quality_keep_sql('text')} THEN 0 ELSE 1 END) AS BIGINT) AS n_drop,
           CAST(sum(CASE WHEN {quality_keep_sql('text')} THEN len({w}) ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM documents GROUP BY lang
    """


_attach_text_oracles()


SPAN_WORDS = 8  # non-overlapping span width for exact span dedup
SAMPLE_RATES = {"en": 60, "es": 40, "de": 40, "fr": 40, "zh": 25}  # pct per lang


@register(
    "dedup_span_exact",
    None,  # oracle attached below (needs dedup SQL builders)
    "C4-style exact span dedup signal: non-overlapping 8-word spans "
    "hashed; spans seen in ≥2 distinct docs are duplicates — per-lang "
    "affected-doc counts and mean duplicate-span fraction",
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: explode (span_hash, doc_id) — 8x fewer rows than
    tokens — one groupBy(hash) for the cross-doc duplicate set, one
    broadcast-ish semi-join back, one per-doc aggregate. The corpus
    text itself never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_spans = F.floor(F.size(words) / SPAN_WORDS).cast("int")
    span = lambda i: dedup_ops.h60_col(  # noqa: E731
        F.concat_ws(" ", F.slice(words, i * SPAN_WORDS + 1, SPAN_WORDS))
    )
    chunks = F.when(n_spans <= 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    )
    ex = docs.select("doc_id", "lang", F.explode(chunks).alias("h"))
    # tracked persist: released by dedup_ops.release_cached(), not leaked
    ex = dedup_ops._persist(ex)
    dup = (
        ex.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    per_doc = (
        ex.join(dup.withColumn("__dup", F.lit(1)), "h", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("__dup"), F.lit(0))).alias("n_dup"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.sum(F.when(F.col("n_dup") > 0, 1).otherwise(0)).alias("docs_with_dup"),
        F.round(
            F.avg(F.col("n_dup").cast("double") / F.col("n_spans")), 6
        ).alias("avg_dup_frac"),
    )


@register(
    "corpus_stratified_sample",
    None,  # oracle attached below
    "Deterministic stratified sampling for training-mix construction: "
    "content-stable hash gate per language rate — reproducible across "
    "engines and runs, no RNG",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    gate = dedup_ops.h60_col(F.col("doc_id").cast("string")) % 100
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pct))
            for lang, pct in SAMPLE_RATES.items()
        ],
        F.lit(0),
    )
    return (
        docs.filter(gate < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


DELETE_PRED = "event_type = 'error' OR value < 50.0"


@register(
    "delete_where_events",
    f"""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE NOT ({DELETE_PRED})
    GROUP BY event_type
    """,
    "Predicate DELETE over the lake table: only stat-admitting files "
    "rewritten, survivors must equal the oracle's complement filter",
)
def delete_where_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loads events into a lake table, runs LakeWriter.delete_where
    (file-pruned rewrite), reads the surviving snapshot back. floor()
    before the cents cast (Spark truncates double→long, DuckDB rounds)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_del_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_del"), pk=["event_id"])
    w.append(ev)
    w.delete_where(DELETE_PRED)
    return (
        cat.table("events_del")
        .read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


HIST_BINS = 10
HIST_LO, HIST_HI = 0.0, 1000.0  # fixed edges: no data-derived float parity risk


@register(
    "value_histogram_by_type",
    f"""
    SELECT event_type,
           CASE WHEN value < {HIST_LO} THEN 0
                WHEN value >= {HIST_HI} THEN {HIST_BINS + 1}
                ELSE CAST(floor((value - {HIST_LO}) / {HIST_HI - HIST_LO}
                                * {HIST_BINS}) AS BIGINT) + 1
           END AS bin,
           count(*) AS n
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
    "Grouped equi-width histogram of event values (explicit bucket "
    "arithmetic, identical IEEE op order on both engines; out-of-range "
    "values land in the 0 / n+1 overflow bins)",
)
def value_histogram_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass, map-side partial agg on (event_type, bin) — the
    histogram shuffle carries bin counts, never rows. The bucket
    expression is written out (not width_bucket) so BOTH engines run
    byte-identical arithmetic; fixed edges avoid data-derived float
    parity risk."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    span = HIST_HI - HIST_LO
    bin_col = (
        F.when(v < HIST_LO, 0)
        .when(v >= HIST_HI, HIST_BINS + 1)
        .otherwise(
            F.floor((v - HIST_LO) / span * HIST_BINS).cast("long") + 1
        )
    )
    return (
        ev.filter(v.isNotNull())
        .groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bin")
    )


RARE_TOKEN_MAX_COUNT = 2  # corpus frequency at or below this = rare


@register(
    "rare_token_ratio",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    per_doc AS (
      SELECT t.doc_id, t.lang,
             count(*) AS n_tok,
             CAST(sum(CASE WHEN f.n <= {RARE_TOKEN_MAX_COUNT}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
      FROM tok t JOIN freq f ON t.w = f.w
      GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           ROUND(avg(CAST(n_rare AS DOUBLE) / n_tok), 6) AS avg_rare_frac,
           CAST(sum(CASE WHEN n_rare * 2 > n_tok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_noisy_docs,
           CAST(sum(n_rare) AS BIGINT) AS total_rare
    FROM per_doc GROUP BY lang
    """,
    "Rare-token quality signal: fraction of tokens whose CORPUS "
    "frequency is tiny — high fractions flag garbage/misspelled text. "
    "Two-pass plan, all-integer until the final ratio (exact cross-engine)",
)
def rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass 1 aggregates corpus token frequencies (map-side combine, one
    shuffle on the token — vocab-sized output); pass 2 joins tokens back
    to their frequency and rolls up per doc then per lang. 'Noisy doc'
    uses integer cross-multiplication (n_rare·2 > n_tok), so every
    comparison is exact — no float threshold parity risk."""
    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tok = docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.explode(words).alias("w")
    )
    tok = dedup_ops._persist(tok)  # both passes read it
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    per_doc = (
        tok.join(freq, "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(
                F.when(F.col("n") <= RARE_TOKEN_MAX_COUNT, 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.round(
            F.avg(F.col("n_rare").cast("double") / F.col("n_tok")), 6
        ).alias("avg_rare_frac"),
        F.sum(
            F.when(F.col("n_rare") * 2 > F.col("n_tok"), 1).otherwise(0)
        ).cast("long").alias("n_noisy_docs"),
        F.sum("n_rare").cast("long").alias("total_rare"),
    )


@register(
    "top_bigrams_per_lang",
    """
    WITH w AS (
      SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT lang, unnest(list_transform(
               generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1]
             )) AS bigram
      FROM w WHERE len(w) >= 2
    ),
    counted AS (
      SELECT lang, bigram, count(*) AS n FROM grams GROUP BY lang, bigram
    ),
    ranked AS (
      SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram ASC) AS rn
      FROM counted
    )
    SELECT lang, bigram, n FROM ranked WHERE rn <= 5
    """,
    "Corpus statistics: top-5 bigrams per language by frequency "
    "(explode → count → per-group top-k), deterministic tie-break",
)
def top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same row-wise shape as the repetition plan, keeping the bigram
    STRING (the output) instead of its hash: posexplode → lead() under
    the doc_id partitioning → per-(lang, bigram) count — the count
    aggregation does map-side partial combine, so the shuffle carries
    (lang, bigram, partial_n), not token rows."""
    docs = _t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tok = docs.repartition(n_part, "doc_id").select(
        "doc_id", "lang", F.posexplode(words).alias("pos", "w")
    )
    win = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.withColumn("w1", F.lead("w", 1).over(win))
        .filter(F.col("w1").isNotNull())
        .select("lang", F.concat_ws(" ", "w", "w1").alias("bigram"))
    )
    counted = grams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    rank = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counted.withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= 5)
        .select("lang", "bigram", "n")
    )


@register(
    "pii_redaction",
    None,  # oracle attached below (operator SQL builders)
    "PII scrubbing: emails + phone numbers redacted to fixed tokens by "
    "codegen'd regexp_replace; deterministic injected PII proves the "
    "Java-regex and RE2 dialects match identical spans (hash-sum check)",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each doc gets one deterministic email + phone appended (synthetic
    corpus carries none), then the redaction pass runs; the oracle must
    agree on match COUNTS and on the byte-exact redacted text (per-lang
    hash sums). At 100 TB this is one narrow projection — no shuffle,
    no Python."""
    from ..operators.text import pii_counts_col, redact_pii_col

    docs = _t(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    n_email, n_phone = pii_counts_col(enriched)
    redacted = redact_pii_col(enriched)
    h = dedup_ops.h60_col(redacted) % dedup_ops.MERSENNE
    return docs.select(
        "lang",
        n_email.alias("ne"),
        n_phone.alias("np"),
        h.alias("h"),
    ).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ne").cast("long").alias("n_emails"),
        F.sum("np").cast("long").alias("n_phones"),
        F.sum("h").alias("redacted_hashsum"),
    )


def _attach_pii_oracle() -> None:
    from ..operators.dedup import MERSENNE, h60_sql
    from ..operators.text import pii_counts_sql, redact_pii_sql

    enriched = (
        "(text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com or 555-' || "
        "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
    )
    ne, np_ = pii_counts_sql(enriched)
    QUERIES["pii_redaction"].oracle = f"""
    SELECT lang, count(*) AS n,
           CAST(sum({ne}) AS BIGINT) AS n_emails,
           CAST(sum({np_}) AS BIGINT) AS n_phones,
           CAST(sum({h60_sql(redact_pii_sql(enriched))} % {MERSENNE})
                AS BIGINT) AS redacted_hashsum
    FROM documents GROUP BY lang
    """


_attach_pii_oracle()


def _attach_span_sample_oracles() -> None:
    from ..operators.dedup import h60_sql

    w = dedup_ops.WORDS_SQL.format(text="text")
    span = h60_sql(f"array_to_string(w[i*{SPAN_WORDS}+1 : i*{SPAN_WORDS}+{SPAN_WORDS}], ' ')")
    QUERIES["dedup_span_exact"].oracle = f"""
    WITH c AS (
      SELECT doc_id, lang,
             CASE WHEN len(w) < {SPAN_WORDS} THEN []
                  ELSE list_transform(
                         -- floor() explicitly: DuckDB CAST(x AS INT) rounds
                         generate_series(0, CAST(floor(len(w) / {SPAN_WORDS}.0) AS INT) - 1),
                         i -> {span})
             END AS chunks
      FROM (SELECT doc_id, lang, {w} AS w FROM documents)
    ),
    ex AS (SELECT doc_id, lang, unnest(chunks) AS h FROM c WHERE len(chunks) > 0),
    dup AS (SELECT h FROM ex GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    per_doc AS (
      SELECT e.doc_id, e.lang, count(*) AS n_spans,
             CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM ex e LEFT JOIN dup d ON e.h = d.h
      GROUP BY e.doc_id, e.lang
    )
    SELECT lang,
           CAST(sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_dup,
           ROUND(avg(CAST(n_dup AS DOUBLE) / n_spans), 6) AS avg_dup_frac
    FROM per_doc GROUP BY lang
    """
    rate_case = " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in SAMPLE_RATES.items()
    )
    QUERIES["corpus_stratified_sample"].oracle = f"""
    SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents
    WHERE {h60_sql("CAST(doc_id AS VARCHAR)")} % 100
          < (CASE lang {rate_case} ELSE 0 END)
    GROUP BY lang
    """


_attach_span_sample_oracles()


@register(
    "dedup_cluster_keep_best",
    dedup_ops.cluster_reps_sql(dedup_ops.minhash_dedup_pairs_sql()),
    "Near-dup clustering: connected components over MinHash-LSH pairs, "
    "one representative per cluster (longest doc, doc_id tie-break) — "
    "the canonical final step of a training-corpus dedup pipeline",
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pairs → min-label connected components (operators/dedup.py:
    dedup_clusters) → per-cluster member count + representative by
    (n_chars DESC, doc_id ASC). The oracle walks the same edges with a
    recursive reachability closure — feasible there because the pair
    set is small; the Spark side is the shape that scales."""
    docs = _t(spark, sf_dir, "documents")
    # tiny verified pair list (it is the DUPLICATES) — persisted by the
    # operator itself, so the component collect and any re-run read it back
    pairs = dedup_ops.minhash_dedup_pairs(docs)
    comp = dedup_ops.dedup_clusters(pairs, out_id="id")
    # comp has one row per clustered doc — broadcast it so the corpus
    # scan joins map-side (no shuffle of the documents table)
    joined = F.broadcast(comp).join(
        docs.select("doc_id", "n_chars"), comp.id == F.col("doc_id")
    ).select("cluster_id", "doc_id", "n_chars")
    # representative = max over (n_chars, -doc_id) ≡ (n_chars DESC,
    # doc_id ASC); a single struct-max aggregate replaces the old
    # window + row_number + re-join (three shuffles → one)
    best = F.max(
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
    ).alias("m")
    return (
        joined.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"), best)
        .select(
            "cluster_id",
            "n_members",
            (-F.col("m.neg_id")).alias("rep_doc_id"),
            F.col("m.n_chars").cast("long").alias("rep_chars"),
        )
    )


Q18_QTY_THRESHOLD = 300


@register(
    "q18_large_volume_orders",
    f"""
    SELECT c_name, o_orderkey, o_orderdate,
           CAST(big.q AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS q
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > {Q18_QTY_THRESHOLD}) big
      ON o_orderkey = big.l_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 10
    """,
    "TPC-H Q18-style large-volume orders: HAVING-filtered aggregate "
    "subquery joined back to orders/customer, top-10",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregate-then-join shape: lineitem aggregates FIRST (partial
    agg map-side, one shuffle on l_orderkey), the HAVING filter leaves a
    tiny relation that broadcasts into orders — the fact never joins
    row-level. Quantities are integral doubles, so the sums are exact
    and order-insensitive."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("q").cast("long").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "funnel_view_click_purchase",
    """
    WITH marked AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '6 hours'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_type, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_no,
             min(CASE WHEN event_type = 'view' THEN ts END) AS v,
             min(CASE WHEN event_type = 'click' THEN ts END) AS c,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND v <= c
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(sum(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL
                         AND v <= c AND c <= p
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel
    FROM per_session
    """,
    "Sessionized conversion funnel: view → click → purchase ordered "
    "inside one 6h-gap session (session_window vs gaps-and-islands oracle)",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle (user_id session window), per-session min-per-stage,
    then a global roll-up — the standard product-analytics funnel on the
    same sessionization the session_windows query proved equivalent."""
    ev = _t(spark, sf_dir, "events")
    stage = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    per = ev.groupBy("user_id", F.session_window("ts", "6 hours")).agg(
        stage("view").alias("v"),
        stage("click").alias("c"),
        stage("purchase").alias("p"),
    )
    v, c, p = F.col("v"), F.col("c"), F.col("p")
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(v.isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(
            F.when(v.isNotNull() & c.isNotNull() & (v <= c), 1).otherwise(0)
        ).alias("n_view_click"),
        F.sum(
            F.when(
                v.isNotNull()
                & c.isNotNull()
                & p.isNotNull()
                & (v <= c)
                & (c <= p),
                1,
            ).otherwise(0)
        ).alias("n_funnel"),
    )


@register(
    "time_travel_snapshot",
    """
    WITH v1 AS (
      SELECT event_id, value FROM events WHERE event_id % 10 < 8
    ),
    v2 AS (
      SELECT event_id,
             CASE WHEN event_id % 10 >= 5 THEN value + 1000.0 ELSE value END AS value
      FROM events
    )
    SELECT 'v1' AS snapshot, count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM v1
    UNION ALL
    SELECT 'v2' AS snapshot, count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM v2
    """,
    "Snapshot isolation / time travel: a versioned read of the table AS "
    "OF the pre-merge commit must still see the old rows after the merge "
    "commits (immutable data files + manifest versioning)",
)
def time_travel_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds the merge_upsert table (append = v_base, merge = v_base+1),
    then reads BOTH versions from the same catalog: the old snapshot
    must be bit-stable against the oracle's pre-merge expression even
    though the merge rewrote the live file set. Cents-integerized sums
    keep the comparison order-insensitive exact."""
    w, batch, cat = merge_upsert_build(spark, sf_dir)
    t = cat.table("events_merged")
    v1 = t.current_version()
    w.write(batch)  # MERGE → v1 + 1
    # floor, not cast: Spark double→long truncates toward zero while
    # DuckDB's CAST rounds — floor() agrees everywhere
    cents = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    a = cents(t.read(version=v1)).withColumn("snapshot", F.lit("v1"))
    b = cents(t.read()).withColumn("snapshot", F.lit("v2"))
    return a.unionByName(b).select("snapshot", "n", "value_cents")


@register(
    "q10_returned_item_revenue",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                         AS BIGINT)) AS BIGINT) AS revenue_micros
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_micros DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10-style: returned-item revenue per customer in a quarter — "
    "4-way join, wide group key, top-20 (TakeOrderedAndProject)",
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact side carries only pushed-filter survivors; both dims and the
    quarter-filtered orders broadcast, so lineitem is never shuffled
    before the aggregate — the q3 shape widened to a per-customer key.
    Revenue integerizes per-ROW to micros before the sum: a grouped
    double sum is order-sensitive in its last ulp and one group per few
    thousand lands on a ROUND(x, 2) half-cent boundary where the two
    engines disagree; integer sums are exact and order-free."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev_micros = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000, 0
    ).cast("long")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev_micros).alias("revenue_micros"))
        .orderBy(F.col("revenue_micros").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q4_priority_returned_orders",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "TPC-H Q4-style priority check (EXISTS adapted to the returned-line "
    "predicate — this lineitem has no commit/receipt dates): semi-join + "
    "group-by over a date-windowed fact",
)
def q4_priority_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(
            li.select("l_orderkey"),
            orders.o_orderkey == li.l_orderkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_revenue_share",
    """
    SELECT ROUND(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-02-01'
    """,
    "TPC-H Q14-style promo revenue share: conditional aggregate ratio in "
    "one pass over a month of shipments, part dim broadcast",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "merge_many_group_commit",
    """
    SELECT event_id, user_id,
           CASE WHEN event_id % 5 = 0 THEN 'b3'
                WHEN event_id % 4 = 0 THEN 'b2'
                WHEN event_id % 3 = 0 THEN 'b1'
                ELSE event_type END AS event_type,
           CASE WHEN event_id % 5 = 0 THEN value + 300.0
                WHEN event_id % 4 = 0 THEN value + 200.0
                WHEN event_id % 3 = 0 THEN value + 100.0
                ELSE value END AS value
    FROM events
    WHERE event_id % 10 < 8
       OR event_id % 3 = 0 OR event_id % 4 = 0 OR event_id % 5 = 0
    """,
    "Group commit (merge_many): three overlapping batches applied as ONE "
    "merge must equal sequential batch-at-a-time merges — later batches "
    "win per key, one commit total",
)
def merge_many_group_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives LakeWriter.merge_many end-to-end: 80% of events as base,
    then three derived batches (every-3rd, every-4th, every-5th key,
    each with a distinct payload) group-committed in one call. Final
    state must equal the oracle's precedence CASE — b3 over b2 over b1
    over base — proving batch-sequential semantics survive the single
    window-merge. Exactly one commit lands (version advances by 1)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 10 < 8)
    batches = [
        ev.filter(F.col("event_id") % m == 0)
        .withColumn("value", F.col("value") + F.lit(float(add)))
        .withColumn("event_type", F.lit(tag))
        for m, add, tag in ((3, 100.0, "b1"), (4, 200.0, "b2"), (5, 300.0, "b3"))
    ]
    lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_gc_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_gc"), pk=["event_id"])
    w.write(base)
    v0 = cat.table("events_gc").current_version()
    w.merge_many(batches)
    assert cat.table("events_gc").current_version() == v0 + 1
    return (
        cat.table("events_gc")
        .read()
        .select("event_id", "user_id", "event_type", "value")
    )


# TPC-H completion set (Q2/Q7-Q9/Q11-Q13/Q15/Q16/Q19-Q22) and the
# round-5 pipeline queries register on import; late imports because both
# modules need register/_t from this module.
from . import corpus_stats, curation, curation2, eval_ops, format_parity, graph, ingest_replay, media_ml, pipeline, quality, timeseries, tpch  # noqa: E402,F401  (registration side effect)


# Keys that have already earned a driver-side CORRECTNESS row. The driver
# hashes only the first 50 registered queries per round, so we emit
# never-driver-checked queries first; this rotates the whole surface
# through the hard-signal window across rounds (VERDICT r5 "Next round"
# #1). The live set is read from the committed CORRECTNESS_r*.json round
# artifacts (self-maintaining as rounds accumulate); this literal is the
# fallback when they are unreadable (rounds 1-5 state).
_DRIVER_CHECKED_FALLBACK: frozenset[str] = frozenset({
    "agg_distinct_orders", "ann_ivf_indexed_topk", "ann_ivf_topk", "ann_lsh_topk",
    "ann_quantized_topk", "anti_join_idle_customers", "asof_latest_purchase",
    "contamination_overlap", "corpus_quality_filter", "corpus_stratified_sample",
    "cube_returnflag_status", "dedup_embedding_cosine", "dedup_exact_stats",
    "dedup_keep_first", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash_hamming", "dedup_span_exact", "delete_where_events",
    "doc_fingerprint_groups", "grouping_sets_orders", "json_extract_props",
    "lang_id_confusion", "merge_upsert_events", "multimodal_pipeline",
    "nested_json_roundtrip", "outer_join_nation_activity", "partition_cells_events",
    "percentile_order_values", "q17_small_qty_revenue", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "range_join_click_attribution", "rollup_lineitem_qty", "schema_promotion_union",
    "semi_join_priority_orders", "session_windows", "similarity_topk",
    "text_normalize_hashsum", "text_quality_scores", "text_repetition_ratio",
    "text_token_stats", "timestamp_parse_roundtrip", "top_k_per_group",
    "upsert_latest_per_key", "user_session_gaps", "windowed_event_counts",
    "zorder_pruned_scan",
})


def _driver_checked() -> frozenset[str]:
    """Union of keys across the committed CORRECTNESS_r*.json round
    artifacts at the repo root; fallback literal if none are readable."""
    import glob
    import json

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    keys: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                for name, row in json.load(f).items():
                    # Only a GREEN row counts as checked: a query that
                    # failed its driver hash must re-enter the 50-slot
                    # window next round (VERDICT r6 "Next round" #2).
                    # Rows-only checks (no oracle) are green when rows
                    # matched without error.
                    green = bool(row.get("hash_match")) or (
                        row.get("hash_match") is None
                        and bool(row.get("rows_match"))
                        and not row.get("err")
                    )
                    if green:
                        keys.add(name)
        except Exception:
            continue
    return frozenset(keys) or _DRIVER_CHECKED_FALLBACK


def _rotated_names() -> list[str]:
    """Never-driver-checked queries first, newest registrations first
    within that group (a query added this round gets a hard correctness
    row this round); already-checked queries follow in registration
    order. Deterministic within a round, and every query lands in the
    driver's 50-slot window within two rounds as the artifacts
    accumulate."""
    checked_set = _driver_checked()
    names = list(QUERIES)
    fresh = [n for n in names if n not in checked_set]
    checked = [n for n in names if n in checked_set]
    return list(reversed(fresh)) + checked


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _rotated_names()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle.strip()
        for name in _rotated_names()
        if QUERIES[name].oracle
    }


from ..operators.similarity import (  # noqa: E402  (late: avoids cycle at import)
    kcenter_coreset,
    kcenter_coreset_sql,
)


@register(
    "kcenter_coreset_select",
    kcenter_coreset_sql(k=8),
    "Greedy k-center (farthest-point) coreset selection over the "
    "embedding corpus — the data-selection primitive behind diversity "
    "sampling / coreset pruning: 8 picks, each the point farthest from "
    "everything already chosen, with the coverage-radius sequence as "
    "output. Integer micro-distances make the greedy argmax bit-equal "
    "across engines; the oracle unrolls the identical recurrence as "
    "CTE steps.",
)
def kcenter_coreset_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_coreset(spark, emb, k=8)


@register(
    "matview_incremental_refresh",
    """
    SELECT CASE WHEN event_id % 10 >= 5 THEN 'updated' ELSE event_type END
             AS event_type,
           CAST(sum(CASE WHEN event_id % 10 >= 5
                    THEN CAST(floor(value * 100) AS BIGINT) + 1000
                    ELSE CAST(floor(value * 100) AS BIGINT) END) AS BIGINT)
             AS total_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE event_id % 7 <> 0
    GROUP BY 1
    """,
    "Materialized view with INCREMENTAL refresh (lake/matview.py): a "
    "sum/count rollup materializes against a pinned base snapshot, the "
    "base is then upserted (50% overlap) and predicate-deleted, and "
    "REFRESH folds the change feed's signed deltas into the view with "
    "one churn-sized MERGE — asserted in-query to have taken the "
    "incremental path, never a recompute. The view must equal the "
    "from-scratch aggregate over the final base state.",
)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_mv"), pk=["event_id"])
    w.write(ev.filter(F.col("event_id") % 10 < 8))
    cat.sql(
        "CREATE MATERIALIZED VIEW ev_rollup AS SELECT event_type, "
        "sum(cents) AS total_cents, count(*) AS n FROM events_mv "
        "GROUP BY event_type"
    )
    # churn the base: 50%-overlap upsert (+1000 cents, type 'updated'
    # moves rows ACROSS groups) and a predicate delete
    w.write(
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("cents", F.col("cents") + F.lit(1000))
        .withColumn("event_type", F.lit("updated"))
    )
    w.delete_where("event_id % 7 = 0")
    st = cat.sql("REFRESH MATERIALIZED VIEW ev_rollup").collect()[0]
    if "incremental" not in st["detail"]:
        raise AssertionError(f"refresh took {st['detail']!r}, not incremental")
    return cat.table("ev_rollup").read().select("event_type", "total_cents", "n")


@register(
    "sql_view_expansion",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE value >= 100
    GROUP BY event_type
    """,
    "Logical SQL views (CREATE VIEW / view-on-view): stored SELECTs "
    "expand into the referencing statement as leading CTEs in "
    "dependency order, so Catalyst optimizes through the bodies and "
    "manifest pruning sees the base tables. The query rolls up a "
    "filtered view THROUGH a second view and must equal the inlined "
    "aggregate.",
)
def sql_view_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        "value",
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    LakeWriter(cat.table("events_v"), pk=["event_id"]).write(ev)
    cat.sql(
        "CREATE VIEW valuable AS SELECT event_type, cents FROM events_v "
        "WHERE value >= 100"
    )
    cat.sql(
        "CREATE VIEW valuable_rollup AS SELECT event_type, "
        "count(*) AS n, sum(cents) AS cents FROM valuable GROUP BY event_type"
    )
    return cat.sql(
        "SELECT event_type, n, cents FROM valuable_rollup"
    )


@register(
    "matview_avg_refresh",
    """
    SELECT event_type,
           CASE WHEN count(m) > 0
                THEN CAST(sum(m) AS DOUBLE) / count(m) END AS avg_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT CASE WHEN event_id % 10 >= 5 THEN 'updated'
                    ELSE event_type END AS event_type,
               CASE WHEN event_id % 13 <> 0 THEN
                    CASE WHEN event_id % 10 >= 5
                         THEN CAST(floor(value * 100) AS BIGINT) + 1000
                         ELSE CAST(floor(value * 100) AS BIGINT) END
               END AS m
        FROM events
        WHERE event_id % 7 <> 0
    )
    GROUP BY event_type
    """,
    "avg() in an incrementally-refreshed materialized view "
    "(lake/matview.py r13): avg decomposes at CREATE into a maintained "
    "<alias>__sum/__cnt pair and the public column is re-derived from "
    "the folded pair each refresh — exact under updates, deletes, and a "
    "NULLABLE measure (the oracle's single sum/count division matches "
    "bit-for-bit because both sides divide the same exact integers "
    "once). Asserted in-query to have taken the incremental path.",
)
def matview_avg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_id") % 13 != 0, F.floor(F.col("value") * 100)
        ).cast("long").alias("cents"),
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_avg"), pk=["event_id"])
    w.write(ev.filter(F.col("event_id") % 10 < 8))
    cat.sql(
        "CREATE MATERIALIZED VIEW avg_rollup AS SELECT event_type, "
        "avg(cents) AS avg_cents, count(*) AS n FROM events_avg "
        "GROUP BY event_type"
    )
    w.write(
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("cents", F.col("cents") + F.lit(1000))
        .withColumn("event_type", F.lit("updated"))
    )
    w.delete_where("event_id % 7 = 0")
    st = cat.sql("REFRESH MATERIALIZED VIEW avg_rollup").collect()[0]
    if "incremental" not in st["detail"]:
        raise AssertionError(f"refresh took {st['detail']!r}, not incremental")
    return cat.table("avg_rollup").read().select("event_type", "avg_cents", "n")


@register(
    "cdf_over_mor_merge",
    """
    SELECT event_id, 'delete' AS change_type, event_type,
           CAST(floor(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_id % 10 < 8 AND event_id % 7 = 0
    UNION ALL
    SELECT event_id, 'update' AS change_type, 'updated' AS event_type,
           CAST(floor(value * 100) AS BIGINT) + 1000 AS cents
    FROM events
    WHERE event_id % 10 BETWEEN 5 AND 7 AND event_id % 7 <> 0
    UNION ALL
    SELECT event_id, 'insert' AS change_type, 'updated' AS event_type,
           CAST(floor(value * 100) AS BIGINT) + 1000 AS cents
    FROM events
    WHERE event_id % 10 IN (8, 9) AND event_id % 7 <> 0
    """,
    "Change-data feed OVER a merge-on-read table (lake/table.py changes "
    "+ lake/mor.py visibility): after a MOR upsert and a MOR predicate "
    "delete, table_changes() must report the tombstone-suppressed keys "
    "as deletes/updates WITHOUT materializing the table (asserted "
    "in-query: tombstone state still standing, no compaction commit). "
    "The feed is the visible-snapshot diff, so standing tombstones can "
    "never surface suppressed row versions as spurious events.",
)
def cdf_over_mor_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..lake.mor import MODE_MOR, mor_state

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    t = cat.table("events_cdfmor")
    w = LakeWriter(t, pk=["event_id"], merge_mode=MODE_MOR)
    w.write(ev.filter(F.col("event_id") % 10 < 8))
    v0 = t.current_version()
    w.write(
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("cents", F.col("cents") + F.lit(1000))
        .withColumn("event_type", F.lit("updated"))
    )
    w.delete_where("event_id % 7 = 0")
    m = t.manifest()
    if not mor_state(m)[1]:
        raise AssertionError("expected standing merge-on-read tombstones")
    if m.props["last_op"] != "DELETE(MOR)":
        raise AssertionError(f"unexpected last_op {m.props['last_op']}")
    return cat.sql(
        f"SELECT event_id, _change_type AS change_type, event_type, cents "
        f"FROM table_changes('events_cdfmor', {v0}, {t.current_version()})"
    )


@register(
    "matview_minmax_repair",
    """
    SELECT event_type, min(m) AS lo, max(m) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT CASE WHEN event_id % 10 >= 5 THEN 'updated'
                    ELSE event_type END AS event_type,
               CASE WHEN event_id % 10 >= 5
                    THEN CAST(floor(value * 100) AS BIGINT) + 1000
                    ELSE CAST(floor(value * 100) AS BIGINT) END AS m
        FROM events
        WHERE event_id % 7 <> 0 AND event_id % 3 = 0
    )
    GROUP BY event_type
    """,
    "min/max in an incrementally-refreshed materialized view via "
    "TOUCHED-GROUP REPAIR (lake/matview.py r13): inserts fold as "
    "least/greatest, but the predicate delete makes a min/max "
    "un-foldable, so refresh recomputes exactly the groups the change "
    "feed deleted from — a base scan semi-joined to churn-bounded group "
    "keys, manifest-pruned via an IN predicate for ≤256 single-column "
    "keys. Asserted in-query: the refresh reports the repair path and "
    "the result equals the from-scratch aggregate.",
)
def matview_minmax_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1/3 slice: the query's POINT is the repair path, not corpus volume
    # (every group gets deleted from, so repair recomputes them all)
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_mm"), pk=["event_id"])
    w.write(ev.filter(F.col("event_id") % 10 < 8))
    cat.sql(
        "CREATE MATERIALIZED VIEW mm_rollup AS SELECT event_type, "
        "min(cents) AS lo, max(cents) AS hi, count(*) AS n "
        "FROM events_mm GROUP BY event_type"
    )
    w.write(
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("cents", F.col("cents") + F.lit(1000))
        .withColumn("event_type", F.lit("updated"))
    )
    w.delete_where("event_id % 7 = 0")
    st = cat.sql("REFRESH MATERIALIZED VIEW mm_rollup").collect()[0]
    if "repair" not in st["detail"]:
        raise AssertionError(f"refresh took {st['detail']!r}, expected repair")
    return cat.table("mm_rollup").read().select("event_type", "lo", "hi", "n")


@register(
    "contrastive_pair_mining",
    f"""
    WITH pairs AS ({dedup_ops.minhash_dedup_pairs_sql(threshold=0.0)})
    SELECT id_a AS anchor_id, id_b AS pair_id, jaccard,
           CASE WHEN jaccard >= 0.7 THEN 'positive'
                ELSE 'hard_negative' END AS label
    FROM pairs
    WHERE jaccard >= 0.7 OR jaccard < 0.3
    """,
    "Contrastive training-pair mining for embedding models (SimCSE/E5 "
    "recipe): LSH candidate pairs double as BOTH sides of the "
    "contrastive objective — exact-Jaccard >= 0.7 collisions become "
    "positives (near-dup augmentations), while same-bucket collisions "
    "with Jaccard < 0.3 become HARD negatives (lexically overlapping "
    "non-duplicates, exactly the pairs in-batch random negatives never "
    "surface); the ambiguous mid-band is dropped. Reuses the banded "
    "MinHash pipeline end-to-end, so mining cost = the dedup pass "
    "already being paid; no all-pairs stage exists at any scale.",
)
def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_ops.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.0
    )
    return pairs.filter(
        (F.col("jaccard") >= 0.7) | (F.col("jaccard") < 0.3)
    ).select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("pair_id"),
        "jaccard",
        F.when(F.col("jaccard") >= 0.7, "positive")
        .otherwise("hard_negative").alias("label"),
    )


@register(
    "sql_view_over_matview",
    """
    SELECT event_type, total_cents, n
    FROM (
        SELECT event_type,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        WHERE event_id % 2 = 0
        GROUP BY event_type
    )
    WHERE n >= 10
    """,
    "A logical VIEW over a MATERIALIZED VIEW (r13): the MV is a lake "
    "table, so a stored view body can filter/reshape it and the "
    "expansion machinery registers the MV like any base table. The "
    "view also survives an incremental MV refresh (asserted in-query: "
    "refresh runs between view creation and the read).",
)
def sql_view_over_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_vm"), pk=["event_id"])
    w.write(ev.filter(F.col("event_id") % 3 != 0))
    cat.sql(
        "CREATE MATERIALIZED VIEW vm_rollup AS SELECT event_type, "
        "sum(cents) AS total_cents, count(*) AS n FROM events_vm "
        "GROUP BY event_type"
    )
    cat.sql(
        "CREATE VIEW busy_types AS SELECT event_type, total_cents, n "
        "FROM vm_rollup WHERE n >= 10"
    )
    # churn + incremental refresh BETWEEN view creation and the read
    w.write(ev.filter(F.col("event_id") % 3 == 0))
    st = cat.sql("REFRESH MATERIALIZED VIEW vm_rollup").collect()[0]
    if "incremental" not in st["detail"]:
        raise AssertionError(f"refresh took {st['detail']!r}")
    return cat.sql("SELECT event_type, total_cents, n FROM busy_types")


@register(
    "sequence_surrogate_keys",
    """
    WITH keyed AS (
      SELECT row_number() OVER (ORDER BY doc_id) AS sk, lang
      FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT sk) AS BIGINT) AS n_keys,
           CAST(min(sk) AS BIGINT) AS min_key,
           CAST(max(sk) AS BIGINT) AS max_key,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM keyed
    """,
    "CREATE SEQUENCE + nextval (r14, lake/sequence.py): surrogate keys "
    "drawn from a catalog sequence while ingesting a documents slice — "
    "SELECT-list nextval strips to a block reservation (ONE CAS per "
    "statement) and per-partition arithmetic assignment (no shuffle, "
    "no window). Which row gets which key is unspecified under "
    "parallelism (DuckDB behaves the same), so the contract checked is "
    "the exact one sequences guarantee: n_rows unique keys forming the "
    "dense block [1, n_rows] — the oracle mirrors it with row_number.",
)
def sequence_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", "lang"
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    view = f"seq_src_{uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    cat.sql("CREATE SEQUENCE doc_sk")
    cat.sql(
        f"CREATE TABLE keyed_docs AS "
        f"SELECT nextval('doc_sk') AS sk, doc_id, lang FROM {view}"
    )
    spark.catalog.dropTempView(view)
    return cat.sql(
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(DISTINCT sk) AS BIGINT) AS n_keys, "
        "CAST(min(sk) AS BIGINT) AS min_key, "
        "CAST(max(sk) AS BIGINT) AS max_key, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs "
        "FROM keyed_docs"
    )


@register(
    "tvf_insertions_deletions",
    """
    WITH upd AS (
      SELECT event_id, value FROM events
      WHERE event_id % 10 BETWEEN 5 AND 7 AND event_id % 4 = 1
    ),
    ins AS (
      SELECT event_id FROM events
      WHERE event_id % 10 >= 8 AND event_id % 4 = 1
    ),
    del AS (
      SELECT event_id FROM events
      WHERE event_id % 10 = 0 AND event_id % 4 = 1
    )
    SELECT 'inserted' AS side,
           CAST((SELECT count(*) FROM upd) + (SELECT count(*) FROM ins)
                AS BIGINT) AS n,
           CAST((SELECT coalesce(sum(event_id), 0) FROM upd)
                + (SELECT coalesce(sum(event_id), 0) FROM ins)
                AS BIGINT) AS id_sum
    UNION ALL
    SELECT 'deleted',
           CAST((SELECT count(*) FROM upd) + (SELECT count(*) FROM del)
                AS BIGINT),
           CAST((SELECT coalesce(sum(event_id), 0) FROM upd)
                + (SELECT coalesce(sum(event_id), 0) FROM del)
                AS BIGINT)
    ORDER BY side
    """,
    "DuckLake's ducklake_table_insertions/_deletions as SQL TVFs "
    "(r14): the row values that became / stopped being visible across "
    "a span — updates contribute their NEW image to insertions and "
    "their OLD image to deletions, hard deletes only to deletions. "
    "Built on the same shared-file-skipping CDF diff as "
    "table_changes, so the span cost scales with churn, not table "
    "size. The oracle reconstructs both sides arithmetically.",
)
def tvf_insertions_deletions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    sl = ev.filter(F.col("event_id") % 4 == 1)
    base = sl.filter(F.col("event_id") % 10 < 8)
    batch = (
        sl.filter(F.col("event_id") % 10 >= 5)
        .withColumn("value", F.col("value") + 1000.0)
    )
    lake_dir = os.path.join(
        tempfile.gettempdir(), f"ducklake_q_{uuid.uuid4().hex[:8]}"
    )
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("events_tvf"), pk=["event_id"])
    w.write(base)
    v1 = cat.table("events_tvf").current_version()
    w.write(batch)  # updates %10 in 5..7, inserts %10 in 8..9
    cat.sql("DELETE FROM events_tvf WHERE event_id % 10 = 0")
    v3 = cat.table("events_tvf").current_version()
    return cat.sql(
        f"SELECT 'inserted' AS side, CAST(count(*) AS BIGINT) AS n, "
        f"CAST(coalesce(sum(event_id), 0) AS BIGINT) AS id_sum "
        f"FROM table_insertions('events_tvf', {v1}, {v3}) "
        f"UNION ALL "
        f"SELECT 'deleted', CAST(count(*) AS BIGINT), "
        f"CAST(coalesce(sum(event_id), 0) AS BIGINT) "
        f"FROM table_deletions('events_tvf', {v1}, {v3}) "
        f"ORDER BY side"
    )
