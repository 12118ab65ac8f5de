"""SQL-surface completeness + data-quality queries, round 5 (fourth
wave): set operations, RANGE-frame moving aggregates, a one-pass column
profiler, referential-integrity auditing, and a mergeable binned
quantile sketch.

These close the gaps a warehouse user notices first when switching
engines — INTERSECT/EXCEPT, `RANGE BETWEEN` frames, ANALYZE-style
profiling, FK orphan checks — and add the mergeable-histogram quantile
shape that scales where exact `percentile` sorts cannot.

Determinism contract: money in integer cents before aggregation; the
only division anywhere is one exact-BIGINT pair in IEEE double rounded
to 6 decimals (the same contract plans/corpus_stats.py pins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .queries import _t, epoch_us_col, register
from .timeseries import US_PER_DAY

CENTS_SQL = "CAST(floor(value * 100) AS BIGINT)"
EPOCH_US_SQL = "epoch_us(CAST(ts AS TIMESTAMP))"

# binned-quantile sketch parameters: 500.00-wide bins over o_totalprice
BIN_CENTS = 50_000
QUANTILE_PCTS = [50, 90, 99]  # integer percent → exact thresholds


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_ops_priority_customers",
    """
    WITH u AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT'),
         h AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '2-HIGH')
    SELECT
      (SELECT count(*) FROM (SELECT * FROM u INTERSECT SELECT * FROM h))
        AS n_both,
      (SELECT count(*) FROM (SELECT * FROM u EXCEPT SELECT * FROM h))
        AS n_urgent_only,
      (SELECT count(*) FROM (SELECT * FROM h EXCEPT SELECT * FROM u))
        AS n_high_only,
      (SELECT count(*) FROM (SELECT * FROM u UNION SELECT * FROM h))
        AS n_either
    """,
    "INTERSECT / EXCEPT / UNION-distinct over customer sets drawn from "
    "two order-priority slices",
)
def set_ops_priority_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three SQL set operators in one audit row.

    Scale shape: each input collapses to DISTINCT custkeys at the scan
    (partial aggregation before the shuffle), so the set ops run over
    |customers|-sized sets, not order rows. Spark plans INTERSECT /
    EXCEPT as left-semi / left-anti hash joins on the already-distinct
    sides — no sort, no nested loop. The four counts stay ONE lazy
    plan: each is a 1-row aggregate, stitched by broadcast cross-joins
    (no driver-side .count() actions).
    """
    orders = _t(spark, sf_dir, "orders")
    u = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    h = (
        orders.filter(F.col("o_orderpriority") == "2-HIGH")
        .select("o_custkey")
        .distinct()
    )
    # the two distinct key sets feed all four set ops — persist so the
    # fact is scanned once per side, not once per operator
    u.persist()
    h.persist()
    parts = [
        u.intersect(h).agg(F.count("*").alias("n_both")),
        u.subtract(h).agg(F.count("*").alias("n_urgent_only")),
        h.subtract(u).agg(F.count("*").alias("n_high_only")),
        u.union(h).distinct().agg(F.count("*").alias("n_either")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(F.broadcast(p))
    return out


# ---------------------------------------------------------------------------
# RANGE-frame moving aggregate (7-day trailing window)
# ---------------------------------------------------------------------------


@register(
    "moving_sum_range_frame",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(floor({EPOCH_US_SQL} / {US_PER_DAY}) AS BIGINT) AS day_idx,
             count(*) AS n,
             sum({CENTS_SQL}) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day_idx,
           CAST(sum(n) OVER w AS BIGINT) AS n_7d,
           CAST(sum(cents) OVER w AS BIGINT) AS cents_7d,
           round(CAST(sum(cents) OVER w AS DOUBLE)
                 / CAST(sum(n) OVER w AS DOUBLE), 6) AS avg_cents_7d
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day_idx
    """,
    "7-day trailing totals per event type via a RANGE frame over the "
    "daily pre-aggregate (value-based window, robust to missing days)",
)
def moving_sum_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day window with a RANGE (value-based) frame — unlike a
    ROWS frame it stays correct when days are missing, the property that
    matters on sparse series.

    Scale shape: the fact collapses to |types|×|days| daily rows first
    (the only shuffle that sees events); the RANGE frame then runs over
    the tiny aggregate. The trailing average divides two exact BIGINTs
    once, rounded to 6 — cross-engine identical.
    """
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(epoch_us_col(ev, "ts") / F.lit(US_PER_DAY))
            .cast("long")
            .alias("day_idx"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day_idx")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, W.currentRow)
    )
    n7 = F.sum("n").over(w)
    c7 = F.sum("cents").over(w)
    return daily.select(
        "event_type",
        "day_idx",
        n7.alias("n_7d"),
        c7.alias("cents_7d"),
        F.round(c7.cast("double") / n7.cast("double"), 6).alias("avg_cents_7d"),
    ).orderBy("event_type", "day_idx")


# ---------------------------------------------------------------------------
# One-pass column profiler (ANALYZE-style)
# ---------------------------------------------------------------------------

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate"]


@register(
    "table_profile_lineitem",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM lineitem
    """
        for c in PROFILE_COLS
    )
    + "\nORDER BY column_name",
    "ANALYZE-style profile of five lineitem columns — null counts, "
    "distinct cardinality, min/max — in ONE scan via a wide aggregate",
)
def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: the stats a writer harvests into file-skipping
    metadata (lake/skipping.py) and an optimizer reads as table stats.

    Scale shape: columns are unpivoted FIRST — ``stack`` emits
    (column_name, value) rows in the scan projection, one branch per
    value type so min/max stay typed — then a two-stage aggregate:
    groupBy(column, value) partial-combines map-side (the shuffle
    carries |distinct values| per column, not rows), and the per-column
    rollup derives n_rows/nulls/distinct/min/max from those counts.
    This replaces the multi-`countDistinct` wide aggregate, whose
    Expand-based rewrite shuffled |cols|× the table at sf0.1 (7.7 s →
    ~1 s measured) and would shuffle 5× a 100 TB fact. The oracle's
    UNION ALL of per-column scans is the semantically-equal slow form.
    """
    li = _t(spark, sf_dir, "lineitem")
    type_groups = [  # one stack branch per storage type, min/max typed
        ["l_quantity", "l_extendedprice", "l_discount"],
        ["l_returnflag"],
        ["l_shipdate"],
    ]
    branches = []
    for cols in type_groups:
        stacked = li.select(
            F.expr(
                f"stack({len(cols)}, "
                + ", ".join(f"'{c}', {c}" for c in cols)
                + ") AS (column_name, v)"
            )
        )
        per_val = stacked.groupBy("column_name", "v").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        branches.append(
            per_val.groupBy("column_name").agg(
                F.sum("cnt").alias("n_rows"),
                F.sum(
                    F.when(F.col("v").isNull(), F.col("cnt")).otherwise(F.lit(0))
                ).alias("n_nulls"),
                F.count(F.when(F.col("v").isNotNull(), F.lit(1))).alias("n_distinct"),
                F.min("v").cast("string").alias("min_value"),
                F.max("v").cast("string").alias("max_value"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("column_name")


# ---------------------------------------------------------------------------
# Referential-integrity audit (FK orphan checks)
# ---------------------------------------------------------------------------


@register(
    "fk_integrity_audit",
    """
    SELECT
      (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
        AS lineitem_orphans,
      (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
        AS order_orphans,
      (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS lineitem_orderkeys,
      (SELECT count(*) FROM orders) AS order_rows
    """,
    "FK orphan audit: lineitem rows without an order and orders without "
    "a customer, via anti joins",
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation as a query — the check a pipeline runs
    before publishing a snapshot.

    Scale shape: orders→customer is an anti join against the broadcast
    customer key set; lineitem→orders is a shuffled left-anti hash join
    on the key both tables are naturally clustered by (with
    `write_bucketed` both sides co-locate and the exchange disappears —
    see tests/test_bucketed.py). Counts reduce map-side, no row data
    survives the joins, and the four audit numbers remain ONE lazy
    plan via broadcast cross-joins of 1-row aggregates.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    parts = [
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count("*").alias("lineitem_orphans")),
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("order_orphans")),
        li.agg(F.countDistinct("l_orderkey").alias("lineitem_orderkeys")),
        orders.agg(F.count("*").alias("order_rows")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(F.broadcast(p))
    return out


# ---------------------------------------------------------------------------
# Mergeable binned quantile sketch
# ---------------------------------------------------------------------------


@register(
    "quantile_bin_sketch",
    f"""
    WITH binned AS (
      SELECT CAST(floor(CAST(floor(o_totalprice * 100) AS BIGINT)
                        / {BIN_CENTS}) AS BIGINT) AS bin_id,
             count(*) AS n
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT bin_id, n,
             CAST(sum(n) OVER (ORDER BY bin_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
             CAST(sum(n) OVER () AS BIGINT) AS total_n
      FROM binned
    ),
    q AS (SELECT unnest([{", ".join(str(p) for p in QUANTILE_PCTS)}]) AS pct)
    SELECT q.pct,
           min(c.bin_id) AS bin_id,
           min(c.bin_id) * {BIN_CENTS} AS bin_lo_cents,
           (min(c.bin_id) + 1) * {BIN_CENTS} AS bin_hi_cents
    FROM q JOIN cum c
      ON c.cum_n * 100 >= q.pct * c.total_n
    GROUP BY q.pct
    ORDER BY q.pct
    """,
    "Mergeable histogram quantiles: p50/p90/p99 of order value from "
    "fixed-width bin counts — the sketch shape that replaces a global "
    "sort at scale",
)
def quantile_bin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from an equi-width histogram: per-bin
    counts are a mergeable, fixed-size state (like HLL/CMS in
    corpus_stats), so the quantile query needs one partial-aggregating
    shuffle of ≤1000 bins — where exact `percentile` needs a sort of
    the corpus. Threshold comparison is pure integer
    (`cum*100 >= pct*total`), so bin selection is exact on both
    engines; the answer is the bin bracket, the sketch's honest output.
    """
    orders = _t(spark, sf_dir, "orders")
    binned = (
        orders.select(
            F.floor(
                F.floor(F.col("o_totalprice") * 100).cast("long") / F.lit(BIN_CENTS)
            )
            .cast("long")
            .alias("bin_id")
        )
        .groupBy("bin_id")
        .agg(F.count("*").alias("n"))
    )
    cum = binned.select(
        "bin_id",
        "n",
        F.sum("n")
        .over(W.orderBy("bin_id").rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("cum_n"),
        F.sum("n").over(W.partitionBy()).cast("long").alias("total_n"),
    )
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in QUANTILE_PCTS])).alias("pct")
    )
    return (
        pcts.join(
            cum, cum.cum_n * 100 >= F.col("pct") * cum.total_n, "inner"
        )
        .groupBy("pct")
        .agg(F.min("bin_id").alias("bin_id"))
        .select(
            "pct",
            "bin_id",
            (F.col("bin_id") * BIN_CENTS).alias("bin_lo_cents"),
            ((F.col("bin_id") + 1) * BIN_CENTS).alias("bin_hi_cents"),
        )
        .orderBy("pct")
    )
