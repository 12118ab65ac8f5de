"""Time-series / product-analytics queries, round 5 (third wave):
retention cohorts, session assembly, gap-filled hourly series with
LOCF, a hypertable-style multi-granularity rollup, per-group trend
regression, a pivoted daily event matrix, and random-projection
dimensionality reduction of the embedding corpus.

These are the operators a TimescaleDB/ClickHouse-style analytics user
expects on top of the ingested `events` hypertable (the reference's
output tables are exactly such event streams), plus the embedding-side
reduction step a training-data pipeline runs before clustering.

Determinism contract (same as plans/queries.py): time becomes integer
epoch-microsecond arithmetic (`epoch_us_col` ↔ DuckDB
``epoch_us(CAST(ts AS TIMESTAMP))``), money becomes integer cents per
row BEFORE aggregation, and dot products fold left-to-right in both
engines (`_dot_hof_sql` ↔ ``list_dot_product``) so every hash compare
is exact.

Scale notes are per-query docstrings; the shared principle: aggregate
to the coarsest grain FIRST (one shuffle over the fact), then run the
analytical step (grouping-set expansion, gap-fill join, regression
sums) over the already-small aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .queries import _t, epoch_us_col, register

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
PROJ_DIMS = 8
PROJ_SEED = 11


def _cents(col: str = "value") -> F.Column:
    return F.floor(F.col(col) * 100).cast("long")


CENTS_SQL = "CAST(floor(value * 100) AS BIGINT)"
EPOCH_US_SQL = "epoch_us(CAST(ts AS TIMESTAMP))"


# ---------------------------------------------------------------------------
# Retention cohorts
# ---------------------------------------------------------------------------


@register(
    "retention_cohorts",
    f"""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(floor({EPOCH_US_SQL} / ({US_PER_DAY} * 7.0)) AS BIGINT) AS week
      FROM events
    ),
    c AS (
      SELECT week, min(week) OVER (PARTITION BY user_id) AS cohort_week
      FROM uw
    )
    SELECT cohort_week,
           week - cohort_week AS week_offset,
           count(*) AS n_active
    FROM c
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    "Weekly retention triangle: users cohorted by first-active week, "
    "active-user counts at each week offset",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle over the events stream.

    Scale shape: the fact collapses to DISTINCT (user, week) in one
    partially-aggregated shuffle — everything after runs on
    |users|·|weeks| rows, not events. The cohort week comes from a
    window min over the SAME rows (no self-join, no second fact scan —
    the join formulation scans the fact twice). The final groupBy
    output is |weeks|² rows regardless of corpus size.
    """
    ev = _t(spark, sf_dir, "events")
    week = F.floor(epoch_us_col(ev, "ts") / (US_PER_DAY * 7.0)).cast("long")
    uw = ev.select(F.col("user_id"), week.alias("week")).distinct()
    cohort_week = F.min("week").over(W.partitionBy("user_id"))
    return (
        uw.select("week", cohort_week.alias("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Session assembly (gap > 30 min starts a new session)
# ---------------------------------------------------------------------------


@register(
    "session_assembly",
    f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, {EPOCH_US_SQL} AS us,
             CASE WHEN {EPOCH_US_SQL}
                       - lag({EPOCH_US_SQL}) OVER w > {SESSION_GAP_US}
                       OR lag({EPOCH_US_SQL}) OVER w IS NULL
                  THEN 1 ELSE 0 END AS starts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {EPOCH_US_SQL}, event_id)
    ),
    sess AS (
      SELECT *, CAST(sum(starts) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_ord
      FROM seq
    )
    SELECT user_id, session_ord,
           count(*) AS n_events,
           max(us) - min(us) AS duration_us,
           min(event_id) AS first_event_id,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS has_purchase
    FROM sess
    GROUP BY user_id, session_ord
    ORDER BY user_id, session_ord
    """,
    "Sessionization: 30-min-gap session ids via lag + running sum, then "
    "per-session event count, duration, and purchase-conversion flag",
)
def session_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assigns session ordinals with the standard two-window idiom
    (gap flag via lag, session id via running sum of flags) and rolls
    each session up.

    Scale shape: both windows share ONE exchange (same partitioning by
    user_id, same ordering — Spark plans a single sort + two window
    operators back to back). The terminal groupBy on (user_id,
    session_ord) is a strict refinement of the window partitioning, so
    the only data movement is the initial user-keyed shuffle. Ties are
    broken by event_id so replays order identically.
    """
    ev = _t(spark, sf_dir, "events")
    us = epoch_us_col(ev, "ts")
    seq = ev.select(
        "user_id", "event_id", "event_type", us.alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    starts = F.when(
        prev.isNull() | ((F.col("us") - prev) > SESSION_GAP_US), 1
    ).otherwise(0)
    sess = seq.withColumn("starts", starts).withColumn(
        "session_ord",
        F.sum("starts").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_ord")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("us") - F.min("us")).alias("duration_us"),
            F.min("event_id").alias("first_event_id"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("has_purchase"),
        )
        .orderBy("user_id", "session_ord")
    )


# ---------------------------------------------------------------------------
# Gap-filled hourly series with LOCF
# ---------------------------------------------------------------------------


@register(
    "timeseries_gapfill",
    f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor({EPOCH_US_SQL} / {US_PER_HOUR}) AS BIGINT) AS hour_idx,
             count(*) AS n_events,
             sum({CENTS_SQL}) AS sum_cents
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(min(hour_idx) AS BIGINT) AS lo,
             CAST(max(hour_idx) AS BIGINT) AS hi FROM hourly
    ),
    grid AS (
      SELECT t.event_type, g.hour_idx
      FROM (SELECT DISTINCT event_type FROM hourly) t,
           (SELECT unnest(generate_series(lo, hi)) AS hour_idx
              FROM bounds) g
    )
    SELECT grid.event_type, grid.hour_idx,
           COALESCE(h.n_events, 0) AS n_events,
           last_value(CAST(h.sum_cents AS BIGINT) IGNORE NULLS) OVER (
             PARTITION BY grid.event_type ORDER BY grid.hour_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_cents
    FROM grid LEFT JOIN hourly h
      ON h.event_type = grid.event_type AND h.hour_idx = grid.hour_idx
    ORDER BY grid.event_type, grid.hour_idx
    """,
    "Hypertable gap-fill: dense hourly grid per event type, missing "
    "buckets carried forward (LOCF) from the last observed hour",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket_gapfill + locf, Spark-first.

    Scale shape: the fact collapses to (type, hour) partial-aggregated
    sums first — the ONLY operator that sees event rows; the aggregate
    is persisted and feeds the bounds row, the distinct-types list, and
    the probe join, so the fact is scanned exactly once. The dense grid
    is |types| × |hours| (data-independent of row count), built from a
    1-row global bounds aggregate cross-joined with the distinct types
    (both broadcast). The LOCF window then runs over grid-sized data.
    ``last_value IGNORE NULLS`` ↔ ``F.last(ignorenulls=True)`` is the
    cross-engine LOCF pair.
    """
    ev = _t(spark, sf_dir, "events")
    hour = F.floor(epoch_us_col(ev, "ts") / F.lit(US_PER_HOUR)).cast("long")
    hourly = (
        ev.select(
            "event_type", hour.alias("hour_idx"), _cents().alias("cents")
        )
        .groupBy("event_type", "hour_idx")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents"))
    )
    hourly.persist()
    bounds = hourly.agg(
        F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi")
    )
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hour_idx"),
    )
    locf = W.partitionBy("event_type").orderBy("hour_idx").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        grid.join(F.broadcast(hourly), ["event_type", "hour_idx"], "left")
        .select(
            "event_type",
            "hour_idx",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("sum_cents", ignorenulls=True).over(locf).alias("filled_cents"),
        )
        .orderBy("event_type", "hour_idx")
    )


# ---------------------------------------------------------------------------
# Hypertable multi-granularity rollup (grouping sets over pre-agg)
# ---------------------------------------------------------------------------


@register(
    "hypertable_rollup",
    f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor({EPOCH_US_SQL} / {US_PER_DAY}) AS BIGINT) AS day_idx,
             CAST(floor({EPOCH_US_SQL} / {US_PER_HOUR}) AS BIGINT) AS hour_idx,
             count(*) AS n,
             sum({CENTS_SQL}) AS cents
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day_idx, hour_idx,
           CASE WHEN hour_idx IS NULL THEN 'day' ELSE 'hour' END AS grain,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM hourly
    GROUP BY GROUPING SETS ((event_type, day_idx),
                            (event_type, day_idx, hour_idx))
    ORDER BY event_type, day_idx, hour_idx NULLS FIRST
    """,
    "Continuous-aggregate rollup: hour AND day grains in one pass via "
    "grouping sets over the hourly pre-aggregate",
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup the way a continuous aggregate
    maintains it: aggregate the fact to the FINEST grain once (the only
    shuffle that sees event rows), then run grouping-set expansion over
    the hourly aggregate — Spark's Expand doubles grid-sized rows, not
    fact rows. At 100 TB the hourly aggregate is ~4 OOM smaller than
    the corpus, so the rollup cost is the one fact scan.
    """
    ev = _t(spark, sf_dir, "events")
    us = epoch_us_col(ev, "ts")
    hourly = (
        ev.select(
            "event_type",
            F.floor(us / F.lit(US_PER_DAY)).cast("long").alias("day_idx"),
            F.floor(us / F.lit(US_PER_HOUR)).cast("long").alias("hour_idx"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "day_idx", "hour_idx")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
    )
    rolled = (
        hourly.groupingSets(
            [["event_type", "day_idx"], ["event_type", "day_idx", "hour_idx"]],
            "event_type",
            "day_idx",
            "hour_idx",
        )
        .agg(F.sum("n").alias("n_events"), F.sum("cents").alias("sum_cents"))
        .select(
            "event_type",
            "day_idx",
            "hour_idx",
            F.when(F.col("hour_idx").isNull(), "day")
            .otherwise("hour")
            .alias("grain"),
            "n_events",
            "sum_cents",
        )
    )
    return rolled.orderBy("event_type", "day_idx", F.col("hour_idx").asc_nulls_first())


# ---------------------------------------------------------------------------
# Per-group least-squares trend (closed form, integer sums)
# ---------------------------------------------------------------------------


@register(
    "grouped_linreg_trend",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(floor({EPOCH_US_SQL} / {US_PER_DAY}) AS BIGINT) AS x,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    sums AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CAST(round(1000000.0 * (n * sxy - sx * sy)
                      / (n * sxx - sx * sx)) AS BIGINT) AS slope_micro
    FROM sums
    ORDER BY event_type
    """,
    "Per-event-type daily-count trend: closed-form least-squares slope "
    "from integer sums (micro-units/day)",
)
def grouped_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS slope of daily event counts, computed from the
    five classic sums — all BIGINT-exact until the single final
    division (both engines divide the same two exact integers in IEEE
    double, so the rounded micro-slope is identical).

    Scale shape: one fact shuffle to daily counts, then a 5-group
    aggregate over |days|·|types| rows. This is the map-reducible form
    of regression — no per-group iteration, no driver collect.
    """
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(epoch_us_col(ev, "ts") / F.lit(US_PER_DAY))
            .cast("long")
            .alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count("*").alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = F.round(
        1000000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx)
    ).cast("long")
    return sums.select(
        "event_type", F.col("n").alias("n_days"), slope.alias("slope_micro")
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Pivoted daily event matrix
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_daily_event_matrix",
    f"""
    SELECT CAST(floor({EPOCH_US_SQL} / {US_PER_DAY}) AS BIGINT) AS day_idx,
           {", ".join(
               f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS n_{t}"
               for t in EVENT_TYPES
           )},
           count(*) AS n_total
    FROM events
    GROUP BY day_idx
    ORDER BY day_idx
    """,
    "Daily event-type matrix: pivot with a fixed column set (one "
    "shuffle, no values-discovery job) plus a row total",
)
def pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().pivot(values=...)` with the value list pinned — the
    explicit list skips Spark's extra distinct-values job AND keeps the
    output schema stable under data drift (an unseen type lands nowhere
    instead of adding a surprise column). Single partial-aggregated
    shuffle; each pivot cell is a map-side conditional count.
    """
    ev = _t(spark, sf_dir, "events")
    day = F.floor(epoch_us_col(ev, "ts") / F.lit(US_PER_DAY)).cast("long")
    pivoted = (
        ev.select(day.alias("day_idx"), "event_type")
        .groupBy("day_idx")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    totals = [F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES]
    n_total = sum(
        (F.coalesce(F.col(t), F.lit(0)) for t in EVENT_TYPES), F.lit(0)
    ).alias("n_total")
    return pivoted.select("day_idx", *totals, n_total).orderBy("day_idx")


# ---------------------------------------------------------------------------
# Random-projection dimensionality reduction (±1 planes, 64 → 8 dims)
# ---------------------------------------------------------------------------


def _sign_planes(dim: int, k: int = PROJ_DIMS, seed: int = PROJ_SEED) -> list[list[float]]:
    """±1 sign matrix from the repo's shared LCG — inlined as literals
    into both engines, so the projection is bit-identical."""
    state = seed
    planes = []
    for _ in range(k):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(1.0 if (state >> 40) & 1 else -1.0)
        planes.append(row)
    return planes


def _proj_oracle_sql() -> str:
    planes = _sign_planes(64)
    cols = ", ".join(
        f"CAST(round(1000.0 * list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(x) for x in p)}])) AS BIGINT) AS p{j}"
        for j, p in enumerate(planes)
    )
    return f"""
    SELECT vec_id, {cols}
    FROM embeddings
    ORDER BY vec_id
    """


@register(
    "srp_projection_reduce",
    _proj_oracle_sql(),
    "Johnson-Lindenstrauss-style reduction: 64-dim embeddings projected "
    "onto 8 deterministic ±1 hyperplanes, quantized to milli-units",
)
def srp_projection_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse random projection (Achlioptas ±1 variant) of the
    embedding corpus to 8 components — the cheap dimensionality
    reduction before clustering / coarse ANN.

    Scale shape: map-only — zero shuffles, zero Python; 8 HOF dot
    products per row inside one codegen'd stage (the unrolled form
    would blow the 64 KB method budget at 8 × 64 dims, see
    ``similarity._dot_sql``). Both engines fold left-to-right and the
    milli-unit quantization happens on the identical double, so the
    BIGINT outputs hash-match exactly.
    """
    from ..operators.similarity import _dot_hof_sql

    emb = _t(spark, sf_dir, "embeddings")
    planes = _sign_planes(64)
    projs = [
        F.round(1000.0 * F.expr(_dot_hof_sql("embedding", p))).cast("long").alias(f"p{j}")
        for j, p in enumerate(planes)
    ]
    return emb.select("vec_id", *projs).orderBy("vec_id")
