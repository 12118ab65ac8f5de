"""As-of (point-in-time) join — the time-series join Spark lacks.

For each left row, attach the payload of the most recent right row with
the same key and ``right_ts <= left_ts`` (backward direction, inclusive
— DuckDB/pandas ``ASOF JOIN`` semantics, so the driver oracle is
DuckDB's native ``ASOF LEFT JOIN``).

Implementation is the scale-correct union-and-sweep, NOT a range join:
tag both inputs, union them, and run one ``last_value(..., ignorenulls)``
window sweep per payload column over ``(key) ORDER BY (ts, side)`` —
right rows sort before left rows at equal timestamps, which yields the
inclusive bound. One shuffle on the key, one sort, zero join explosion:
a naive ``l.ts >= r.ts`` theta-join materializes O(|L|·|R|/keys) rows
before aggregating, which at 100 TB is the difference between a sort
and an outage. Skewed keys behave like any window: AQE handles
moderate skew; pathological single-key skew would call for
range-bucketing the timeline per key (bucket boundaries carry the last
value of the previous bucket), which this module documents as the
escalation path.

Used by the training-data pipeline to stamp events with the latest
prior model score / session attribute / price quote per entity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward-inclusive as-of join; left rows keep all columns, right
    payload columns arrive as ``<name><suffix>`` (NULL when no right row
    precedes). ``payload`` defaults to every right column except the key
    and timestamp."""
    keys = [key] if isinstance(key, str) else list(key)
    if payload is None:
        payload = [c for c in right.columns if c not in keys and c != right_ts]
    payload = list(payload)

    lcols = [c for c in left.columns]
    # Payload travels as ONE struct column: a right row whose payload
    # fields are all NULL is still a non-null struct, so it correctly
    # shadows older rows (per-column last(ignorenulls) would skip it),
    # and the whole sweep is a single window function regardless of
    # payload width.
    payload_t = F.struct(*[F.col(c).alias(c) for c in payload])
    null_payload = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
    )
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        null_payload.alias("__p"),
    )
    # SQL equality never matches NULL keys: a right row with any NULL key
    # component can match no left row, so drop it BEFORE the union —
    # null-keyed left rows then sweep over an all-left partition and get a
    # NULL payload, exactly like the oracle's ASOF LEFT JOIN.
    right_nonnull = right
    for k in keys:
        right_nonnull = right_nonnull.filter(F.col(k).isNotNull())
    tagged_right = right_nonnull.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload_t.alias("__p"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # Tie-break: equal-(key, ts) right rows would otherwise resolve
    # nondeterministically; ordering by the payload struct itself makes
    # last() pick the max payload, stable across runs and partitionings.
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__p").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = unioned.select(
        *lcols,
        "__side",
        F.last(F.col("__p"), ignorenulls=True).over(w).alias("__m"),
    )
    return swept.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload]
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = (),
    left_cols: Sequence[str] = (),
    suffix: str = "_right",
) -> str:
    """DuckDB oracle: native ASOF LEFT JOIN with identical inclusive
    backward semantics."""
    keys = [key] if isinstance(key, str) else list(key)
    on = " AND ".join([f"l.{k} = r.{k}" for k in keys] + [f"l.{left_ts} >= r.{right_ts}"])
    sel = ", ".join(
        [f"l.{c}" for c in left_cols]
        + [f"r.{c} AS {c}{suffix}" for c in payload]
    )
    return f"""
    SELECT {sel}
    FROM ({left_sql}) l
    ASOF LEFT JOIN ({right_sql}) r ON {on}
    """
