"""As-of (point-in-time) join — the time-series join Spark lacks.

For each left row, attach the payload of the most recent right row with
the same key and ``right_ts <= left_ts`` (backward direction, inclusive
— DuckDB/pandas ``ASOF JOIN`` semantics, so the driver oracle is
DuckDB's native ``ASOF LEFT JOIN``). All four DuckDB comparison
operators (``>= > <= <``) and inner-vs-left row semantics are covered
by the ``direction`` / ``strict`` / ``how`` parameters, and DuckDB's
SQL surface (``FROM a ASOF [LEFT] JOIN b ON ...``) parses directly in
``LakeCatalog.sql`` (lake/table.py ``_rewrite_asof_join``).

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
    how: str = "left",
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """As-of join; left rows keep all columns, right payload columns
    arrive as ``<name><suffix>`` (NULL when no right row matches).
    ``payload`` defaults to every right column except the key and
    timestamp.

    The four DuckDB ``ASOF JOIN`` comparison operators map to:

    - ``direction="backward", strict=False`` — ``l.ts >= r.ts``
      (latest right row at-or-before; the DuckDB/pandas default)
    - ``direction="backward", strict=True``  — ``l.ts >  r.ts``
    - ``direction="forward",  strict=False`` — ``l.ts <= r.ts``
      (earliest right row at-or-after)
    - ``direction="forward",  strict=True``  — ``l.ts <  r.ts``

    ``how="inner"`` drops unmatched left rows (DuckDB ``ASOF JOIN``);
    ``how="left"`` keeps them with NULL payload (``ASOF LEFT JOIN``).
    Every variant stays one shuffle + one window sweep."""
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
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
    # A NULL right timestamp compares false against every left ts in
    # SQL, so it can never match — but in the sweep it would sort to an
    # end of the partition and shadow real matches. Drop it up front
    # (NULL LEFT ts rows stay: they sort before any right row in either
    # direction's ordering below, sweep over nothing, and surface NULL
    # payload — the oracle's behavior for a NULL probe).
    right_nonnull = right_nonnull.filter(F.col(right_ts).isNotNull())
    tagged_right = right_nonnull.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload_t.alias("__p"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # Sweep order encodes (direction, strict): the ts axis flips for
    # forward joins (NULL LEFT ts rows pinned FIRST either way, so a
    # NULL probe sees no right rows), and the side tiebreak decides
    # whether an equal-ts right row is visible (inclusive: right sorts
    # before left; strict: after). Tie-break: equal-(key, ts) right
    # rows would otherwise resolve nondeterministically; ordering by
    # the payload struct itself makes last() pick the max payload,
    # stable across runs and partitionings.
    ts_ord = (
        F.col("__ts").asc_nulls_first()
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    side_ord = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        W.partitionBy(*keys)
        .orderBy(ts_ord, side_ord, F.col("__p").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = unioned.select(
        *lcols,
        "__side",
        F.last(F.col("__p"), ignorenulls=True).over(w).alias("__m"),
    )
    out = swept.filter(F.col("__side") == 1)
    if how == "inner":
        # the struct column is non-null iff SOME right row matched
        # (even one whose payload fields are all NULL), so this is the
        # exact matched indicator — no marker column needed
        out = out.filter(F.col("__m").isNotNull())
    return out.select(
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
