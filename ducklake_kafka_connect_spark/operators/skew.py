"""Skew-mitigation operators: salted two-phase aggregation and salted
joins for hot keys.

AQE's skew-join splitting (enabled session-wide) handles most runtime
skew; these operators cover the two cases it cannot:

- **Aggregation skew**: a groupBy whose key space is tiny relative to
  the cluster (5 event types on 1000 executors) reduces each hot key on
  ONE task no matter how AQE splits scan partitions. Spark's partial
  aggregation already combines map-side, which usually suffices — but
  when the per-key combine state is expensive (collect_set, approximate
  sketches), ``salted_aggregate`` fans each key out to ``n_salt``
  partial groups first, then merges the partials: two small shuffles
  instead of one hot reducer.
- **Join skew without a broadcastable side**: when BOTH sides are too
  big to broadcast and one key dominates, ``salted_join`` salts the
  skewed (probe) side deterministically and explodes the build side
  across the salt space, so the hot key's rows spread over ``n_salt``
  reducers.

Salts are DETERMINISTIC (hash-derived, not rand()): retries and
speculative tasks must salt a row identically or results change under
failure — the same determinism contract the rest of the engine keeps.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16

# (merge_fn, finish) per supported partial-aggregatable function: how to
# combine per-salt partials into the final value
_MERGEABLE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _salt_col(cols: Sequence[str], n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): xxhash64 of the row's non-key
    payload — stable across retries, spreads uniformly."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase aggregation: partials on (keys, salt), merge on keys.

    ``aggs`` maps output name → (fn, column) with fn in sum/min/max/
    count. count partials merge by SUM; the others are idempotent under
    re-merge. Results are exactly the plain groupBy's (addition order
    differs — callers aggregating floats should integerize first, as
    the query surface does everywhere).
    """
    for name, (fn, _c) in aggs.items():
        if fn not in _MERGEABLE and fn != "count":
            raise ValueError(f"{name}: {fn!r} is not partial-mergeable")
    non_key = [c for c in df.columns if c not in keys]
    salted = df.withColumn("__salt", _salt_col(non_key or list(keys), n_salt))
    partial_exprs = []
    for name, (fn, c) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{name}"))
        else:
            partial_exprs.append(_MERGEABLE[fn](F.col(c)).alias(f"__p_{name}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    final_exprs = []
    for name, (fn, _c) in aggs.items():
        merge = F.sum if fn in ("count", "sum") else _MERGEABLE[fn]
        final_exprs.append(merge(F.col(f"__p_{name}")).alias(name))
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT (skewed/probe) side salted and the RIGHT
    (build) side replicated across the salt space — the classic salted
    join for hot keys when neither side broadcasts. Join semantics for
    'inner' and 'left' match the plain join exactly (each left row meets
    each matching right row exactly once: at its own salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    non_key = [c for c in left.columns if c not in on]
    l_salted = left.withColumn("__salt", _salt_col(non_key or on, n_salt))
    r_exploded = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = l_salted.join(r_exploded, on + ["__salt"], how)
    return out.drop("__salt")
