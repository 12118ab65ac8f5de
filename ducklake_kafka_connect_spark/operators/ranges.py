"""Range (interval-containment) join — bucketized, not theta.

Joining points to intervals with ``start <= ts <= end`` as a raw
theta-join degenerates to a broadcast-nested-loop (O(|P|·|I|) per key
group) — at 100 TB that plan is an outage. The standard fix: quantize
time into fixed-width buckets, explode each interval into the buckets
it covers, bucket each point, equi-join on (key, bucket), and keep the
exact containment filter. The shuffle key (key, bucket) is
high-cardinality, the join is a plain hash join, and each matching
(point, interval) pair meets in exactly one bucket — the point's own —
so no dedup pass is needed.

Bucket width trades replication for selectivity: an interval of length
L becomes ⌈L/width⌉+1 rows. Choose width ≈ the median interval length;
the replication factor stays ~2 while the bucket filter removes almost
all non-matching pairs before the exact predicate runs.

Truncation soundness: bucket indices derive from second-truncated
timestamps. Truncation is monotone, so for any truly-matching pair
``start <= ts <= end`` implies ``bucket(start) <= bucket(ts) <=
bucket(end)`` — the pair always meets; non-matching pairs that sneak
into a shared bucket are removed by the exact filter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of ``points`` to ``intervals`` on equal ``key`` and
    ``start_col <= point_ts <= end_col`` (inclusive, BETWEEN
    semantics). Returns point columns + interval columns (shared key
    columns appear once)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = int(bucket_seconds)
    p = points.withColumn("__b", F.floor(F.unix_timestamp(F.col(point_ts)) / w))
    i = intervals.withColumn(
        "__bs",
        F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / w),
            F.floor(F.unix_timestamp(F.col(end_col)) / w),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    on = [*keys, "__b"]
    joined = p.join(i, on=on, how="inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__b")
