"""Deterministic sharded export for training-data handoff.

A corpus pipeline's last step is exporting curated rows into N shard
files a trainer can stream. Two properties matter at 100 TB: shard
assignment must be CONTENT-STABLE (re-running the export after an
upstream change moves only the rows that changed, so downstream caches
and resumable readers keep working), and the write must be one
partitioned pass (no driver-side iteration, no global sort unless
requested). Shard id = first-60-md5-bits(key) mod n_shards — the same
hash primitive the dedup family uses, emitted identically in SQL so the
accounting query is oracle-checkable.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import h60_col, h60_sql


def shard_col(key: Column, n_shards: int) -> Column:
    """Content-stable shard id in [0, n_shards)."""
    return (h60_col(key) % F.lit(n_shards)).cast("long")


def shard_sql(key_expr: str, n_shards: int) -> str:
    return f"({h60_sql(key_expr)} % {n_shards})"


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str,
    order_col: str | None = None,
) -> list[str]:
    """Write ``df`` as JSONL under ``out_dir/shard=K/`` directories.

    One repartition on the shard id co-locates each shard into a single
    task (so each shard directory holds one file absent skew), and an
    optional ``order_col`` sorts rows within each shard file —
    sortWithinPartitions, never a global sort. Returns the shard
    directory paths. At scale this is the terminal one-shuffle pass of
    the pipeline; nothing is collected to the driver."""
    sharded = df.withColumn(
        "shard", shard_col(F.col(key_col).cast("string"), n_shards)
    ).repartition(n_shards, "shard")
    if order_col is not None:
        sharded = sharded.sortWithinPartitions("shard", order_col)
    sharded.write.partitionBy("shard").mode("overwrite").json(out_dir)
    return [
        os.path.join(out_dir, d)
        for d in sorted(os.listdir(out_dir))
        if d.startswith("shard=")
    ]
