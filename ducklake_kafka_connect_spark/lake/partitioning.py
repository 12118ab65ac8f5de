"""Partition-expression mini-parser and derived-column materialization.

The reference accepts partition specs like ``year(created_at),
month(created_at), event_type`` per table
(``connect/DucklakeSinkConfig.java:365-379``) and applies them with
``ALTER TABLE … SET PARTITIONED BY`` (``ingestor/DucklakeTableManager.java:207-219``).

Spark partitions on *columns*, so temporal expressions are materialized
as hidden derived columns (prefix ``_p_``) that become hive-style
partition directories; raw column specs partition on the column itself.
Readers drop the hidden columns; Catalyst still prunes on them when a
query filters on e.g. ``year(ts)`` via the derived column.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FN_RE = re.compile(r"^\s*(year|month|day)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$")
_COL_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*$")

_FNS = {"year": F.year, "month": F.month, "day": F.dayofmonth}


@dataclass(frozen=True)
class PartitionExpr:
    fn: str | None  # None for a raw column
    column: str

    @property
    def output_name(self) -> str:
        if self.fn is None:
            return self.column
        return f"_p_{self.fn}_{self.column}"

    @property
    def dir_name(self) -> str:
        """Directory-layout column: a prefixed copy consumed by
        ``partitionBy`` (removed into the hive dir name), while the real
        value stays as a data column inside each file — so reads never
        need partition discovery, and parquet footer min/max stats prune
        files on the data column."""
        if self.fn is None:
            return f"_pd_{self.column}"
        return f"_pd_{self.fn}_{self.column}"

    @property
    def is_derived(self) -> bool:
        return self.fn is not None

    def to_column(self) -> Column:
        if self.fn is None:
            return F.col(self.column)
        return _FNS[self.fn](F.col(self.column))

    def spec_string(self) -> str:
        return self.column if self.fn is None else f"{self.fn}({self.column})"


def parse_partition_exprs(spec: str | list[str] | None) -> list[PartitionExpr]:
    """Parse ``"year(c), month(c), other_col"`` → [PartitionExpr, …].

    Unknown functions / malformed entries raise ValueError (the reference
    validates partition config the same way, DucklakeSinkConfigPartitionTest).
    """
    if not spec:
        return []
    parts = spec if isinstance(spec, list) else [p for p in spec.split(",") if p.strip()]
    out: list[PartitionExpr] = []
    for p in parts:
        m = _FN_RE.match(p)
        if m:
            out.append(PartitionExpr(fn=m.group(1), column=m.group(2)))
            continue
        m = _COL_RE.match(p)
        if m:
            out.append(PartitionExpr(fn=None, column=m.group(1)))
            continue
        raise ValueError(f"Invalid partition expression: {p!r}")
    return out


def with_partition_columns(df: DataFrame, exprs: list[PartitionExpr]) -> DataFrame:
    """Materialize derived partition columns (no-op for raw columns)."""
    for e in exprs:
        if e.is_derived:
            df = df.withColumn(e.output_name, e.to_column())
    return df


def partition_column_names(exprs: list[PartitionExpr]) -> list[str]:
    return [e.output_name for e in exprs]


def derived_column_names(exprs: list[PartitionExpr]) -> list[str]:
    return [e.output_name for e in exprs if e.is_derived]


def dir_column_names(exprs: list[PartitionExpr]) -> list[str]:
    return [e.dir_name for e in exprs]


def with_dir_columns(df: DataFrame, exprs: list[PartitionExpr]) -> DataFrame:
    """Add the prefixed directory-layout copies used by partitionBy."""
    for e in exprs:
        df = df.withColumn(e.dir_name, F.col(e.output_name))
    return df


def dir_key_to_partition_tuple(part_key: str, exprs: list[PartitionExpr]) -> tuple:
    """'_pd_year_ts=2023/_pd_month_ts=1' → values ordered like exprs
    (hive null marker preserved as-is)."""
    d = {}
    if part_key:
        for seg in part_key.split("/"):
            k, _, v = seg.partition("=")
            d[k] = v
    return tuple(d.get(e.dir_name) for e in exprs)
