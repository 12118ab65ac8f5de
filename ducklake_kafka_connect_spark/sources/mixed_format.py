"""Mixed-format detection and dispatch (reference operator A7).

The reference allows one Kafka partition to interleave Arrow IPC and
JSON payloads: ``put()`` dispatches on the decoded value type
(``connect/DucklakeSinkTask.java:630-638,550-559``, ``README.md:120-127``).

Spark shape: sniff the payload head — Arrow IPC streams open with an
encapsulated-message marker (0xFFFFFFFF continuation then metadata
length) while JSON starts with ``{``/``[`` after optional whitespace —
split the batch with a codegen'd predicate, decode each side with its
native path, and union by name. The sniff reads 8 bytes per row
JVM-side; no Python touches rows that are not Arrow payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .arrow_ipc import decode_arrow_ipc
from .json_decode import decode_json
from ..lake.relation_cache import local_rows_df

# Arrow IPC streaming format begins each message with a 4-byte
# continuation marker 0xFFFFFFFF (Arrow columnar format spec ≥ 0.15).
_ARROW_MAGIC = bytes([0xFF, 0xFF, 0xFF, 0xFF])


def is_arrow_ipc_col(value: Column) -> Column:
    """Predicate: payload starts with the IPC continuation marker."""
    head = F.substring(value.cast("binary"), 1, 4)
    return head == F.lit(_ARROW_MAGIC)


def split_by_format(df: DataFrame, value_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """(arrow_rows, other_rows) — one pruned scan each side; the
    predicate is a cheap prefix compare, fully JVM-side."""
    pred = is_arrow_ipc_col(F.col(value_col))
    return df.filter(pred), df.filter(~pred | F.col(value_col).isNull())


def decode_mixed(
    df: DataFrame,
    value_col: str = "value",
    json_sample_size: int = 1000,
) -> DataFrame:
    """Decode a batch that may interleave Arrow IPC and JSON payloads.

    Arrow rows explode via mapInArrow; JSON rows go through sampled
    inference + from_json; outputs align by unionByName with null fill
    (schema drift across formats lands in the reconcile step downstream,
    same as the reference's unified-schema merge).
    """
    arrow_rows, json_rows = split_by_format(df, value_col)
    out = None
    if not arrow_rows.isEmpty():
        out = decode_arrow_ipc(arrow_rows, value_col)
    if not json_rows.isEmpty():
        decoded = decode_json(json_rows, value_col, sample_size=json_sample_size)
        out = (
            decoded
            if out is None
            else out.unionByName(decoded, allowMissingColumns=True)
        )
    if out is None:
        return local_rows_df(df.sparkSession, [], "value string")
    return out
