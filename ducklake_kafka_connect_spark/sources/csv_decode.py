"""CSV value decode (source-format extension, JVM-native).

Kafka Connect's converter family includes simple delimited payloads;
this leg decodes a string/binary ``value`` column of single-line CSV
records under a DECLARED schema via Spark's built-in ``from_csv`` —
whole-stage codegen, zero Python in the hot path (unlike the
Avro/proto pure-Python codecs, CSV needs no wire-format work).

DLQ contract matches the JSON decoder: rows whose parse fails (or
whose typed fields all come back null while the raw line is non-empty
— ``from_csv`` PERMISSIVE nulls fields it cannot convert) carry the
raw line in ``_corrupt``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .json_decode import CORRUPT_COL


def decode_csv(
    df: DataFrame,
    schema_ddl: str,
    value_col: str = "value",
    keep_cols: list[str] | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Decode one CSV record per row under ``schema_ddl`` (a DDL string,
    e.g. ``"pk long, name string, score double"``). Field order in the
    DDL is the column order on the wire. Returns typed columns plus
    ``_corrupt`` (raw line) for unparseable rows."""
    schema = T.StructType.fromDDL(schema_ddl)
    keep = list(keep_cols or [])
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **(options or {}),
    }
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    raw = F.col(value_col).cast("string")
    parsed = df.select(
        *keep,
        raw.alias("__raw"),
        F.from_csv(raw, parse_schema.simpleString(), opts).alias("__rec"),
    )
    field_cols = [F.col(f"__rec.{f.name}").alias(f.name) for f in schema.fields]
    # PERMISSIVE quirk: a line with the WRONG delimiter/arity parses
    # "successfully" with every typed field null — treat an all-null
    # record from a non-empty line as corrupt too (DLQ, not silent
    # null rows), matching the connector's bad-record triage
    all_null = None
    for f in schema.fields:
        c = F.col(f"__rec.{f.name}").isNull()
        all_null = c if all_null is None else (all_null & c)
    corrupt = F.when(
        F.col(f"__rec.{CORRUPT_COL}").isNotNull()
        | (all_null & (F.length(F.trim(F.col("__raw"))) > 0)),
        F.col("__raw"),
    ).alias(CORRUPT_COL)
    return parsed.select(*keep, *field_cols, corrupt)
