"""Replicates the driver's t2 gate locally: every queries() entry with an
oracle must match DuckDB on row count, column names, and (order-insensitive)
values at sf0.001/sf0.01."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def df_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


# The driver's value-hash is TYPE-sensitive (a DuckDB HUGEINT hashes
# differently from a Spark BIGINT even when every value is equal), while
# canon() above stringifies — so equal-looking results can still fail the
# driver gate.  This map pins the oracle output type each Spark type must
# produce; anything outside it (HUGEINT from an uncast sum(), DECIMAL from
# integer avg(), …) fails locally before the driver ever sees it.
_DDB_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_SPARK_TO_DDB_TYPES = {
    # Integer WIDTH drift is fine: DuckDB materializes all of these as plain
    # Python ints, so the driver hash agrees (verified: int-vs-BIGINT queries
    # have green driver rows).  HUGEINT/DECIMAL materialize as Decimal — the
    # failure mode this guard exists for.
    "bigint": _DDB_INTS,
    "int": _DDB_INTS,
    "smallint": _DDB_INTS,
    "tinyint": _DDB_INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
}


def _assert_oracle_types(name, sdf, ddb, sql):
    desc = ddb.execute(f"DESCRIBE {sql}").fetchall()
    ddb_types = {row[0]: row[1] for row in desc}
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    problems = []
    for col, stype in spark_types.items():
        dtype = ddb_types.get(col)
        if dtype is None:
            continue  # column-name mismatch is caught by the main assert
        if "HUGEINT" in dtype:
            problems.append(f"{col}: oracle {dtype} (uncast integer sum?)")
            continue
        if dtype.startswith("DECIMAL") and not stype.startswith("decimal"):
            problems.append(f"{col}: oracle {dtype} vs spark {stype}")
            continue
        if stype.startswith("decimal") and not dtype.startswith("DECIMAL"):
            # e.g. a SQL literal like `/ 2.0` silently making the Spark
            # side DECIMAL while the oracle stays DOUBLE
            problems.append(f"{col}: spark {stype} vs oracle {dtype}")
            continue
        expected = _SPARK_TO_DDB_TYPES.get(stype)
        if expected is not None and dtype not in expected:
            problems.append(f"{col}: oracle {dtype} vs spark {stype}")
    assert not problems, (
        f"{name}: oracle/Spark result-type drift (driver hash would "
        f"mismatch even on equal values): {problems}"
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = entry_mod.oracle_sql()[name]
    _assert_oracle_types(name, sdf, ddb, sql)
    cur = ddb.execute(sql)
    ddb_cols = [d[0] for d in cur.description]
    ddb_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: column names differ: {spark_cols} vs {ddb_cols}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(ddb_rows)}"
    )
    a = df_rows(spark_cols, spark_rows)
    b = df_rows(ddb_cols, ddb_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
