"""DuckDB ``ASOF [LEFT] JOIN`` SQL surface through LakeCatalog.sql,
cross-checked against DuckDB's native ASOF join on identical frames
(lake/table.py ``_rewrite_asof_join``)."""

import datetime as dt
import os
import tempfile
import uuid

import duckdb
import pytest

from ducklake_kafka_connect_spark.lake import LakeCatalog
from ducklake_kafka_connect_spark.lake.writer import LakeWriter


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_env(spark):
    quotes = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:30:00"), 1.0),
         ("u", _ts("2024-01-01 10:00:00"), 2.0),
         ("u", _ts("2024-01-01 10:30:00"), 3.0),
         ("w", _ts("2024-01-01 08:00:00"), 9.0)],
        "k string, ts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")),
         (2, "u", _ts("2024-01-01 11:00:00")),
         (3, "u", _ts("2024-01-01 09:00:00")),
         (4, "x", _ts("2024-01-01 12:00:00"))],
        "id long, k string, ts timestamp",
    )
    root = os.path.join(tempfile.gettempdir(), "asofsql_" + uuid.uuid4().hex[:8])
    cat = LakeCatalog(spark, root)
    LakeWriter(cat.table("trades"), pk=["id"]).append(trades)
    LakeWriter(cat.table("quotes"), pk=["k", "ts"]).append(quotes)
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    return cat, con


@pytest.mark.parametrize(
    "op,kind",
    [(">=", "ASOF JOIN"), (">", "ASOF JOIN"), ("<=", "ASOF JOIN"),
     ("<", "ASOF JOIN"), (">=", "ASOF LEFT JOIN"), ("<=", "ASOF LEFT JOIN")],
)
def test_all_operators_match_duckdb(asof_env, op, kind):
    cat, con = asof_env
    q = (
        f"SELECT t.id, t.k, q.price AS price FROM trades t {kind} quotes q "
        f"ON t.k = q.k AND t.ts {op} q.ts ORDER BY t.id"
    )
    mine = [(r["id"], r["k"], r["price"]) for r in cat.sql(q).collect()]
    ref = [tuple(r) for r in con.execute(q).fetchall()]
    assert mine == ref, f"{kind} {op}"


def test_reversed_orientation_and_where_group(asof_env):
    cat, con = asof_env
    # inequality written right-side-first must flip, WHERE + GROUP BY
    # apply over the rewritten view
    q = (
        "SELECT t.k, count(*) AS n, round(sum(q.price), 6) AS s "
        "FROM trades t ASOF JOIN quotes q "
        "ON q.k = t.k AND q.ts <= t.ts "
        "WHERE q.price > 1.0 GROUP BY t.k ORDER BY t.k"
    )
    assert [tuple(r) for r in cat.sql(q).collect()] == con.execute(q).fetchall()


def test_subquery_side_and_keyless(asof_env):
    cat, con = asof_env
    q = (
        "SELECT t.id, q.price AS p FROM trades t ASOF LEFT JOIN "
        "(SELECT ts, price FROM quotes WHERE k = 'u') q "
        "ON t.ts >= q.ts ORDER BY t.id"
    )
    assert [tuple(r) for r in cat.sql(q).collect()] == con.execute(q).fetchall()


def test_qualified_star_expansion(asof_env):
    cat, _ = asof_env
    out = cat.sql(
        "SELECT t.*, q.price AS p FROM trades t ASOF LEFT JOIN quotes q "
        "ON t.k = q.k AND t.ts >= q.ts ORDER BY t.id"
    )
    # left table columns (incl. the lake's _inserted_at stamp) + alias
    assert out.columns == ["id", "k", "ts", "_inserted_at", "p"]
    assert out.count() == 4


def test_name_collision_suffix(asof_env):
    cat, _ = asof_env
    # unqualified right columns that collide with left names surface
    # with a _r suffix in the joined view's shape
    out = cat.sql(
        "SELECT t.id, q.k AS qk, q.ts AS qts FROM trades t ASOF JOIN quotes q "
        "ON t.k = q.k AND t.ts >= q.ts ORDER BY t.id"
    )
    rows = {r["id"]: (r["qk"], r["qts"]) for r in out.collect()}
    assert rows[1] == ("u", _ts("2024-01-01 10:00:00"))


def test_refusals(asof_env):
    cat, _ = asof_env
    with pytest.raises(ValueError, match="WITH prelude"):
        cat.sql(
            "WITH x AS (SELECT * FROM trades) SELECT x.id FROM x "
            "ASOF JOIN quotes q ON x.k = q.k AND x.ts >= q.ts"
        )
    with pytest.raises(ValueError, match="exactly one inequality"):
        cat.sql(
            "SELECT t.id FROM trades t ASOF JOIN quotes q "
            "ON t.k = q.k AND t.ts >= q.ts AND t.ts > q.ts"
        )
    with pytest.raises(ValueError, match="inequality"):
        cat.sql(
            "SELECT t.id FROM trades t ASOF JOIN quotes q ON t.k = q.k"
        )
    with pytest.raises(ValueError, match="needs an alias"):
        cat.sql(
            "SELECT id FROM trades t ASOF JOIN (SELECT * FROM quotes) "
            "ON t.ts >= ts"
        )
