"""Differential SQL fuzzing: seeded-random ANSI queries run through the
FULL catalog path (``LakeCatalog.sql`` over ingested lake tables —
view registration, predicate extraction, manifest/Bloom file pruning,
dialect rewrites) and through DuckDB over the *same in-memory frame*,
asserting identical result multisets.

Why this exists: the 250+ registry queries pin known shapes; random
conjuncts/projections walk the rewrite machinery into corners no
hand-written query does (operator precedence through the pruning
parser, three-valued logic with NULLs, IN-list edge types, set-op
dedup). The fixture derives every value ONCE (in DuckDB, exported to
pandas, fed to both engines) so no cross-engine arithmetic can differ;
all numeric columns are integers, which makes every comparison exact.

Determinism: queries carry no LIMIT and results compare as sorted
tuple multisets, so row order never matters; the generator is seeded,
so a failure reproduces by seed.
"""

import random

import duckdb
import pytest

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

N_QUERIES = 120

INT_COLS_LI = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
               "qty", "cents", "disc"]
STR_COLS_LI = ["rf", "ls"]
INT_COLS_ORD = ["o_orderkey", "o_custkey", "ocents"]
STR_COLS_ORD = ["status", "prio"]

RF_VALS = ["A", "N", "R"]
LS_VALS = ["F", "O"]
STATUS_VALS = ["F", "O", "P"]


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    con = duckdb.connect()
    # one derivation for both engines; disc is NULL on every third line
    # so three-valued logic gets exercised
    li = con.execute(
        """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               CAST(floor(l_quantity) AS BIGINT) AS qty,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
               CASE WHEN l_linenumber % 3 = 0 THEN NULL
                    ELSE CAST(floor(l_discount * 100) AS BIGINT) END AS disc,
               l_returnflag AS rf, l_linestatus AS ls
        FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
        ORDER BY l_orderkey, l_linenumber LIMIT 2000
        """
    ).df()
    orders = con.execute(
        """
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS ocents,
               o_orderstatus AS status, o_orderpriority AS prio
        FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
        ORDER BY o_orderkey LIMIT 800
        """
    ).df()
    con.register("li", li)
    con.register("ord_t", orders)
    cat = LakeCatalog(spark, str(tmp_path_factory.mktemp("fuzz")))
    LakeWriter(cat.table("li")).write(spark.createDataFrame(li))
    LakeWriter(cat.table("ord_t")).write(spark.createDataFrame(orders))
    yield cat, con
    con.close()


class Gen:
    """Seeded random query generator over the li/ord_t schemas."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)

    def int_expr(self, cols, depth=0):
        r = self.r
        if depth >= 2 or r.random() < 0.55:
            return r.choice(cols) if r.random() < 0.8 else str(r.randint(0, 50))
        kind = r.choice(["add", "mul", "mod", "case", "neg"])
        a = self.int_expr(cols, depth + 1)
        if kind == "add":
            return f"({a} + {self.int_expr(cols, depth + 1)})"
        if kind == "mul":
            return f"({a} * {r.randint(1, 5)})"
        if kind == "mod":
            return f"({a} % {r.randint(2, 13)})"
        if kind == "neg":
            return f"(- {a})"
        return (
            f"(CASE WHEN {self.pred(cols, [], depth + 1)} THEN {a} "
            f"ELSE {self.int_expr(cols, depth + 1)} END)"
        )

    def pred(self, int_cols, str_pool, depth=0):
        r = self.r
        if depth < 2 and r.random() < 0.35:
            op = r.choice(["AND", "OR"])
            return (
                f"({self.pred(int_cols, str_pool, depth + 1)} {op} "
                f"{self.pred(int_cols, str_pool, depth + 1)})"
            )
        if depth < 2 and r.random() < 0.1:
            return f"(NOT {self.pred(int_cols, str_pool, depth + 1)})"
        if str_pool and r.random() < 0.3:
            col, vals = r.choice(str_pool)
            if r.random() < 0.5:
                return f"{col} = '{r.choice(vals)}'"
            picks = r.sample(vals, k=r.randint(1, len(vals)))
            return f"{col} IN ({', '.join(repr(v) for v in picks)})"
        col = r.choice(int_cols)
        kind = r.choice(["cmp", "between", "in", "null"])
        if kind == "cmp":
            op = r.choice(["=", "<>", "<", "<=", ">", ">="])
            rhs = (
                str(r.randint(0, 2000))
                if r.random() < 0.7
                else self.int_expr(int_cols, depth + 1)
            )
            return f"{col} {op} {rhs}"
        if kind == "between":
            lo = r.randint(0, 1000)
            return f"{col} BETWEEN {lo} AND {lo + r.randint(0, 500)}"
        if kind == "in":
            ks = ", ".join(str(r.randint(0, 100)) for _ in range(r.randint(1, 5)))
            return f"{col} IN ({ks})"
        return f"{col} IS {'NOT ' if r.random() < 0.5 else ''}NULL"

    def query(self) -> str:
        r = self.r
        str_pool_li = [("rf", RF_VALS), ("ls", LS_VALS)]
        shape = r.choice(
            ["project", "agg", "join", "setop", "insub", "window"]
        )
        if shape == "project":
            exprs = [
                f"{self.int_expr(INT_COLS_LI)} AS c{i}"
                for i in range(r.randint(1, 4))
            ]
            if r.random() < 0.5:
                exprs.append(r.choice(STR_COLS_LI))
            return (
                f"SELECT {', '.join(exprs)} FROM li "
                f"WHERE {self.pred(INT_COLS_LI, str_pool_li)}"
            )
        if shape == "agg":
            keys = r.sample(STR_COLS_LI + ["l_linenumber"], k=r.randint(1, 2))
            aggs = [
                "count(*) AS n",
                f"sum({self.int_expr(INT_COLS_LI)}) AS s",
                f"min({r.choice(INT_COLS_LI)}) AS lo",
                f"max({r.choice(INT_COLS_LI)}) AS hi",
                f"count({r.choice(INT_COLS_LI)}) AS nn",
            ][: r.randint(2, 5)]
            having = (
                f" HAVING count(*) > {r.randint(0, 20)}"
                if r.random() < 0.4
                else ""
            )
            return (
                f"SELECT {', '.join(keys + aggs)} FROM li "
                f"WHERE {self.pred(INT_COLS_LI, str_pool_li)} "
                f"GROUP BY {', '.join(keys)}{having}"
            )
        if shape == "join":
            return (
                f"SELECT l_orderkey, qty, ocents, status FROM li "
                f"JOIN ord_t ON l_orderkey = o_orderkey "
                f"WHERE {self.pred(INT_COLS_LI, str_pool_li)} "
                f"AND {self.pred(INT_COLS_ORD, [('status', STATUS_VALS)])}"
            )
        if shape == "setop":
            op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
            col = r.choice(INT_COLS_LI)
            return (
                f"SELECT {col} FROM li WHERE "
                f"{self.pred(INT_COLS_LI, str_pool_li)} {op} "
                f"SELECT {col} FROM li WHERE "
                f"{self.pred(INT_COLS_LI, str_pool_li)}"
            )
        if shape == "insub":
            return (
                f"SELECT l_orderkey, cents FROM li "
                f"WHERE {self.pred(INT_COLS_LI, str_pool_li)} "
                f"AND l_orderkey IN (SELECT o_orderkey FROM ord_t WHERE "
                f"{self.pred(INT_COLS_ORD, [('status', STATUS_VALS)])})"
            )
        part = r.choice(STR_COLS_LI)
        return (
            f"SELECT rf, ls, count(*) OVER (PARTITION BY {part}) AS w "
            f"FROM li WHERE {self.pred(INT_COLS_LI, str_pool_li)}"
        )


def _norm(rows):
    out = []
    for row in rows:
        out.append(
            tuple(
                int(v) if isinstance(v, (int, float)) and v == int(v)
                else v
                for v in row
            )
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize("batch", range(6))
def test_differential_fuzz(env, batch):
    cat, con = env
    per = N_QUERIES // 6
    for i in range(per):
        seed = batch * per + i
        q = Gen(seed).query()
        mine = _norm(tuple(r) for r in cat.sql(q).collect())
        ref = _norm(con.execute(q).fetchall())
        assert mine == ref, (
            f"seed {seed} diverged ({len(mine)} vs {len(ref)} rows):\n{q}\n"
            f"spark head: {mine[:5]}\nduckdb head: {ref[:5]}"
        )
