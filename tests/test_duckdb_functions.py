"""DuckDB scalar-function parity in catalog SQL — every rewrite in
``lake/table.py _rewrite_duckdb_functions`` cross-checked against
DuckDB running the identical statement."""

import os
import tempfile
import uuid

import duckdb
import pytest

from ducklake_kafka_connect_spark.lake import LakeCatalog


@pytest.fixture(scope="module")
def env(spark):
    cat = LakeCatalog(
        spark, os.path.join(tempfile.gettempdir(), "fnp_" + uuid.uuid4().hex[:6])
    )
    return cat, duckdb.connect()


CASES = [
    # list family → array builtins
    "SELECT list_transform(list_value(1,2,3), x -> x * 2) AS a",
    "SELECT list_filter(list_value(1,2,3,4), x -> x % 2 = 0) AS a",
    "SELECT list_contains(list_value(1,2,3), 2) AS a,"
    "       list_contains(list_value(1,2,3), 9) AS b",
    "SELECT list_concat(list_value(1,2), list_value(3)) AS a",
    "SELECT array_length(list_value(1,2,3)) AS a",
    # string predicates / search
    "SELECT starts_with('hello', 'he') AS a, ends_with('hello', 'lo') AS b",
    "SELECT strpos('hello', 'll') AS a, strpos('hello', 'zz') AS b",
    "SELECT regexp_matches('hello world', 'o w') AS a,"
    "       regexp_matches('abc', '^z') AS b",
    # epoch extractors
    "SELECT epoch_ms(TIMESTAMP '2024-03-05 06:07:08.123') AS a",
    "SELECT epoch_us(TIMESTAMP '2024-03-05 06:07:08.123456') AS a",
    # strftime/strptime with %-format translation (incl. quoted literal
    # text and the locale-independent tokens)
    "SELECT strftime(TIMESTAMP '2024-03-05 06:07:08', '%Y-%m-%d %H:%M:%S') AS a",
    "SELECT strftime(TIMESTAMP '2024-03-05 06:07:08', '%Y-%m-%dT%H:%M:%S') AS a",
    "SELECT strftime(TIMESTAMP '2024-03-05 06:07:08', '%d/%m/%Y') AS a",
    "SELECT strftime(TIMESTAMP '2024-03-05 06:07:08', '%a %b %d') AS a",
    "SELECT upper(strftime(TIMESTAMP '2024-01-05 18:07:08', '%I %p')) AS a",
    "SELECT strptime('2024-03-05 06:07:08', '%Y-%m-%d %H:%M:%S') AS a",
    "SELECT strptime('05/03/2024', '%d/%m/%Y') AS a",
    # string_split: literal separator regex-escaped ('.' must not be
    # a regex wildcard), empty fields preserved
    "SELECT string_split('a.b.c', '.') AS a",
    "SELECT string_split('a,b,,c', ',') AS a",
    # nesting: rewrites recurse into argument lists
    "SELECT list_transform(string_split('1.2.3', '.'), x -> CAST(x AS INT)) AS a",
]


@pytest.mark.parametrize("q", CASES)
def test_function_parity(env, q):
    cat, con = env
    mine = [
        tuple(list(x) if isinstance(x, (list, tuple)) else x for x in r)
        for r in cat.sql(q).collect()
    ]
    ref = [
        tuple(list(x) if isinstance(x, (list, tuple)) else x for x in r)
        for r in con.execute(q).fetchall()
    ]
    assert mine == ref, q


def test_list_distinct_set_equal(env):
    """DuckDB documents list_distinct's element ORDER as unspecified —
    compare as sets."""
    cat, con = env
    q = "SELECT list_distinct(list_value(1,2,2,3)) AS a"
    (mine,) = cat.sql(q).collect()
    (ref,) = con.execute(q).fetchall()
    assert set(mine["a"]) == set(ref[0])


def test_refusals_and_non_calls(env):
    cat, _ = env
    # computed format: honest refusal beats a silently-wrong pattern
    with pytest.raises(ValueError, match="string literal"):
        cat.sql("SELECT strftime(TIMESTAMP '2024-01-01', concat('%Y', '')) AS a")
    with pytest.raises(ValueError, match="unsupported format token"):
        cat.sql("SELECT strftime(TIMESTAMP '2024-01-01', '%V') AS a")
    # the names must NOT rewrite inside string literals or quoted idents
    (row,) = cat.sql("SELECT 'strpos(x)' AS a, length('epoch_ms(t)') AS b").collect()
    assert row["a"] == "strpos(x)" and row["b"] == len("epoch_ms(t)")


class TestDistinctOn:
    """DuckDB/Postgres DISTINCT ON → row_number window rewrite."""

    @pytest.fixture(scope="class")
    def don(self, spark):
        import datetime as dt

        from ducklake_kafka_connect_spark.lake import LakeWriter

        def _ts(s):
            return dt.datetime.fromisoformat(s)

        cat = LakeCatalog(
            spark,
            os.path.join(tempfile.gettempdir(), "don_" + uuid.uuid4().hex[:6]),
        )
        ev = spark.createDataFrame(
            [(1, "u", _ts("2024-01-01 10:00:00"), 5.0),
             (2, "u", _ts("2024-01-01 11:00:00"), 7.0),
             (3, "w", _ts("2024-01-01 09:00:00"), 1.0),
             (4, "w", _ts("2024-01-01 09:30:00"), 2.0),
             (5, "x", _ts("2024-01-02 00:00:00"), 9.0)],
            "id long, k string, ts timestamp, v double",
        )
        LakeWriter(cat.table("ev"), pk=["id"]).append(ev)
        con = duckdb.connect()
        con.register("ev", ev.toPandas())
        return cat, con

    @pytest.mark.parametrize(
        "q",
        [
            "SELECT DISTINCT ON (k) id, k, v FROM ev ORDER BY k, ts DESC",
            "SELECT DISTINCT ON (k) id, k, v FROM ev ORDER BY k, ts DESC LIMIT 2",
            "SELECT DISTINCT ON (k) id, k FROM ev WHERE v > 1.0 ORDER BY k, v ASC",
            "WITH big AS (SELECT * FROM ev WHERE v >= 2.0) "
            "SELECT DISTINCT ON (k) id, k FROM big ORDER BY k, ts DESC",
        ],
    )
    def test_matches_duckdb(self, don, q):
        cat, con = don
        mine = sorted(tuple(r) for r in cat.sql(q).collect())
        ref = sorted(tuple(r) for r in con.execute(q).fetchall())
        assert mine == ref, q

    def test_star_keeps_shape(self, don):
        cat, _ = don
        out = cat.sql("SELECT DISTINCT ON (k) * FROM ev ORDER BY k, ts DESC")
        assert "__don" not in out.columns
        assert out.count() == 3

    def test_plain_distinct_untouched(self, don):
        cat, _ = don
        assert cat.sql("SELECT DISTINCT k FROM ev").count() == 3
        # aggregate DISTINCT is inside parens — must not trigger
        (row,) = cat.sql("SELECT count(DISTINCT k) AS n FROM ev").collect()
        assert row["n"] == 3


class TestUsingSample:
    """DuckDB USING SAMPLE → Spark TABLESAMPLE (sampling row sets are
    engine-local by nature, so assertions are on counts, bounds, and
    seed determinism — not row identity)."""

    @pytest.fixture(scope="class")
    def us(self, spark, tmp_path_factory):
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

        cat = LakeCatalog(spark, str(tmp_path_factory.mktemp("us")))
        cat.sql("CREATE TABLE big (pk BIGINT, PRIMARY KEY (pk))")
        LakeWriter(cat.table("big"), auto_create=False).write(
            spark.range(10000).select(F.col("id").alias("pk"))
        )
        return cat

    def test_percent_band(self, us):
        n = us.sql("SELECT count(*) AS n FROM big USING SAMPLE 10%").collect()[0]["n"]
        assert 600 <= n <= 1500  # bernoulli 10% of 10k

    def test_percent_keyword(self, us):
        n = us.sql(
            "SELECT count(*) AS n FROM big USING SAMPLE 10 PERCENT"
        ).collect()[0]["n"]
        assert 600 <= n <= 1500

    def test_rows_exact(self, us):
        assert (
            us.sql("SELECT count(*) AS n FROM big USING SAMPLE 50 ROWS")
            .collect()[0]["n"]
            == 50
        )

    def test_reservoir_rows(self, us):
        assert (
            us.sql(
                "SELECT count(*) AS n FROM big USING SAMPLE reservoir(25 ROWS)"
            ).collect()[0]["n"]
            == 25
        )

    def test_seed_deterministic(self, us):
        q = "SELECT sum(pk) AS s FROM big USING SAMPLE 10% (bernoulli, 42)"
        a = us.sql(q).collect()[0]["s"]
        b = us.sql(q).collect()[0]["s"]
        assert a == b

    def test_in_subquery(self, us):
        n = us.sql(
            "SELECT count(*) AS n FROM "
            "(SELECT pk FROM big USING SAMPLE 100 ROWS) WHERE pk >= 0"
        ).collect()[0]["n"]
        assert n == 100
