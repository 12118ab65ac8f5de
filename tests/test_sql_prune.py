"""SQL-path manifest pruning: ``LakeCatalog.sql`` must open the same
file count for a selective point query as ``read(where=)`` does
(VERDICT r7 #1 — without this a SQL user's point lookup opens every
live file's footer at 100 TB scale)."""

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.sql_prune import (
    extract_table_predicates,
)


SCHEMAS = {
    "orders": {"o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"},
    "customer": {"c_custkey", "c_name", "c_mktsegment"},
}
TABLES = set(SCHEMAS)


def ex(query, tables=TABLES, schemas=SCHEMAS):
    return extract_table_predicates(query, tables, schemas)


class TestExtraction:
    def test_single_table_point(self):
        got = ex("SELECT * FROM orders WHERE o_orderkey = 42")
        assert got == {"orders": "o_orderkey = 42"}

    def test_conjuncts_combine(self):
        got = ex(
            "SELECT o_custkey FROM orders "
            "WHERE o_orderkey >= 10 AND o_totalprice < 5.5 "
            "GROUP BY o_custkey"
        )
        assert got == {"orders": "o_orderkey >= 10 AND o_totalprice < 5.5"}

    def test_string_literal_escaped(self):
        got = ex("SELECT * FROM customer WHERE c_name = 'O''Brien'")
        assert got == {"customer": "c_name = 'O''Brien'"}

    def test_between_in_null(self):
        got = ex(
            "SELECT * FROM orders WHERE o_orderkey BETWEEN 5 AND 9 "
            "AND o_custkey IN (1, 2) AND o_totalprice IS NOT NULL "
            "AND o_orderdate IS NULL"
        )
        assert got == {
            "orders": "o_orderkey BETWEEN 5 AND 9 AND o_custkey IN (1, 2)"
            " AND o_totalprice IS NOT NULL AND o_orderdate IS NULL"
        }

    def test_qualified_join_attribution(self):
        got = ex(
            "SELECT * FROM orders o JOIN customer c "
            "ON o.o_custkey = c.c_custkey "
            "WHERE o.o_orderkey = 7 AND c.c_mktsegment = 'BUILDING'"
        )
        assert got == {
            "orders": "o_orderkey = 7",
            "customer": "c_mktsegment = 'BUILDING'",
        }

    def test_unqualified_in_join_dropped(self):
        got = ex(
            "SELECT * FROM orders o JOIN customer c "
            "ON o.o_custkey = c.c_custkey WHERE o_orderkey = 7"
        )
        assert got == {}

    def test_is_null_dropped_under_join(self):
        got = ex(
            "SELECT * FROM orders o LEFT JOIN customer c "
            "ON o.o_custkey = c.c_custkey "
            "WHERE c.c_mktsegment IS NULL AND o.o_orderkey > 3"
        )
        assert got == {"orders": "o_orderkey > 3"}

    def test_self_join_never_pruned(self):
        got = ex(
            "SELECT * FROM orders a JOIN orders b "
            "ON a.o_custkey = b.o_custkey WHERE a.o_orderkey = 5"
        )
        assert got == {}

    def test_or_defeats_extraction(self):
        assert ex("SELECT * FROM orders WHERE o_orderkey = 1 OR o_custkey = 2") == {}

    def test_union_defeats_extraction(self):
        q = (
            "SELECT o_orderkey FROM orders WHERE o_orderkey = 1 "
            "UNION ALL SELECT o_orderkey FROM orders"
        )
        assert ex(q) == {}

    def test_multi_statement_defeats_extraction(self):
        assert ex("SELECT 1; SELECT * FROM orders WHERE o_orderkey = 1") == {}

    def test_subquery_where_invisible(self):
        got = ex(
            "SELECT * FROM orders WHERE o_custkey IN "
            "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTO')"
        )
        # the inner WHERE binds the subquery; the outer IN-subquery
        # conjunct is not a provable literal shape — nothing extracted
        assert got == {}

    def test_unknown_column_dropped(self):
        got = ex("SELECT * FROM orders WHERE nope = 1 AND o_orderkey = 2")
        assert got == {"orders": "o_orderkey = 2"}

    def test_alias_shadowing_table_name(self):
        # alias 'customer' binds orders; conjuncts via it go to orders
        got = ex(
            "SELECT * FROM orders AS customer WHERE customer.o_orderkey = 9"
        )
        assert got == {"orders": "o_orderkey = 9"}

    def test_unlexable_query_safe(self):
        assert ex("SELECT * FROM orders WHERE `o_orderkey` = 1") == {}

    def test_derived_table_not_confused(self):
        got = ex(
            "SELECT * FROM (SELECT * FROM orders) t WHERE t.o_orderkey = 1"
        )
        # 'orders' occurs only inside parens: no depth-0 relation
        assert got == {}


def _write_ranged(spark, tmp_path, name):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.table(name)
    w = LakeWriter(t, pk=["id"])
    for base in (0, 1000, 2000, 3000):
        w.append(
            spark.range(base, base + 100).select(
                F.col("id"),
                (F.col("id") % 7).alias("bucket"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
        )
    return cat, t


class TestCatalogSqlPruning:
    def test_point_query_opens_same_files_as_read_where(self, spark, tmp_path):
        cat, t = _write_ranged(spark, tmp_path, "sq1")
        pred = "id = 2050"
        via_read = t.read(where=pred)
        via_sql = cat.sql("SELECT * FROM sq1 WHERE id = 2050")
        all_files = t.read().inputFiles()
        assert len(via_read.inputFiles()) < len(all_files)
        assert len(via_sql.inputFiles()) == len(via_read.inputFiles())
        assert [r["id"] for r in via_sql.collect()] == [2050]

    def test_join_query_prunes_each_side(self, spark, tmp_path):
        cat, t = _write_ranged(spark, tmp_path, "sq2")
        cat2 = LakeCatalog(spark, str(tmp_path))
        u = cat2.table("sq2b")
        w = LakeWriter(u, pk=["bid"])
        for base in (0, 1000):
            w.append(
                spark.range(base, base + 50).select(
                    F.col("id").alias("bid"),
                    F.lit("x").alias("tag"),
                )
            )
        q = (
            "SELECT a.id, b.tag FROM sq2 a JOIN sq2b b ON a.id = b.bid "
            "WHERE a.id >= 3000 AND b.bid >= 1000"
        )
        df = cat.sql(q)
        # a-side: only the 3000-file; b-side: only the 1000-file
        assert len(df.inputFiles()) == len(
            t.read(where="id >= 3000").inputFiles()
        ) + len(u.read(where="bid >= 1000").inputFiles())
        assert df.count() == 0  # sq2b holds bids 0..49 and 1000..1049 only

        q2 = (
            "SELECT a.id, b.tag FROM sq2 a JOIN sq2b b ON a.id = b.bid "
            "WHERE a.id >= 1000 AND b.bid >= 1000"
        )
        assert cat.sql(q2).count() == 50

    def test_where_hints_prune_and_filter(self, spark, tmp_path):
        cat, t = _write_ranged(spark, tmp_path, "sq3")
        df = cat.sql(
            "SELECT count(*) AS n FROM sq3",
            where_hints={"sq3": "id >= 3000"},
        )
        assert df.collect()[0]["n"] == 100
        assert len(df.inputFiles()) == len(t.read(where="id >= 3000").inputFiles())

    def test_unprunable_sql_still_correct(self, spark, tmp_path):
        cat, _ = _write_ranged(spark, tmp_path, "sq4")
        n = cat.sql(
            "SELECT count(*) AS n FROM sq4 WHERE id = 50 OR id = 3050"
        ).collect()[0]["n"]
        assert n == 2

    def test_versioned_sql_still_prunes(self, spark, tmp_path):
        cat, t = _write_ranged(spark, tmp_path, "sq5")
        v = t.manifest().version
        got = cat.sql(
            "SELECT count(*) AS n FROM sq5 WHERE id >= 3000",
            versions={"sq5": v},
        ).collect()[0]["n"]
        assert got == 100


class TestCatalogPrefix:
    def test_strip_basic(self):
        from ducklake_kafka_connect_spark.lake.sql_prune import (
            strip_catalog_prefix as sp,
        )

        assert (
            sp("SELECT * FROM lake.main.orders WHERE o_orderkey = 1")
            == "SELECT * FROM orders WHERE o_orderkey = 1"
        )
        # qualified column through the namespace also drops it
        assert (
            sp("SELECT lake.main.orders.o_orderkey FROM lake.main.orders")
            == "SELECT orders.o_orderkey FROM orders"
        )
        # string literals untouched
        q = "SELECT * FROM orders WHERE c = 'lake.main.orders'"
        assert sp(q) == q
        # unlexable input returned unchanged
        q2 = "SELECT * FROM `lake.main.orders`"
        assert sp(q2) == q2

    def test_sql_accepts_reference_namespace(self, spark, tmp_path):
        cat, t = _write_ranged(spark, tmp_path, "sq6")
        df = cat.sql(
            "SELECT count(*) AS n FROM lake.main.sq6 WHERE id >= 3000"
        )
        assert df.collect()[0]["n"] == 100
        assert len(df.inputFiles()) == len(t.read(where="id >= 3000").inputFiles())


class TestRowCount:
    def test_metadata_only_count(self, spark, tmp_path):
        cat, t = _write_ranged(spark, tmp_path, "sq7")
        assert t.row_count() == 400
        assert t.row_count() == t.read().count()
        # earlier version still answers from its own manifest
        v1 = t.manifest().version
        LakeWriter(t, pk=["id"]).append(
            spark.range(9000, 9050).select(
                F.col("id"),
                (F.col("id") % 7).alias("bucket"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
        )
        assert t.row_count() == 450
        assert t.row_count(version=v1) == 400

    def test_missing_rows_stat_falls_back_to_scan(self, spark, tmp_path):
        cat, t = _write_ranged(spark, tmp_path, "sq8")
        m = t.manifest()
        f0 = m.all_files()[0]
        m.file_stats[f0].pop("__rows", None)  # simulate a pre-__rows file
        assert sum(
            1 for f in m.all_files() if "__rows" not in (m.file_stats.get(f) or {})
        ) == 1
        # count directly off the doctored manifest object path
        import ducklake_kafka_connect_spark.lake.table as tbl

        orig = t.manifest
        t.manifest = lambda version=None: m
        try:
            assert t.row_count() == 400
        finally:
            t.manifest = orig


class TestViewHygiene:
    def test_pruned_view_does_not_linger(self, spark, tmp_path):
        """Temp views outlive catalog.sql (D1), so the pruned+filtered
        registration must be swapped back to the full table afterwards —
        a later direct spark.sql must see every row."""
        cat, t = _write_ranged(spark, tmp_path, "sq9")
        df = cat.sql("SELECT count(*) AS n FROM sq9 WHERE id = 2050")
        assert df.collect()[0]["n"] == 1
        assert spark.sql("SELECT count(*) AS n FROM sq9").collect()[0]["n"] == 400
        # and the pruned result itself stays correct after re-registration
        assert df.collect()[0]["n"] == 1


def test_recursive_cte_through_catalog_sql(spark, tmp_path):
    """WITH RECURSIVE flows through LakeCatalog.sql: the conjunct
    extractor must neither break on the syntax nor mis-prune the lake
    view the recursion scans."""
    from pyspark.sql import functions as F

    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeTable, LakeWriter

    t = LakeTable(spark, str(tmp_path), "chain")
    LakeWriter(t).write(
        spark.range(10).select(
            F.col("id").alias("node"), (F.col("id") + 1).alias("next")
        )
    )
    cat = LakeCatalog(spark, str(tmp_path))
    out = cat.sql(
        """
        WITH RECURSIVE walk(node, d) AS (
          SELECT CAST(0 AS BIGINT), 0
          UNION ALL
          SELECT c.next, w.d + 1
          FROM walk w JOIN chain c ON c.node = w.node
          WHERE w.d < 5
        )
        SELECT max(d) AS depth, count(*) AS n FROM walk
        """
    ).collect()
    assert out == [(5, 6)]
