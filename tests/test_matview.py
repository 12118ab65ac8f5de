"""Materialized views (lake/matview.py): creation, incremental refresh
via the change feed, group death, markers, guards."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.matview import (
    PROP_BASE_VERSION,
    parse_mv_query,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "lake"))
    w = LakeWriter(c.table("sales"), pk=["id"])
    w.write(
        spark.createDataFrame(
            [(i, f"r{i % 4}", (i % 10) * 100) for i in range(200)],
            "id int, region string, cents long",
        )
    )
    return c, w


MV_DDL = (
    "CREATE MATERIALIZED VIEW mv AS SELECT region, sum(cents) AS total, "
    "count(*) AS n FROM sales GROUP BY region"
)


def _content(cat):
    return {
        r["region"]: (r["total"], r["n"])
        for r in cat.table("mv").read().collect()
    }


def _expected(cat):
    return {
        r["region"]: (r["total"], r["n"])
        for r in cat.table("sales")
        .read()
        .groupBy("region")
        .agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
        .collect()
    }


def test_create_matches_full_aggregate(spark, cat):
    c, _ = cat
    c.sql(MV_DDL)
    assert _content(c) == _expected(c)
    props = c.table("mv").properties()
    assert props[PROP_BASE_VERSION] == str(c.table("sales").current_version())


def test_incremental_refresh_folds_churn(spark, cat):
    c, w = cat
    c.sql(MV_DDL)
    # update (moves a row across groups), insert into a NEW group, delete
    w.write(
        spark.createDataFrame(
            [(5, "r9", 777), (300, "r9", 5)], "id int, region string, cents long"
        )
    )
    w.delete_where("region = 'r2'")
    st = c.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert "incremental" in st["detail"]
    assert _content(c) == _expected(c)
    # marker advanced atomically with the merge
    assert c.table("mv").properties()[PROP_BASE_VERSION] == str(
        c.table("sales").current_version()
    )
    # noop when the base did not move
    assert "noop" in c.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["detail"]


def test_group_death_and_rebirth(spark, cat):
    c, w = cat
    c.sql(MV_DDL)
    w.delete_where("region = 'r3'")
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert "r3" not in _content(c) and _content(c) == _expected(c)
    w.write(
        spark.createDataFrame([(500, "r3", 42)], "id int, region string, cents long")
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c)["r3"] == (42, 1)


def test_where_clause_commutes(spark, cat):
    c, w = cat
    c.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT region, sum(cents) AS total, "
        "count(*) AS n FROM sales WHERE cents >= 500 GROUP BY region"
    )
    w.write(
        spark.createDataFrame(
            # id=6 had cents 600 (in view) -> drops below the predicate;
            # id=7 had 700 -> stays but value changes; insert above/below
            [(6, "r2", 100), (7, "r3", 900), (600, "r0", 50), (601, "r0", 999)],
            "id int, region string, cents long",
        )
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    exp = {
        r["region"]: (r["total"], r["n"])
        for r in c.table("sales")
        .read()
        .filter("cents >= 500")
        .groupBy("region")
        .agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert _content(c) == exp


def test_full_refresh_and_drop(spark, cat):
    c, w = cat
    c.sql(MV_DDL)
    w.write(
        spark.createDataFrame([(700, "r1", 1)], "id int, region string, cents long")
    )
    st = c.sql("REFRESH MATERIALIZED VIEW mv FULL").collect()[0]
    assert "full" in st["detail"] and _content(c) == _expected(c)
    c.sql("DROP MATERIALIZED VIEW mv")
    assert not c.table("mv").exists()
    with pytest.raises(ValueError, match="does not exist"):
        c.sql("DROP MATERIALIZED VIEW mv")
    c.sql("DROP MATERIALIZED VIEW IF EXISTS mv")
    # DROP MATERIALIZED VIEW refuses plain tables
    with pytest.raises(ValueError, match="not a materialized view"):
        c.sql("DROP MATERIALIZED VIEW sales")


def test_count_expr_and_or_replace(spark, cat):
    c, w = cat
    c.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT region, count(*) AS n, "
        "count(CASE WHEN cents > 500 THEN 1 END) AS n_big, "
        "sum(cents) AS total FROM sales GROUP BY region"
    )
    w.write(
        spark.createDataFrame([(3, "r3", 900)], "id int, region string, cents long")
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    exp = {
        r["region"]: (r["n"], r["n_big"])
        for r in c.table("sales").read().groupBy("region").agg(
            F.count("*").alias("n"),
            F.count(F.expr("CASE WHEN cents > 500 THEN 1 END")).alias("n_big"),
        ).collect()
    }
    got = {
        r["region"]: (r["n"], r["n_big"])
        for r in c.table("mv").read().collect()
    }
    assert got == exp
    # OR REPLACE re-materializes with a new definition
    c.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW mv AS SELECT region, "
        "count(*) AS n FROM sales GROUP BY region"
    )
    assert set(c.table("mv").read().columns) >= {"region", "n"}


def test_definition_guards(spark, cat):
    c, _ = cat
    with pytest.raises(ValueError, match="stddev"):
        parse_mv_query("SELECT region, stddev(cents) AS m, count(*) AS n FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="count\\(\\*\\)"):
        parse_mv_query("SELECT region, sum(cents) AS s FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="every GROUP BY"):
        parse_mv_query("SELECT sum(cents) AS s, count(*) AS n FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="unsupported select item"):
        parse_mv_query("SELECT region, cents, count(*) AS n FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="is not a materialized view"):
        from ducklake_kafka_connect_spark.lake.matview import (
            refresh_materialized_view,
        )

        refresh_materialized_view(c, "sales")


def test_refresh_after_base_compaction(spark, cat):
    """OPTIMIZE on the base between refreshes is a content-identical
    rewrite: the change feed across it must fold to zero delta."""
    from ducklake_kafka_connect_spark.lake.maintenance import compact

    c, w = cat
    c.sql(MV_DDL)
    w.write(
        spark.createDataFrame([(9, "r1", 123)], "id int, region string, cents long")
    )
    compact(c.table("sales"))
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c) == _expected(c)


def test_refresh_over_mor_base(spark, cat):
    """A merge-on-read base: the change feed's MOR span path feeds the
    same signed fold."""
    c, _ = cat
    c.sql(MV_DDL)
    mor = LakeWriter(c.table("sales"), pk=["id"], merge_mode="merge-on-read")
    mor.merge(
        spark.createDataFrame(
            [(5, "r0", 1000), (800, "r8", 7)], "id int, region string, cents long"
        )
    )
    mor.delete_where("id = 10")
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c) == _expected(c)


def test_avg_refresh_matches_full(spark, cat):
    """r13: avg(expr) sugar — maintained as a hidden sum/cnt pair, the
    public column re-derived each refresh; exact under updates, deletes,
    and NULL measures."""
    c, w = cat
    c.sql(
        "CREATE MATERIALIZED VIEW mva AS SELECT region, avg(cents) AS a, "
        "sum(cents) AS s, count(*) AS n FROM sales GROUP BY region"
    )
    # churn: insert with NULL measure, update, delete
    w.merge(
        spark.createDataFrame(
            [(500, "r9", None), (501, "r9", 40), (1, "r1", 7)],
            "id int, region string, cents long",
        )
    )
    w.delete_where("id = 2")
    c.sql("REFRESH MATERIALIZED VIEW mva")
    exp = {
        r["region"]: (r["a"], r["s"], r["n"])
        for r in c.table("sales").read().groupBy("region").agg(
            F.avg("cents").alias("a"),
            F.sum("cents").alias("s"),
            F.count("*").alias("n"),
        ).collect()
    }
    got = {
        r["region"]: (r["a"], r["s"], r["n"])
        for r in c.table("mva").read().collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        ea, es, en = exp[k]
        ga, gs, gn = got[k]
        assert gn == en and gs == es, k
        assert (ga is None) == (ea is None), k
        if ea is not None:
            assert abs(ga - ea) < 1e-9, k


def test_avg_all_null_group_is_null(spark, cat):
    """A group whose every measure is NULL: avg must be NULL in BOTH the
    full materialization and after incremental folding (cnt = 0 keys the
    public column off the maintained pair)."""
    c, w = cat
    w.merge(
        spark.createDataFrame(
            [(900, "rnull", None)], "id int, region string, cents long"
        )
    )
    c.sql(
        "CREATE MATERIALIZED VIEW mva AS SELECT region, avg(cents) AS a, "
        "count(*) AS n FROM sales GROUP BY region"
    )
    row = c.table("mva").read().filter("region = 'rnull'").collect()[0]
    assert row["a"] is None and row["n"] == 1
    # grow the all-NULL group incrementally — still NULL
    w.merge(
        spark.createDataFrame(
            [(901, "rnull", None)], "id int, region string, cents long"
        )
    )
    c.sql("REFRESH MATERIALIZED VIEW mva")
    row = c.table("mva").read().filter("region = 'rnull'").collect()[0]
    assert row["a"] is None and row["n"] == 2
    # a non-null value arrives — avg becomes exact over the non-nulls
    w.merge(
        spark.createDataFrame(
            [(902, "rnull", 30)], "id int, region string, cents long"
        )
    )
    c.sql("REFRESH MATERIALIZED VIEW mva")
    row = c.table("mva").read().filter("region = 'rnull'").collect()[0]
    assert row["a"] == 30.0 and row["n"] == 3


def test_null_sum_divergence_pinned(spark, cat):
    """The DOCUMENTED divergence, pinned: a live group whose every value
    is NULL reports sum = NULL from a FULL materialization but sum = 0
    after incremental folding — and that is the ONLY difference."""
    c, w = cat
    w.merge(
        spark.createDataFrame(
            [(900, "rnull", None)], "id int, region string, cents long"
        )
    )
    c.sql(MV_DDL)  # full materialization at create
    full_row = c.table("mv").read().filter("region = 'rnull'").collect()[0]
    assert full_row["total"] is None  # FULL: sum over all-NULL = NULL
    # now make the group arrive INCREMENTALLY instead
    c.sql("DROP MATERIALIZED VIEW mv")
    w.delete_where("id = 900")
    c.sql(MV_DDL)
    w.merge(
        spark.createDataFrame(
            [(900, "rnull", None)], "id int, region string, cents long"
        )
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    inc_row = c.table("mv").read().filter("region = 'rnull'").collect()[0]
    assert inc_row["total"] == 0  # incremental: 0-seeded fold
    assert inc_row["n"] == full_row["n"] == 1
    # every OTHER group agrees exactly with the from-scratch aggregate
    got = {k: v for k, v in _content(c).items() if k != "rnull"}
    exp = {k: v for k, v in _expected(c).items() if k != "rnull"}
    assert got == exp


def test_or_replace_refuses_plain_table(spark, cat):
    c, _ = cat
    with pytest.raises(ValueError, match="not a materialized view"):
        c.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW sales AS SELECT region, "
            "count(*) AS n FROM sales GROUP BY region"
        )


def test_refresh_racing_base_write(spark, cat):
    """REFRESH races a base write: the refresh pins the base tip (to_v)
    when it reads the CDF; a base commit landing before the MERGE
    commits must neither be folded in (it's past the pin) nor lost (the
    NEXT refresh folds it). Simulated by injecting the racing write into
    the writer merge call."""
    from ducklake_kafka_connect_spark.lake.writer import LakeWriter as _LW

    c, w = cat
    c.sql(MV_DDL)
    w.write(
        spark.createDataFrame([(300, "r3", 11)], "id int, region string, cents long")
    )
    racing = spark.createDataFrame(
        [(301, "r3", 500)], "id int, region string, cents long"
    )
    orig_merge = _LW.merge
    fired = {}

    def racing_merge(self, df, **kw):
        if self.table.name == "mv" and not fired.get("done"):
            fired["done"] = True
            LakeWriter(c.table("sales"), pk=["id"]).write(racing)
        return orig_merge(self, df, **kw)

    _LW.merge = racing_merge
    try:
        c.sql("REFRESH MATERIALIZED VIEW mv")
    finally:
        _LW.merge = orig_merge
    assert fired.get("done")
    # the recorded base_version excludes the racing commit
    recorded = int(c.table("mv").properties()[PROP_BASE_VERSION])
    assert recorded < c.table("sales").current_version()
    # and the next refresh converges on the full aggregate
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c) == _expected(c)
    assert int(c.table("mv").properties()[PROP_BASE_VERSION]) == (
        c.table("sales").current_version()
    )


def test_refresh_spanning_mor_materialization(spark, cat):
    """A MOR base whose refresh span CROSSES the OPTIMIZE that
    materializes the tombstones: the change feed across the compaction
    must fold to exactly the real churn."""
    from ducklake_kafka_connect_spark.lake.maintenance import compact

    c, _ = cat
    c.sql(MV_DDL)
    mor = LakeWriter(c.table("sales"), pk=["id"], merge_mode="merge-on-read")
    mor.merge(
        spark.createDataFrame(
            [(5, "r0", 999), (810, "r8", 13)], "id int, region string, cents long"
        )
    )
    mor.delete_where("id = 11")
    compact(c.table("sales"))  # materializes the MOR debt
    mor.merge(
        spark.createDataFrame(
            [(811, "r8", 29)], "id int, region string, cents long"
        )
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c) == _expected(c)


def test_minmax_repair_refresh(spark, cat):
    """r13: min/max via touched-group repair — inserts fold as
    least/greatest, a delete of the argmin/argmax repairs ONLY the
    touched groups from the base, dead groups tombstone."""
    c, w = cat
    c.sql(
        "CREATE MATERIALIZED VIEW mvm AS SELECT region, min(cents) AS lo, "
        "max(cents) AS hi, sum(cents) AS total, count(*) AS n "
        "FROM sales GROUP BY region"
    )

    def expected():
        return {
            r["region"]: (r["lo"], r["hi"], r["total"], r["n"])
            for r in c.table("sales").read().groupBy("region").agg(
                F.min("cents").alias("lo"), F.max("cents").alias("hi"),
                F.sum("cents").alias("total"), F.count("*").alias("n"),
            ).collect()
        }

    def got():
        return {
            r["region"]: (r["lo"], r["hi"], r["total"], r["n"])
            for r in c.table("mvm").read().collect()
        }

    # insert-only churn: pure fold path (no repair in the status detail)
    w.write(
        spark.createDataFrame(
            [(600, "r0", -5), (601, "r1", 9999)],
            "id int, region string, cents long",
        )
    )
    st = c.sql("REFRESH MATERIALIZED VIEW mvm").collect()[0]
    assert "repair" not in st["detail"], st["detail"]
    assert got() == expected()
    assert got()["r0"][0] == -5 and got()["r1"][1] == 9999
    # delete the argmax of r1 AND the argmin of r0: repair must raise
    # min/lower max exactly, and only those groups are repaired
    w.delete_where("id IN (600, 601)")
    st = c.sql("REFRESH MATERIALIZED VIEW mvm").collect()[0]
    assert "repair(2 group(s))" in st["detail"], st["detail"]
    assert got() == expected()
    # update that MOVES a row across groups: -1 on the old group
    # (repairs it), +1 on the new (folds)
    w.merge(
        spark.createDataFrame(
            [(1, "r9", 777)], "id int, region string, cents long"
        )
    )
    st = c.sql("REFRESH MATERIALIZED VIEW mvm").collect()[0]
    assert "repair" in st["detail"]
    assert got() == expected()
    # kill an entire group: every r9 row out → group dies via repair
    w.delete_where("region = 'r9'")
    c.sql("REFRESH MATERIALIZED VIEW mvm")
    assert got() == expected()
    assert "r9" not in got()


def test_minmax_repair_with_where_and_nulls(spark, cat):
    """Repair honors the definition's WHERE and NULL measures (min/max
    ignore NULLs; an all-NULL group reports NULL min/max but stays live
    through count(*))."""
    c, w = cat
    w.merge(
        spark.createDataFrame(
            [(700, "rn", None), (701, "rn", None)],
            "id int, region string, cents long",
        )
    )
    c.sql(
        "CREATE MATERIALIZED VIEW mvw AS SELECT region, min(cents) AS lo, "
        "count(*) AS n FROM sales WHERE id < 1000 GROUP BY region"
    )
    row = c.table("mvw").read().filter("region = 'rn'").collect()[0]
    assert row["lo"] is None and row["n"] == 2
    # delete one NULL row: repair path, group stays live, min stays NULL
    w.delete_where("id = 700")
    st = c.sql("REFRESH MATERIALIZED VIEW mvw").collect()[0]
    assert "repair" in st["detail"]
    row = c.table("mvw").read().filter("region = 'rn'").collect()[0]
    assert row["lo"] is None and row["n"] == 1


def test_random_churn_equivalence(spark, tmp_path):
    """Seeded random churn (inserts / cross-group updates / deletes /
    NULL measures) against the FULL aggregate ring — sum, count(*),
    count(expr), avg, min, max — refreshed incrementally after every
    batch. The incremental view must equal the from-scratch aggregate
    at every step (modulo the documented NULL-sum divergence, excluded
    by construction here via a non-null sum measure)."""
    import random

    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    rng = random.Random(1307)
    c = LakeCatalog(spark, str(tmp_path / "lake"))
    w = LakeWriter(c.table("rt"), pk=["id"])
    rows = {
        i: (f"g{i % 5}", rng.randrange(-50, 500)) for i in range(80)
    }
    df = lambda d: spark.createDataFrame(
        [(k, g, v) for k, (g, v) in d.items()],
        "id int, grp string, cents long",
    )
    w.write(df(rows))
    c.sql(
        "CREATE MATERIALIZED VIEW rmv AS SELECT grp, sum(cents) AS s, "
        "count(*) AS n, count(CASE WHEN cents > 100 THEN 1 END) AS nbig, "
        "avg(cents) AS a, min(cents) AS lo, max(cents) AS hi "
        "FROM rt GROUP BY grp"
    )

    def expected():
        out = {}
        for k, (g, v) in rows.items():
            out.setdefault(g, []).append(v)
        exp = {}
        for g, vs in out.items():
            exp[g] = (
                sum(vs), len(vs), sum(1 for v in vs if v > 100),
                round(sum(vs) / len(vs), 9), min(vs), max(vs),
            )
        return exp

    def got():
        return {
            r["grp"]: (
                r["s"], r["n"], r["nbig"],
                round(r["a"], 9), r["lo"], r["hi"],
            )
            for r in c.table("rmv").read().collect()
        }

    next_id = 1000
    for step in range(6):
        batch = {}
        for _ in range(rng.randrange(3, 12)):
            op = rng.random()
            if op < 0.4 and rows:  # update (possibly cross-group)
                k = rng.choice(list(rows))
                batch[k] = (f"g{rng.randrange(5)}", rng.randrange(-50, 500))
            elif op < 0.7:  # insert
                batch[next_id] = (f"g{rng.randrange(7)}", rng.randrange(-50, 500))
                next_id += 1
        if batch:
            w.merge(df(batch))
            rows.update(batch)
        if rows and rng.random() < 0.8:  # predicate delete
            cut = rng.randrange(-40, 480)
            doomed = [k for k, (_, v) in rows.items() if v == cut]
            w.delete_where(f"cents = {cut}")
            for k in doomed:
                del rows[k]
        c.sql("REFRESH MATERIALIZED VIEW rmv")
        assert got() == expected(), f"divergence at step {step}"


def test_minmax_repair_backslash_and_quote_keys(spark, cat):
    """r14 (ADVICE): group keys containing backslashes or quotes must
    not be mangled by the IN-prune literal — the prune is skipped for
    such keys (the left_semi join alone guarantees exactness)."""
    c, w = cat
    w.write(
        spark.createDataFrame(
            [
                (900, "C:\\temp", 10),
                (901, "C:\\temp", 99),
                (902, "it's", 5),
                (903, "it's", 77),
                (904, "plain", 3),
            ],
            "id int, region string, cents long",
        )
    )
    c.sql(
        "CREATE MATERIALIZED VIEW mvb AS SELECT region, min(cents) AS lo, "
        "max(cents) AS hi, count(*) AS n FROM sales GROUP BY region"
    )

    def state():
        return {
            r["region"]: (r["lo"], r["hi"], r["n"])
            for r in c.table("mvb").read().collect()
        }

    def expected():
        return {
            r["region"]: (r["lo"], r["hi"], r["n"])
            for r in c.table("sales").read().groupBy("region").agg(
                F.min("cents").alias("lo"), F.max("cents").alias("hi"),
                F.count("*").alias("n"),
            ).collect()
        }

    # delete the argmax of BOTH tricky-keyed groups: repair recomputes
    # them from the base; a mangled literal would under-read the group
    w.delete_where("id IN (901, 903)")
    st = c.sql("REFRESH MATERIALIZED VIEW mvb").collect()[0]
    assert "repair" in st["detail"], st["detail"]
    assert state() == expected()
    assert state()["C:\\temp"] == (10, 10, 1)
    assert state()["it's"] == (5, 5, 1)
    # kill the backslash group entirely: must tombstone, not linger
    w.delete_where("id = 900")
    c.sql("REFRESH MATERIALIZED VIEW mvb")
    assert state() == expected()
    assert "C:\\temp" not in state()


class TestBaseEvolutionMatrix:
    """r14 (VERDICT r13 #4): materialized views × base-table evolution.
    ADD COLUMN and type widening between refreshes fold fine (the MV
    references only its own columns); a REPLACE'd base refuses the
    incremental fold with the FULL remedy; a refresh racing concurrent
    base writes commits a consistent base_version."""

    def test_base_add_column_between_refreshes(self, spark, cat):
        c, w = cat
        c.sql(MV_DDL)
        # base gains a column; new rows carry it
        w.write(
            spark.createDataFrame(
                [(900, "r0", 50, "web")],
                "id int, region string, cents long, channel string",
            )
        )
        st = c.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert "incremental" in st["detail"]
        assert _content(c) == _expected(c)
        # and again after more churn on the widened base
        w.delete_where("id = 900")
        c.sql("REFRESH MATERIALIZED VIEW mv")
        assert _content(c) == _expected(c)

    def test_base_type_widen_between_refreshes(self, spark, cat):
        c, w = cat
        c.sql(
            "CREATE MATERIALIZED VIEW mvw AS SELECT region, "
            "min(cents) AS lo, sum(cents) AS total, count(*) AS n "
            "FROM sales GROUP BY region"
        )
        # the id column widens int -> long via the promotion ladder
        w.write(
            spark.createDataFrame(
                [(5_000_000_000, "r1", 7)], "id long, region string, cents long"
            )
        )
        assert c.table("sales").manifest().schema["id"].dataType.simpleString() == "bigint"
        c.sql("REFRESH MATERIALIZED VIEW mvw")
        got = {
            r["region"]: (r["lo"], r["total"], r["n"])
            for r in c.table("mvw").read().collect()
        }
        exp = {
            r["region"]: (r["lo"], r["total"], r["n"])
            for r in c.table("sales").read().groupBy("region").agg(
                F.min("cents").alias("lo"), F.sum("cents").alias("total"),
                F.count("*").alias("n"),
            ).collect()
        }
        assert got == exp

    def test_base_replace_refuses_incremental(self, spark, cat):
        c, w = cat
        c.sql(MV_DDL)
        c.sql("REFRESH MATERIALIZED VIEW mv")
        before = _content(c)
        # REPLACE the base: disjoint history
        c.sql("CREATE OR REPLACE TABLE sales (id BIGINT, region STRING, cents BIGINT, PRIMARY KEY (id))")
        w2 = LakeWriter(c.table("sales"), pk=["id"])
        w2.write(
            spark.createDataFrame(
                [(1, "rX", 11), (2, "rX", 22)], "id long, region string, cents long"
            )
        )
        with pytest.raises(ValueError, match="REPLACE"):
            c.sql("REFRESH MATERIALIZED VIEW mv")
        # the MV is untouched by the refused refresh
        assert _content(c) == before
        # FULL re-initializes from the new base
        c.sql("REFRESH MATERIALIZED VIEW mv FULL")
        assert _content(c) == {"rX": (33, 2)}
        # and incremental folding resumes cleanly after the re-init
        w2.write(spark.createDataFrame([(3, "rY", 5)], "id long, region string, cents long"))
        st = c.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert "incremental" in st["detail"]
        assert _content(c) == {"rX": (33, 2), "rY": (5, 1)}

    def test_refresh_pins_consistent_base_version(self, spark, cat):
        c, w = cat
        c.sql(MV_DDL)
        # two base commits; refresh folds BOTH and records exactly the
        # version it read — then a commit landing after the refresh is
        # picked up by the NEXT refresh, never half-applied
        w.write(spark.createDataFrame([(901, "r0", 10)], "id int, region string, cents long"))
        w.write(spark.createDataFrame([(902, "r1", 20)], "id int, region string, cents long"))
        pinned = c.table("sales").current_version()
        c.sql("REFRESH MATERIALIZED VIEW mv")
        props = c.table("mv").properties()
        assert int(props[PROP_BASE_VERSION]) == pinned
        assert _content(c) == _expected(c)
        w.write(spark.createDataFrame([(903, "r2", 30)], "id int, region string, cents long"))
        # marker unchanged until the next refresh
        assert int(c.table("mv").properties()[PROP_BASE_VERSION]) == pinned
        c.sql("REFRESH MATERIALIZED VIEW mv")
        assert int(c.table("mv").properties()[PROP_BASE_VERSION]) == pinned + 1
        assert _content(c) == _expected(c)


class TestStarJoinMatview:
    """r14: star-join matviews — fact JOIN one broadcast dim. Fact
    churn folds through the pinned dim snapshot; any dim change refuses
    incremental with a FULL remedy."""

    def _mk(self, spark, c):
        wd = LakeWriter(c.table("dim_region"), pk=["region"])
        wd.write(
            spark.createDataFrame(
                [(f"r{i}", "west" if i % 2 == 0 else "east") for i in range(4)],
                "region string, zone string",
            )
        )
        c.sql(
            "CREATE MATERIALIZED VIEW mvj AS SELECT zone, sum(cents) AS total, "
            "count(*) AS n FROM sales JOIN dim_region "
            "ON sales.region = dim_region.region GROUP BY zone"
        )
        return wd

    def _expected(self, spark, c):
        return {
            r["zone"]: (r["total"], r["n"])
            for r in c.table("sales").read().alias("s").join(
                c.table("dim_region").read().select("region", "zone"),
                on="region",
            ).groupBy("zone").agg(
                F.sum("cents").alias("total"), F.count("*").alias("n")
            ).collect()
        }

    def _got(self, c):
        return {
            r["zone"]: (r["total"], r["n"])
            for r in c.table("mvj").read().collect()
        }

    def test_create_and_incremental_fact_churn(self, spark, cat):
        c, w = cat
        self._mk(spark, c)
        assert self._got(c) == self._expected(spark, c)
        # fact insert + cross-group update + delete fold incrementally
        w.write(
            spark.createDataFrame(
                [(900, "r0", 5), (901, "r5", 7)],  # r5 has no dim row -> drops
                "id int, region string, cents long",
            )
        )
        st = c.sql("REFRESH MATERIALIZED VIEW mvj").collect()[0]
        assert "incremental" in st["detail"], st["detail"]
        assert self._got(c) == self._expected(spark, c)
        w.merge(
            spark.createDataFrame(
                [(900, "r1", 5)], "id int, region string, cents long"
            )
        )  # moves a row west -> east
        w.delete_where("id = 10")
        c.sql("REFRESH MATERIALIZED VIEW mvj")
        assert self._got(c) == self._expected(spark, c)

    def test_dim_change_refuses_then_full(self, spark, cat):
        c, w = cat
        wd = self._mk(spark, c)
        # dim attribute flips a region to the other zone
        wd.merge(
            spark.createDataFrame([("r0", "east")], "region string, zone string")
        )
        with pytest.raises(ValueError, match="FULL"):
            c.sql("REFRESH MATERIALIZED VIEW mvj")
        c.sql("REFRESH MATERIALIZED VIEW mvj FULL")
        assert self._got(c) == self._expected(spark, c)
        # fact churn resumes incrementally against the new pinned dim
        w.write(
            spark.createDataFrame(
                [(910, "r0", 9)], "id int, region string, cents long"
            )
        )
        st = c.sql("REFRESH MATERIALIZED VIEW mvj").collect()[0]
        assert "incremental" in st["detail"]
        assert self._got(c) == self._expected(spark, c)

    def test_minmax_repair_on_join_view(self, spark, cat):
        c, w = cat
        wd = LakeWriter(c.table("dim_region"), pk=["region"])
        wd.write(
            spark.createDataFrame(
                [(f"r{i}", "west" if i % 2 == 0 else "east") for i in range(4)],
                "region string, zone string",
            )
        )
        c.sql(
            "CREATE MATERIALIZED VIEW mvjm AS SELECT zone, min(cents) AS lo, "
            "max(cents) AS hi, count(*) AS n FROM sales JOIN dim_region "
            "ON sales.region = dim_region.region GROUP BY zone"
        )
        # delete the global argmax: repair recomputes the touched zone
        # through the join (group key 'zone' is a DIM column, so the
        # base-manifest IN-prune is skipped — the semi-join is exact)
        top = c.table("sales").read().orderBy(F.desc("cents"), "id").limit(1).collect()[0]
        w.delete_where(f"id = {top['id']}")
        st = c.sql("REFRESH MATERIALIZED VIEW mvjm").collect()[0]
        assert "repair" in st["detail"], st["detail"]
        got = {
            r["zone"]: (r["lo"], r["hi"], r["n"])
            for r in c.table("mvjm").read().collect()
        }
        exp = {
            r["zone"]: (r["lo"], r["hi"], r["n"])
            for r in c.table("sales").read().join(
                c.table("dim_region").read().select("region", "zone"), on="region"
            ).groupBy("zone").agg(
                F.min("cents").alias("lo"), F.max("cents").alias("hi"),
                F.count("*").alias("n"),
            ).collect()
        }
        assert got == exp

    def test_join_guards(self, spark, cat):
        c, _ = cat
        LakeWriter(c.table("dim_bad"), pk=["region"]).write(
            spark.createDataFrame(
                [("r0", 1)], "region string, cents int"  # collides with fact
            )
        )
        with pytest.raises(ValueError, match="collide"):
            c.sql(
                "CREATE MATERIALIZED VIEW mvx AS SELECT region, sum(cents) AS t, "
                "count(*) AS n FROM sales JOIN dim_bad "
                "ON sales.region = dim_bad.region GROUP BY region"
            )
        with pytest.raises(ValueError, match="qualified equality"):
            c.sql(
                "CREATE MATERIALIZED VIEW mvy AS SELECT region, sum(cents) AS t, "
                "count(*) AS n FROM sales JOIN dim_bad ON region = region "
                "GROUP BY region"
            )


def test_star_join_two_dims(spark, cat):
    """r14: multi-dim star joins — fact churn folds through BOTH pinned
    dims; a change to EITHER dim refuses with the FULL remedy naming
    the changed dim(s)."""
    c, w = cat
    LakeWriter(c.table("dim_zone"), pk=["region"]).write(
        spark.createDataFrame(
            [(f"r{i}", "west" if i % 2 == 0 else "east") for i in range(4)],
            "region string, zone string",
        )
    )
    LakeWriter(c.table("dim_tier"), pk=["cents"]).write(
        spark.createDataFrame(
            [(c_ * 100, "hi" if c_ >= 5 else "lo") for c_ in range(10)],
            "cents long, tier string",
        )
    )
    c.sql(
        "CREATE MATERIALIZED VIEW mv2d AS SELECT zone, tier, "
        "sum(cents) AS total, count(*) AS n FROM sales "
        "JOIN dim_zone ON sales.region = dim_zone.region "
        "JOIN dim_tier ON sales.cents = dim_tier.cents "
        "GROUP BY zone, tier"
    )

    def expected():
        return {
            (r["zone"], r["tier"]): (r["total"], r["n"])
            for r in c.table("sales").read()
            .join(c.table("dim_zone").read().select("region", "zone"), on="region")
            .join(c.table("dim_tier").read().select("cents", "tier"), on="cents")
            .groupBy("zone", "tier")
            .agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
            .collect()
        }

    def got():
        return {
            (r["zone"], r["tier"]): (r["total"], r["n"])
            for r in c.table("mv2d").read().collect()
        }

    assert got() == expected()
    # fact churn folds incrementally through both pinned dims
    w.write(
        spark.createDataFrame(
            [(950, "r1", 700), (951, "r2", 0)],
            "id int, region string, cents long",
        )
    )
    w.delete_where("id = 7")
    st = c.sql("REFRESH MATERIALIZED VIEW mv2d").collect()[0]
    assert "incremental" in st["detail"], st["detail"]
    assert got() == expected()
    # EITHER dim changing refuses, naming it
    LakeWriter(c.table("dim_tier"), pk=["cents"]).merge(
        spark.createDataFrame([(900, "mid")], "cents long, tier string")
    )
    with pytest.raises(ValueError, match="dim_tier"):
        c.sql("REFRESH MATERIALIZED VIEW mv2d")
    c.sql("REFRESH MATERIALIZED VIEW mv2d FULL")
    assert got() == expected()
    # duplicate dim refuses at create; snowflake (dim-to-dim) refuses
    with pytest.raises(ValueError, match="twice"):
        c.sql(
            "CREATE MATERIALIZED VIEW mvdup AS SELECT zone, sum(cents) AS t, "
            "count(*) AS n FROM sales "
            "JOIN dim_zone ON sales.region = dim_zone.region "
            "JOIN dim_zone ON sales.region = dim_zone.region GROUP BY zone"
        )
    with pytest.raises(ValueError, match="star, not snowflake"):
        c.sql(
            "CREATE MATERIALIZED VIEW mvsnow AS SELECT tier, sum(cents) AS t, "
            "count(*) AS n FROM sales "
            "JOIN dim_zone ON sales.region = dim_zone.region "
            "JOIN dim_tier ON dim_zone.zone = dim_tier.tier GROUP BY tier"
        )
