"""ATTACH / DETACH: read-only sibling lakes addressable as
``alias.table`` in catalog SQL (lake/table.py ``attach`` /
``_rewrite_attached_refs``)."""

import pytest

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter


@pytest.fixture
def lakes(spark, tmp_path):
    a = LakeCatalog(spark, str(tmp_path / "a"))
    b = LakeCatalog(spark, str(tmp_path / "b"))
    LakeWriter(a.table("t"), pk=["id"]).append(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, s string")
    )
    LakeWriter(b.table("dim"), pk=["id"]).append(
        spark.createDataFrame([(1, "X"), (2, "Y")], "id long, label string")
    )
    return a, b


def test_attach_join_and_detach(lakes, tmp_path):
    a, b = lakes
    a.sql(f"ATTACH '{b.root}' AS mirror")
    rows = sorted(
        tuple(r)
        for r in a.sql(
            "SELECT t.id, t.s, d.label FROM t JOIN mirror.dim d ON t.id = d.id"
        ).collect()
    )
    assert rows == [(1, "a", "X"), (2, "b", "Y")]
    dbs = {r["database"]: r["access"] for r in a.sql("SHOW DATABASES").collect()}
    assert dbs == {"main": "read_write", "mirror": "read_only"}
    a.sql("DETACH mirror")
    with pytest.raises(Exception):
        a.sql("SELECT * FROM mirror.dim").collect()


def test_attached_is_read_only(lakes):
    a, b = lakes
    a.sql(f"ATTACH '{b.root}' AS m2")
    with pytest.raises(ValueError, match="READ-ONLY"):
        a.sql("INSERT INTO m2.dim VALUES (9, 'Z')")
    with pytest.raises(ValueError, match="READ-ONLY"):
        a.sql("DELETE FROM m2.dim WHERE id = 1")
    # the attached side is still writable through its OWN catalog, and
    # a re-read through the attachment sees the new version
    LakeWriter(b.table("dim"), pk=["id"]).write(
        b.spark.createDataFrame([(3, "Z")], "id long, label string")
    )
    assert a.sql("SELECT count(*) AS n FROM m2.dim").collect()[0]["n"] == 3


def test_attach_guards(lakes):
    a, b = lakes
    a.sql(f"ATTACH '{b.root}' AS m3")
    with pytest.raises(ValueError, match="already in use"):
        a.attach(b.root, "M3")  # case-insensitive alias collision
    with pytest.raises(ValueError, match="not attached"):
        a.sql("DETACH nosuch")
    # alias refs inside string literals must not rewrite
    (row,) = a.sql("SELECT 'm3.dim' AS s").collect()
    assert row["s"] == "m3.dim"
    # unknown table under a valid alias: untouched → analysis error
    with pytest.raises(Exception):
        a.sql("SELECT * FROM m3.nosuch").collect()
