"""CDC tombstone deletes (extension beyond the reference — SURVEY §2.G:
the reference treats null-valued records as null rows, never deletes)
and the whole-batch schema-conflict DLQ route."""

import json

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.streaming.ingest import (
    IngestConfig,
    IngestPipeline,
    TableSpec,
)


def _table(spark, tmp_path, name="t"):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.table(name)
    w = LakeWriter(t, pk=["id"])
    w.write(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        )
    )
    return t, w


class TestTombstones:
    def test_delete_existing_key(self, spark, tmp_path):
        t, w = _table(spark, tmp_path)
        batch = spark.createDataFrame(
            [(2, None, True), (4, "d", False)],
            "id long, v string, _deleted boolean",
        )
        w.merge(batch, tombstone_col="_deleted")
        rows = {r["id"]: r["v"] for r in t.read().collect()}
        assert rows == {1: "a", 3: "c", 4: "d"}

    def test_delete_then_reinsert_resolves_by_order(self, spark, tmp_path):
        t, w = _table(spark, tmp_path, "t2")
        batch = spark.createDataFrame(
            [(2, None, True, 1), (2, "revived", False, 2)],
            "id long, v string, _deleted boolean, seq long",
        )
        w.merge(batch.select("id", "v", "_deleted", "seq"), order_col="seq",
                tombstone_col="_deleted")
        rows = {r["id"]: r["v"] for r in t.read().collect()}
        assert rows[2] == "revived"
        # opposite order: delete wins
        t3, w3 = _table(spark, tmp_path, "t3")
        batch = spark.createDataFrame(
            [(2, "stale", False, 1), (2, None, True, 2)],
            "id long, v string, _deleted boolean, seq long",
        )
        w3.merge(batch, order_col="seq", tombstone_col="_deleted")
        assert 2 not in {r["id"] for r in t3.read().collect()}

    def test_delete_missing_key_noop(self, spark, tmp_path):
        t, w = _table(spark, tmp_path, "t4")
        batch = spark.createDataFrame(
            [(99, None, True)], "id long, v string, _deleted boolean"
        )
        w.merge(batch, tombstone_col="_deleted")
        assert t.read().count() == 3

    def test_delete_only_batch(self, spark, tmp_path):
        t, w = _table(spark, tmp_path, "t5")
        batch = spark.createDataFrame(
            [(1, None, True), (3, None, True)], "id long, v string, _deleted boolean"
        )
        w.merge(batch, tombstone_col="_deleted")
        rows = {r["id"]: r["v"] for r in t.read().collect()}
        assert rows == {2: "b"}


class TestSchemaConflictDLQ:
    def test_whole_batch_reconcile_error_routes_to_dlq(self, spark, tmp_path):
        # batch 1 establishes `ts` as timestamp; batch 2 sends a
        # non-temporal string for the same field → ReconcileError →
        # every row of batch 2 lands in the DLQ, table unchanged
        # (reference: string+timestamp mixes are an error by design,
        # ArrowSchemaMerge.java:407-417 → DLQ triage)
        catalog = LakeCatalog(spark, str(tmp_path))
        cfg = IngestConfig(tables={"ev": TableSpec(auto_create=True)})
        pipe = IngestPipeline(catalog, cfg)

        def kafka_batch(rows):
            data = [
                (None, json.dumps(v), "ev", 0, i, None) for i, v in enumerate(rows)
            ]
            return spark.createDataFrame(
                data,
                "key binary, value string, topic string, partition int, "
                "offset long, timestamp timestamp",
            )

        pipe.process_batch(kafka_batch([{"id": 1, "ts": "2024-01-01T10:00:00Z"}]), 0)
        table = catalog.table("ev")
        assert table.read().count() == 1
        assert dict(table.read().dtypes)["ts"] == "timestamp"

        pipe.process_batch(kafka_batch([{"id": 2, "ts": "not-a-time"}]), 1)
        assert table.read().count() == 1  # nothing ingested
        dlq = catalog.table("ev_dlq")
        bad = dlq.read().collect()
        assert len(bad) == 1
        assert "reconcile_error" in bad[0]["error"]


class TestUpdateWhere:
    """Predicate UPDATE: file-pruned in-place rewrite with SET
    expressions; guards on PK and partition columns."""

    def test_update_where_rewrites_only_matching_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=["id"])
        w.write(
            spark.range(100).select(
                F.col("id"),
                (F.col("id") % 5).alias("grade"),
                F.lit("x").alias("name"),
            )
        )
        w.update_where("grade = 3", {"name": "'promoted'", "grade": "grade + 10"})
        rows = {r["id"]: (r["grade"], r["name"]) for r in cat.table("t").read().collect()}
        assert len(rows) == 100
        for i in range(100):
            if i % 5 == 3:
                assert rows[i] == (13, "promoted")
            else:
                assert rows[i] == (i % 5, "x")
        # history records the op
        ops = [r["op"] for r in cat.table("t").history().collect()]
        assert "UPDATE" in ops

    def test_update_where_prunes_untouched_partitions(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=["id"], partition_by="bucket")
        w.write(
            spark.range(40).select(
                F.col("id"), (F.col("id") % 2).alias("bucket"), F.lit(1.0).alias("v")
            )
        )
        m0 = cat.table("t").manifest()
        w.update_where("bucket = 1 AND id >= 0", {"v": "v * 2"})
        m1 = cat.table("t").manifest()
        # bucket=0's files are carried, not rewritten
        b0_key = [k for k in m0.files if "bucket=0" in k or k.endswith("0")]
        assert b0_key and m0.files[b0_key[0]] == m1.files[b0_key[0]]
        got = {r["id"]: r["v"] for r in cat.table("t").read().collect()}
        assert got[1] == 2.0 and got[2] == 1.0

    def test_update_where_guards(self, spark, tmp_path):
        import pytest
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=["id"], partition_by="bucket")
        w.write(
            spark.range(10).select(
                F.col("id"), (F.col("id") % 2).alias("bucket"), F.lit(1.0).alias("v")
            )
        )
        with pytest.raises(ValueError, match="PK"):
            w.update_where("v > 0", {"id": "id + 1"})
        with pytest.raises(ValueError, match="partition"):
            w.update_where("v > 0", {"bucket": "1 - bucket"})
        with pytest.raises(ValueError, match="unknown"):
            w.update_where("v > 0", {"nope": "1"})
