"""Sharded JSONL export: deterministic assignment + physical write."""

import json
import os

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake.export import export_jsonl_shards, shard_col
from ducklake_kafka_connect_spark.sources.parquet_loader import load_parquet

SF = "/root/testdata/sf0.001"


def test_export_jsonl_shards_roundtrip(spark, tmp_path):
    docs = load_parquet(spark, f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "export")
    dirs = export_jsonl_shards(docs, out, 8, key_col="doc_id", order_col="doc_id")
    assert len(dirs) == 8  # every shard materialized at this corpus size

    # physical rows match the computed assignment per shard
    want = {
        r["shard"]: r["n"]
        for r in docs.withColumn("shard", shard_col(F.col("doc_id").cast("string"), 8))
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = 0
    for d in dirs:
        k = int(os.path.basename(d).split("=")[1])
        rows = []
        for f in os.listdir(d):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    rows += [json.loads(line) for line in fh if line.strip()]
        assert len(rows) == want[k]
        # order_col honored within the shard file set
        ids = [r["doc_id"] for r in rows]
        assert ids == sorted(ids)
        total += len(rows)
    assert total == docs.count()


def test_export_is_content_stable(spark, tmp_path):
    docs = load_parquet(spark, f"{SF}/documents.parquet").select("doc_id", "text")
    a = docs.withColumn("s", shard_col(F.col("doc_id").cast("string"), 8))
    # dropping rows must not move any surviving row to another shard
    b = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "s", shard_col(F.col("doc_id").cast("string"), 8)
    )
    am = {r["doc_id"]: r["s"] for r in a.collect()}
    bm = {r["doc_id"]: r["s"] for r in b.collect()}
    assert all(am[k] == v for k, v in bm.items())
