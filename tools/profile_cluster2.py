"""Warm-run breakdown of dedup_cluster_keep_best (bench protocol)."""

from __future__ import annotations

import time

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators import dedup as dedup_ops
from ducklake_kafka_connect_spark.session import build_session
from ducklake_kafka_connect_spark.sources.parquet_loader import load_parquet

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"  {label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return r


def run(spark):
    docs = load_parquet(spark, f"{SF}/documents.parquet")
    pairs = dedup_ops.minhash_dedup_pairs(docs)
    t("pairs.collect", lambda: pairs.collect())
    comp = t("clusters", lambda: dedup_ops.dedup_clusters(pairs, out_id="id"))
    joined = comp.join(
        docs.select("doc_id", "n_chars"), comp.id == F.col("doc_id")
    ).select("cluster_id", "doc_id", "n_chars")
    sized = joined.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    reps = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("rep_doc_id"),
                F.col("n_chars").cast("long").alias("rep_chars"))
    )
    out = reps.join(sized, "cluster_id")
    t("final.collect", lambda: out.collect())


def main():
    spark = build_session(app_name="profile-cluster2")
    spark.range(100).count()
    for i in range(3):
        print(f"--- pass {i} (cache kept) ---")
        run(spark)
    dedup_ops.release_cached()
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
